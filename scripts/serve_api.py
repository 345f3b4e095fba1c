"""Run the live JSON API daemon (operators/api_server.py) for manual use:

    python scripts/serve_api.py [--port 8080] [--sf-dir /root/testdata/sf0.01] [--with-cdc]

Serves the seven reference routes (reference src/api/routes.ts:11-17) plus
the CDC tail endpoint. Ctrl-C to stop."""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument(
        "--with-cdc",
        action="store_true",
        help="run the CDC fold first and enable /api/cdc/:address",
    )
    args = ap.parse_args()

    from hive_server_spark.operators.api_server import HiveApiServer
    from hive_server_spark.session import get_spark

    spark = get_spark("hive-api-server")
    spark.sparkContext.setLogLevel("ERROR")

    cdc_dir = None
    if args.with_cdc:
        from hive_server_spark.plans.streaming_pack import _land_seq_slices
        from hive_server_spark.streaming.cdc import run_incremental_fold_with_cdc

        work = tempfile.mkdtemp(prefix="hss_api_cdc_")
        ev_dir = _land_seq_slices(spark, args.sf_dir)
        stream = (
            spark.readStream.schema(spark.read.parquet(ev_dir).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ev_dir)
        )
        _store, cdc_dir = run_incremental_fold_with_cdc(
            spark,
            stream,
            state_dir=os.path.join(work, "state"),
            checkpoint_dir=os.path.join(work, "ckpt"),
            cdc_dir=os.path.join(work, "cdc"),
        )

    srv = HiveApiServer(spark, args.sf_dir, port=args.port, cdc_dir=cdc_dir).start()
    print(f"serving on http://127.0.0.1:{srv.port}/api/pools  (Ctrl-C to stop)")
    try:
        srv._thread.join()
    except KeyboardInterrupt:
        srv.stop()


if __name__ == "__main__":
    main()
