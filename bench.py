"""Benchmark harness: runs every gate query at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"queries": {...}, "sf": ..., "metric": ..., "unit": "sec", "value": total_sec}
(headline fields deliberately LAST — see the key-order note in main()).

Each query is executed with a count() action (full materialization, no
driver-side result transfer) after a warm-up of the session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hive_server_spark import gate  # noqa: E402
from hive_server_spark.session import get_spark  # noqa: E402


def main() -> None:
    # The driver parses this process's stdout as the benchmark result. The
    # JVM child writes its own noise ("Setting default log level...",
    # log4j banners) straight to fd 1, so divert fd 1 to stderr for the whole
    # run and emit the single JSON line on the saved real stdout at the end.
    real_stdout = os.dup(1)
    os.dup2(2, 1)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("hive-server-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen/Python-worker warm-up: run one representative query at the
    # smallest scale factor so measured numbers reflect steady-state
    # execution, not first-query compilation.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    warm = gate.spark_queries()
    for wq in ("orders_state", "text_profile", "amount_out_buy", "multimodal_decode_profile"):
        if wq in warm:
            warm[wq](spark, "/root/testdata/sf0.001").count()

    timings: dict[str, float] = {}
    for name, fn in sorted(gate.spark_queries().items()):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    # key order matters operationally: the driver records only the LAST
    # 2000 chars of stdout (BENCH_r*.json "tail"), and with 113 queries this
    # line is ~3.7k chars — so the headline metric/value go at the END of
    # the object, where the tail window is guaranteed to keep them.
    line = json.dumps(
        {
            "queries": timings,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "metric": "gate_queries_total_runtime",
            "unit": "sec",
            "value": total,
        }
    )
    os.write(real_stdout, (line + "\n").encode())
    os.close(real_stdout)


if __name__ == "__main__":
    main()
