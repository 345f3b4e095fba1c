"""Dump .explain("formatted") for every gate query into a directory.

Usage: python scripts/dump_plans.py <outdir> [name ...]

Used by the optimization rounds to commit before/after plan evidence
(plans/r16/<query>_before.txt / _after.txt). Streaming queries that only
have per-micro-batch plans are skipped (same skip set as explain_audit).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from hive_server_spark import gate
    from hive_server_spark.session import get_spark

    outdir = sys.argv[1]
    only = set(sys.argv[2:])
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    skip = {"orders_state_streaming"}
    n = 0
    for name, fn in sorted(gate.spark_queries().items()):
        if name in skip or (only and name not in only):
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # pragma: no cover
            plan = f"ERROR: {type(e).__name__}: {e}"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        n += 1
    print(f"wrote {n} plans to {outdir}")


if __name__ == "__main__":
    main()
