"""A/B attribution for the round-16 text-tail regression (VERDICT r16 item 1).

Hypothesis under test: session-lifetime persist() accumulation slows the
alphabetically-late query families in a single-session full sweep (storage
blocks + GC pressure vs 32 executor threads in one local JVM), NOT the
text queries' own plans (which did not change r15→r16).

Three arms, each on a FRESH SparkSession, same methodology as bench.py
(count() per query, warm-up first):

  A  run ONLY the text_* family (cold caches, no prior families)
  B  run the FULL sorted registry (the bench shape) — text times come from
     the same loop, i.e. after every other family's caches accumulated
  C  like B, but spark.catalog.clearCache() right before the first text_*
     query — same JVM age and prior work as B, storage pressure removed

If B.text >> A.text and C.text ~= A.text, the accumulation hypothesis is
confirmed and bounded to storage (not JVM aging). Prints a JSON summary.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
       python scripts/ab_cache_pressure.py [--arms ABC] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fresh_spark():
    from hive_server_spark.session import get_spark

    spark = get_spark("hss-ab-cache-pressure")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _warm_up(spark, sf_dir):
    from hive_server_spark import gate

    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    warm = gate.spark_queries()
    for wq in ("orders_state", "text_profile", "amount_out_buy", "multimodal_decode_profile"):
        if wq in warm:
            warm[wq](spark, "/root/testdata/sf0.001").count()


def _storage_mb(spark) -> dict:
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    mem = sum(i.memSize() for i in infos)
    disk = sum(i.diskSize() for i in infos)
    return {"n_rdds": len(infos), "mem_mb": round(mem / 1e6, 1), "disk_mb": round(disk / 1e6, 1)}


def run_arm(arm: str, sf_dir: str) -> dict:
    from hive_server_spark import gate
    from hive_server_spark.plans import streaming_pack, text_pack

    spark = _fresh_spark()
    try:
        _warm_up(spark, sf_dir)
        queries = sorted(gate.spark_queries().items())
        if arm == "A":
            queries = [(n, f) for n, f in queries if n.startswith("text_")]
        else:
            # the bench shape: waves first
            streaming_pack.fold_seq_slices(spark, sf_dir)
            streaming_pack._evt_streaming_results(spark, sf_dir)
        text_pack._bpe_train(spark, sf_dir)
        timings: dict[str, float] = {}
        cleared = False
        storage_at_text = None
        for name, fn in queries:
            if name.startswith("text_") and not cleared:
                storage_at_text = _storage_mb(spark)
                if arm == "C":
                    spark.catalog.clearCache()
                cleared = True
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            timings[name] = round(time.perf_counter() - t0, 4)
        text_sum = round(sum(v for k, v in timings.items() if k.startswith("text_")), 2)
        return {
            "arm": arm,
            "text_sum": text_sum,
            "total_sum": round(sum(timings.values()), 2),
            "storage_at_text_start": storage_at_text,
            "storage_at_end": _storage_mb(spark),
            "timings": timings,
        }
    finally:
        spark.stop()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default="ABC")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    results = [run_arm(a, sf_dir) for a in args.arms]
    summary = {
        "sf_dir": sf_dir,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS"),
        "arms": results,
    }
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(summary, fh, indent=1)
            fh.write("\n")
    slim = [
        {k: r[k] for k in ("arm", "text_sum", "total_sum", "storage_at_text_start")}
        for r in results
    ]
    print(json.dumps(slim, indent=1))


if __name__ == "__main__":
    main()
