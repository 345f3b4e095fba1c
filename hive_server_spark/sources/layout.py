"""Physical layout for derived state tables (100 TB posture).

The reference's per-pool Redis indexes (reference src/models/order-book.ts:
31-53) become *physical layout* here: the orders state table is written
hash-bucketed by pool into `pool_bucket=NN/` partitions, so per-pool reads
(order book, trader views, CDC recompute) prune to one partition directory
at the scan — the columnar analogue of a Redis key prefix.

Bucket-by-hash rather than raw pool_address keeps directory cardinality
bounded (pools are unbounded, buckets are fixed) while still pruning ~1/N of
the data per pool lookup. On a real deployment the same scheme feeds
co-partitioned (bucketed) joins; locally it demonstrates partition pruning,
asserted by test via the scanned-file count."""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS = 16


def pool_bucket(col: str = "pool_address") -> Column:
    return F.pmod(F.hash(F.col(col)), F.lit(N_BUCKETS)).alias("pool_bucket")


def write_orders_partitioned(orders: DataFrame, path: str) -> None:
    """Write the orders state partitioned by pool bucket."""
    (
        orders.withColumn("pool_bucket", pool_bucket())
        .write.mode("overwrite")
        .partitionBy("pool_bucket")
        .parquet(path)
    )


def read_pool_orders(spark: SparkSession, path: str, pool_address: str) -> DataFrame:
    """Per-pool read with partition pruning: the bucket predicate is computed
    from the pool address and lands on the directory structure (a
    PartitionFilter, not a data filter)."""
    df = spark.read.parquet(path)
    return df.where(
        (F.col("pool_bucket") == F.pmod(F.hash(F.lit(pool_address)), F.lit(N_BUCKETS)))
        & (F.col("pool_address") == pool_address)
    ).drop("pool_bucket")


def scanned_files(df: DataFrame) -> int:
    """Number of files the plan will actually scan (post partition pruning)."""
    return df.select(F.input_file_name()).distinct().count()


def partition_dirs(path: str) -> list[str]:
    return sorted(d for d in os.listdir(path) if d.startswith("pool_bucket="))


def compact(spark: SparkSession, path: str, out_path: str, target_files: int) -> int:
    """Bin-pack a small-file table into `target_files` parquet files —
    the maintenance job every long-running ingest needs (per-batch appends
    leave file counts growing; scans then pay per-file open cost). Returns
    the compacted file count."""
    df = spark.read.parquet(path)
    df.repartition(target_files).write.mode("overwrite").parquet(out_path)
    return scanned_files(spark.read.parquet(out_path))
