"""Scalable global top-k with deterministic ranks.

`row_number() OVER (ORDER BY …)` with no PARTITION BY funnels EVERY input
row through one partition's sort — fine at test scale, a wall at 100 TB.
`orderBy().limit(k)` instead plans TakeOrderedAndProject: each partition
keeps a local k-row heap and only those heaps merge. `global_topk` uses the
bounded form and then ranks the ≤k survivors (the window now sorts k rows,
not the world). The order must be total (include a tiebreak column) for the
result to be deterministic — same requirement the oracle SQL has."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_topk(df: DataFrame, order: list[Column], k: int, rank_col: str = "rk") -> DataFrame:
    """Top-k rows of `df` under the total order `order`, with a 1-based
    BIGINT rank column appended."""
    topk = df.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return topk.withColumn(rank_col, F.row_number().over(w).cast("bigint"))


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    sort_cols: list[str],
    payload_cols: list[str],
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Per-group top-k where each group's candidate set is corpus-sized.

    `Window.partitionBy(group).orderBy(...)` + row_number sorts EVERY
    candidate row of a group inside one task — with a handful of groups
    (e.g. a bounded anchor set scored against the whole corpus) that is a
    full-corpus single-task sort per group at 100 TB. This does the
    distributed two-level form instead:

      1. local: groupBy (group, spark_partition_id) keeps a k-row sorted
         head per scan partition (`slice(sort_array(collect_list(...)), k)`
         — group state is bounded by k, and partition row counts are
         bounded by `spark.sql.files.maxPartitionBytes`, so no collect
         blowup);
      2. merge: explode the ≤k-per-partition survivors (≤ k x n_partitions
         rows per group) and rank with the window, which now sorts a
         bounded set.

    The final result is partition-layout-independent: local heads are
    supersets of every group's true top-k under a TOTAL order. `sort_cols`
    are ascending — negate numeric columns for descending; include a
    tiebreak so the order is total (same requirement as global_topk)."""
    struct_cols = [F.col(c) for c in sort_cols + payload_cols]
    local = (
        df.groupBy(*group_cols, F.spark_partition_id().alias("_p"))
        .agg(F.slice(F.sort_array(F.collect_list(F.struct(*struct_cols))), 1, k)
             .alias("_top"))
        .select(*group_cols, F.explode("_top").alias("_s"))
    )
    w = Window.partitionBy(*group_cols).orderBy(
        *[F.asc(f"_s.{c}") for c in sort_cols]
    )
    return (
        local.withColumn(rank_col, F.row_number().over(w).cast("bigint"))
        .where(F.col(rank_col) <= k)
        .select(
            *group_cols,
            *[F.col(f"_s.{c}").alias(c) for c in sort_cols + payload_cols],
            rank_col,
        )
    )
