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
