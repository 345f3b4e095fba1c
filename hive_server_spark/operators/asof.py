"""As-of and range joins — operators Spark's join surface lacks natively,
composed from built-ins (north-star custom-operator slot).

As-of join (`asof_join_last`): for each left row, the most recent right row
at-or-before it in sequence order. The naive formulation is a per-row
lookup/theta join (quadratic); the scalable form used here is the
union-and-carry idiom: union both sides tagged, one window per key carries
`last(right_value, ignorenulls)` forward in ROWS order, then filter back to
left rows. One shuffle + one sort per key — linear, and exactly how a
100 TB as-of (trade→quote) join should run.

Range join (`seq_band_join`): pairs within ±band in a numeric dimension.
The naive |a−b|≤band theta join is O(n·m); the bucketed form maps each row
to floor(x/band) and explodes the probe side to its 3 candidate buckets —
the inequality survives only as a residual filter after an equi-shuffle on
(key, bucket). Pair volume is O(matches), not O(n·m)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_last(
    left: DataFrame,
    right: DataFrame,
    key: str,
    order: str,
    value_cols: list[str],
    direction_cols: tuple[str, str] = ("_is_left", "_r_order"),
) -> DataFrame:
    """For every `left` row: the latest `right` row with right.order <=
    left.order within `key`. Right value columns come back as `asof_<col>`;
    rows with no prior right row get nulls. Columns `key` and `order` must
    exist on both sides with identical names."""
    is_left, r_order = direction_cols
    l_tag = left.select(
        key, order,
        *[F.col(c) for c in left.columns if c not in (key, order)],
        F.lit(True).alias(is_left),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast("long").alias(r_order),
    )
    r_tag = right.select(
        key, order,
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in (key, order)
        ],
        F.lit(False).alias(is_left),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(order).cast("long").alias(r_order),
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows sort BEFORE left rows at the same order value, so an exact
    # tie is visible to the left row (at-or-before semantics)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(order).asc(), F.col(is_left).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
        F.last(r_order, ignorenulls=True).over(w).alias("asof_order"),
    )
    drop = [is_left, r_order] + [f"_r_{c}" for c in value_cols]
    return carried.where(F.col(is_left)).drop(*drop)


def seq_band_join_count(
    left: DataFrame,
    right: DataFrame,
    key: str,
    order: str,
    band: int,
    count_alias: str = "n_in_band",
) -> DataFrame:
    """Per left row: COUNT of right rows with |left.order − right.order| ≤
    band within `key`, via bucket-explode equi-join (see module docstring)."""
    bucket = (F.col(order) / band).cast("long")
    l_b = left.select(
        key, order, F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("_bkt")
    )
    r_b = right.select(
        F.col(key).alias("_rk"),
        F.col(order).alias("_ro"),
        (F.col(order) / band).cast("long").alias("_bkt"),
    )
    joined = l_b.join(
        r_b,
        (F.col(key) == F.col("_rk"))
        & (l_b["_bkt"] == r_b["_bkt"])
        & (F.abs(F.col(order) - F.col("_ro")) <= band),
        "left_outer",
    )
    return joined.groupBy(key, order).agg(
        F.count("_ro").cast("bigint").alias(count_alias)
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    order: str,
    value_cols: list[str],
) -> DataFrame:
    """For every `left` row: the `right` row NEAREST in `order` within
    `key`, either direction (pandas merge_asof direction='nearest');
    exact ties broken toward the earlier (at-or-before) row. Same
    union-and-carry idiom as asof_join_last run in both directions — two
    window sorts over ONE shuffle on `key`, still linear: the backward
    pass carries last(right) forward, the forward pass carries
    first(right) backward, and a per-row CASE picks the closer. Right
    value columns come back as `asof_<col>`, the matched order value as
    `asof_order`; rows with no right row at all get nulls.

    CONTRACT: `order` must be an integral column (byte/short/int/long) on
    BOTH sides — the distance arithmetic and the returned `asof_order` run
    in long. Timestamp/date callers cast to epoch integers first
    (e.g. unix_micros); validated up front so a wrong type fails with this
    contract, not a deep analysis error."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    _integral = (ByteType, ShortType, IntegerType, LongType)
    for df, side in ((left, "left"), (right, "right")):
        dt = df.schema[order].dataType
        if not isinstance(dt, _integral):
            raise TypeError(
                f"asof_join_nearest requires an integral order column; "
                f"{side}[{order!r}] is {dt.simpleString()} — cast "
                "timestamps/dates to epoch integers (unix_micros/unix_date) "
                "before calling"
            )
    is_left, r_order = "_is_left", "_r_order"
    l_tag = left.select(
        key, order,
        *[F.col(c) for c in left.columns if c not in (key, order)],
        F.lit(True).alias(is_left),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast("long").alias(r_order),
    )
    r_tag = right.select(
        key, order,
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in (key, order)
        ],
        F.lit(False).alias(is_left),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(order).cast("long").alias(r_order),
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows sort before left rows at the same order value in BOTH
    # directions, so an exact tie is visible as distance 0 on both sides
    w_back = (
        Window.partitionBy(key)
        .orderBy(F.col(order).asc(), F.col(is_left).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(key)
        .orderBy(F.col(order).desc(), F.col(is_left).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w_back).alias(f"_prev_{c}")
            for c in value_cols
        ],
        F.last(r_order, ignorenulls=True).over(w_back).alias("_prev_order"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w_fwd).alias(f"_next_{c}")
            for c in value_cols
        ],
        F.last(r_order, ignorenulls=True).over(w_fwd).alias("_next_order"),
    )
    take_prev = F.col("_next_order").isNull() | (
        F.col("_prev_order").isNotNull()
        & (
            (F.col(order) - F.col("_prev_order"))
            <= (F.col("_next_order") - F.col(order))
        )
    )
    keep = [c for c in left.columns]
    picked = [
        F.when(take_prev, F.col(f"_prev_{c}")).otherwise(F.col(f"_next_{c}")).alias(
            f"asof_{c}"
        )
        for c in value_cols
    ]
    asof_order = (
        F.when(take_prev, F.col("_prev_order"))
        .otherwise(F.col("_next_order"))
        .alias("asof_order")
    )
    return carried.where(F.col(is_left)).select(*keep, *picked, asof_order)
