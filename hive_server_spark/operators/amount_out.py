"""A7 — amount-out (swap simulation): the order-walk as a window prefix sum.

Reference semantics (src/models/order-book.ts:262-333): given an input
`amount` and an order side, walk the OPPOSITE side's price levels — BUY
consumes asks ascending, SELL consumes bids descending (:267-270) — consuming
`min(remaining, level_volume)` per level, accumulating output (base↔quote
converted by the level price) and the touched prices; if the walk exhausts all
levels with remainder left, report insufficient liquidity (:309-316).

Spark-first: the sequential loop is a cumulative sum in disguise (SURVEY W2).
  cum_before = sum(level_volume) OVER (pool, side ORDER BY walk_price
               ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)
  take       = least(level_volume, amount − cum_before)   on levels where
               cum_before < amount
  output     = Σ take·price (BUY: input in base, output in quote — the walk
               consumes ask volume; SELL mirrors with bids)
One job, no iteration, no driver-side loop — works for every pool at once.

Divergence (SURVEY Q6, documented): the reference walks only the top-100
levels (the getBuyLevels/getSellLevels default), so it can report
"insufficient liquidity" while deeper liquidity exists. Ours is uncapped by
default; pass `level_cap=100` for bug-compatible behavior.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hive_server_spark.operators.orderbook import price_levels, top_levels


def amount_out(
    orders: DataFrame,
    order_type: str,
    amount: Decimal | int | str,
    pool_address: str | None = None,
    level_cap: int | None = None,
) -> DataFrame:
    """Simulate a market order of `amount` (base units) per pool.

    Returns one row per pool: (pool_address, output_amount, hit_prices,
    consumed, is_error, error_message) ≙ AmountOutResult (reference
    src/models/types.ts:49-54; error shape :309-316).
    """
    if order_type not in ("BUY", "SELL"):
        raise ValueError(f"order_type must be BUY or SELL, got {order_type!r}")

    levels = price_levels(
        orders if pool_address is None else orders.where(F.col("pool_address") == pool_address)
    )
    # BUY consumes the sell side ascending; SELL consumes buys descending
    opposite = "SELL" if order_type == "BUY" else "BUY"
    walk_key = F.asc("price") if order_type == "BUY" else F.desc("price")
    side = levels.where(F.col("order_type") == opposite)
    if level_cap is not None:
        side = top_levels(side, level_cap)

    amt = F.lit(str(amount)).cast(side.schema["total_volume"].dataType)
    w = Window.partitionBy("pool_address").orderBy(walk_key).rowsBetween(
        Window.unboundedPreceding, -1
    )
    walked = side.select(
        "pool_address",
        "price",
        "total_volume",
        F.coalesce(F.sum("total_volume").over(w), F.lit(0)).alias("cum_before"),
    )
    consumed = walked.where(F.col("cum_before") < amt).select(
        "pool_address",
        "price",
        F.least(F.col("total_volume"), amt - F.col("cum_before")).alias("take"),
        F.col("cum_before"),
    )
    result = consumed.groupBy("pool_address").agg(
        F.sum(F.col("take") * F.col("price")).alias("output_amount"),
        F.transform(
            F.sort_array(F.collect_list(F.struct(F.col("cum_before"), F.col("price")))),
            lambda s: s["price"],
        ).alias("hit_prices"),
        F.sum("take").alias("consumed"),
    )
    return result.select(
        "pool_address",
        "output_amount",
        "hit_prices",
        "consumed",
        (F.col("consumed") < amt).alias("is_error"),
        F.when(F.col("consumed") < amt, F.lit("Insufficient liquidity")).alias(
            "error_message"
        ),
    )


# ---------------------------------------------------------------------------
# DuckDB-oracle SQL fragment: expects CTEs order_events/order_updates/
# orders_state (see operators.fold) + literals substituted via .format().
# Walk direction: BUY → opposite side 'SELL', price ASC; SELL → 'BUY', DESC.
# ---------------------------------------------------------------------------
AMOUNT_OUT_SQL = """
, levels AS (
  SELECT pool_address, order_type, price,
         SUM(amount - filled) AS total_volume
  FROM orders_state
  WHERE active AND price IS NOT NULL
  GROUP BY pool_address, order_type, price
), walked AS (
  SELECT pool_address, price, total_volume,
         COALESCE(SUM(total_volume) OVER (
           PARTITION BY pool_address ORDER BY price {direction}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM levels
  WHERE order_type = '{opposite}'
), consumed AS (
  SELECT pool_address, price,
         least(total_volume, {amount} - cum_before) AS take
  FROM walked
  WHERE cum_before < {amount}
)
SELECT pool_address,
       CAST(SUM(take * price) AS DOUBLE)  AS output_amount,
       CAST(SUM(take) AS DOUBLE)          AS consumed,
       CAST(SUM(take) < {amount} AS BOOLEAN) AS is_error
FROM consumed
GROUP BY pool_address
"""
