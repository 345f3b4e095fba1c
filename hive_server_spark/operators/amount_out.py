"""A7 — amount-out (swap simulation): the order-walk as a window prefix sum.

Reference semantics (src/models/order-book.ts:262-333): given an input
`amount` and an order side, walk the OPPOSITE side's price levels — BUY
consumes asks ascending, SELL consumes bids descending (:267-270).
The two directions differ in UNITS (:291-304):

  BUY  — `amount` is QUOTE spent. Per ask level the quote capacity is
         level_volume * price; quoteSpend = min(remaining, capacity);
         the output accumulates BASE received = quoteSpend / price.
  SELL — `amount` is BASE sold. Per bid level take = min(remaining,
         level_volume); the output accumulates QUOTE received = take * price.

If no levels exist the reference returns an explicit error result
("No liquidity available", outputAmount=0, prices=[]) (:271-278); if the walk
exhausts all levels with remainder left it reports
"Insufficient liquidity" (:309-316). Every visited level's price is appended
to `prices` (:306), visited ⇔ remaining > 0 when the level is reached.

Spark-first: the sequential loop is a cumulative sum in disguise (SURVEY W2).
  capacity   = level quote capacity (BUY) or base volume (SELL)
  cum_before = sum(capacity) OVER (pool ORDER BY walk_price
               ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)
  visited    ⇔ cum_before < amount;  take = least(capacity, amount − cum_before)
One job, no iteration, no driver-side loop — works for every pool at once.

Cross-engine exactness: everything stays integer-valued DECIMAL except the
one place the reference genuinely divides — the final partially-consumed ask
level of a BUY walk. At most one such level exists per pool, so the output is
  Σ(exact full-level contributions, DECIMAL) cast to DOUBLE
  + (partial_quote AS DOUBLE) / (price AS DOUBLE)        -- single division
which is bit-deterministic in both Spark and DuckDB (one cast, one IEEE
division, one addition — see the parity rules in gate.py's docstring).

Divergence (SURVEY Q6, documented): the reference walks only the top-100
levels (the getBuyLevels/getSellLevels default), so it can report
"insufficient liquidity" while deeper liquidity exists. Ours is uncapped by
default; pass `level_cap=100` for bug-compatible behavior.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hive_server_spark.operators.orderbook import price_levels, top_levels

NO_LIQUIDITY = "No liquidity available"
INSUFFICIENT = "Insufficient liquidity"


def amount_out(
    orders: DataFrame,
    order_type: str,
    amount: Decimal | int | str,
    pool_address: str | None = None,
    level_cap: int | None = None,
) -> DataFrame:
    """Simulate a market order of `amount` per pool — quote units for BUY,
    base units for SELL (reference src/models/order-book.ts:281-304).

    Returns one row per pool present in `orders` (pools with an empty
    opposite side included, as error rows — reference :271-278):
    (pool_address, output_amount double, hit_prices array<decimal>,
    consumed, is_error, error_message) ≙ AmountOutResult
    (reference src/models/types.ts:49-54).
    """
    if order_type not in ("BUY", "SELL"):
        raise ValueError(f"order_type must be BUY or SELL, got {order_type!r}")
    is_buy = order_type == "BUY"

    if pool_address is not None:
        orders = orders.where(F.col("pool_address") == pool_address)
    levels = price_levels(orders)
    # BUY consumes the sell side ascending; SELL consumes buys descending
    opposite = "SELL" if is_buy else "BUY"
    walk_key = F.asc("price") if is_buy else F.desc("price")
    side = levels.where(F.col("order_type") == opposite)
    if level_cap is not None:
        side = top_levels(side, level_cap)

    amt = F.lit(str(amount)).cast("decimal(18,3)")
    # bounded synthetic values (SURVEY sources/synthetic.py): these narrowing
    # casts are exact and keep products inside both engines' 38-digit cap
    vol = F.col("total_volume").cast("decimal(18,3)")
    price12 = F.col("price").cast("decimal(12,3)")
    capacity: Column = (vol * price12) if is_buy else vol  # (31,6) | (18,3)

    w = Window.partitionBy("pool_address").orderBy(walk_key).rowsBetween(
        Window.unboundedPreceding, -1
    )
    walked = side.select(
        "pool_address",
        "price",
        vol.alias("total_volume"),
        capacity.alias("capacity"),
        F.coalesce(
            F.sum(capacity).over(w), F.lit(0).cast("decimal(18,3)")
        ).alias("cum_before"),
    )
    visited = walked.where(F.col("cum_before") < amt).select(
        "pool_address",
        "price",
        "total_volume",
        F.least(F.col("capacity"), amt - F.col("cum_before")).alias("take"),
        (F.col("capacity") <= amt - F.col("cum_before")).alias("is_full"),
    )

    if is_buy:
        # full ask levels yield their base volume exactly; the single partial
        # level is the one genuine division of the walk
        out_exact = F.sum(F.when(F.col("is_full"), F.col("total_volume")))
        part_in = F.max(F.when(~F.col("is_full"), F.col("take")))
        part_price = F.max(F.when(~F.col("is_full"), F.col("price")))
        output_amount = F.coalesce(out_exact.cast("double"), F.lit(0.0)) + F.coalesce(
            part_in.cast("double") / part_price.cast("double"), F.lit(0.0)
        )
    else:
        # SELL is exact end-to-end: take and price are both decimal
        output_amount = F.coalesce(
            F.sum(
                F.col("take").cast("decimal(18,3)") * F.col("price").cast("decimal(12,3)")
            ).cast("double"),
            F.lit(0.0),
        )

    agg = visited.groupBy("pool_address").agg(
        output_amount.alias("output_amount"),
        F.transform(
            F.sort_array(F.collect_list(F.struct(F.col("price"))), asc=is_buy),
            lambda s: s["price"],
        ).alias("hit_prices"),
        F.sum("take").alias("consumed"),
    )

    pools = orders.select("pool_address").distinct()
    joined = pools.join(F.broadcast(agg), "pool_address", "left")
    no_liq = F.col("consumed").isNull()
    short = F.col("consumed") < amt
    return joined.select(
        "pool_address",
        F.coalesce(F.col("output_amount"), F.lit(0.0)).alias("output_amount"),
        F.coalesce(F.col("hit_prices"), F.array().cast("array<decimal(18,3)>")).alias(
            "hit_prices"
        ),
        F.coalesce(F.col("consumed"), F.lit(0).cast("decimal(18,3)")).alias("consumed"),
        (no_liq | short).alias("is_error"),
        F.when(no_liq, F.lit(NO_LIQUIDITY))
        .when(short, F.lit(INSUFFICIENT))
        .alias("error_message"),
    )


# ---------------------------------------------------------------------------
# DuckDB-oracle SQL: expects CTEs order_events/order_updates/orders_state
# (see operators.fold). amount_out_ctes() appends the walk CTEs, ending in
# `amount_out_result(pool_address, output_amount, consumed, hit_prices,
# n_levels, is_error)`; gate queries SELECT the columns they surface.
# ---------------------------------------------------------------------------

def amount_out_ctes(
    order_type: str,
    amount: str = "CAST(500 AS DECIMAL(18,3))",
    level_cap: int | None = None,
) -> str:
    """Oracle CTE chain mirroring amount_out() — independent formulation of
    the same walk (window prefix sum over per-level capacity)."""
    is_buy = order_type == "BUY"
    opposite = "SELL" if is_buy else "BUY"
    direction = "ASC" if is_buy else "DESC"
    capacity = (
        "CAST(total_volume * CAST(price AS DECIMAL(12,3)) AS DECIMAL(31,6))"
        if is_buy
        else "total_volume"
    )
    if is_buy:
        out_expr = """
        CAST(COALESCE(SUM(CASE WHEN is_full THEN total_volume END), 0) AS DOUBLE)
        + COALESCE(CAST(MAX(CASE WHEN NOT is_full THEN take END) AS DOUBLE)
                   / CAST(MAX(CASE WHEN NOT is_full THEN price END) AS DOUBLE), 0.0)
        """
    else:
        out_expr = """
        CAST(COALESCE(SUM(CAST(take AS DECIMAL(18,3)) * CAST(price AS DECIMAL(12,3))), 0) AS DOUBLE)
        """
    src = "ao_capped" if level_cap is not None else "ao_levels"
    capped = (
        f"""
, ao_capped AS (
  SELECT pool_address, price, total_volume FROM (
    SELECT *, row_number() OVER (PARTITION BY pool_address
                                 ORDER BY price {direction}) AS _rk
    FROM ao_levels)
  WHERE _rk <= {level_cap}
)"""
        if level_cap is not None
        else ""
    )
    return f"""
, ao_levels AS (
  SELECT pool_address, price,
         CAST(SUM(amount - filled) AS DECIMAL(18,3)) AS total_volume
  FROM orders_state
  WHERE active AND price IS NOT NULL AND order_type = '{opposite}'
  GROUP BY pool_address, price
){capped}
, ao_walked AS (
  SELECT pool_address, price, total_volume,
         {capacity} AS capacity,
         COALESCE(SUM({capacity}) OVER (
           PARTITION BY pool_address ORDER BY price {direction}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           CAST(0 AS DECIMAL(18,3))) AS cum_before
  FROM {src}
), ao_visited AS (
  SELECT pool_address, price, total_volume,
         least(capacity, {amount} - cum_before) AS take,
         capacity <= {amount} - cum_before      AS is_full
  FROM ao_walked
  WHERE cum_before < {amount}
), ao_agg AS (
  SELECT pool_address,
         {out_expr} AS output_amount,
         CAST(SUM(take) AS DOUBLE) AS consumed_d,
         SUM(take) AS consumed_x,
         array_to_string(list(CAST(price AS VARCHAR) ORDER BY price {direction}), ',')
           AS hit_prices,
         COUNT(*) AS n_levels
  FROM ao_visited GROUP BY pool_address
), amount_out_result AS (
  SELECT p.pool_address,
         COALESCE(a.output_amount, 0.0)          AS output_amount,
         COALESCE(a.consumed_d, 0.0)             AS consumed,
         COALESCE(a.hit_prices, '')              AS hit_prices,
         CAST(COALESCE(a.n_levels, 0) AS BIGINT) AS n_levels,
         (a.pool_address IS NULL OR a.consumed_x < {amount}) AS is_error
  FROM (SELECT DISTINCT pool_address FROM orders_state) p
  LEFT JOIN ao_agg a USING (pool_address)
)"""
