"""Read-side lookups: latest price (A4), market-order history (A5),
per-trader orders (J1), pool inventory (S8/P6).

Each mirrors one REST endpoint (reference src/api/routes.ts:11-17) as a pure
DataFrame→DataFrame function. The reference's Redis secondary indexes
(trader_orders:{pool}:{trader} sets, src/models/order-book.ts:35-49) are
subsumed by predicate pushdown + shuffle hash; no index maintenance needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_price(order_events: DataFrame) -> DataFrame:
    """A4 — last LatestPrice event per pool (reference
    src/models/order-book.ts:361-368: each event overwrites the scalar).
    One hash aggregate via max_by(price, seq)."""
    return (
        order_events.where(F.col("event_type") == "LatestPrice")
        .groupBy("pool_address")
        .agg(F.max_by("price", "seq").alias("latest_price"))
    )


def market_orders(order_events: DataFrame, trader: str | None = None) -> DataFrame:
    """A5 — append-only per-trader market-order log (reference
    src/models/order-book.ts:184-200). Read = filter; no fold needed."""
    mo = order_events.where(F.col("event_type") == "MarketOrderExecuted").select(
        "pool_address",
        "seq",
        "trader",
        "order_type",
        "price",
        F.col("filled_amount"),
        "event_time",
    )
    return mo if trader is None else mo.where(F.col("trader") == trader)


def user_orders(orders: DataFrame, trader: str, pool_address: str | None = None) -> DataFrame:
    """J1 — trader → orders semi-join. Returns BOTH active and tombstoned
    orders (SURVEY Q7; reference src/models/order-book.ts:351-359 keeps
    cancelled ids in the trader set)."""
    out = orders.where(F.col("trader") == trader)
    return out if pool_address is None else out.where(F.col("pool_address") == pool_address)


def trader_order_counts(orders: DataFrame) -> DataFrame:
    """Per-trader order stats across pools — the analytical generalization of
    getUserOrders (one shuffle, map-side combined)."""
    return orders.groupBy("trader").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("active"), 1).otherwise(0)).alias("n_active"),
        F.sum(F.col("amount")).alias("total_amount"),
        F.sum(F.col("filled")).alias("total_filled"),
    )


def pools_summary(order_events: DataFrame) -> DataFrame:
    """S8/P6 — pool inventory with liveness stats (replaces the Redis
    `pool:*` pattern scan, reference src/services/hive-factory-listener.ts:126-134)."""
    return order_events.groupBy("pool_address").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct(F.col("order_id")).alias("n_orders_touched"),
        F.count_distinct(F.col("trader")).alias("n_traders"),
        F.max_by(F.col("price"), F.when(F.col("event_type") == "LatestPrice", F.col("seq"))).alias(
            "latest_price"
        ),
    )
