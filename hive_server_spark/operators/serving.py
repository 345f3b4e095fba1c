"""Serving edge: JSON response shapes (SURVEY S10).

The reference serves each endpoint as JSON over Express
(reference src/api/controllers/*.ts, src/api/routes.ts:11-17). The engine's
serving edge is `to_json` over the assembled struct — rendering happens
JVM-side per row; the caller collects only the (tiny) response rows, never
intermediate state. Decimal money renders as strings at the edge, matching
the reference's string-typed amounts (SURVEY §1.2) without float drift."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hive_server_spark.operators.orderbook import order_book


def _dec_str(c: str) -> F.Column:
    return F.col(c).cast("string").alias(c)


def order_book_json(orders: DataFrame, pool_address: str, depth: int = 20) -> DataFrame:
    """GET /api/pools/:address/orderbook — one row, one JSON document with
    bids[]/asks[] (price desc / asc, FIFO order ids per level)."""
    book = order_book(orders, pool_address, depth)
    render_side = lambda side: F.transform(  # noqa: E731
        F.filter(F.col(side), lambda s: s["price"].isNotNull()),
        lambda s: F.struct(
            s["price"].cast("string").alias("price"),
            s["total_volume"].cast("string").alias("totalVolume"),
            s["order_ids"].alias("orders"),
        ),
    )
    return book.select(
        F.to_json(
            F.struct(
                F.col("pool_address").alias("pool"),
                render_side("bids").alias("bids"),
                render_side("asks").alias("asks"),
            )
        ).alias("json")
    )


def order_json(orders: DataFrame, pool_address: str, order_id: int) -> DataFrame:
    """GET /api/pools/:address/orders/:id — point lookup, tombstones
    included (Q7: cancelled orders stay readable)."""
    row = orders.where(
        (F.col("pool_address") == pool_address) & (F.col("order_id") == order_id)
    )
    return row.select(
        F.to_json(
            F.struct(
                F.col("order_id").alias("id"),
                F.col("trader"),
                _dec_str("price"),
                _dec_str("amount"),
                _dec_str("filled"),
                F.col("remaining_amount").cast("string").alias("remainingAmount"),
                F.col("order_type").alias("type"),
                F.col("active"),
            )
        ).alias("json")
    )


def user_orders_json(orders: DataFrame, trader: str) -> DataFrame:
    """GET /api/pools/:address/orders?trader= — active AND tombstoned (Q7),
    one JSON row per order."""
    return orders.where(F.col("trader") == trader).select(
        F.to_json(
            F.struct(
                F.col("pool_address").alias("pool"),
                F.col("order_id").alias("id"),
                _dec_str("price"),
                _dec_str("amount"),
                F.col("order_type").alias("type"),
                F.col("active"),
            )
        ).alias("json")
    )
