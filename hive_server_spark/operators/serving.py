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


def pools_json(pools: DataFrame) -> DataFrame:
    """GET /api/pools — every pool with its token metadata; the reference
    drops rows missing address/baseToken (validity filter P6,
    reference src/api/controllers/pool-controller.ts:10)."""
    valid = pools.where(
        F.col("pool_address").isNotNull() & F.col("base_symbol").isNotNull()
    )
    return valid.select(
        F.to_json(
            F.struct(
                F.col("pool_address").alias("address"),
                F.struct(
                    F.col("base_symbol").alias("symbol"),
                    F.col("base_decimals").alias("decimals"),
                ).alias("baseToken"),
                F.struct(
                    F.col("quote_symbol").alias("symbol"),
                    F.lit(6).alias("decimals"),
                ).alias("quoteToken"),
            )
        ).alias("json")
    )


def pool_info_json(pools: DataFrame, pool_address: str) -> DataFrame:
    """GET /api/pools/:address — PoolInfo shape (reference
    src/models/types.ts:35-40): token metadata + latest price as string."""
    row = pools.where(F.col("pool_address") == pool_address)
    return row.select(
        F.to_json(
            F.struct(
                F.col("pool_address").alias("address"),
                F.struct(
                    F.col("base_symbol").alias("symbol"),
                    F.col("base_decimals").alias("decimals"),
                ).alias("baseToken"),
                F.struct(
                    F.col("quote_symbol").alias("symbol"),
                    F.lit(6).alias("decimals"),
                ).alias("quoteToken"),
                F.col("latest_price").cast("string").alias("latestPrice"),
            )
        ).alias("json")
    )


def market_orders_json(events: DataFrame, pool_address: str, trader: str) -> DataFrame:
    """GET /api/pools/:address/:trader/market-orders — the append-only
    execution history (reference src/models/order-book.ts:184-200)."""
    mo = events.where(
        (F.col("event_type") == "MarketOrderExecuted")
        & (F.col("pool_address") == pool_address)
        & (F.col("trader") == trader)
    )
    return mo.select(
        F.to_json(
            F.struct(
                F.col("seq").alias("sequence"),
                F.col("order_type").alias("type"),
                F.col("price").cast("string").alias("price"),
                F.col("filled_amount").cast("string").alias("filledAmount"),
                F.col("event_time").cast("string").alias("timestamp"),
            )
        ).alias("json")
    )


def amount_out_json(result: DataFrame, pool_address: str) -> DataFrame:
    """GET /api/pools/:address/get-amount-out — AmountOutResult shape
    (reference src/models/types.ts:49-54): string amounts, touched prices,
    optional errorMessage."""
    row = result.where(F.col("pool_address") == pool_address)
    return row.select(
        F.to_json(
            F.struct(
                F.col("is_error").alias("isError"),
                F.col("error_message").alias("errorMessage"),
                F.col("output_amount").cast("string").alias("outputAmount"),
                F.transform(
                    F.col("hit_prices"), lambda p: p.cast("string")
                ).alias("prices"),
            )
        ).alias("json")
    )
