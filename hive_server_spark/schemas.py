"""Explicit schemas for the engine's canonical tables (SURVEY.md §1.3).

The reference declares its schema twice — TypeScript interfaces
(reference src/models/types.ts:1-58) and contract ABIs
(reference src/abis/hive-core.json:476-664) — with no inference or evolution.
We mirror that with explicit StructTypes; core tables are never inferSchema'd.

Decimal stance (SURVEY quirk Q1): the reference converts uint256 → JS Number →
string, silently losing precision above 2^53 (reference
src/services/hive-listener.ts:239-241). We store DECIMAL(38,18) — the
*intended* fixed-point semantics — and render strings only at the API edge.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# fixed-point money/amount type (Q1)
DEC = DecimalType(38, 18)

# ---------------------------------------------------------------------------
# order_events — append-only union of the six hive-core events
# (reference src/abis/hive-core.json:476-664; decode paths
#  src/services/hive-listener.ts:178-206,228-335)
# `seq` is the total order: block_number * 1e6 + log_index.
# Unused fields are null per event type (FIXTURES.md §1).
# ---------------------------------------------------------------------------
EVENT_TYPES = (
    "OrderCreated",
    "OrderFilled",
    "OrderCancelled",
    "OrderUpdated",
    "LatestPrice",
    "MarketOrderExecuted",
)

ORDER_EVENTS_SCHEMA = StructType(
    [
        StructField("pool_address", StringType(), False),
        StructField("seq", LongType(), False),
        StructField("event_time", TimestampType(), False),
        StructField("event_type", StringType(), False),
        StructField("order_id", LongType(), True),
        StructField("trader", StringType(), True),
        StructField("price", DEC, True),
        StructField("amount", DEC, True),
        StructField("filled", DEC, True),  # ABI field `filled` (SURVEY Q3)
        StructField("remaining", DEC, True),
        StructField("new_amount", DEC, True),  # OrderUpdated only
        StructField("order_type", StringType(), True),  # BUY | SELL
        StructField("filled_amount", DEC, True),  # MarketOrderExecuted only
    ]
)

# ---------------------------------------------------------------------------
# orders — derived current state per (pool_address, order_id)
# ≙ Order (reference src/models/types.ts:3-13)
# ---------------------------------------------------------------------------
ORDERS_SCHEMA = StructType(
    [
        StructField("pool_address", StringType(), False),
        StructField("order_id", LongType(), False),
        StructField("trader", StringType(), True),
        StructField("price", DEC, True),
        StructField("amount", DEC, True),
        StructField("filled", DEC, True),
        StructField("remaining_amount", DEC, True),
        StructField("order_type", StringType(), True),
        StructField("active", BooleanType(), True),
        StructField("created_ts", TimestampType(), True),
    ]
)

# ---------------------------------------------------------------------------
# pools — dimension ≙ PoolInfo (reference src/models/types.ts:35-46)
# ---------------------------------------------------------------------------
POOLS_SCHEMA = StructType(
    [
        StructField("pool_address", StringType(), False),
        StructField("base_address", StringType(), True),
        StructField("base_name", StringType(), True),
        StructField("base_symbol", StringType(), True),
        StructField("base_decimals", IntegerType(), True),
        StructField("quote_address", StringType(), True),
        StructField("quote_name", StringType(), True),
        StructField("quote_symbol", StringType(), True),
        StructField("quote_decimals", IntegerType(), True),
    ]
)

# ---------------------------------------------------------------------------
# market_orders — append-only per-trader log ≙ MarketOrder
# (reference src/models/types.ts:15-19; append path src/models/order-book.ts:184-200)
# ---------------------------------------------------------------------------
MARKET_ORDERS_SCHEMA = StructType(
    [
        StructField("pool_address", StringType(), False),
        StructField("seq", LongType(), False),
        StructField("trader", StringType(), False),
        StructField("order_type", StringType(), True),
        StructField("price", DEC, True),
        StructField("filled_amount", DEC, True),
        StructField("event_time", TimestampType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Driver-provided extension tables (TESTDATA.md / FIXTURES.md §4)
# ---------------------------------------------------------------------------
DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)

EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), True),
        StructField("label", IntegerType(), True),
    ]
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)

# All driver tables, by name (TESTDATA.md)
DRIVER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
