"""A1 — the keyed upsert fold: order_events log → current `orders` state.

This is the reference's core "engine": per (pool, order_id) it applies
  OrderCreated   → insert            (reference src/models/order-book.ts:80-102)
  OrderFilled    → set {filled, remaining_amount, active}   (:146-168)
  OrderCancelled → set active=false (tombstone, never delete — SURVEY Q7) (:170-182)
  OrderUpdated   → set amount ONLY (remaining/filled stay stale — SURVEY Q5) (:104-117)
dispatched from src/services/hive-listener.ts:178-206,228-335.

Spark-first design: each event row is projected to per-field *update columns*
(null where the event doesn't touch the field); the current state is then the
last non-null update per field in `seq` order. We compute that with ONE hash
aggregate — `max(struct(seq, value))` per field — which gets map-side partial
aggregation and no sort. At 100 TB this is a single shuffle on the state key,
with combiner-style reduction on the map side; a window/sort formulation would
shuffle the same data but add a per-partition sort and lose partial agg.

Quirk stances (SURVEY §2.11): Q3 — we read the ABI-named `filled` field (the
reference destructures a misnamed `filledAmount` and stores NaN; we implement
the intent). Q5/Q7 encoded as above.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _last_update(value: Column, seq: Column) -> Column:
    """Value carried by the latest (by seq) non-null update.

    max(struct(seq, value)) over non-null updates == value at max seq.
    Null updates produce a null struct, which max() skips entirely —
    well-defined in Spark and mirrored by DuckDB's
    `max_by(v, CASE WHEN v IS NOT NULL THEN seq END)` in the oracle.
    """
    return F.max(F.when(value.isNotNull(), F.struct(seq, value.alias("v")))).getField("v")


def project_updates(events: DataFrame) -> DataFrame:
    """Project each event row to per-field *update columns* (null where the
    event doesn't touch the field) — the shared front half of the batch fold
    and the streaming incremental fold."""
    et = F.col("event_type")
    is_created = et == "OrderCreated"
    is_filled = et == "OrderFilled"
    is_cancelled = et == "OrderCancelled"
    is_updated = et == "OrderUpdated"
    zero = F.lit(0).cast(events.schema["amount"].dataType)

    upd = events.where(F.col("order_id").isNotNull()).select(
        "pool_address",
        "order_id",
        "seq",
        F.when(is_created, F.col("trader")).alias("u_trader"),
        F.when(is_created, F.col("price")).alias("u_price"),
        # Q5: OrderUpdated rewrites `amount` only
        F.when(is_created, F.col("amount"))
        .when(is_updated, F.col("new_amount"))
        .alias("u_amount"),
        F.when(is_created, zero).when(is_filled, F.col("filled")).alias("u_filled"),
        F.when(is_created, F.col("amount"))
        .when(is_filled, F.col("remaining"))
        .alias("u_remaining"),
        F.when(is_created, F.col("order_type")).alias("u_order_type"),
        # Q7: cancelled → tombstone, still readable
        F.when(is_created, F.lit(True))
        .when(is_filled, F.col("remaining") > 0)
        .when(is_cancelled, F.lit(False))
        .alias("u_active"),
        F.when(is_created, F.col("event_time")).alias("u_created_ts"),
        is_created.cast("int").alias("is_created"),
    )
    return upd


def fold_order_events(events: DataFrame) -> DataFrame:
    """Fold an order_events log (ORDER_EVENTS_SCHEMA-shaped) into the current
    `orders` state table (ORDERS_SCHEMA-shaped).

    Pure batch recompute: deterministic given the log, independent of
    micro-batch boundaries (the streaming layer maintains the same result
    incrementally — see hive_server_spark.streaming).
    """
    upd = project_updates(events)
    seq = F.col("seq")
    folded = (
        upd.groupBy("pool_address", "order_id")
        .agg(
            _last_update(F.col("u_trader"), seq).alias("trader"),
            _last_update(F.col("u_price"), seq).alias("price"),
            _last_update(F.col("u_amount"), seq).alias("amount"),
            _last_update(F.col("u_filled"), seq).alias("filled"),
            _last_update(F.col("u_remaining"), seq).alias("remaining_amount"),
            _last_update(F.col("u_order_type"), seq).alias("order_type"),
            _last_update(F.col("u_active"), seq).alias("active"),
            F.min("u_created_ts").alias("created_ts"),
            # seq of the (latest) OrderCreated — FIFO key for price-time
            # priority within a level (A3)
            F.max(F.when(F.col("is_created") == 1, seq)).alias("created_seq"),
            F.max("is_created").alias("_has_created"),
        )
        # an order exists only if it was created (events for unknown ids are
        # dropped, matching the reference's undefined-lookup behavior,
        # reference src/models/order-book.ts:211-213)
        .where(F.col("_has_created") == 1)
        .drop("_has_created")
    )
    return folded


# ---------------------------------------------------------------------------
# DuckDB-oracle SQL fragments (compose after sources.synthetic.ORDER_EVENTS_CTE)
# ---------------------------------------------------------------------------

ORDER_UPDATES_CTE = """
order_updates AS (
  SELECT
    pool_address, order_id, seq,
    CASE WHEN event_type = 'OrderCreated' THEN trader END       AS u_trader,
    CASE WHEN event_type = 'OrderCreated' THEN price END        AS u_price,
    CASE WHEN event_type = 'OrderCreated' THEN amount
         WHEN event_type = 'OrderUpdated' THEN new_amount END   AS u_amount,
    CASE WHEN event_type = 'OrderCreated' THEN CAST(0 AS DECIMAL(18,3))
         WHEN event_type = 'OrderFilled'  THEN filled END       AS u_filled,
    CASE WHEN event_type = 'OrderCreated' THEN amount
         WHEN event_type = 'OrderFilled'  THEN remaining END    AS u_remaining,
    CASE WHEN event_type = 'OrderCreated' THEN order_type END   AS u_order_type,
    CASE WHEN event_type = 'OrderCreated' THEN TRUE
         WHEN event_type = 'OrderFilled'  THEN remaining > 0
         WHEN event_type = 'OrderCancelled' THEN FALSE END      AS u_active,
    CASE WHEN event_type = 'OrderCreated' THEN event_time END   AS u_created_ts,
    CASE WHEN event_type = 'OrderCreated' THEN 1 ELSE 0 END     AS is_created
  FROM order_events
  WHERE order_id IS NOT NULL
)
"""

ORDERS_STATE_CTE = """
orders_state AS (
  SELECT
    pool_address, order_id,
    max_by(u_trader,     CASE WHEN u_trader     IS NOT NULL THEN seq END) AS trader,
    max_by(u_price,      CASE WHEN u_price      IS NOT NULL THEN seq END) AS price,
    max_by(u_amount,     CASE WHEN u_amount     IS NOT NULL THEN seq END) AS amount,
    max_by(u_filled,     CASE WHEN u_filled     IS NOT NULL THEN seq END) AS filled,
    max_by(u_remaining,  CASE WHEN u_remaining  IS NOT NULL THEN seq END) AS remaining_amount,
    max_by(u_order_type, CASE WHEN u_order_type IS NOT NULL THEN seq END) AS order_type,
    max_by(u_active,     CASE WHEN u_active     IS NOT NULL THEN seq END) AS active,
    min(u_created_ts) AS created_ts,
    max(CASE WHEN is_created = 1 THEN seq END) AS created_seq
  FROM order_updates
  GROUP BY pool_address, order_id
  HAVING max(is_created) = 1
)
"""
