"""Deterministic `order_events` log derived from the driver's `events` table.

The reference's input is a blockchain event log (six hive-core event types,
reference src/abis/hive-core.json:476-664). The driver's test corpus has no
such log, so the correctness gate derives one *deterministically, in pure
arithmetic* from `events(event_id, ts, user_id, ...)` — the same derivation is
expressible in DuckDB SQL, so every downstream operator (fold, order book,
amount-out) is hash-checkable against the oracle.

All money columns are integer-valued DECIMAL(18,3): exact in both engines,
products stay at scale 6 (< both engines' precision caps), sums are exact and
order-insensitive. Final gate projections cast to DOUBLE/BIGINT/DATE.

The SQL text is dialect-portable (runs under both Spark SQL and DuckDB); the
library entry point runs it through spark.sql over a registered `events` view.

Event-type mix (k = (event_id*7 + user_id) % 10):
  k 0-3 → OrderCreated     k 7 → OrderCancelled
  k 4-6 → OrderFilled      k 8 → OrderUpdated
  k 9   → LatestPrice (even event_id) | MarketOrderExecuted (odd)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_server_spark.catalog import load_table

# Portable SQL body for the order_events derivation; expects a relation named
# `events`. Used verbatim as a CTE by both the Spark queries and the DuckDB
# oracle strings.
ORDER_EVENTS_SQL = """
SELECT
  concat('pool_', CAST(event_id % 3 AS STRING))          AS pool_address,
  event_id                                               AS seq,
  ts                                                     AS event_time,
  CASE WHEN k <= 3 THEN 'OrderCreated'
       WHEN k <= 6 THEN 'OrderFilled'
       WHEN k = 7  THEN 'OrderCancelled'
       WHEN k = 8  THEN 'OrderUpdated'
       WHEN event_id % 2 = 0 THEN 'LatestPrice'
       ELSE 'MarketOrderExecuted' END                    AS event_type,
  CASE WHEN k <= 8 THEN event_id % 120 END               AS order_id,
  CASE WHEN k <= 8 OR event_id % 2 = 1
       THEN concat('T', CAST(user_id % 10 AS STRING)) END AS trader,
  CASE WHEN k <= 3 OR k = 9
       THEN CAST(100 + (event_id * 13) % 50 AS DECIMAL(18,3)) END AS price,
  CASE WHEN k <= 3
       THEN CAST(10 + (event_id * 17) % 90 AS DECIMAL(18,3)) END  AS amount,
  CASE WHEN k >= 4 AND k <= 6
       THEN CAST((event_id * 29) % 100 AS DECIMAL(18,3)) END      AS filled,
  CASE WHEN k >= 4 AND k <= 6
       THEN CAST((event_id * 31) % 80 AS DECIMAL(18,3)) END       AS remaining,
  CASE WHEN k = 8
       THEN CAST(10 + (event_id * 23) % 90 AS DECIMAL(18,3)) END  AS new_amount,
  CASE WHEN k <= 3 THEN
         CASE WHEN (event_id % 120) % 2 = 0 THEN 'BUY' ELSE 'SELL' END
       WHEN k = 9 AND event_id % 2 = 1 THEN
         CASE WHEN user_id % 2 = 0 THEN 'BUY' ELSE 'SELL' END
       END                                               AS order_type,
  CASE WHEN k = 9 AND event_id % 2 = 1
       THEN CAST(1 + (event_id * 19) % 60 AS DECIMAL(18,3)) END   AS filled_amount
FROM (SELECT event_id, ts, user_id,
             (event_id * 7 + user_id) % 10 AS k
      FROM events) e
"""

ORDER_EVENTS_CTE = f"order_events AS (\n{ORDER_EVENTS_SQL}\n)"


def order_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the order_events log at `sf_dir`. One narrow projection over the
    parquet scan — no shuffle; scales linearly with input splits."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(ORDER_EVENTS_SQL)
