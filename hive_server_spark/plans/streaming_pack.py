"""Gate query for the streaming layer: the incremental fold, driven to
completion with an availableNow trigger, must equal the batch fold — so it
shares the batch `orders_state` DuckDB oracle verbatim. This is the
strongest available check for a streaming operator: full value parity
against a SQL oracle, not a rows-only smoke."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_server_spark.operators.fold import ORDER_UPDATES_CTE, ORDERS_STATE_CTE
from hive_server_spark.registry import register
from hive_server_spark.sources.synthetic import ORDER_EVENTS_CTE, order_events
from hive_server_spark.streaming.incremental import (
    materialize_orders,
    run_incremental_fold,
)

_ORACLE = (
    f"WITH {ORDER_EVENTS_CTE}, {ORDER_UPDATES_CTE}, {ORDERS_STATE_CTE}"
    + """
SELECT pool_address, order_id, trader,
       CAST(price AS DOUBLE)            AS price,
       CAST(amount AS DOUBLE)           AS amount,
       CAST(filled AS DOUBLE)           AS filled,
       CAST(remaining_amount AS DOUBLE) AS remaining_amount,
       order_type, active,
       CAST(created_ts AS DATE)         AS created_date,
       created_seq
FROM orders_state
"""
)


def streamed_orders_state(
    spark: SparkSession, sf_dir: str, chunks: int = 2
) -> DataFrame:
    # chunks=2 keeps the gate query genuinely multi-batch while halving its
    # fixed cost; chunk-count invariance itself is pinned by
    # tests/test_streaming.py at 1 and 3 chunks.
    """Run the full streaming pipeline: derive order_events, land them as
    `chunks` parquet files, stream them through the incremental fold
    (maxFilesPerTrigger=1 → one micro-batch per file), return the
    materialized orders state."""
    work = tempfile.mkdtemp(prefix="hss_stream_")
    ev_dir = os.path.join(work, "events")
    order_events(spark, sf_dir).repartition(chunks).write.mode("overwrite").parquet(ev_dir)
    schema = spark.read.parquet(ev_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ev_dir)
    )
    store = run_incremental_fold(
        spark,
        stream,
        state_dir=os.path.join(work, "state"),
        checkpoint_dir=os.path.join(work, "ckpt"),
    )
    return materialize_orders(store.latest(spark))


@register("orders_state_streaming", _ORACLE)
def q_orders_state_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = streamed_orders_state(spark, sf_dir)
    dbl = lambda c: F.col(c).cast("double").alias(c)  # noqa: E731
    return st.select(
        "pool_address",
        "order_id",
        "trader",
        dbl("price"),
        dbl("amount"),
        dbl("filled"),
        dbl("remaining_amount"),
        "order_type",
        "active",
        F.col("created_ts").cast("date").alias("created_date"),
        "created_seq",
    )
