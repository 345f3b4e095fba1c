"""CDC push of per-pool book snapshots (SURVEY S9/ST5).

The reference re-emits the whole order book of every pool touched by a
micro-batch over Socket.io (reference src/services/hive-listener.ts:212-221,
src/api/server.ts:43-51). Spark-first equivalent: inside the same
foreachBatch that maintains the orders state, recompute the book for
exactly the pools touched in this batch and append the snapshots (with the
batch id as the CDC version) to an output table — any push transport can
tail that table; the engine's job ends at the versioned snapshot stream.

Scale posture: the touched-pool set is typically tiny relative to the pool
universe, so the book recompute filters the state table on an IN-list
(broadcast semi-join) before aggregating — per batch the cost is
O(orders of touched pools), not O(all orders)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_server_spark.operators.orderbook import price_levels, top_levels
from hive_server_spark.streaming.incremental import (
    ParquetStateStore,
    materialize_orders,
    merge_partials,
    partial_fold,
)


def book_snapshots(orders: DataFrame, pools: DataFrame, depth: int = 20) -> DataFrame:
    """Depth-k book rows for the given pools (one row per level, tagged for
    downstream assembly)."""
    touched = orders.join(F.broadcast(pools), "pool_address", "left_semi")
    return top_levels(price_levels(touched), depth=depth).select(
        "pool_address",
        "order_type",
        "price",
        "total_volume",
        "order_count",
        "level_rank",
    )


def run_incremental_fold_with_cdc(
    spark: SparkSession,
    events_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    cdc_dir: str,
    depth: int = 20,
) -> tuple[ParquetStateStore, str]:
    """Incremental fold + CDC: each micro-batch merges the orders state and
    appends depth-k snapshots for the touched pools, versioned by batch id.
    Returns (state store, cdc output path)."""
    store = ParquetStateStore(state_dir)
    os.makedirs(cdc_dir, exist_ok=True)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        # exactly-once state over at-least-once replay: a crash between the
        # state commit and the checkpoint commit re-delivers this batch_id;
        # re-merging it would double-count. The snapshot write below still
        # runs on replay — it is an idempotent partition overwrite, and the
        # crash may have happened before it landed.
        if not store.already_applied(batch_id):
            batch_state = partial_fold(batch_df)
            current = store.latest(sess)
            merged = (
                batch_state
                if current is None
                else merge_partials(current, batch_state)
            )
            store.commit(merged, batch_id)

        touched = batch_df.select("pool_address").distinct()
        snaps = book_snapshots(
            materialize_orders(store.latest(sess)), touched, depth
        )
        # exactly-once under foreachBatch retries: a plain append would
        # duplicate this batch's snapshots if the job dies between the write
        # and the checkpoint commit. Overwriting a hive-partition subdirectory
        # (cdc_version=<batch_id>) is idempotent — a retry clobbers the
        # partial output — and scanning cdc_dir still yields one table with
        # cdc_version as a (prunable) partition column.
        snaps.write.mode("overwrite").parquet(
            os.path.join(cdc_dir, f"cdc_version={batch_id}")
        )

    from hive_server_spark.streaming.incremental import await_stream_with_retry

    writer = (
        events_stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    # retry policy: see incremental.py::_TRANSIENT_PY4J — the CDC write is
    # already idempotent per batch (partition-overwrite above), so a
    # checkpoint-resumed retry is exactly-once here too.
    await_stream_with_retry(writer.start)
    return store, cdc_dir
