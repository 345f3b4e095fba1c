"""CDC snapshot stream (ST5): every touched pool gets a fresh book per
micro-batch; the final version equals the batch-computed book."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from hive_server_spark.operators.fold import fold_order_events
from hive_server_spark.operators.orderbook import price_levels, top_levels
from hive_server_spark.sources.synthetic import order_events
from hive_server_spark.streaming.cdc import run_incremental_fold_with_cdc
from tests.conftest import SF_SMALL


def test_cdc_final_snapshot_matches_batch_book(spark):
    ev = order_events(spark, SF_SMALL)
    work = tempfile.mkdtemp(prefix="hss_cdc_")
    ev_dir = os.path.join(work, "events")
    ev.repartition(3).write.parquet(ev_dir)
    schema = spark.read.parquet(ev_dir).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(ev_dir)
    )
    _, cdc_dir = run_incremental_fold_with_cdc(
        spark,
        stream,
        state_dir=os.path.join(work, "state"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        cdc_dir=os.path.join(work, "cdc"),
    )
    cdc = spark.read.parquet(cdc_dir)
    versions = [r.cdc_version for r in cdc.select("cdc_version").distinct().collect()]
    assert len(versions) == 3  # one snapshot set per micro-batch

    last = cdc.where(F.col("cdc_version") == max(versions)).drop("cdc_version")
    batch_book = top_levels(price_levels(fold_order_events(ev)), depth=20).select(
        *last.columns
    )

    def rows(df):
        cols = sorted(df.columns)
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    assert rows(last) == rows(batch_book)

    # every batch's snapshot covers exactly the pools touched in that batch
    n_pools = ev.select("pool_address").distinct().count()
    per_version = (
        cdc.groupBy("cdc_version")
        .agg(F.countDistinct("pool_address").alias("n"))
        .collect()
    )
    assert all(1 <= r.n <= n_pools for r in per_version)
