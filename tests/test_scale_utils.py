"""Scale utilities: salted-join equivalence and partition-pruned layout."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from hive_server_spark.catalog import load_table
from hive_server_spark.operators.fold import fold_order_events
from hive_server_spark.operators.skew import salted_join
from hive_server_spark.sources import layout
from hive_server_spark.sources.synthetic import order_events
from tests.conftest import SF_SMALL


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_join_equals_plain_join(spark):
    ev = order_events(spark, SF_SMALL).select("pool_address", "seq", "event_type")
    pools = (
        ev.select("pool_address")
        .distinct()
        .withColumn("pool_tag", F.upper("pool_address"))
    )
    plain = ev.join(pools, "pool_address", "inner")
    salted = salted_join(ev, pools, "pool_address", salt=8)
    assert _rows(salted) == _rows(plain)


def test_salted_join_rejects_ambiguous_columns(spark):
    import pytest

    ev = order_events(spark, SF_SMALL).select("pool_address", "seq")
    with pytest.raises(ValueError):
        salted_join(ev, ev, "pool_address")


def test_partitioned_layout_prunes_to_one_bucket(spark):
    orders = fold_order_events(order_events(spark, SF_SMALL))
    with tempfile.TemporaryDirectory(prefix="hss_layout_") as root:
        path = f"{root}/orders"
        layout.write_orders_partitioned(orders, path)
        dirs = layout.partition_dirs(path)
        assert 1 <= len(dirs) <= layout.N_BUCKETS

        pool = orders.first().pool_address
        pruned = layout.read_pool_orders(spark, path, pool)
        # correctness: identical rows to an unpartitioned filter
        want = orders.where(F.col("pool_address") == pool)
        assert _rows(pruned) == _rows(want.select(*pruned.columns))

        # pruning: scans at most the files of ONE bucket directory
        total_files = layout.scanned_files(spark.read.parquet(path))
        pruned_files = layout.scanned_files(pruned)
        assert pruned_files < total_files or len(dirs) == 1
