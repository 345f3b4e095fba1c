"""Accuracy bounds for the approximate-aggregate path (no cross-engine
oracle possible: sketch implementations differ), plus the Q6 cap divergence."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_server_spark.catalog import load_table
from hive_server_spark.plans.relational import rel_approx_sketches
from tests.conftest import SF_SMALL


def test_approx_sketches_within_tolerance(spark):
    """The gate query self-reports sketch accuracy as booleans (so the
    driver hash-gates them); here we independently recompute the exact side
    and assert both the booleans and the exact columns."""
    rows = {r.s_nationkey: r for r in rel_approx_sketches(spark, SF_SMALL).collect()}
    li = load_table(spark, SF_SMALL, "lineitem")
    s = load_table(spark, SF_SMALL, "supplier")
    exact = {
        r.s_nationkey: r
        for r in (
            li.join(s, li.l_suppkey == s.s_suppkey)
            .groupBy("s_nationkey")
            .agg(F.count_distinct("l_suppkey").alias("nd"))
        ).collect()
    }
    assert rows.keys() == exact.keys()
    for k, a in rows.items():
        assert a.exact_suppliers == exact[k].nd
        assert a.hll_within_bound, f"nation {k}: HLL outside ±10% bound"
        assert a.pctl_within_bound, f"nation {k}: approx median outside p45..p55"


def test_amount_out_cap_reports_insufficient_when_uncapped_fills(spark):
    """Q6 divergence: with a tiny level cap the walk must consume no more
    than the capped liquidity, and strictly less than the uncapped walk
    whenever the uncapped walk needs deeper levels."""
    from hive_server_spark.operators.amount_out import amount_out
    from hive_server_spark.operators.fold import fold_order_events
    from hive_server_spark.sources.synthetic import order_events

    orders = fold_order_events(order_events(spark, SF_SMALL)).persist()
    diverged = 0
    # BUY amounts are QUOTE units (≈ price × volume per level), so scan a few
    # magnitudes — divergence appears once the walk needs deeper than 2 levels
    for amount in (500, 5_000, 20_000, 60_000):
        uncapped = {r.pool_address: r for r in amount_out(orders, "BUY", amount).collect()}
        capped = {
            r.pool_address: r
            for r in amount_out(orders, "BUY", amount, level_cap=2).collect()
        }
        assert capped.keys() == uncapped.keys()
        for k in capped:
            assert float(capped[k].consumed) <= float(uncapped[k].consumed) + 1e-9
            if capped[k].is_error and not uncapped[k].is_error:
                diverged += 1
    assert diverged >= 1, "cap=2 should visibly truncate at least one pool"
