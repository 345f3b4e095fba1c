"""Cache ledger (last-consumer unpersist) — unit coverage.

The ledger must (a) release a managed cache exactly when a NON-consumer
query starts after every consumer has run, (b) keep it for partial /
out-of-order orderings, (c) re-persist ("self-heal") when a released cache
is accessed again, (d) never release on nested registered-query
invocations, and (e) carry only registered query names in the generated
CONSUMERS table.
"""

from __future__ import annotations

import pytest

from hive_server_spark import cache_ledger
from hive_server_spark.cache_consumers import CONSUMERS
from hive_server_spark.registry import spark_queries


@pytest.fixture()
def ledger_sandbox(monkeypatch):
    """Isolated ledger state + consumer table for each test."""
    fresh = {
        "app": None,
        "seen": set(),
        "current": None,
        "stack": [],
        "entries": {},
        "audit": {},
    }
    monkeypatch.setattr(cache_ledger, "_STATE", fresh)
    table: dict[str, frozenset] = {}
    monkeypatch.setattr(cache_ledger, "CONSUMERS", table)
    return fresh, table


def _df(spark):
    return spark.range(5).selectExpr("id", "id * 2 AS v")


def test_consumers_table_names_are_registered():
    registered = set(spark_queries())
    for cache, consumers in CONSUMERS.items():
        unknown = set(consumers) - registered
        assert not unknown, f"{cache}: unregistered consumers {unknown}"
        assert consumers, f"{cache}: empty consumer set"


def test_release_after_last_consumer(spark, ledger_sandbox):
    state, table = ledger_sandbox
    table["c1"] = frozenset({"q_a", "q_b"})
    df = _df(spark).persist()
    try:
        tok = cache_ledger.enter_query(spark, "q_a")
        cache_ledger.touch(spark, "c1", df)
        cache_ledger.exit_query(tok)
        assert df.storageLevel.useMemory

        tok = cache_ledger.enter_query(spark, "q_b")
        cache_ledger.touch(spark, "c1", df)
        cache_ledger.exit_query(tok)
        # both consumers ran, but nothing released yet (q_b's action may
        # still be pending until the next query starts)
        assert df.storageLevel.useMemory

        tok = cache_ledger.enter_query(spark, "q_other")
        cache_ledger.exit_query(tok)
        assert not df.storageLevel.useMemory, "cache must be released"
        assert "c1" not in state["entries"]
    finally:
        df.unpersist()


def test_partial_consumer_set_keeps_cache(spark, ledger_sandbox):
    _, table = ledger_sandbox
    table["c1"] = frozenset({"q_a", "q_b", "q_never"})
    df = _df(spark).persist()
    try:
        for q in ("q_a", "q_b", "q_x", "q_y"):
            tok = cache_ledger.enter_query(spark, q)
            if q in ("q_a", "q_b"):
                cache_ledger.touch(spark, "c1", df)
            cache_ledger.exit_query(tok)
        assert df.storageLevel.useMemory, "q_never not seen: keep the cache"
    finally:
        df.unpersist()


def test_self_heal_re_persists_on_reaccess(spark, ledger_sandbox):
    state, table = ledger_sandbox
    table["c1"] = frozenset({"q_a"})
    df = _df(spark).persist()
    try:
        tok = cache_ledger.enter_query(spark, "q_a")
        cache_ledger.touch(spark, "c1", df)
        cache_ledger.exit_query(tok)
        tok = cache_ledger.enter_query(spark, "q_other")
        cache_ledger.exit_query(tok)
        assert not df.storageLevel.useMemory

        # an out-of-order re-run of the consumer re-arms and re-persists
        tok = cache_ledger.enter_query(spark, "q_a")
        cache_ledger.touch(spark, "c1", df)
        cache_ledger.exit_query(tok)
        assert df.storageLevel.useMemory
        assert "c1" in state["entries"]
    finally:
        df.unpersist()


def test_nested_invocation_never_releases(spark, ledger_sandbox):
    state, table = ledger_sandbox
    table["c1"] = frozenset({"q_outer"})
    df = _df(spark).persist()
    try:
        tok = cache_ledger.enter_query(spark, "q_outer")
        cache_ledger.touch(spark, "c1", df)
        # a nested registered query (composed inside q_outer's build) must
        # not release c1 even though q_outer (its only consumer) has been
        # seen — q_outer's action has not run yet
        inner = cache_ledger.enter_query(spark, "q_inner")
        cache_ledger.exit_query(inner)
        assert df.storageLevel.useMemory
        assert "c1" in state["entries"]
        cache_ledger.exit_query(tok)
        assert state["current"] is None
    finally:
        df.unpersist()


def test_unknown_cache_is_never_released(spark, ledger_sandbox):
    state, _ = ledger_sandbox
    df = _df(spark).persist()
    try:
        tok = cache_ledger.enter_query(spark, "q_a")
        cache_ledger.touch(spark, "mystery", df)
        cache_ledger.exit_query(tok)
        assert "mystery" not in state["entries"]
        for q in ("q_b", "q_c"):
            tok = cache_ledger.enter_query(spark, q)
            cache_ledger.exit_query(tok)
        assert df.storageLevel.useMemory
    finally:
        df.unpersist()
