"""SessionCache semantics: applicationId keying, eviction of entries from
stopped contexts, and best-effort on_evict (ADVICE r2: id(spark) keys can
collide after GC and leaked persisted DataFrames / temp dirs)."""

from __future__ import annotations

from types import SimpleNamespace

from hive_server_spark.session_cache import SessionCache


def _fake_spark(app_id: str):
    return SimpleNamespace(sparkContext=SimpleNamespace(applicationId=app_id))


def test_memoizes_within_one_application():
    cache = SessionCache()
    spark = _fake_spark("app-1")
    calls = []
    v1 = cache.get_or_create(spark, ("k",), lambda: calls.append(1) or "built")
    v2 = cache.get_or_create(spark, ("k",), lambda: calls.append(1) or "rebuilt")
    assert v1 == v2 == "built"
    assert len(calls) == 1


def test_distinct_keys_distinct_entries():
    cache = SessionCache()
    spark = _fake_spark("app-1")
    a = cache.get_or_create(spark, ("a",), lambda: "A")
    b = cache.get_or_create(spark, ("b",), lambda: "B")
    assert (a, b) == ("A", "B")


def test_new_application_evicts_and_releases_old_entries():
    evicted = []
    cache = SessionCache(on_evict=evicted.append)
    cache.get_or_create(_fake_spark("app-1"), ("k",), lambda: "old")
    # same key under a NEW application id (old context stopped): must not
    # hand back the stale value, and must release the old one
    fresh = cache.get_or_create(_fake_spark("app-2"), ("k",), lambda: "new")
    assert fresh == "new"
    assert evicted == ["old"]


def test_on_evict_errors_are_swallowed():
    def boom(_):
        raise RuntimeError("context already dead")

    cache = SessionCache(on_evict=boom)
    cache.get_or_create(_fake_spark("app-1"), ("k",), lambda: "old")
    assert cache.get_or_create(_fake_spark("app-2"), ("k",), lambda: "new") == "new"
