"""Serving-edge JSON shapes (S10): parseable, correctly ordered, tombstones
visible in trader views but absent from the book."""

from __future__ import annotations

import json

from hive_server_spark.operators.fold import fold_order_events
from hive_server_spark.operators import serving
from hive_server_spark.sources.synthetic import order_events
from tests.conftest import SF_SMALL


def _orders(spark):
    return fold_order_events(order_events(spark, SF_SMALL))


def test_order_book_json_shape(spark):
    orders = _orders(spark)
    pool = orders.first().pool_address
    rows = serving.order_book_json(orders, pool, depth=5).collect()
    assert len(rows) == 1
    doc = json.loads(rows[0].json)
    assert doc["pool"] == pool
    bid_prices = [float(b["price"]) for b in doc["bids"]]
    ask_prices = [float(a["price"]) for a in doc["asks"]]
    assert bid_prices == sorted(bid_prices, reverse=True)
    assert ask_prices == sorted(ask_prices)
    assert all(b["orders"] for b in doc["bids"])  # FIFO queues present


def test_order_json_includes_tombstones(spark):
    orders = _orders(spark)
    dead = orders.where("NOT active").first()
    doc = json.loads(
        serving.order_json(orders, dead.pool_address, dead.order_id).first().json
    )
    assert doc["active"] is False and doc["id"] == dead.order_id
    # money renders as strings (reference string-typed amounts, no float drift)
    assert isinstance(doc["price"], str)


def test_user_orders_json_q7(spark):
    orders = _orders(spark)
    trader = orders.where("NOT active").first().trader
    docs = [json.loads(r.json) for r in serving.user_orders_json(orders, trader).collect()]
    assert docs and any(not d["active"] for d in docs)


def _pools_dim(spark):
    from hive_server_spark.gate import q_pool_info_enriched
    return q_pool_info_enriched(spark, SF_SMALL)


def test_pools_json_validity_filter_and_shape(spark):
    docs = [json.loads(r.json) for r in serving.pools_json(_pools_dim(spark)).collect()]
    assert docs
    for d in docs:
        assert d["address"].startswith("pool_")
        assert set(d["baseToken"]) == {"symbol", "decimals"}
        assert d["quoteToken"]["symbol"] == "USDQ"


def test_pool_info_json_latest_price_is_string(spark):
    pools = _pools_dim(spark)
    addr = pools.first().pool_address
    (row,) = serving.pool_info_json(pools, addr).collect()
    doc = json.loads(row.json)
    assert doc["address"] == addr
    assert isinstance(doc["latestPrice"], str) and float(doc["latestPrice"]) > 0


def test_market_orders_json_history(spark):
    ev = order_events(spark, SF_SMALL)
    mo = ev.where(ev.event_type == "MarketOrderExecuted").first()
    rows = serving.market_orders_json(ev, mo.pool_address, mo.trader).collect()
    assert rows
    doc = json.loads(rows[0].json)
    assert doc["type"] in ("BUY", "SELL")
    assert isinstance(doc["price"], str) and isinstance(doc["filledAmount"], str)


def test_amount_out_json_matches_reference_shape(spark):
    from hive_server_spark.operators.amount_out import amount_out
    r = amount_out(_orders(spark), "BUY", 500)
    addr = r.first().pool_address
    (row,) = serving.amount_out_json(r, addr).collect()
    doc = json.loads(row.json)
    assert set(doc) <= {"isError", "errorMessage", "outputAmount", "prices"}
    assert isinstance(doc["outputAmount"], str)
    assert all(isinstance(p, str) for p in doc["prices"])
    assert ("errorMessage" in doc) == doc["isError"]


def test_pool_info_json_null_latest_price_omits_key(spark):
    """The serving gate oracle (plans/serving_pack._POOL_INFO_JSON_ORACLE)
    mirrors Spark's to_json null-key omission with a CASE branch that sf0.01
    data never exercises (every pool has LatestPrice events) — pin the
    omission contract itself here so a to_json behavior change surfaces as
    this failure, not a silent oracle divergence on sparser data."""
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        F.to_json(
            F.struct(
                F.lit("p").alias("address"),
                F.lit(None).cast("string").alias("latestPrice"),
            )
        ).alias("json")
    )
    (row,) = df.collect()
    assert row.json == '{"address":"p"}'  # null key dropped, no trailing comma


def test_serving_pack_json_is_parseable(spark):
    """Gate JSON rows must round-trip through a real JSON parser (the hash
    oracle checks bytes; this checks the bytes are valid JSON)."""
    from hive_server_spark.plans import serving_pack

    rows = serving_pack.q_serving_pool_info_json(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        doc = json.loads(r.json)
        assert set(doc) >= {"address", "baseToken", "quoteToken"}
        assert doc["baseToken"]["symbol"].startswith("TK")
    rows = serving_pack.q_serving_user_orders_json(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        doc = json.loads(r.json)
        assert doc["id"] == r.order_id and isinstance(doc["active"], bool)


def test_serving_order_book_json_oracle_parity_and_contract(spark):
    """The (round-16 staged) depth-20 book JSON route: byte-identical to
    the DuckDB concatenation oracle at sf0.001, parseable, bids strictly
    price-descending / asks ascending, and FIFO (created_seq) order ids
    within each level — the price-time-priority contract as a string."""
    import json as _json

    import duckdb

    from hive_server_spark.plans.serving_pack import (
        _ORDER_BOOK_JSON_ORACLE,
        q_serving_order_book_json,
    )
    from tests.conftest import SF_SMALL

    rows = sorted(
        tuple(r) for r in q_serving_order_book_json(spark, SF_SMALL).collect()
    )
    assert len(rows) > 0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMALL}/events.parquet'"
    )
    orc = sorted(
        tuple(r) for r in con.execute(_ORDER_BOOK_JSON_ORACLE).fetchall()
    )
    assert rows == orc

    saw_multi_order_level = False
    for pool, doc in rows:
        parsed = _json.loads(doc)
        assert parsed["pool"] == pool
        bid_prices = [float(b["price"]) for b in parsed["bids"]]
        ask_prices = [float(a["price"]) for a in parsed["asks"]]
        assert bid_prices == sorted(bid_prices, reverse=True)
        assert ask_prices == sorted(ask_prices)
        for lvl in parsed["bids"] + parsed["asks"]:
            assert len(lvl["orders"]) >= 1
            if len(lvl["orders"]) > 1:
                saw_multi_order_level = True
    # the FIFO-within-level contract must actually be exercised
    assert saw_multi_order_level


def test_serving_amount_out_json_oracle_parity_and_error_branches(spark):
    """The (round-17 staged) amount-out JSON route: byte parity with the
    DuckDB oracle at sf0.001 (success branch), INSUFFICIENT-branch parity
    under an amount no book can fill (both engines re-run the walk at
    10^9 quote units), and the NO-LIQUIDITY branch rendered from a
    crafted one-sided book (no oracle row exists to compare — the sf
    corpora have no empty side — so the Spark rendering contract is
    pinned directly)."""
    import json as _json

    import duckdb
    from pyspark.sql import functions as F

    from hive_server_spark.operators.amount_out import (
        NO_LIQUIDITY,
        amount_out,
        amount_out_ctes,
    )
    from hive_server_spark.plans.serving_pack import (
        _AMOUNT_OUT_JSON_ORACLE,
        _orders_state,
        q_serving_amount_out_json,
    )
    from hive_server_spark.plans.serving_pack import (
        ORDER_EVENTS_CTE,
        ORDER_UPDATES_CTE,
        ORDERS_STATE_CTE,
    )
    from tests.conftest import SF_SMALL

    def render(result):
        return result.select(
            "pool_address",
            F.to_json(
                F.struct(
                    F.col("pool_address").alias("pool"),
                    F.col("is_error").alias("isError"),
                    F.col("error_message").alias("errorMessage"),
                    F.floor(F.col("output_amount") * 1e6)
                    .cast("bigint")
                    .alias("outputAmountMicro"),
                    F.transform(
                        F.col("hit_prices"), lambda p: p.cast("string")
                    ).alias("prices"),
                )
            ).alias("json"),
        )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMALL}/events.parquet'"
    )

    # success branch: the staged query vs its oracle, byte for byte
    got = sorted(
        tuple(r) for r in q_serving_amount_out_json(spark, SF_SMALL).collect()
    )
    orc = sorted(
        tuple(r)
        for r in con.execute(_AMOUNT_OUT_JSON_ORACLE).fetchall()
    )
    assert got == orc and len(got) > 0
    assert any(not _json.loads(doc)["isError"] for _, doc in got)

    # INSUFFICIENT branch: an amount no book fills — same oracle chain,
    # larger amount, still byte-identical
    big = "CAST(1000000000 AS DECIMAL(18,3))"
    big_oracle = (
        f"WITH {ORDER_EVENTS_CTE}, {ORDER_UPDATES_CTE}, {ORDERS_STATE_CTE}"
        + amount_out_ctes("BUY", amount=big)
        + """
SELECT pool_address,
       '{"pool":"' || pool_address ||
       '","isError":' || CASE WHEN is_error THEN 'true' ELSE 'false' END ||
       CASE WHEN n_levels = 0
              THEN ',"errorMessage":"No liquidity available"'
            WHEN is_error
              THEN ',"errorMessage":"Insufficient liquidity"'
            ELSE '' END ||
       ',"outputAmountMicro":' ||
       CAST(CAST(floor(output_amount * 1000000.0) AS BIGINT) AS VARCHAR) ||
       ',"prices":' ||
       CASE WHEN hit_prices = '' THEN '[]'
            ELSE '["' || replace(hit_prices, ',', '","') || '"]' END ||
       '}' AS json
FROM amount_out_result
"""
    )
    got_big = sorted(
        tuple(r)
        for r in render(
            amount_out(_orders_state(spark, SF_SMALL), "BUY", 10**9)
        ).collect()
    )
    orc_big = sorted(tuple(r) for r in con.execute(big_oracle).fetchall())
    assert got_big == orc_big
    parsed = [_json.loads(doc) for _, doc in got_big]
    assert all(p["isError"] for p in parsed)
    assert all(p["errorMessage"] == "Insufficient liquidity" for p in parsed)

    # NO-LIQUIDITY branch: crafted one-sided book (BUY orders only, so a
    # BUY walk finds an empty ask side) — rendering contract only
    one_sided = spark.createDataFrame(
        [("pool_x", 1, "T1", 100.0, 10.0, 0.0, "BUY", True, 1)],
        "pool_address string, order_id long, trader string, price double, "
        "amount double, filled double, order_type string, active boolean, "
        "created_seq long",
    ).select(
        "pool_address", "order_id", "trader",
        F.col("price").cast("decimal(12,3)").alias("price"),
        F.col("amount").cast("decimal(18,3)").alias("amount"),
        F.col("filled").cast("decimal(18,3)").alias("filled"),
        "order_type", "active", "created_seq",
    )
    [(_, doc)] = render(amount_out(one_sided, "BUY", 500)).collect()
    p = _json.loads(doc)
    assert p["isError"] and p["errorMessage"] == NO_LIQUIDITY
    assert p["outputAmountMicro"] == 0 and p["prices"] == []
