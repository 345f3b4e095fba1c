"""Amount-out tests — SURVEY §5.3:
(a) window-based implementation == literal Python port of the reference walk
    (reference src/models/order-book.ts:281-316): BUY spends QUOTE per ask
    level (min(remaining, volume*price)) and receives BASE (spend/price);
    SELL sells BASE into bids (min(remaining, volume)) and receives QUOTE;
(b) monotonicity: more input ⇒ ≥ output;
(c) insufficient-liquidity flag iff amount > Σ capacity;
(d) empty opposite side ⇒ explicit error row ("No liquidity available"),
    never a missing row (reference :271-278).
"""

from __future__ import annotations

import random
from decimal import Decimal as D

import pytest

from hive_server_spark.operators.amount_out import (
    INSUFFICIENT,
    NO_LIQUIDITY,
    amount_out,
)
from hive_server_spark.operators.fold import fold_order_events
from tests.conftest import ev


def reference_walk(levels, amount, is_buy):
    """Literal port of the reference's sequential order-walk
    (src/models/order-book.ts:281-316): levels pre-sorted in walk order.
    BUY: remaining is quote; spend min(remaining, vol*price), gain spend/price.
    SELL: remaining is base; take min(remaining, vol), gain take*price.
    Every level reached with remaining > 0 records its price (:306)."""
    remaining = float(amount)
    total_out = 0.0
    hit = []
    for price, vol in levels:
        if remaining <= 0:
            break
        price_f, vol_f = float(price), float(vol)
        if is_buy:
            spend = min(remaining, vol_f * price_f)
            total_out += spend / price_f
            remaining -= spend
        else:
            take = min(remaining, vol_f)
            total_out += take * price_f
            remaining -= take
        hit.append(price)
    return total_out, hit, remaining > 0


def _orders(make_events, book):
    rows, seq = [], 0
    for side, price, amount in book:
        seq += 1
        rows.append(ev(seq=seq, event_type="OrderCreated", order_id=seq,
                       trader=f"T{seq % 3}", price=price, amount=amount,
                       order_type=side))
    return fold_order_events(make_events(rows))


def test_buy_spends_quote_receives_base(make_events):
    orders = _orders(make_events, [
        ("SELL", 100, 10), ("SELL", 125, 20), ("SELL", 150, 100),
        ("BUY", 99, 5),
    ])
    # BUY spending 1500 quote: level 100 capacity 1000 → 10 base;
    # level 125 spends remaining 500 → 4 base. Total 14 base, 2 levels.
    r = amount_out(orders, "BUY", 1500).collect()[0]
    assert r.output_amount == pytest.approx(14.0)
    assert [int(p) for p in r.hit_prices] == [100, 125]
    assert r.consumed == D(1500)
    assert r.is_error is False
    assert r.error_message is None


def test_exact_boundary_and_insufficient(make_events):
    orders = _orders(make_events, [("SELL", 100, 10), ("SELL", 125, 20)])
    # total quote capacity = 10*100 + 20*125 = 3500
    exact = amount_out(orders, "BUY", 3500).collect()[0]
    assert exact.is_error is False
    assert exact.output_amount == pytest.approx(30.0)
    short = amount_out(orders, "BUY", 3501).collect()[0]
    assert short.is_error is True
    assert short.error_message == INSUFFICIENT
    assert short.output_amount == pytest.approx(30.0)


def test_sell_walks_bids_desc(make_events):
    orders = _orders(make_events, [("BUY", 99, 10), ("BUY", 98, 10), ("BUY", 100, 5)])
    r = amount_out(orders, "SELL", 12).collect()[0]
    # consume 5@100 then 7@99
    assert r.output_amount == pytest.approx(5 * 100 + 7 * 99)
    assert [int(p) for p in r.hit_prices] == [100, 99]


def test_zero_volume_level_visited_but_contributes_nothing(make_events):
    # a fully-unfilled order with amount 0 creates a zero-capacity level;
    # the reference loop still visits it while remaining > 0 and pushes its
    # price (src/models/order-book.ts:306) — output unaffected
    orders = _orders(make_events, [
        ("SELL", 100, 10), ("SELL", 101, 0), ("SELL", 102, 10),
    ])
    r = amount_out(orders, "BUY", 1000 + 0 + 1020).collect()[0]
    assert r.output_amount == pytest.approx(20.0)
    assert [int(p) for p in r.hit_prices] == [100, 101, 102]
    assert r.is_error is False


def test_no_liquidity_is_explicit_error_row(make_events):
    # only BUY orders exist, so a BUY walk has an empty opposite side —
    # the pool must still surface, as an error row (reference :271-278)
    orders = _orders(make_events, [("BUY", 99, 10)])
    rows = amount_out(orders, "BUY", 500).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.is_error is True
    assert r.error_message == NO_LIQUIDITY
    assert r.output_amount == 0.0
    assert r.consumed == D(0)
    assert r.hit_prices == []


@pytest.mark.parametrize("trial_seed", [7, 21, 99])
@pytest.mark.parametrize("order_type", ["BUY", "SELL"])
def test_random_books_match_reference_walk(make_events, trial_seed, order_type):
    rng = random.Random(trial_seed)
    opposite = "SELL" if order_type == "BUY" else "BUY"
    book = [(opposite, rng.randint(90, 110), rng.randint(1, 40))
            for _ in range(rng.randint(3, 12))]
    orders = _orders(make_events, book)
    # collapse to levels in walk order like the reference does
    levels: dict[int, D] = {}
    for _, price, amount in book:
        levels[price] = levels.get(price, D(0)) + D(amount)
    walk = sorted(levels.items(), reverse=(order_type == "SELL"))
    capacity = sum(
        (v * p if order_type == "BUY" else v) for p, v in walk
    )
    prev_out = -1.0
    for amount in (1, 13, 37, int(capacity), int(capacity) + 5_000):
        expect_out, expect_hit, expect_err = reference_walk(
            [(D(p), v) for p, v in walk], amount, order_type == "BUY")
        got = amount_out(orders, order_type, amount).collect()[0]
        assert got.output_amount == pytest.approx(expect_out)
        assert [int(p) for p in got.hit_prices] == [int(p) for p in expect_hit]
        assert got.is_error is expect_err
        assert got.output_amount >= prev_out - 1e-9  # monotonicity
        prev_out = got.output_amount
