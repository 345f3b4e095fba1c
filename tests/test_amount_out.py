"""Amount-out tests — SURVEY §5.3:
(a) window-based implementation == literal Python port of the reference walk
    (reference src/models/order-book.ts:281-316);
(b) monotonicity: more input ⇒ ≥ output;
(c) insufficient-liquidity flag iff amount > Σ capacity.
"""

from __future__ import annotations

import random
from decimal import Decimal as D

import pytest

from hive_server_spark.operators.amount_out import amount_out
from hive_server_spark.operators.fold import fold_order_events
from tests.conftest import ev


def reference_walk(levels, amount):
    """Literal port of the reference's sequential order-walk
    (src/models/order-book.ts:281-316): levels pre-sorted in walk order,
    consume min(remaining, volume) per level."""
    remaining = D(amount)
    total_out = D(0)
    hit = []
    for price, vol in levels:
        if remaining <= 0:
            break
        take = min(vol, remaining)
        if take > 0:
            total_out += take * price
            hit.append(price)
            remaining -= take
    return total_out, hit, remaining > 0


def _orders(make_events, book):
    rows, seq = [], 0
    for side, price, amount in book:
        seq += 1
        rows.append(ev(seq=seq, event_type="OrderCreated", order_id=seq,
                       trader=f"T{seq % 3}", price=price, amount=amount,
                       order_type=side))
    return fold_order_events(make_events(rows))


def test_multi_level_walk_golden(make_events):
    orders = _orders(make_events, [
        ("SELL", 101, 10), ("SELL", 102, 20), ("SELL", 103, 100),
        ("BUY", 99, 5),
    ])
    # BUY of 25 base: 10@101 + 15@102 = 1010 + 1530 = 2540
    r = amount_out(orders, "BUY", 25).collect()[0]
    assert r.output_amount == D(2540)
    assert [int(p) for p in r.hit_prices] == [101, 102]
    assert r.is_error is False
    assert r.error_message is None


def test_exact_boundary_and_insufficient(make_events):
    orders = _orders(make_events, [("SELL", 101, 10), ("SELL", 102, 20)])
    exact = amount_out(orders, "BUY", 30).collect()[0]
    assert exact.is_error is False
    assert exact.output_amount == D(10 * 101 + 20 * 102)
    short = amount_out(orders, "BUY", 31).collect()[0]
    assert short.is_error is True
    assert short.error_message == "Insufficient liquidity"


def test_sell_walks_bids_desc(make_events):
    orders = _orders(make_events, [("BUY", 99, 10), ("BUY", 98, 10), ("BUY", 100, 5)])
    r = amount_out(orders, "SELL", 12).collect()[0]
    # consume 5@100 then 7@99
    assert r.output_amount == D(5 * 100 + 7 * 99)
    assert [int(p) for p in r.hit_prices] == [100, 99]


@pytest.mark.parametrize("trial_seed", [7, 21, 99])
def test_random_books_match_reference_walk(make_events, trial_seed):
    rng = random.Random(trial_seed)
    book = [("SELL", rng.randint(90, 110), rng.randint(1, 40))
            for _ in range(rng.randint(3, 12))]
    orders = _orders(make_events, book)
    # collapse to levels in walk order (asks asc) like the reference does
    levels: dict[int, D] = {}
    for _, price, amount in book:
        levels[price] = levels.get(price, D(0)) + D(amount)
    walk = sorted(levels.items())
    prev_out = D(-1)
    for amount in (1, 13, 37, sum(v for _, v in walk), 10_000):
        expect_out, expect_hit, expect_err = reference_walk(
            [(D(p), v) for p, v in walk], amount)
        rows = amount_out(orders, "BUY", amount).collect()
        got = rows[0]
        assert got.output_amount == expect_out
        assert [int(p) for p in got.hit_prices] == [int(p) for p in expect_hit]
        assert got.is_error is expect_err
        assert got.output_amount >= prev_out  # monotonicity
        prev_out = got.output_amount
