"""A1 fold unit tests — SURVEY §5.1: synthetic event sequences vs the
hand-computed fold, including quirks Q5 (partial update) and Q7 (tombstones).
"""

from __future__ import annotations

from decimal import Decimal as D

from hive_server_spark.operators.fold import fold_order_events
from tests.conftest import ev


def _state(df):
    return {
        (r.pool_address, r.order_id): r
        for r in df.collect()
    }


def test_create_partial_fill_fillout(make_events):
    rows = [
        ev(seq=1, event_type="OrderCreated", order_id=1, trader="T1", price=100,
           amount=50, order_type="BUY"),
        ev(seq=2, event_type="OrderFilled", order_id=1, filled=20, remaining=30),
        ev(seq=3, event_type="OrderFilled", order_id=1, filled=50, remaining=0),
    ]
    st = _state(fold_order_events(make_events(rows)))
    o = st[("pool_0", 1)]
    assert o.trader == "T1"
    assert o.price == D(100)
    assert o.amount == D(50)
    assert o.filled == D(50)
    assert o.remaining_amount == D(0)
    assert o.active is False  # fill-out flips active
    assert o.order_type == "BUY"


def test_cancel_tombstone_q7(make_events):
    rows = [
        ev(seq=1, event_type="OrderCreated", order_id=1, trader="T1", price=100,
           amount=50, order_type="SELL"),
        ev(seq=2, event_type="OrderCancelled", order_id=1),
    ]
    st = _state(fold_order_events(make_events(rows)))
    o = st[("pool_0", 1)]
    # tombstoned, not deleted: row still present, fields intact
    assert o.active is False
    assert o.amount == D(50)
    assert o.trader == "T1"


def test_update_after_partial_fill_q5(make_events):
    rows = [
        ev(seq=1, event_type="OrderCreated", order_id=1, trader="T1", price=100,
           amount=50, order_type="BUY"),
        ev(seq=2, event_type="OrderFilled", order_id=1, filled=20, remaining=30),
        ev(seq=3, event_type="OrderUpdated", order_id=1, new_amount=80),
    ]
    st = _state(fold_order_events(make_events(rows)))
    o = st[("pool_0", 1)]
    # Q5: amount rewritten, filled/remaining/active untouched (stale)
    assert o.amount == D(80)
    assert o.filled == D(20)
    assert o.remaining_amount == D(30)
    assert o.active is True


def test_events_for_unknown_order_dropped(make_events):
    rows = [
        ev(seq=1, event_type="OrderFilled", order_id=9, filled=5, remaining=5),
        ev(seq=2, event_type="OrderCreated", order_id=1, trader="T1", price=10,
           amount=1, order_type="BUY"),
    ]
    st = _state(fold_order_events(make_events(rows)))
    assert ("pool_0", 9) not in st
    assert ("pool_0", 1) in st


def test_multi_pool_interleaved(make_events):
    rows = [
        ev(pool="pool_0", seq=1, event_type="OrderCreated", order_id=1, trader="TA",
           price=10, amount=5, order_type="BUY"),
        ev(pool="pool_1", seq=2, event_type="OrderCreated", order_id=1, trader="TB",
           price=20, amount=7, order_type="SELL"),
        ev(pool="pool_0", seq=3, event_type="OrderFilled", order_id=1, filled=5, remaining=0),
    ]
    st = _state(fold_order_events(make_events(rows)))
    assert st[("pool_0", 1)].active is False
    assert st[("pool_1", 1)].active is True
    assert st[("pool_1", 1)].trader == "TB"


def test_created_defaults(make_events):
    rows = [ev(seq=1, event_type="OrderCreated", order_id=1, trader="T1",
               price=10, amount=5, order_type="BUY")]
    st = _state(fold_order_events(make_events(rows)))
    o = st[("pool_0", 1)]
    assert o.filled == D(0)
    assert o.remaining_amount == D(5)
    assert o.active is True
    assert o.created_seq == 1
