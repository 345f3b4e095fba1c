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


def test_scd2_versions_match_python_carry(spark):
    """orders_scd2_versions vs a python carry-forward over the same
    projected updates: version numbering, validity intervals, is_current,
    and every carried attribute — and the final (is_current) version of
    each order must equal the batch fold's state row."""
    from tests.conftest import SF_SMALL

    from hive_server_spark.gate import spark_queries
    from hive_server_spark.operators.fold import project_updates
    from hive_server_spark.sources.synthetic import order_events

    got = spark_queries()["orders_scd2_versions"](spark, SF_SMALL).collect()
    upd = project_updates(order_events(spark, SF_SMALL)).collect()

    by_key: dict[tuple, list] = {}
    for r in upd:
        by_key.setdefault((r.pool_address, r.order_id), []).append(r)
    want = {}
    for key, rows in by_key.items():
        rows.sort(key=lambda r: r.seq)
        carried = {"trader": None, "price": None, "amount": None,
                   "filled": None, "remaining_amount": None, "active": None}
        for i, r in enumerate(rows):
            for field, u in (("trader", r.u_trader), ("price", r.u_price),
                             ("amount", r.u_amount), ("filled", r.u_filled),
                             ("remaining_amount", r.u_remaining),
                             ("active", r.u_active)):
                if u is not None:
                    carried[field] = u
            nxt = rows[i + 1].seq if i + 1 < len(rows) else None
            want[(key[0], key[1], r.seq)] = (
                i + 1, nxt,
                carried["trader"],
                None if carried["price"] is None else float(carried["price"]),
                None if carried["amount"] is None else float(carried["amount"]),
                None if carried["filled"] is None else float(carried["filled"]),
                None if carried["remaining_amount"] is None
                else float(carried["remaining_amount"]),
                carried["active"],
            )
    assert len(got) == len(want)
    for r in got:
        w = want[(r.pool_address, r.order_id, r.valid_from_seq)]
        assert (r.version_no, r.valid_to_seq, r.trader, r.price, r.amount,
                r.filled, r.remaining_amount, r.active) == w
        assert r.is_current == (r.valid_to_seq is None)

    # final versions == batch fold state (for orders with a Created event)
    state = {
        (r.pool_address, r.order_id): r
        for r in spark_queries()["orders_state"](spark, SF_SMALL).collect()
    }
    finals = {
        (r.pool_address, r.order_id): r for r in got if r.is_current
    }
    for key, s in state.items():
        f = finals[key]
        assert (f.trader, f.price, f.amount, f.filled,
                f.remaining_amount, f.active) == (
            s.trader, s.price, s.amount, s.filled,
            s.remaining_amount, s.active
        )
