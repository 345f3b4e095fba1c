"""Property-based fold test (SURVEY §5.1): random event sequences → the
Spark fold must equal a direct Python simulator of the reference's state
machine (reference src/models/order-book.ts:80-182, quirks Q3/Q5/Q7)."""

from __future__ import annotations

import random
from decimal import Decimal as D

from hive_server_spark.operators.fold import fold_order_events
from tests.conftest import ev


def simulate(events):
    """Python port of the reference's per-event mutations."""
    state: dict = {}
    for e in sorted(events, key=lambda r: r[1]):  # by seq
        (pool, seq, _ts, etype, oid, trader, price, amount, filled,
         remaining, new_amount, otype, _fa) = e
        key = (pool, oid)
        if etype == "OrderCreated":
            state[key] = {
                "trader": trader, "price": price, "amount": amount,
                "filled": D(0), "remaining_amount": amount,
                "order_type": otype, "active": True, "created_seq": seq,
                "created": True,
            }
        elif key in state:
            o = state[key]
            if etype == "OrderFilled":
                o.update(filled=filled, remaining_amount=remaining,
                         active=remaining > 0)
            elif etype == "OrderCancelled":
                o["active"] = False
            elif etype == "OrderUpdated":
                o["amount"] = new_amount  # Q5: remaining/filled stay stale
    return state


def _random_events(rng, n_orders=12, n_events=60):
    events, seq = [], 0
    live = []
    for _ in range(n_events):
        seq += 1
        kind = rng.random()
        if kind < 0.35 or not live:
            oid = rng.randrange(n_orders)
            live.append(oid)
            events.append(ev(
                seq=seq, event_type="OrderCreated", order_id=oid,
                trader=f"T{rng.randrange(4)}",
                price=100 + rng.randrange(50),
                amount=10 + rng.randrange(90),
                order_type=rng.choice(["BUY", "SELL"]),
            ))
        elif kind < 0.6:
            amt = rng.randrange(90)
            events.append(ev(
                seq=seq, event_type="OrderFilled", order_id=rng.choice(live),
                filled=amt, remaining=rng.randrange(80),
            ))
        elif kind < 0.75:
            events.append(ev(
                seq=seq, event_type="OrderCancelled", order_id=rng.choice(live),
            ))
        elif kind < 0.9:
            events.append(ev(
                seq=seq, event_type="OrderUpdated", order_id=rng.choice(live),
                new_amount=10 + rng.randrange(90),
            ))
        else:
            # event for an id that may never have been created (dropped)
            events.append(ev(
                seq=seq, event_type="OrderFilled",
                order_id=n_orders + rng.randrange(5),
                filled=1, remaining=1,
            ))
    return events


def test_fold_matches_reference_simulator(spark, make_events):
    rng = random.Random(1234)
    for trial in range(5):
        events = _random_events(rng)
        want = {
            k: v for k, v in simulate(events).items() if v.get("created")
        }
        got = {
            (r.pool_address, r.order_id): r
            for r in fold_order_events(make_events(events)).collect()
        }
        assert got.keys() == want.keys(), f"trial {trial}: key set"
        for k, w in want.items():
            g = got[k]
            assert g.trader == w["trader"], (trial, k)
            assert g.price == w["price"], (trial, k)
            assert g.amount == w["amount"], (trial, k)
            assert g.filled == w["filled"], (trial, k)
            assert g.remaining_amount == w["remaining_amount"], (trial, k)
            assert g.order_type == w["order_type"], (trial, k)
            assert g.active == w["active"], (trial, k)
            assert g.created_seq == w["created_seq"], (trial, k)
