"""Keyed stateful streaming fold via applyInPandasWithState (SURVEY A1/ST3).

The foreachBatch+merge pipeline (streaming/incremental.py) is the preferred
production path (pure DataFrame ops, no Python in the loop); this module is
the *custom stateful operator* form the north star asks for: per
(pool_address, order_id) group, an arbitrary Python fold over event batches
with explicit GroupState — the Spark-native replacement for the reference's
per-event Redis mutation (reference src/models/order-book.ts:80-182).

State = per-field (last-set seq, value) pairs — the same mergeable shape as
the incremental fold, so arbitrary micro-batch boundaries (and late
arrivals of earlier-seq events) converge to the batch recompute; the
equivalence test pins that.

Scale posture: state lives in the executor state store keyed by the group;
only touched keys are read/written per batch. Orders never expire in the
reference (tombstone, not delete — Q7), hence NoTimeout."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# (seq, value) per field, flattened: money is double here (exact for the
# integer-valued test amounts; the decimal-exact path is incremental.py)
_PAIRS = [
    ("trader", StringType()),
    ("price", DoubleType()),
    ("amount", DoubleType()),
    ("filled", DoubleType()),
    ("remaining_amount", DoubleType()),
    ("order_type", StringType()),
    ("active", BooleanType()),
]

STATE_SCHEMA = StructType(
    [f for name, t in _PAIRS for f in
     (StructField(f"s_{name}", LongType()), StructField(f"v_{name}", t))]
    + [
        StructField("created_seq", LongType()),
        StructField("has_created", LongType()),
        StructField("version", LongType()),  # batches that touched this key
    ]
)

OUTPUT_SCHEMA = StructType(
    [StructField("pool_address", StringType()), StructField("order_id", LongType())]
    + [StructField(name, t) for name, t in _PAIRS]
    + [
        StructField("created_seq", LongType()),
        # per-key emission counter: the row with max version IS the final
        # state (event seqs can't serve here — a later batch may carry only
        # lower-seq events)
        StructField("version", LongType()),
    ]
)

_EVENT_COLS = [
    "pool_address", "order_id", "seq", "event_type", "trader", "price",
    "amount", "filled", "remaining", "new_amount", "order_type",
]


def _updates_for(row: pd.Series) -> dict[str, Any]:
    """Field updates per event type — Q3/Q5/Q7 semantics, mirroring
    operators/fold.py project_updates."""
    et = row["event_type"]
    if et == "OrderCreated":
        return {
            "trader": row["trader"],
            "price": float(row["price"]),
            "amount": float(row["amount"]),
            "filled": 0.0,
            "remaining_amount": float(row["amount"]),
            "order_type": row["order_type"],
            "active": True,
        }
    if et == "OrderFilled":
        return {
            "filled": float(row["filled"]),
            "remaining_amount": float(row["remaining"]),
            "active": bool(row["remaining"] > 0),
        }
    if et == "OrderCancelled":
        return {"active": False}
    if et == "OrderUpdated":
        return {"amount": float(row["new_amount"])}
    return {}


def _fold_group(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    names = [n for n, _ in _PAIRS]
    if state.exists:
        st = list(state.get)
    else:
        st = [None] * (2 * len(names)) + [None, 0, 0]
    st[-1] = (st[-1] or 0) + 1

    for pdf in pdf_iter:
        for _, row in pdf.sort_values("seq").iterrows():
            seq = int(row["seq"])
            upd = _updates_for(row)
            for i, name in enumerate(names):
                if name in upd and (st[2 * i] is None or seq >= st[2 * i]):
                    st[2 * i], st[2 * i + 1] = seq, upd[name]
            if row["event_type"] == "OrderCreated":
                st[-3] = seq if st[-3] is None else max(st[-3], seq)
                st[-2] = 1

    state.update(tuple(st))
    out = {
        "pool_address": [key[0]],
        "order_id": [key[1]],
        **{name: [st[2 * i + 1]] for i, name in enumerate(names)},
        "created_seq": [st[-3]],
        "version": [st[-1]],
    }
    # emit only created orders (reference drops unknown-id events)
    if st[-2] != 1:
        yield pd.DataFrame(columns=list(out))
        return
    yield pd.DataFrame(out)


def stateful_orders_stream(events_stream: DataFrame) -> DataFrame:
    """events stream → per-batch updated order rows (update output mode)."""
    return (
        events_stream.selectExpr(*_EVENT_COLS)
        .groupBy("pool_address", "order_id")
        .applyInPandasWithState(
            _fold_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
