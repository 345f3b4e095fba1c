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


def _last_field_update(name: str, pdf: pd.DataFrame, seqs, masks) -> tuple | None:
    """(seq, value) of the latest update this batch touches `name` with —
    Q3/Q5/Q7 semantics, mirroring operators/fold.py project_updates.
    Vectorized: boolean masks + a tail index, never per-row Python."""
    import numpy as np

    created, filled, cancelled, updated = masks
    num = lambda c: pd.to_numeric(pdf[c], errors="coerce").to_numpy()  # noqa: E731
    if name == "trader":
        mask, vals = created, pdf["trader"].to_numpy()
    elif name == "price":
        mask, vals = created, num("price")
    elif name == "amount":
        mask = created | updated
        vals = np.where(created, num("amount"), num("new_amount"))
    elif name == "filled":
        mask = created | filled
        vals = np.where(created, 0.0, num("filled"))
    elif name == "remaining_amount":
        mask = created | filled
        vals = np.where(created, num("amount"), num("remaining"))
    elif name == "order_type":
        mask, vals = created, pdf["order_type"].to_numpy()
    else:  # active
        mask = created | filled | cancelled
        vals = np.where(created, True, np.where(filled, num("remaining") > 0, False))
    idx = np.nonzero(mask)[0]
    if len(idx) == 0:
        return None
    i = idx[-1]
    v = vals[i]
    if name == "active":
        v = bool(v)
    elif name in ("price", "amount", "filled", "remaining_amount"):
        v = float(v)
    return int(seqs[i]), v


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
        pdf = pdf.sort_values("seq")
        seqs = pdf["seq"].astype("int64").to_numpy()
        et = pdf["event_type"].to_numpy()
        masks = (
            et == "OrderCreated",
            et == "OrderFilled",
            et == "OrderCancelled",
            et == "OrderUpdated",
        )
        for i, name in enumerate(names):
            upd = _last_field_update(name, pdf, seqs, masks)
            if upd is not None and (st[2 * i] is None or upd[0] >= st[2 * i]):
                st[2 * i], st[2 * i + 1] = upd
        import numpy as np

        created_idx = np.nonzero(masks[0])[0]
        if len(created_idx):
            last_created = int(seqs[created_idx[-1]])
            st[-3] = last_created if st[-3] is None else max(st[-3], last_created)
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
