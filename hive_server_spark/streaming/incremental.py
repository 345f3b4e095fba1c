"""Streaming incremental view maintenance of the `orders` state (SURVEY §2.9).

The reference maintains order state by mutating Redis per event inside a
block-triggered micro-batch loop with an in-memory cursor (reference
src/services/block-event-manager.ts:39-92, src/services/hive-listener.ts:
144-221); a crash loses the cursor (SURVEY ST6). Spark-first replacement:

    readStream(order_events) → project_updates → per-batch PARTIAL FOLD
    → foreachBatch MERGE into a versioned parquet state table

The state value per (pool_address, order_id) keeps, for every order field,
the pair (seq-of-last-set, value) — `max(struct(seq, value))` over non-null
updates. That makes the per-batch partial fold a *commutative, associative
monoid*: merging batch states in ANY batch partitioning yields the same
final state as the batch recompute (operators/fold.py). This is the formal
version of the reference's "skipped blocks are caught up as a range"
semantics (ST1) — and the property the equivalence tests pin down.

Checkpointing replaces the reference's in-memory `lastProcessedBlock`
cursor, strictly improving ST6 (no event loss on crash).

Scale posture: each micro-batch does one hash-aggregate of the batch (small)
plus an outer-join merge against current state partitioned on the state key;
with state bucketed by (pool_address) the merge is a co-partitioned join.
State never leaves executors; the driver only tracks the version pointer.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_server_spark.operators.fold import project_updates

_FIELDS = (
    "trader",
    "price",
    "amount",
    "filled",
    "remaining_amount",
    "order_type",
    "active",
)
_UPD_OF = {
    "trader": "u_trader",
    "price": "u_price",
    "amount": "u_amount",
    "filled": "u_filled",
    "remaining_amount": "u_remaining",
    "order_type": "u_order_type",
    "active": "u_active",
}


def partial_fold(events: DataFrame) -> DataFrame:
    """Fold a (micro-)batch of events into a mergeable partial state: per
    field a struct(seq, v) carrying the latest non-null update in this batch.
    One hash aggregate with map-side combine."""
    upd = project_updates(events)
    seq = F.col("seq")

    def last_pair(field: str):
        u = F.col(_UPD_OF[field])
        return F.max(F.when(u.isNotNull(), F.struct(seq.alias("seq"), u.alias("v")))).alias(
            f"p_{field}"
        )

    return upd.groupBy("pool_address", "order_id").agg(
        *[last_pair(f) for f in _FIELDS],
        F.min("u_created_ts").alias("created_ts"),
        F.max(F.when(F.col("is_created") == 1, seq)).alias("created_seq"),
        F.max("is_created").alias("has_created"),
    )


def merge_partials(state: DataFrame, batch: DataFrame) -> DataFrame:
    """Monoid merge of two partial states: full-outer join on the state key;
    per field keep the (seq, v) pair with the larger seq (greatest() skips
    nulls). Commutative and associative — batch boundaries cannot change the
    result."""
    s, b = state.alias("s"), batch.alias("b")
    joined = s.join(b, ["pool_address", "order_id"], "full_outer")
    cols = [F.col("pool_address"), F.col("order_id")]
    for f in _FIELDS:
        cols.append(F.greatest(F.col(f"s.p_{f}"), F.col(f"b.p_{f}")).alias(f"p_{f}"))
    cols += [
        F.least(F.col("s.created_ts"), F.col("b.created_ts")).alias("created_ts"),
        F.greatest(F.col("s.created_seq"), F.col("b.created_seq")).alias("created_seq"),
        F.greatest(F.col("s.has_created"), F.col("b.has_created")).alias("has_created"),
    ]
    return joined.select(*cols)


def materialize_orders(partial: DataFrame) -> DataFrame:
    """Partial state → the user-facing `orders` table (same shape as the
    batch fold): unwrap the (seq, v) pairs, keep only created orders."""
    cols = [F.col("pool_address"), F.col("order_id")]
    rename = dict(zip(_FIELDS, ("trader", "price", "amount", "filled",
                                "remaining_amount", "order_type", "active")))
    for f, out in rename.items():
        cols.append(F.col(f"p_{f}.v").alias(out))
    cols += [F.col("created_ts"), F.col("created_seq")]
    return partial.where(F.col("has_created") == 1).select(*cols)


class ParquetStateStore:
    """Versioned parquet state table with TWO commit granularities:

    - ``commit(df, n)`` writes the FULL state as `v{n}` — atomic and
      self-contained, but O(state) per batch (the round-14/15/16 scale
      flaw, VERDICT r16 item 3);
    - ``commit_delta(df, n)`` writes only this batch's PARTIAL as `d{n}` —
      O(batch) per commit. Readers reconstruct: the state at version n is
      ``combine(newest full v{m<=n} ∪ d{m+1} ∪ ... ∪ d{n})``, where
      ``combine`` is the store's keyed monoid fold (constructor arg; None
      means append-only, i.e. the state IS the union). Every state this
      engine streams is such a monoid (the fold's max-by-seq pairs, the
      band index's MIN semilattice, the sketch SUM/MAX grids, the flag
      appends), so per-batch work drops from read-S + merge + write-S to
      write-batch — the "partitioned append + periodic compaction keyed
      on the batch id" design. ``compact()`` is the compaction: it
      materializes the pointer state as a full `v{n}` so ``vacuum`` can
      retire the subsumed deltas.

    In both cases the pointer file flips last (never read and overwrite
    the same files in one job), batch ids are monotonic within one
    checkpoint lineage, and the replay guard (``already_applied``) is
    unchanged. At cluster scale the same layout maps onto a Delta/Iceberg
    table (deltas = appended files, compact = rewrite_data_files)."""

    def __init__(self, root: str, run_id: str | None = None, combine=None):
        """`run_id` (optional) binds this store handle to one streaming
        checkpoint's identity (callers pass the checkpoint dir). Batch ids
        are only monotonic WITHIN one checkpoint lineage — a fresh
        checkpoint restarts them at 0, so replaying a fresh stream onto an
        already-committed store would silently skip every batch (the
        `already_applied` guard would read them all as replays). Recording
        the identity at first commit turns that mismatch into a loud
        error instead.

        `combine` (optional) folds a UNION of state partials into the
        state: one keyed aggregate, or None for append-only stores (the
        state IS the union). It must be a commutative/associative fold
        whose partials carry unique keys — so combine(x) == x on any
        already-folded frame; every merge this engine streams has that
        form, and the chunk-invariance oracles pin the equivalence."""
        self.root = root
        self.run_id = run_id
        self.combine = combine
        os.makedirs(root, exist_ok=True)

    @property
    def _ptr(self) -> str:
        return os.path.join(self.root, "LATEST")

    @property
    def _run_file(self) -> str:
        return os.path.join(self.root, "RUN_ID")

    def _recorded_run_id(self) -> str | None:
        if not os.path.exists(self._run_file):
            return None
        with open(self._run_file) as fh:
            return fh.read().strip()

    def _ids(self, prefix: str) -> list[int]:
        out = []
        for name in os.listdir(self.root):
            m = re.fullmatch(prefix + r"(\d+)", name)
            if m is not None:
                out.append(int(m.group(1)))
        return sorted(out)

    def latest(self, spark: SparkSession) -> DataFrame | None:
        b = self.committed_version()
        if b is None:
            return None
        return self._state_at(spark, b)

    def at_version(self, spark: SparkSession, batch_id: int) -> DataFrame:
        """Time travel: the state as of micro-batch `batch_id` — a full
        `v{batch_id}` snapshot if one exists, else the newest full at or
        below it plus the delta chain up to it (the plain-parquet form of
        Delta/Iceberg snapshot reads). A vacuumed (or never-committed)
        version fails loudly here, not with a deep Spark path error."""
        return self._state_at(spark, batch_id)

    def _state_at(self, spark: SparkSession, b: int) -> DataFrame:
        fulls = [m for m in self._ids("v") if m <= b]
        base = max(fulls) if fulls else None
        if base == b:
            return spark.read.parquet(os.path.join(self.root, f"v{b}"))
        lo = 0 if base is None else base + 1
        deltas = [i for i in self._ids("d") if lo <= i <= b]
        missing = set(range(lo, b + 1)) - set(deltas)
        if missing:
            raise ValueError(
                f"state version {b} is not readable; committed "
                f"versions: {self.versions()} (older versions are removed "
                "by vacuum(keep_last=...))"
            )
        frames = [] if base is None else [os.path.join(self.root, f"v{base}")]
        frames += [os.path.join(self.root, f"d{i}") for i in deltas]
        df = spark.read.parquet(frames[0])
        for path in frames[1:]:
            df = df.unionByName(spark.read.parquet(path))
        if len(frames) > 1 and self.combine is not None:
            df = self.combine(df)
        return df

    def versions(self) -> list[int]:
        """Committed version numbers still readable from disk, ascending
        (full `v{n}` snapshots and `d{n}` delta commits alike)."""
        return sorted(set(self._ids("v")) | set(self._ids("d")))

    def _reconstructible(self, b: int, fulls: set[int], deltas: set[int]) -> bool:
        """Would version `b` still read given only these dirs on disk?"""
        base = max((m for m in fulls if m <= b), default=None)
        if base == b:
            return True
        lo = 0 if base is None else base + 1
        return not (set(range(lo, b + 1)) - deltas)

    def compact(self, spark: SparkSession) -> int | None:
        """Compaction: materialize the pointer state as a full `v{n}`
        snapshot (idempotent — overwrite), so vacuum() can retire the
        delta chain that produced it. Returns the compacted version."""
        b = self.committed_version()
        if b is None or b in self._ids("v"):
            return b
        state = self._state_at(spark, b)
        state.write.mode("overwrite").parquet(os.path.join(self.root, f"v{b}"))
        return b

    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Retention: delete version directories not needed to read the
        newest `keep_last` versions (SCALE.md §6 — without this a
        long-running stream accumulates state unboundedly). The pointer
        target always survives, even if it is older than the cut (a
        concurrent commit may not have flipped LATEST yet when the newest
        directory appeared), and a `v{n}`/`d{n}` directory that a KEPT
        version still reconstructs through is never removed — on a
        delta-committed store, run compact() first to retire the chain.
        Returns the removed version numbers."""
        if keep_last < 1:
            raise ValueError(f"keep_last must be >= 1, got {keep_last}")
        vs = self.versions()
        keep = set(vs[-keep_last:])
        ptr = self.committed_version()
        if ptr is not None:
            keep.add(ptr)
        fulls = set(self._ids("v"))
        deltas = set(self._ids("d"))
        removed = set()
        # sweep DIRECTORIES oldest-first (deltas before their compacted
        # fulls at the same id): a dir goes iff every kept version still
        # reconstructs without it
        for kind, v in sorted(
            [("d", v) for v in deltas] + [("v", v) for v in fulls],
            key=lambda kv: (kv[1], kv[0]),
        ):
            f2 = fulls - {v} if kind == "v" else fulls
            d2 = deltas - {v} if kind == "d" else deltas
            if all(self._reconstructible(k, f2, d2) for k in keep):
                shutil.rmtree(os.path.join(self.root, f"{kind}{v}"))
                fulls, deltas = f2, d2
                if not (v in fulls or v in deltas):
                    removed.add(v)
        return sorted(removed)

    def _check_lineage(self, action: str) -> None:
        """Raise if this bound handle and a COMMITTED store disagree on
        lineage. Only the pointer makes a store owned: a torn first
        commit (v0 + RUN_ID written, LATEST never flipped) is logically
        empty and a new lineage may take it over."""
        recorded = self._recorded_run_id()
        if (
            self.run_id is not None
            and recorded is not None
            and recorded != self.run_id
            and self.committed_version() is not None
        ):
            raise RuntimeError(
                f"state store {self.root} was committed under a different "
                f"streaming checkpoint ({recorded!r} != {self.run_id!r}); "
                f"refusing to {action} across lineages — batch ids are "
                "only monotonic within one checkpoint. Use a new state_dir "
                "or resume the original checkpoint."
            )

    def commit(self, df: DataFrame, batch_id: int) -> None:
        """Commit `df` as the FULL state at `batch_id` (O(state) write)."""
        self._commit_dir(df, batch_id, "v")

    def commit_delta(self, df: DataFrame, batch_id: int) -> None:
        """Commit `df` as this batch's PARTIAL state (O(batch) write) —
        readers fold the delta chain through `combine` (see class doc).
        Same atomicity and replay discipline as commit(): the delta dir is
        overwritten idempotently, the pointer flips last."""
        self._commit_dir(df, batch_id, "d")

    def _commit_dir(self, df: DataFrame, batch_id: int, kind: str) -> None:
        # a bound handle never merges onto a foreign lineage's committed
        # state — without this, a mis-pointed stream whose batch ids run
        # AHEAD of the pointer would silently corrupt the store (the
        # already_applied guard alone only catches ids at-or-behind it)
        self._check_lineage("commit")
        version = f"v{batch_id}"
        df.write.mode("overwrite").parquet(
            os.path.join(self.root, f"{kind}{batch_id}")
        )
        if self.run_id is not None and (
            self._recorded_run_id() is None or self.committed_version() is None
        ):
            # claim (or re-claim after a torn first commit) the store
            rtmp = self._run_file + ".tmp"
            with open(rtmp, "w") as fh:
                fh.write(self.run_id)
            os.replace(rtmp, self._run_file)
        tmp = self._ptr + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(version)
        os.replace(tmp, self._ptr)

    def committed_version(self) -> int | None:
        """The batch id the LATEST pointer currently names, or None before
        the first commit. Only the pointer counts: a `v{n}` directory
        without a flipped pointer is a torn commit and must be redone."""
        if not os.path.exists(self._ptr):
            return None
        with open(self._ptr) as fh:
            return int(fh.read().strip().lstrip("v"))

    def already_applied(self, batch_id: int) -> bool:
        """Replay guard (exactly-once over at-least-once foreachBatch):
        True iff the committed state already reflects `batch_id`. A
        foreachBatch job that dies AFTER store.commit() but BEFORE the
        streaming checkpoint commits gets the same batch re-delivered on
        restart with the same batch_id (the Structured Streaming replay
        contract); merging it again would double-count. Batch ids are
        monotonic, so pointer >= batch_id means this batch (and everything
        before it) is in. A torn commit — `v{batch_id}` written, pointer
        not flipped — returns False so the replay re-merges off the old
        pointer and rewrites the directory (write mode is overwrite).

        The pointer-vs-batch-id comparison is only sound within ONE
        checkpoint lineage: a FRESH checkpoint restarts batch ids at 0, so
        a committed store fed by a new stream would read every batch as a
        replay and silently return stale state. When both this handle and
        a COMMITTED store carry a run id (see __init__) and they disagree,
        raise instead of proceeding — regardless of whether the incoming
        batch id is behind the pointer (would silently skip) or ahead of
        it (commit would silently merge across lineages; the commit path
        re-checks too)."""
        self._check_lineage("touch")
        last = self.committed_version()
        return last is not None and last >= batch_id


def make_fold_on_batch(store: ParquetStateStore, retain_versions: int | None = None):
    """The foreachBatch body for the incremental order fold, factored out
    so the replay path is unit-testable: guarded by
    ``store.already_applied`` (skip re-delivered batches), then
    partial-fold → merge → commit → optional vacuum."""

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        if store.already_applied(batch_id):
            return
        batch_state = partial_fold(batch_df)
        current = store.latest(batch_df.sparkSession)
        merged = batch_state if current is None else merge_partials(current, batch_state)
        store.commit(merged, batch_id)
        if retain_versions is not None:
            store.vacuum(keep_last=retain_versions)

    return on_batch


# py4j's CALLBACK channel (the JVM→Python path every foreachBatch batch
# rides) occasionally dies with a reset/garbled socket under local[32]
# load — observed as "Error while sending a command" / "Received empty
# command" / "Connection reset" wrapped in FOREACH_BATCH_USER_FUNCTION_
# ERROR. It is an infrastructure flake, not a data error, and every
# foreachBatch in this repo is built to survive a restart anyway: the
# checkpoint resumes the stream and the state store's replay guard
# (`already_applied`, torn-commit re-merge) makes re-delivered batches
# exactly-once. So the house policy is: retry the stream, never the data.
_TRANSIENT_PY4J = (
    "Error while sending a command",
    "Received empty command",
    "Connection reset",
    "Py4JNetworkException",
)


def is_transient_py4j(exc: BaseException) -> bool:
    msg = str(exc)
    return any(t in msg for t in _TRANSIENT_PY4J)


# Raised by start_query() when a stalled predecessor's stop() failed or
# exceeded its stopTimeout and the JVM-side query is still winding down:
# starting on the same checkpoint reports the query as already active.
# Retryable by construction — the stall path above already waited
# (bounded) for isActive to clear, so by the next attempt the handle has
# normally been released.
_RETRYABLE_START = (
    "already active",
    "CONCURRENT_QUERY",
)


def is_retryable_start(exc: BaseException) -> bool:
    msg = str(exc)
    return any(t in msg for t in _RETRYABLE_START)


class StreamStalled(RuntimeError):
    """An active stream made no progress for the stall window — the
    silent twin of the transient py4j flake: the callback channel can
    also WEDGE (no exception, the JVM-side batch blocks on a Python
    invocation that never answers), which a bare awaitTermination() waits
    on forever. Raised after q.stop() so the checkpoint-resuming retry
    path treats it exactly like the noisy flake."""


# Generous: the whole sketch family runs in <30 s, so 300 s is a 10x
# margin — sized against the false-positive cost, because lastProgress
# only advances at BATCH completion: a healthy batch that simply runs
# long looks identical to a wedge, and stopping it re-does its work from
# the checkpoint on every retry. The wedge case stays bounded at
# attempts x window instead of infinite.
_STALL_WINDOW_S = 300.0


def _await_bounded(
    q, stall_s: float = _STALL_WINDOW_S, settle_s: float = 30.0
) -> None:
    """awaitTermination with liveness: poll in 5 s slices and track the
    last committed batchId via lastProgress. An ACTIVE query whose
    progress is frozen for `stall_s` is stopped and reported as
    StreamStalled (the retry resumes its checkpoint). A query exception
    still surfaces through awaitTermination's own raise."""
    import time as _time

    last_mark = None  # (batchId, runId) of the newest progress seen
    last_change = _time.monotonic()
    while True:
        if q.awaitTermination(5):
            return
        prog = q.lastProgress
        mark = (prog.get("batchId"), prog.get("runId")) if prog else None
        if mark != last_mark:
            last_mark = mark
            last_change = _time.monotonic()
        elif _time.monotonic() - last_change > stall_s:
            try:
                q.stop()
            except Exception:
                pass  # the retry's fresh start supersedes a wedged stop
            # A failed or timed-out stop() can leave the query ACTIVE, and
            # the retry's start on the same checkpoint would then fail with
            # the non-transient CONCURRENT_QUERY error instead of resuming.
            # Wait (bounded by settle_s) for the handle to clear before
            # handing control to the retry; if it never clears, the retry's
            # start-side 'already active' match keeps the remaining attempts.
            deadline = _time.monotonic() + settle_s
            while _time.monotonic() < deadline:
                try:
                    if not q.isActive:
                        break
                except Exception:
                    break  # dead handle == not active
                _time.sleep(min(1.0, settle_s / 4))
            raise StreamStalled(
                f"stream made no progress for {stall_s:.0f}s "
                f"(last batch mark {last_mark}); stopped for retry"
            )


def await_stream_with_retry(start_query, attempts: int = 3, backoff_s: float = 2.0):
    """Start + await an availableNow stream via `start_query()` (a thunk
    returning a started StreamingQuery), retrying on the transient py4j
    callback-channel failure documented above — in BOTH its forms: the
    noisy one (socket reset surfaces as an exception) and the silent one
    (the channel wedges and the stream freezes mid-batch; detected by the
    bounded await's stall window). Starting the stream is itself a py4j
    round-trip, so the start call sits INSIDE the retry.

    Exactly-once across retries holds only if the thunk re-uses the SAME
    checkpoint (and state) directory on every call — writer.start-style
    thunks and the work=-pinned sketch starters do; a thunk that mints a
    fresh checkpoint per call would recompute from scratch and must not
    be passed here."""
    import sys as _sys
    import time as _time

    last: BaseException | None = None
    for attempt in range(attempts):
        try:
            q = start_query()
            _await_bounded(q)
            return
        except StreamStalled as e:
            last = e
            # every swallowed recovery prints: a bench wave or verify run
            # that paid a stall window must say so in its log, or the
            # next timing disposition is guesswork (SCALE.md r15). On the
            # final attempt no retry follows — say so, and skip the
            # pointless backoff sleep before the re-raise (ADVICE r15).
            if attempt == attempts - 1:
                print(
                    f"await_stream_with_retry: attempt {attempt + 1}/"
                    f"{attempts} stalled, giving up after {attempts} "
                    f"attempts: {e}",
                    file=_sys.stderr,
                    flush=True,
                )
                break
            print(
                f"await_stream_with_retry: attempt {attempt + 1}/{attempts} "
                f"stalled, resuming from checkpoint: {e}",
                file=_sys.stderr,
                flush=True,
            )
            _time.sleep(backoff_s)
        except Exception as e:
            if not (is_transient_py4j(e) or is_retryable_start(e)):
                raise
            last = e
            if attempt == attempts - 1:
                print(
                    f"await_stream_with_retry: attempt {attempt + 1}/"
                    f"{attempts} hit transient py4j failure, giving up "
                    f"after {attempts} attempts: {type(e).__name__}",
                    file=_sys.stderr,
                    flush=True,
                )
                break
            print(
                f"await_stream_with_retry: attempt {attempt + 1}/{attempts} "
                f"hit transient py4j failure, restarting: "
                f"{type(e).__name__}",
                file=_sys.stderr,
                flush=True,
            )
            _time.sleep(backoff_s)
    assert last is not None
    raise last


def commit_seed_state(
    store: ParquetStateStore,
    batch_id: int,
    seed_df: DataFrame,
    expected_rows: int,
    what: str,
) -> None:
    """Freeze batch 0's seed state (an IVF coarse quantizer, a PQ
    sub-codebook — any id-windowed bootstrap artifact) into `store`,
    verifying completeness BEFORE the commit.

    The count must run on the un-committed seed DataFrame: counting the
    store AFTER commit (the original guard shape, ADVICE r13) leaves a
    hole — a transient py4j failure between the commit and the count
    replays batch 0, `latest()` is no longer None, the freeze branch is
    skipped, and the run proceeds on the committed incomplete codebook
    with no error. Raising pre-commit means an incomplete seed state is
    never persisted, so every replay re-derives the seed set and re-hits
    this check. Every streaming ingest that freezes batch-0 state MUST go
    through this helper (or carry a written no-freeze note) —
    tests/test_streaming.py audits the foreachBatch sites statically."""
    n_seed = seed_df.count()
    if n_seed != expected_rows:
        raise ValueError(
            f"{what} seed batch incomplete: batch 0 carried {n_seed} of "
            f"the {expected_rows} seed rows; increase the batch size or "
            f"reduce chunks"
        )
    store.commit(seed_df, batch_id)


def run_incremental_fold(
    spark: SparkSession,
    events_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    retain_versions: int | None = None,
) -> ParquetStateStore:
    """Drive the stream to completion (availableNow) maintaining the state
    store; returns the store (materialize with `materialize_orders`).

    `events_stream` must be a *streaming* DataFrame with order_events shape.
    `retain_versions=N` applies the vacuum retention policy after every
    commit (keep the newest N snapshots) — the long-running-stream setting;
    the default None keeps full history for time travel.
    """
    store = ParquetStateStore(state_dir, run_id=checkpoint_dir)
    on_batch = make_fold_on_batch(store, retain_versions=retain_versions)
    writer = (
        events_stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    await_stream_with_retry(writer.start)
    return store
