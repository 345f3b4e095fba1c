"""Gate query for the streaming layer: the incremental fold, driven to
completion with an availableNow trigger, must equal the batch fold — so it
shares the batch `orders_state` DuckDB oracle verbatim. This is the
strongest available check for a streaming operator: full value parity
against a SQL oracle, not a rows-only smoke."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_server_spark.catalog import load_table
from hive_server_spark.operators.fold import ORDER_UPDATES_CTE, ORDERS_STATE_CTE
from hive_server_spark.registry import register
from hive_server_spark.session import session_scratch
from hive_server_spark.sources.synthetic import (
    ORDER_EVENTS_CTE,
    ORDER_EVENTS_SQL,
    order_events,
)
from hive_server_spark.streaming.incremental import (
    _await_bounded,
    materialize_orders,
    run_incremental_fold,
)
from hive_server_spark.streaming.windows import hourly_rollup_stream, session_stream

_ORACLE = (
    f"WITH {ORDER_EVENTS_CTE}, {ORDER_UPDATES_CTE}, {ORDERS_STATE_CTE}"
    + """
SELECT pool_address, order_id, trader,
       CAST(price AS DOUBLE)            AS price,
       CAST(amount AS DOUBLE)           AS amount,
       CAST(filled AS DOUBLE)           AS filled,
       CAST(remaining_amount AS DOUBLE) AS remaining_amount,
       order_type, active,
       CAST(created_ts AS DATE)         AS created_date,
       created_seq
FROM orders_state
"""
)


def _land_order_events(spark: SparkSession, sf_dir: str, chunks: int) -> str:
    """Land order_events as `chunks` parquet files once per (session, sf_dir,
    chunks) — the landing is deterministic input, so every streaming gate
    query over it (incremental fold, stateful fold) shares one write; only
    checkpoints/state are per-run."""

    def land() -> str:
        ev_dir = os.path.join(tempfile.mkdtemp(dir=session_scratch("oe_land")), "events")
        order_events(spark, sf_dir).repartition(chunks).write.parquet(ev_dir)
        return ev_dir

    return _LANDED.get_or_create(spark, ("order_events", sf_dir, chunks), land)


def streamed_orders_state(
    spark: SparkSession, sf_dir: str, chunks: int = 2
) -> DataFrame:
    # chunks=2 keeps the gate query genuinely multi-batch while halving its
    # fixed cost; chunk-count invariance itself is pinned by
    # tests/test_streaming.py at 1 and 3 chunks.
    """Run the full streaming pipeline: derive order_events, land them as
    `chunks` parquet files, stream them through the incremental fold
    (maxFilesPerTrigger=1 → one micro-batch per file), return the
    materialized orders state."""
    work = tempfile.mkdtemp(dir=session_scratch("stream"))
    ev_dir = _land_order_events(spark, sf_dir, chunks)
    schema = spark.read.parquet(ev_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ev_dir)
    )
    with _scoped_shuffle_partitions(spark):
        store = run_incremental_fold(
            spark,
            stream,
            state_dir=os.path.join(work, "state"),
            checkpoint_dir=os.path.join(work, "ckpt"),
        )
    return materialize_orders(store.latest(spark))


# ---------------------------------------------------------------------------
# Watermarked tumbling-window aggregation, driven as a real append-mode
# stream (SURVEY ST2). The oracle encodes the watermark contract itself:
# a window is emitted iff its end <= final watermark (= max event time −
# delay), so the HAVING clause below IS the late-data policy, cross-checked.
# ---------------------------------------------------------------------------
# The state-store partition count is fixed from this conf when a stream
# starts; at gate scale large counts are pure overhead. Results are
# partition-count invariant (pinned by tests/test_streaming.py chunk
# invariance) — a latency knob only.
from hive_server_spark.session import scoped_shuffle_partitions as _scoped_shuffle_partitions


_HOURLY_STREAM_ORACLE = """
SELECT date_trunc('hour', ts) AS bucket, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
HAVING epoch_us(date_trunc('hour', ts) + INTERVAL 1 HOUR)
       <= (SELECT epoch_us(max(ts)) - 1000000 FROM events)
"""


# landed ts-ordered event files, shared across the streaming gate queries —
# each run still gets its own checkpoint/sink dirs, but the (identical)
# landing write happens once per (session, sf_dir); evicted landings have
# their temp dirs deleted so long-lived processes don't leak disk
from hive_server_spark.session_cache import SessionCache

_LANDED: SessionCache[str] = SessionCache(
    on_evict=lambda d: shutil.rmtree(os.path.dirname(d), ignore_errors=True)
)


def _stamp_ascending_mtimes(paths: list[str]) -> None:
    """Ascending mtimes over `paths`, the ONE ordering contract every
    landing shares: the file stream source replays files in
    modification-time order, and files written by one job share an mtime,
    making delivery order arbitrary without the stamp (ts-ordered event
    streams, the seq-slice version numbering, doc_id-ordered ingest)."""
    base = time.time() - 1_000
    for i, p in enumerate(paths):
        os.utime(p, (base + 10 * i, base + 10 * i))


def _land_events_ts_ordered(spark: SparkSession, sf_dir: str, chunks: int) -> str:
    def land() -> str:
        ev_dir = os.path.join(tempfile.mkdtemp(dir=session_scratch("land")), "events")
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        ev.repartitionByRange(chunks, "ts").write.parquet(ev_dir)
        _stamp_ascending_mtimes(sorted(glob.glob(os.path.join(ev_dir, "part-*.parquet"))))
        return ev_dir

    return _LANDED.get_or_create(spark, ("events_ts", sf_dir, chunks), land)


def _events_stream_in_ts_order(
    spark: SparkSession, sf_dir: str, chunks: int = 2
) -> tuple[DataFrame, str]:
    """Stream over events landed range-partitioned by ts into `chunks`
    files with ascending mtimes, so the file source replays them in
    event-time order (range k+1 never regresses behind the watermark raised
    by range k — zero late drops by construction). Returns (stream, a fresh
    per-run workdir for checkpoints).

    Zero-late ordering is load-bearing for oracle soundness: Spark's
    watermark guarantee is one-directional — data within the delay is
    guaranteed to aggregate, but *too-late* data "may or may not" be dropped
    (empirically on 4.1.2, a below-watermark row whose window has no live
    state still creates state and emits — verified with a newest-half-first
    landing). A drop-policy oracle is therefore unspecifiable; only in-order
    landings give the streaming gates a deterministic answer."""
    ev_dir = _land_events_ts_ordered(spark, sf_dir, chunks)
    work = tempfile.mkdtemp(dir=session_scratch("stream"))
    schema = spark.read.parquet(ev_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ev_dir)
    )
    return stream, work


def _start_append_stream(spark: SparkSession, out: DataFrame, work: str):
    """Start (without awaiting) an append-mode stream into a memory sink;
    returns (StreamingQuery, sink name). Callers await and then read
    ``spark.table(sink)`` — the final no-data micro-batch advances the
    watermark past every closed window and flushes the remaining state."""
    sink = f"stream_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    return q, sink


def _run_append_stream(spark: SparkSession, out: DataFrame, work: str) -> DataFrame:
    """Drive an append-mode streaming DataFrame to completion (availableNow)
    into a memory sink."""
    with _scoped_shuffle_partitions(spark):
        q, sink = _start_append_stream(spark, out, work)
        # bounded await (not bare awaitTermination): memory-sink streams
        # don't cross the py4j callback channel, but the stall window still
        # turns any silent wedge into a loud StreamStalled instead of an
        # unbounded block (no retry wrapper here — these availableNow
        # drivers are deterministic re-runs, so failing fast is correct)
        _await_bounded(q)
    return spark.table(sink)


def _out_hourly_rollup(
    spark: SparkSession, sf_dir: str, chunks: int = 2, watermark: str = "1 second"
) -> tuple[DataFrame, str]:
    stream, work = _events_stream_in_ts_order(spark, sf_dir, chunks)
    return hourly_rollup_stream(stream, watermark=watermark), work


def streamed_hourly_rollup(
    spark: SparkSession, sf_dir: str, chunks: int = 2, watermark: str = "1 second"
) -> DataFrame:
    """The watermarked hourly rollup as an actual append-mode stream."""
    return _run_append_stream(
        spark, *_out_hourly_rollup(spark, sf_dir, chunks, watermark)
    )


@register("evt_hourly_rollup_streaming", _HOURLY_STREAM_ORACLE)
def q_evt_hourly_rollup_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _evt_streaming_results(spark, sf_dir)["evt_hourly_rollup_streaming"]


# ---------------------------------------------------------------------------
# Native session windows (session_window(ts, gap)) as an append-mode stream.
# The oracle is the BATCH island-numbering sessionization (lag → flag →
# prefix sum — an entirely different algorithm) plus the watermark contract:
# a session is emitted iff its end (= last event + gap) <= final watermark.
# Session merging across micro-batch boundaries is exercised for real: a
# session spanning two chunks exists as partial state until the gap closes.
# Boundary semantics: session_window treats [start, last+gap) as half-open —
# an event at exactly gap distance starts a NEW session — so the oracle
# flags a new island on gap_us >= gap, not >.
# ---------------------------------------------------------------------------
_SESSIONS_STREAM_ORACLE = """
WITH seq AS (
  SELECT user_id, event_id, ts, value,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
), flagged AS (
  SELECT *, CASE WHEN gap_us IS NULL OR gap_us >= 1800000000 THEN 1 ELSE 0 END AS is_new
  FROM seq
), numbered AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id,
       MIN(ts)                       AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE  AS session_end,
       CAST(COUNT(*) AS BIGINT)      AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM numbered
GROUP BY user_id, session_no
HAVING epoch_us(MAX(ts)) + 1800000000
       <= (SELECT epoch_us(max(ts)) - 1000000 FROM events)
"""


def _out_sessions(
    spark: SparkSession, sf_dir: str, chunks: int = 2
) -> tuple[DataFrame, str]:
    stream, work = _events_stream_in_ts_order(spark, sf_dir, chunks)
    return session_stream(stream, gap="30 minutes", watermark="1 second"), work


def streamed_sessions(
    spark: SparkSession, sf_dir: str, chunks: int = 2
) -> DataFrame:
    return _run_append_stream(spark, *_out_sessions(spark, sf_dir, chunks))


@register("evt_sessions_streaming", _SESSIONS_STREAM_ORACLE)
def q_evt_sessions_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _evt_streaming_results(spark, sf_dir)["evt_sessions_streaming"]


# ---------------------------------------------------------------------------
# Watermarked stream-stream band join (SURVEY ST2/ST3 composition): two
# event streams co-join on user within ±10 minutes of event time. Both
# sides carry watermarks and the time-range predicate bounds join state —
# rows age out of state once the partner watermark passes ts + band, which
# is the ONLY way an unbounded stream-stream join survives at scale. The
# ts-ordered replay keeps both sides time-aligned, so no match is lost to
# eviction, and the emitted set equals the batch band join exactly.
# ---------------------------------------------------------------------------
_SSJOIN_ORACLE = """
SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
       epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
FROM events a JOIN events b
  ON a.user_id = b.user_id AND a.event_id % 2 = 0 AND b.event_id % 2 = 1
 AND b.ts BETWEEN a.ts - INTERVAL 10 MINUTE AND a.ts + INTERVAL 10 MINUTE
"""


def _out_band_join(
    spark: SparkSession, sf_dir: str, chunks: int = 2, band: str = "10 MINUTES"
) -> tuple[DataFrame, str]:
    stream_a, work = _events_stream_in_ts_order(spark, sf_dir, chunks)
    # second reader over the same landed files: both sides replay the same
    # micro-batch sequence, so their watermarks advance in lockstep
    ev_dir = _land_events_ts_ordered(spark, sf_dir, chunks)
    schema = spark.read.parquet(ev_dir).schema
    stream_b = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ev_dir)
    )
    a = (
        stream_a.where(F.col("event_id") % 2 == 0)
        .select(
            F.col("event_id").alias("a_id"),
            "user_id",
            F.col("ts").alias("a_ts"),
        )
        .withWatermark("a_ts", "1 second")
    )
    b = (
        stream_b.where(F.col("event_id") % 2 == 1)
        .select(
            F.col("event_id").alias("b_id"),
            F.col("user_id").alias("b_user"),
            F.col("ts").alias("b_ts"),
        )
        .withWatermark("b_ts", "1 second")
    )
    j = a.join(
        b,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("b_ts") >= F.col("a_ts") - F.expr(f"INTERVAL {band}"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {band}")),
        "inner",
    ).select(
        "user_id",
        "a_id",
        "b_id",
        (F.unix_micros("b_ts") - F.unix_micros("a_ts")).alias("gap_us"),
    )
    return j, work


def streamed_band_join(
    spark: SparkSession, sf_dir: str, chunks: int = 2, band: str = "10 MINUTES"
) -> DataFrame:
    return _run_append_stream(spark, *_out_band_join(spark, sf_dir, chunks, band))


@register("evt_stream_stream_join", _SSJOIN_ORACLE)
def q_evt_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _evt_streaming_results(spark, sf_dir)["evt_stream_stream_join"]


# ---------------------------------------------------------------------------
# Chained stateful streaming: at-ingest dedup → windowed rollup in ONE
# stream (Spark's multi-stateful-operator support). The landed input
# contains every event 2-3×; dropDuplicatesWithinWatermark collapses the
# copies (state bounded by the watermark horizon, the property that makes
# ingest dedup viable on an unbounded stream), and the downstream tumbling
# aggregate sees each event once — so the oracle is the rollup over
# DISTINCT events plus the usual emission contract.
# ---------------------------------------------------------------------------
_DEDUP_ROLLUP_ORACLE = """
SELECT date_trunc('hour', ts) AS bucket, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
WHERE user_id % 2 = 0
GROUP BY 1, 2
HAVING epoch_us(date_trunc('hour', ts) + INTERVAL 1 HOUR)
       <= (SELECT epoch_us(max(ts)) - 1000000
           FROM events WHERE user_id % 2 = 0)
"""


def _land_duplicated_events(spark: SparkSession, sf_dir: str, chunks: int) -> str:
    def land() -> str:
        ev_dir = os.path.join(tempfile.mkdtemp(dir=session_scratch("dedup_land")), "events")
        # half the user universe: the dedup semantics are unaffected and the
        # duplicated landing (2-3 copies per event) stays write-bound, not huge
        ev = (
            load_table(spark, sf_dir, "events")
            .where(F.col("user_id") % 2 == 0)
            .select("event_id", "ts", "user_id", "event_type", "value")
        )
        # land every event 2×, a third copy for every third event — duplicate
        # copies share a ts, so range partitioning keeps them in one micro-batch
        dup = ev.unionAll(ev).unionAll(ev.where(F.col("event_id") % 3 == 0))
        dup.repartitionByRange(chunks, "ts").write.parquet(ev_dir)
        _stamp_ascending_mtimes(sorted(glob.glob(os.path.join(ev_dir, "part-*.parquet"))))
        return ev_dir

    return _LANDED.get_or_create(spark, ("events_dup", sf_dir, chunks), land)


def _out_dedup_rollup(
    spark: SparkSession, sf_dir: str, chunks: int = 2
) -> tuple[DataFrame, str]:
    work = tempfile.mkdtemp(dir=session_scratch("dedup"))
    ev_dir = _land_duplicated_events(spark, sf_dir, chunks)
    schema = spark.read.parquet(ev_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ev_dir)
    )
    out = (
        stream.withWatermark("ts", "1 second")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("bucket"), "event_type", "n_events", "total_value"
        )
    )
    return out, work


def streamed_dedup_rollup(
    spark: SparkSession, sf_dir: str, chunks: int = 2
) -> DataFrame:
    return _run_append_stream(spark, *_out_dedup_rollup(spark, sf_dir, chunks))


@register("evt_dedup_rollup_streaming", _DEDUP_ROLLUP_ORACLE)
def q_evt_dedup_rollup_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _evt_streaming_results(spark, sf_dir)["evt_dedup_rollup_streaming"]


# ---------------------------------------------------------------------------
# Stream-static join: the streaming side enriches from a static dimension
# (re-resolved per micro-batch — the Spark pattern for slowly-changing
# dims), then aggregates per cohort. Oracle: the batch join + rollup.
# ---------------------------------------------------------------------------
_STREAM_STATIC_ORACLE = """
WITH dim AS (
  SELECT DISTINCT user_id, concat('U', CAST(user_id % 7 AS VARCHAR)) AS cohort
  FROM events
)
SELECT date_trunc('hour', e.ts) AS bucket, d.cohort,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events e JOIN dim d USING (user_id)
GROUP BY 1, 2
HAVING epoch_us(date_trunc('hour', e.ts) + INTERVAL 1 HOUR)
       <= (SELECT epoch_us(max(ts)) - 1000000 FROM events)
"""


def _out_static_enrich_rollup(
    spark: SparkSession, sf_dir: str, chunks: int = 2
) -> tuple[DataFrame, str]:
    stream, work = _events_stream_in_ts_order(spark, sf_dir, chunks)
    dim = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .withColumn(
            "cohort", F.concat(F.lit("U"), (F.col("user_id") % 7).cast("string"))
        )
    )
    out = (
        stream.withWatermark("ts", "1 second")
        .join(F.broadcast(dim), "user_id")
        .groupBy(F.window("ts", "1 hour").alias("win"), "cohort")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("win.start").alias("bucket"), "cohort", "n_events", "total_value")
    )
    return out, work


def streamed_static_enrich_rollup(
    spark: SparkSession, sf_dir: str, chunks: int = 2
) -> DataFrame:
    return _run_append_stream(
        spark, *_out_static_enrich_rollup(spark, sf_dir, chunks)
    )


@register("evt_stream_static_enrich", _STREAM_STATIC_ORACLE)
def q_evt_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _evt_streaming_results(spark, sf_dir)["evt_stream_static_enrich"]


# ---------------------------------------------------------------------------
# Time travel on the versioned state store: the orders state AS OF
# micro-batch 1 of 3. The landing splits the log at deterministic seq
# cutoffs (⌊max/3⌋, 2·⌊max/3⌋), so "state at v1" has an exact batch
# definition — the fold over seq <= 2·⌊max/3⌋ — which is what the oracle
# computes. This gates both the snapshot-read mechanism (every commit's
# v{n} stays readable) and the incremental fold's mid-stream correctness,
# not just its final convergence.
# ---------------------------------------------------------------------------
_TIME_TRAVEL_ORACLE = (
    "WITH order_events AS (\n  SELECT * FROM (\n"
    + ORDER_EVENTS_SQL
    + "\n) _oe WHERE seq <= 2*((SELECT max(event_id) FROM events)//3)\n), "
    + ORDER_UPDATES_CTE
    + ", "
    + ORDERS_STATE_CTE
    + """
SELECT pool_address, order_id, trader,
       CAST(price AS DOUBLE)            AS price,
       CAST(amount AS DOUBLE)           AS amount,
       CAST(filled AS DOUBLE)           AS filled,
       CAST(remaining_amount AS DOUBLE) AS remaining_amount,
       order_type, active,
       CAST(created_ts AS DATE)         AS created_date,
       created_seq
FROM orders_state
"""
)


def _land_seq_slices(spark: SparkSession, sf_dir: str) -> str:
    def land() -> str:
        # one derivation, one write: seq IS event_id (sources/synthetic.py),
        # so the cutoff probe is a max() over the raw events parquet
        # (footer-stats cheap) rather than a materialization of the full
        # order_events derivation; all three slices then land in a single
        # partitionBy job (repartition(3, slice) puts every row of a slice
        # in one task, so each slice=i directory holds exactly one part
        # file; partitionBy drops the helper column from the files). The
        # oracle side pins the same identity: its cutoffs are
        # (SELECT max(event_id) FROM events)//3.
        max_seq = (
            load_table(spark, sf_dir, "events")
            .agg(F.max("event_id"))
            .collect()[0][0]
        )
        c1, c2 = max_seq // 3, 2 * (max_seq // 3)
        land_root = tempfile.mkdtemp(dir=session_scratch("tt_land"))
        tmp = os.path.join(land_root, "sliced")
        (
            order_events(spark, sf_dir)
            .withColumn(
                "slice",
                F.when(F.col("seq") <= c1, 0)
                .when(F.col("seq") <= c2, 1)
                .otherwise(2),
            )
            .repartition(3, "slice")
            .write.partitionBy("slice")
            .parquet(tmp)
        )
        ev_dir = os.path.join(land_root, "events")
        os.makedirs(ev_dir)
        dsts = []
        for i in range(3):
            parts = glob.glob(os.path.join(tmp, f"slice={i}", "part-*.parquet"))
            # the three-file mtime layout (batch ids 0/1/2) is what the
            # time-travel oracle's version numbering is defined against — an
            # empty or multi-file slice would silently break it, so fail loud
            assert len(parts) == 1, (
                f"seq slice {i} of events({sf_dir}) wrote {len(parts)} part files "
                f"(expected exactly 1); the version-numbering contract of "
                f"orders_state_at_version requires one file per slice"
            )
            dst = os.path.join(ev_dir, f"{i:02d}.parquet")
            os.replace(parts[0], dst)
            dsts.append(dst)
        _stamp_ascending_mtimes(dsts)
        return ev_dir

    return _LANDED.get_or_create(spark, ("order_events_slices", sf_dir), land)


# one incremental fold over the 3-slice landing, shared by the whole
# CDC-family (orders_state_time_travel, cdc_book_snapshots,
# orders_state_changelog) — VERDICT r04 item 3: before this cache each of
# the three gate queries re-ran the same 3-micro-batch streaming fold
# (~9 s + 4 s + 4 s locally); now one fold-with-CDC run serves all three.
# The with-CDC variant commits the identical versioned state (same
# partial_fold/merge/commit per batch — streaming/cdc.py adds only the
# snapshot append), so at_version() readers are unaffected by sharing.
_FOLDED: SessionCache[tuple] = SessionCache(
    on_evict=lambda sc: shutil.rmtree(os.path.dirname(sc[1]), ignore_errors=True)
)


def fold_seq_slices(spark: SparkSession, sf_dir: str):
    """Run (once per session × sf_dir) the incremental fold + CDC over the
    deterministic 3-slice landing; returns (ParquetStateStore, cdc_dir)."""

    def build():
        from hive_server_spark.streaming.cdc import run_incremental_fold_with_cdc

        work = tempfile.mkdtemp(dir=session_scratch("ttfold"))
        ev_dir = _land_seq_slices(spark, sf_dir)
        schema = spark.read.parquet(ev_dir).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ev_dir)
        )
        with _scoped_shuffle_partitions(spark):
            store, cdc_dir = run_incremental_fold_with_cdc(
                spark,
                stream,
                state_dir=os.path.join(work, "state"),
                checkpoint_dir=os.path.join(work, "ckpt"),
                cdc_dir=os.path.join(work, "cdc"),
                depth=20,
            )
        return store, cdc_dir

    return _FOLDED.get_or_create(spark, ("seq_slice_fold", sf_dir), build)


def orders_state_at_version(
    spark: SparkSession, sf_dir: str, version: int = 1
) -> DataFrame:
    store, _cdc_dir = fold_seq_slices(spark, sf_dir)
    return materialize_orders(store.at_version(spark, version))


# ---------------------------------------------------------------------------
# The CUSTOM stateful operator form (SURVEY ST3/§2.10): the same keyed fold
# as applyInPandasWithState — per-(pool, order) Python state over Arrow
# batches, vectorized masks inside the group (never per-row loops). Update
# output mode emits a row per touched key per batch; the final state is the
# max-version row per key. Money is double here (exact for integer-valued
# amounts), so it shares the batch fold's oracle minus created_date.
# ---------------------------------------------------------------------------
_STATEFUL_ORACLE = (
    f"WITH {ORDER_EVENTS_CTE}, {ORDER_UPDATES_CTE}, {ORDERS_STATE_CTE}"
    + """
SELECT pool_address, order_id, trader,
       CAST(price AS DOUBLE)            AS price,
       CAST(amount AS DOUBLE)           AS amount,
       CAST(filled AS DOUBLE)           AS filled,
       CAST(remaining_amount AS DOUBLE) AS remaining_amount,
       order_type, active, created_seq
FROM orders_state
"""
)


def stateful_orders_state(
    spark: SparkSession, sf_dir: str, chunks: int = 2
) -> DataFrame:
    from pyspark.sql import Window

    from hive_server_spark.streaming.stateful import stateful_orders_stream

    work = tempfile.mkdtemp(dir=session_scratch("stateful"))
    ev_dir = _land_order_events(spark, sf_dir, chunks)
    schema = spark.read.parquet(ev_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ev_dir)
    )
    sink = f"stateful_{uuid.uuid4().hex[:8]}"
    with _scoped_shuffle_partitions(spark):
        q = (
            stateful_orders_stream(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        _await_bounded(q)  # stall-windowed await (see _run_append_stream)
    tbl = spark.table(sink)
    w = Window.partitionBy("pool_address", "order_id").orderBy(F.desc("version"))
    return (
        tbl.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "version")
    )


@register("orders_state_stateful", _STATEFUL_ORACLE)
def q_orders_state_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stateful_orders_state(spark, sf_dir).select(
        "pool_address", "order_id", "trader", "price", "amount", "filled",
        "remaining_amount", "order_type", "active", "created_seq",
    )


@register("orders_state_time_travel", _TIME_TRAVEL_ORACLE)
def q_orders_state_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = orders_state_at_version(spark, sf_dir, version=1)
    dbl = lambda c: F.col(c).cast("double").alias(c)  # noqa: E731
    return st.select(
        "pool_address",
        "order_id",
        "trader",
        dbl("price"),
        dbl("amount"),
        dbl("filled"),
        dbl("remaining_amount"),
        "order_type",
        "active",
        F.col("created_ts").cast("date").alias("created_date"),
        "created_seq",
    )


@register("orders_state_streaming", _ORACLE)
def q_orders_state_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = streamed_orders_state(spark, sf_dir)
    dbl = lambda c: F.col(c).cast("double").alias(c)  # noqa: E731
    return st.select(
        "pool_address",
        "order_id",
        "trader",
        dbl("price"),
        dbl("amount"),
        dbl("filled"),
        dbl("remaining_amount"),
        "order_type",
        "active",
        F.col("created_ts").cast("date").alias("created_date"),
        "created_seq",
    )


# ---------------------------------------------------------------------------
# Sliding (overlapping) windows as an append-mode stream: each event belongs
# to exactly size/slide = 4 windows. The oracle replicates Spark's epoch-
# aligned window assignment arithmetically — bucket_k = time_bucket(15min,
# ts) − k·15min for k in 0..3 — plus the same watermark finalization HAVING
# as the tumbling oracle, so assignment, overlap fan-out, and late-data
# policy are all value-checked.
# ---------------------------------------------------------------------------
_SLIDING_STREAM_ORACLE = """
WITH fanned AS (
  SELECT time_bucket(INTERVAL 15 MINUTE, ts) - k.k * INTERVAL 15 MINUTE AS bucket,
         event_type, value
  FROM events, unnest(generate_series(0, 3)) AS k(k)
)
SELECT bucket, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM fanned
GROUP BY bucket, event_type
HAVING epoch_us(bucket + INTERVAL 1 HOUR)
       <= (SELECT epoch_us(max(ts)) - 1000000 FROM events)
"""


from hive_server_spark.streaming.windows import sliding_rollup_stream  # noqa: E402


def _out_sliding_rollup(
    spark: SparkSession, sf_dir: str, chunks: int = 2
) -> tuple[DataFrame, str]:
    stream, work = _events_stream_in_ts_order(spark, sf_dir, chunks)
    return sliding_rollup_stream(stream, watermark="1 second"), work


@register("evt_sliding_rollup_streaming", _SLIDING_STREAM_ORACLE)
def q_evt_sliding_rollup_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _evt_streaming_results(spark, sf_dir)["evt_sliding_rollup_streaming"]


# ---------------------------------------------------------------------------
# Concurrent family execution (VERDICT r06 item 3 / round-5 stretch 7).
# The six evt_* streaming gates are six DIFFERENT stateful computations, so
# they cannot share one streaming query — but they CAN share wall clock:
# Spark runs any number of streaming queries concurrently on one session,
# so the first gate call starts ALL six (availableNow) and awaits them
# together; per-session results are cached the way the CDC family caches
# its fold (_FOLDED above). Family wall time drops from sum(6 harness
# spin-ups) to ~max(...), with zero semantic change — each query keeps its
# own landed input, checkpoint dir, memory sink, and oracle. The landed
# inputs themselves were already shared via _LANDED.
# A caller that wants ONE stream in isolation (chunk-invariance tests, a
# user embedding a single operator) uses the streamed_* functions, which
# still run serially standalone.
# ---------------------------------------------------------------------------
_EVT_STREAM_BUILDERS = {
    "evt_hourly_rollup_streaming": _out_hourly_rollup,
    "evt_sessions_streaming": _out_sessions,
    "evt_stream_stream_join": _out_band_join,
    "evt_dedup_rollup_streaming": _out_dedup_rollup,
    "evt_stream_static_enrich": _out_static_enrich_rollup,
    "evt_sliding_rollup_streaming": _out_sliding_rollup,
}

_EVT_RESULTS: SessionCache[dict] = SessionCache()


def _run_sketch_stream(spark: SparkSession, starter, sf_dir: str, prefix: str):
    """Start + await one foreachBatch sketch stream (CMS/HLL/CUSUM) with
    the initial start INSIDE the transient-py4j retry — starting a
    foreachBatch stream is itself a py4j round-trip (ADVICE r8). The work
    dir is minted once and pinned across attempts, so a retry resumes the
    SAME checkpoint + state exactly-once; returns the state store every
    attempt wrote through (same pinned dir → same store)."""
    from hive_server_spark.streaming.incremental import await_stream_with_retry

    work = tempfile.mkdtemp(dir=session_scratch(prefix.strip("_").removeprefix("hss_")))
    stores: list = []

    def thunk():
        q, store = starter(spark, sf_dir, work=work)
        stores.append(store)
        return q

    await_stream_with_retry(thunk, attempts=3)
    return stores[-1]


def _evt_streaming_results(spark: SparkSession, sf_dir: str) -> dict:
    """Run the whole evt_* streaming family concurrently once per
    (session, sf_dir); returns {query name: result DataFrame}."""

    def build() -> dict:
        with _scoped_shuffle_partitions(spark):
            running = []
            for name, builder in _EVT_STREAM_BUILDERS.items():
                out, work = builder(spark, sf_dir)
                q, sink = _start_append_stream(spark, out, work)
                running.append((name, q, sink))
            # The memory-sink streams above never call back into Python, so
            # they run as one concurrent wave. The foreachBatch sketch
            # streams DO (each micro-batch invokes a Python function over
            # py4j's callback channel), which flakes transiently under load
            # (see streaming/incremental.py::_TRANSIENT_PY4J). Policy: at
            # most ONE Python-callback stream in flight (cms rides the
            # append wave, hll starts after cms terminates), and each is
            # awaited through the checkpoint-resuming retry — the replay
            # guard makes re-delivered batches exactly-once.
            # Pinned work dirs: a transient py4j failure retries the SAME
            # checkpoint + state dir, so the resumed stream keeps committed
            # progress and the store handle the results are built from IS
            # the store the retry wrote to (a fresh dir per attempt would
            # leave the original store holding only pre-crash batches).
            # The INITIAL start call sits inside the retry too (ADVICE r8):
            # starting a foreachBatch stream is itself a py4j round-trip
            # and can fail just as transiently as a mid-stream batch.
            # CMS still rides the append wave: its start+await runs first,
            # while the memory-sink streams (already started above) drain
            # concurrently in the background.
            results = {}
            cms_store = _run_sketch_stream(spark, start_cms_stream, sf_dir, "hss_cms_")
            for name, q, sink in running:
                _await_bounded(q)  # stall-windowed (see _run_append_stream)
                results[name] = spark.table(sink)
            results["evt_cms_streaming"] = _cms_final(spark, cms_store)
            hll_store = _run_sketch_stream(spark, start_hll_stream, sf_dir, "hss_hll_")
            results["evt_hll_streaming"] = _hll_final(spark, hll_store)
            cusum_store = _run_sketch_stream(
                spark, start_cusum_stream, sf_dir, "hss_cusum_"
            )
            results["evt_cusum_streaming"] = _cusum_final(spark, cusum_store)
        return results

    return _EVT_RESULTS.get_or_create(spark, ("evt_streaming_family", sf_dir), build)


# ---------------------------------------------------------------------------
# Streaming corpus ingest (round 6): the LLM-pipeline × streaming
# intersection — a continuously-crawled corpus arrives in batches, and the
# exact-dedup index (per content fingerprint: canonical doc, group size,
# token mass) is maintained INCREMENTALLY, not recomputed. The per-batch
# partial is a fingerprint-keyed hash aggregate and the cross-batch merge
# is the monoid (min, sum, sum), so micro-batch boundaries can never
# change the answer (same invariance argument as the orders fold), the
# state store is the versioned/vacuumable ParquetStateStore, and the
# oracle is the plain batch GROUP BY — the streaming machinery must land
# exactly where one batch pass would. State scales with DISTINCT corpus
# content (the dedup index a 100 TB crawl maintains anyway), shuffles are
# fingerprint-keyed with map-side combine.
# ---------------------------------------------------------------------------
_DOCS_INGEST_ORACLE = """
SELECT md5(text) AS fingerprint_md5,
       CAST(MIN(doc_id) AS BIGINT) AS canonical_doc_id,
       CAST(COUNT(*) AS BIGINT)    AS group_size,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
FROM documents GROUP BY md5(text)
"""


def _docs_ingest_partial(batch: DataFrame) -> DataFrame:
    return batch.groupBy(F.md5("text").alias("fingerprint_md5")).agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count("*").alias("group_size"),
        F.sum(F.size(F.split("text", " "))).alias("total_tokens"),
    )


def _docs_ingest_merge(state: DataFrame, batch: DataFrame) -> DataFrame:
    return (
        state.unionByName(batch)
        .groupBy("fingerprint_md5")
        .agg(
            F.min("canonical_doc_id").alias("canonical_doc_id"),
            F.sum("group_size").alias("group_size"),
            F.sum("total_tokens").alias("total_tokens"),
        )
    )


def _land_documents(spark: SparkSession, sf_dir: str, chunks: int) -> str:
    """Documents range-partitioned by doc_id into `chunks` files with
    ascending mtimes (the _land_events_ts_ordered trick), so the file
    source replays them in doc_id order. The exact-dedup ingest index is
    a monoid and doesn't care; the near-dup index's per-batch flagging
    DOES (see docs_neardup_streaming block comment) — the file source
    orders by modification time, and same-write mtimes make the delivery
    order arbitrary."""

    def land() -> str:
        d = os.path.join(tempfile.mkdtemp(dir=session_scratch("docs_land")), "docs")
        load_table(spark, sf_dir, "documents").repartitionByRange(
            chunks, "doc_id"
        ).write.parquet(d)
        _stamp_ascending_mtimes(sorted(glob.glob(os.path.join(d, "part-*.parquet"))))
        return d

    return _LANDED.get_or_create(spark, ("documents", sf_dir, chunks), land)


@register("docs_ingest_streaming", _DOCS_INGEST_ORACLE)
def docs_ingest_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the corpus in doc_id-ordered chunks (one micro-batch per
    file) and maintain the exact-dedup index incrementally in a versioned
    parquet state store; return the final index, which must equal the
    batch GROUP BY."""
    from hive_server_spark.streaming.incremental import ParquetStateStore

    chunks = 2
    work = tempfile.mkdtemp(dir=session_scratch("docs_stream"))
    d = _land_documents(spark, sf_dir, chunks)
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    store = ParquetStateStore(os.path.join(work, "state"))

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        # no-freeze: exact-dedup ingest state is a pure content-derived
        # monoid — there is no batch-0 bootstrap artifact to freeze, so
        # commit_seed_state does not apply (static audit: test_streaming).
        # exactly-once over at-least-once replay: a crash between
        # store.commit and the checkpoint commit re-delivers this batch_id;
        # merging it twice would double-count group_size/total_tokens
        if store.already_applied(batch_id):
            return
        part = _docs_ingest_partial(batch_df)
        cur = store.latest(batch_df.sparkSession)
        merged = part if cur is None else _docs_ingest_merge(cur, part)
        store.commit(merged, batch_id)

    with _scoped_shuffle_partitions(spark):
        from hive_server_spark.streaming.incremental import (
            await_stream_with_retry,
        )

        writer = (
            stream.writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
        )
        await_stream_with_retry(writer.start)
    out = store.latest(spark)
    return out.select(
        "fingerprint_md5",
        F.col("canonical_doc_id").cast("bigint").alias("canonical_doc_id"),
        F.col("group_size").cast("bigint").alias("group_size"),
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# Streaming NEAR-dup index (round 9, VERDICT r8 item 3): the operator a
# continuous crawl pipeline runs next to the exact-dedup ingest index —
# maintain the MinHash LSH band buckets incrementally and flag each newly
# ingested document that lands in a band already occupied by an earlier
# document. Two state pieces, both in the versioned ParquetStateStore:
#
#   band state  — band_key → MIN(doc_id). A MIN semilattice (idempotent,
#     commutative, associative — like the HLL registers), so re-merging a
#     replayed batch could never change it; the replay guard still skips
#     replays so the flags table (which is append-shaped, NOT idempotent)
#     stays exactly-once.
#   flags       — per flagged doc: how many of its bands were occupied
#     and the smallest earlier doc sharing a band (its canonical
#     near-dup partner). Appended per batch AFTER the batch's own bands
#     are merged in, so two near-dup docs arriving in ONE batch flag the
#     later one identically to their arriving in different batches —
#     micro-batch boundaries can never change the answer, PROVIDED
#     ingestion is doc_id-ordered (the landed chunks are
#     repartitionByRange(doc_id), the same ordered-arrival contract the
#     evt_* streams have on ts): a band's min can then never drop below
#     an already-flagged doc after its batch.
#
# Under that contract the final flags table equals the batch LSH rule
# "doc d is a near-dup iff some band of d has min(doc_id) < d over the
# WHOLE corpus" — which is the oracle below, sharing every signature
# fragment with dedup_minhash_sigs/candidates. Scale: band state is the
# O(distinct bands) dedup index a 100 TB crawl maintains anyway (RocksDB/
# Delta MERGE in production — ParquetStateStore docstring); the per-batch
# work is one band-keyed map-side-combined agg + one band-keyed join of
# the batch against the index; flags are O(near-dups). Nothing all-pairs.
# ---------------------------------------------------------------------------
from hive_server_spark.plans.text_pack import (  # noqa: E402
    _SHINGLES_CTE_D,
    _TOKS_CTE_D,
    _band_cols_d,
    _band_union_d,
    _mh_cols_d,
)
from hive_server_spark.functions import text as _T  # noqa: E402

_DOCS_NEARDUP_ORACLE = f"""
WITH {_TOKS_CTE_D},
{_SHINGLES_CTE_D},
sigs AS (
  SELECT doc_id,
       {_mh_cols_d}
  FROM shingled
),
sigs_b AS (
  SELECT doc_id, {_band_cols_d}
  FROM sigs
),
bands AS ({_band_union_d}),
bmin AS (SELECT band_key, MIN(doc_id) AS min_id FROM bands GROUP BY band_key),
j AS (
  SELECT b.doc_id, m.min_id
  FROM bands b JOIN bmin m ON b.band_key = m.band_key
  WHERE m.min_id < b.doc_id
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_occupied_bands,
       CAST(MIN(min_id) AS BIGINT) AS partner_doc_id
FROM j GROUP BY doc_id
"""


def _doc_bands(docs_df: DataFrame) -> DataFrame:
    """doc_id → 4 prefixed LSH band keys ('{band}#mh_mh'), one row each —
    the same signatures dedup_minhash_sigs emits, exploded through the
    shared band_keys spelling (functions/text.py)."""
    return _T.band_keys(_T.minhash_signatures(docs_df))


def streamed_docs_neardup(
    spark: SparkSession, sf_dir: str, chunks: int = 2
) -> DataFrame:
    """Run the incremental near-dup index over the corpus landed in
    `chunks` doc_id-ordered micro-batches; returns the final flags table
    (doc_id, n_occupied_bands, partner_doc_id). Chunk count must not
    change the answer (tests/test_streaming.py)."""
    from hive_server_spark.streaming.incremental import (
        ParquetStateStore,
        await_stream_with_retry,
    )

    work = tempfile.mkdtemp(dir=session_scratch("neardup_stream"))
    d = _land_documents(spark, sf_dir, chunks)
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    ckpt = os.path.join(work, "ckpt")
    bands_store = ParquetStateStore(os.path.join(work, "bands"), run_id=ckpt)
    flags_store = ParquetStateStore(os.path.join(work, "flags"), run_id=ckpt)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        # no-freeze: the band index is a MIN semilattice over content
        # hashes — no id-windowed bootstrap artifact exists, so
        # commit_seed_state does not apply (static audit: test_streaming).
        ss = batch_df.sparkSession
        bands = _doc_bands(batch_df)
        # 1. merge the batch into the band index (MIN semilattice). The
        #    guard is belt-and-braces here (min-merge is idempotent) but
        #    keeps replays from re-running the work.
        if not bands_store.already_applied(batch_id):
            part = bands.groupBy("band_key").agg(
                F.min("doc_id").alias("min_doc_id")
            )
            cur = bands_store.latest(ss)
            merged = (
                part
                if cur is None
                else cur.unionByName(part)
                .groupBy("band_key")
                .agg(F.min("min_doc_id").alias("min_doc_id"))
            )
            bands_store.commit(merged, batch_id)
        # 2. flag this batch's docs against the POST-merge index: a doc is
        #    a near-dup iff some band's committed min is a smaller doc_id.
        #    Appends are NOT idempotent — this guard is load-bearing. A
        #    crash between the two commits replays into a bands-skip +
        #    flags-commit, which reads the identical post-merge state.
        if not flags_store.already_applied(batch_id):
            state = bands_store.latest(ss)
            flagged = (
                bands.join(state, "band_key")
                .where(F.col("min_doc_id") < F.col("doc_id"))
                .groupBy("doc_id")
                .agg(
                    F.count("*").alias("n_occupied_bands"),
                    F.min("min_doc_id").alias("partner_doc_id"),
                )
            )
            prev = flags_store.latest(ss)
            flags_store.commit(
                flagged if prev is None else prev.unionByName(flagged),
                batch_id,
            )

    with _scoped_shuffle_partitions(spark):
        writer = (
            stream.writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
        )
        await_stream_with_retry(writer.start)
    out = flags_store.latest(spark)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_occupied_bands").cast("bigint").alias("n_occupied_bands"),
        F.col("partner_doc_id").cast("bigint").alias("partner_doc_id"),
    )


@register("docs_neardup_streaming", _DOCS_NEARDUP_ORACLE)
def docs_neardup_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the corpus in doc_id-ordered chunks and maintain the MinHash
    band near-dup index incrementally; return the flagged-docs table,
    which must equal the batch LSH occupied-band rule (see block
    comment)."""
    return streamed_docs_neardup(spark, sf_dir, chunks=2)


# ---------------------------------------------------------------------------
# Cross-snapshot incremental dedup (round 10, VERDICT r9 item 4): the BATCH
# twin of docs_neardup_streaming — the nightly-pipeline shape, where the
# band index is a first-class PERSISTED TABLE between corpus snapshots, not
# in-flight stream state. A new document batch is deduped against the index
# a prior snapshot wrote to parquet:
#
#   1. the prior snapshot's band_key → MIN(doc_id) index is written to and
#      read back from parquet (here built from the id-ordered first half of
#      the corpus; in production it's the index the previous run left);
#   2. the NEW batch's band partials merge in (MIN semilattice — the same
#      replay-absorbing algebra the streaming twin commits per micro-batch;
#      production would MERGE/upsert instead of rewriting);
#   3. the batch's bands join the post-merge index: a doc is flagged iff
#      some band's min is a smaller doc_id — catching dups against the
#      prior corpus AND within the batch itself with ONE rule.
#
# Because the snapshot split is doc_id-ordered, the post-merge index equals
# the full-corpus band index, so the flags are EXACTLY the batch LSH
# occupied-band rule restricted to the new batch — the oracle below (the
# docs_neardup_streaming oracle + the threshold filter). Scale: per
# snapshot the prior corpus is NEVER rescanned — cost is O(batch bands) +
# one band-keyed merge against the index (both sides already partitioned
# by band_key from their aggs, so the merge and the flag join reuse the
# same partitioning); flags are O(near-dups). Nothing all-pairs.
# ---------------------------------------------------------------------------
_DOCS_NEARDUP_INCR_ORACLE = f"""
WITH {_TOKS_CTE_D},
{_SHINGLES_CTE_D},
sigs AS (
  SELECT doc_id,
       {_mh_cols_d}
  FROM shingled
),
sigs_b AS (
  SELECT doc_id, {_band_cols_d}
  FROM sigs
),
bands AS ({_band_union_d}),
bmin AS (SELECT band_key, MIN(doc_id) AS min_id FROM bands GROUP BY band_key),
j AS (
  SELECT b.doc_id, m.min_id
  FROM bands b JOIN bmin m ON b.band_key = m.band_key
  WHERE m.min_id < b.doc_id
),
thr AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS t FROM documents)
SELECT j.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_occupied_bands,
       CAST(MIN(j.min_id) AS BIGINT) AS partner_doc_id
FROM j CROSS JOIN thr WHERE j.doc_id >= thr.t
GROUP BY j.doc_id
"""


def incremental_docs_neardup(
    spark: SparkSession, docs: DataFrame, index_path: str, batch: DataFrame
) -> DataFrame:
    """Dedup `batch` against the persisted band index at `index_path`
    (band_key, min_doc_id parquet), merging the batch's own bands in
    first. Returns the flags table (doc_id, n_occupied_bands,
    partner_doc_id). `docs` is unused except to share the caller's session
    conventions; kept for signature symmetry with the streaming twin."""
    batch_bands = _doc_bands(batch)
    prior_index = spark.read.parquet(index_path)
    batch_part = batch_bands.groupBy("band_key").agg(
        F.min("doc_id").alias("min_doc_id")
    )
    merged = (
        prior_index.unionByName(batch_part)
        .groupBy("band_key")
        .agg(F.min("min_doc_id").alias("min_doc_id"))
    )
    return (
        batch_bands.join(merged, "band_key")
        .where(F.col("min_doc_id") < F.col("doc_id"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_occupied_bands"),
            F.min("min_doc_id").cast("bigint").alias("partner_doc_id"),
        )
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "n_occupied_bands",
            "partner_doc_id",
        )
    )


@register("docs_neardup_incremental", _DOCS_NEARDUP_INCR_ORACLE)
def docs_neardup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the prior snapshot's band index to parquet (id-ordered first
    half of the corpus), then dedup the second half as a new batch against
    the persisted index — must equal the full-corpus batch LSH
    occupied-band rule restricted to the batch (see block comment)."""
    from hive_server_spark.plans.text_pack import _docs as _text_docs

    docs = _text_docs(spark, sf_dir)
    mn, mx = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    thr = (mn + mx) // 2  # == the oracle's integer-division threshold
    work = tempfile.mkdtemp(dir=session_scratch("neardup_incr"))
    index_path = os.path.join(work, "band_index")
    (
        _doc_bands(docs.where(F.col("doc_id") < thr))
        .groupBy("band_key")
        .agg(F.min("doc_id").alias("min_doc_id"))
        .write.mode("overwrite")
        .parquet(index_path)
    )
    return incremental_docs_neardup(
        spark, docs, index_path, docs.where(F.col("doc_id") >= thr)
    )


# ---------------------------------------------------------------------------
# Streaming count-min sketch (round 7): the sketch-monoid × streaming
# intersection — the evt_cms_heavy_hitters grid, maintained INCREMENTALLY
# over the event stream. Each micro-batch folds to its own d×w partial
# (batch → per-user counts → ×d fan-out → (r, bucket) cells) and
# cross-batch merge is cell-wise SUM — the count-min sketch is exactly a
# monoid, so micro-batch boundaries can never change the final grid, the
# state is BOUNDED (≤ d·w rows regardless of stream length — the whole
# point of sketching a 100 TB stream), and the oracle is the plain batch
# sketch. Replay-guarded like docs_ingest_streaming (skip already-applied
# batch ids), versioned in the same vacuumable ParquetStateStore.
# ---------------------------------------------------------------------------
from hive_server_spark.plans.events_pack import _cms_hash, _CMS_D  # noqa: E402

_CMS_STREAM_ORACLE = f"""
WITH u AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id),
r AS (SELECT unnest(range(0, {_CMS_D})) AS r),
h AS (
  SELECT u.cnt, r.r, {_cms_hash('r.r', 'u.user_id', 'd')} AS bucket
  FROM u CROSS JOIN r
)
SELECT r, bucket, CAST(SUM(cnt) AS BIGINT) AS cell
FROM h GROUP BY r, bucket
"""


def _cms_partial(batch: DataFrame) -> DataFrame:
    u = batch.groupBy("user_id").agg(F.count("*").alias("cnt"))
    return (
        u.select(
            "user_id",
            "cnt",
            F.explode(F.expr(f"sequence(0, {_CMS_D - 1})")).alias("r"),
        )
        .withColumn("bucket", F.expr(_cms_hash("r", "user_id", "s")))
        .groupBy("r", "bucket")
        .agg(F.sum("cnt").alias("cell"))
    )


def start_cms_stream(
    spark: SparkSession, sf_dir: str, chunks: int = 2, work: str | None = None
):
    """Start (without awaiting) the incremental CMS stream; returns
    (StreamingQuery, ParquetStateStore). The landed ts-ordered events dir
    is shared with the rest of the evt_* family via _LANDED.

    `work` pins the checkpoint + state directory: a retry that passes the
    SAME work dir resumes the original checkpoint exactly-once (the
    store's replay guard absorbs re-delivered batches). Omitting it mints
    a fresh run — never do that inside a retry loop, the fresh store
    would start empty while the caller still reads the original one."""
    from hive_server_spark.streaming.incremental import ParquetStateStore

    stream, fresh_work = _events_stream_in_ts_order(spark, sf_dir, chunks)
    work = work or fresh_work
    ckpt = os.path.join(work, "ckpt")
    store = ParquetStateStore(os.path.join(work, "state"), run_id=ckpt)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        # no-freeze: the CMS sketch is a counter-matrix SUM monoid — no
        # batch-0 seed artifact, commit_seed_state does not apply.
        if store.already_applied(batch_id):
            return
        part = _cms_partial(batch_df)
        cur = store.latest(batch_df.sparkSession)
        merged = (
            part
            if cur is None
            else cur.unionByName(part)
            .groupBy("r", "bucket")
            .agg(F.sum("cell").alias("cell"))
        )
        store.commit(merged, batch_id)

    q = (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    return q, store


def _cms_final(spark: SparkSession, store) -> DataFrame:
    out = store.latest(spark)
    return out.select(
        F.col("r").cast("bigint").alias("r"),
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("cell").cast("bigint").alias("cell"),
    )


@register("evt_cms_streaming", _CMS_STREAM_ORACLE)
def evt_cms_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain the count-min grid incrementally over the landed event
    stream (one micro-batch per file); the final cells must equal the
    one-pass batch sketch — monoid merge, bounded state, exactly-once
    under replay. Runs concurrently with the rest of the evt_* family."""
    return _evt_streaming_results(spark, sf_dir)["evt_cms_streaming"]


# ---------------------------------------------------------------------------
# Streaming HyperLogLog registers (round 7): the MAX-merge twin of the
# SUM-merge CMS grid above. Each micro-batch folds its distinct
# (event_type, user) hashes to per-(type, bucket) rank maxima; cross-batch
# merge is cell-wise MAX — registers are a bounded join-semilattice
# (≤ types × m rows regardless of stream length), so micro-batch
# boundaries can never change the final register table and re-delivered
# elements are absorbed (MAX is idempotent — the reason real pipelines
# ship HLL registers, not distinct sets, between workers). The oracle is
# the plain batch register table; evt_hll_cardinality gates the estimate
# arithmetic on the same registers.
# ---------------------------------------------------------------------------
from hive_server_spark.functions.text import hash_expr  # noqa: E402
from hive_server_spark.plans.events_pack import _hll_rank, _HLL_M  # noqa: E402

_HLL_STREAM_ORACLE = f"""
WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
h AS (
  SELECT event_type,
         {hash_expr("CAST(user_id AS VARCHAR)", "hll", "d")} AS hv
  FROM u
)
SELECT event_type, CAST(hv % {_HLL_M} AS BIGINT) AS bucket,
       CAST(MAX({_hll_rank(f"(hv // {_HLL_M})", "d")}) AS BIGINT) AS reg
FROM h GROUP BY event_type, hv % {_HLL_M}
"""


def _hll_partial(batch: DataFrame) -> DataFrame:
    u = batch.select("event_type", "user_id").distinct()
    h = u.select(
        "event_type",
        F.expr(hash_expr("CAST(user_id AS STRING)", "hll", "s")).alias("hv"),
    )
    return (
        h.select(
            "event_type",
            (F.col("hv") % _HLL_M).alias("bucket"),
            F.expr(_hll_rank(f"(hv DIV {_HLL_M})", "s")).alias("rank"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("rank").alias("reg"))
    )


def start_hll_stream(
    spark: SparkSession, sf_dir: str, chunks: int = 2, work: str | None = None
):
    """Start (without awaiting) the incremental HLL-register stream;
    returns (StreamingQuery, ParquetStateStore). Shares the landed
    ts-ordered events dir with the rest of the evt_* family. `work` pins
    the checkpoint + state dir across retries (see start_cms_stream)."""
    from hive_server_spark.streaming.incremental import ParquetStateStore

    stream, fresh_work = _events_stream_in_ts_order(spark, sf_dir, chunks)
    work = work or fresh_work
    ckpt = os.path.join(work, "hll_ckpt")
    store = ParquetStateStore(os.path.join(work, "hll_state"), run_id=ckpt)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        # no-freeze: the HLL register state is a MAX semilattice — no
        # batch-0 seed artifact, commit_seed_state does not apply.
        if store.already_applied(batch_id):
            return
        part = _hll_partial(batch_df)
        cur = store.latest(batch_df.sparkSession)
        merged = (
            part
            if cur is None
            else cur.unionByName(part)
            .groupBy("event_type", "bucket")
            .agg(F.max("reg").alias("reg"))
        )
        store.commit(merged, batch_id)

    q = (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    return q, store


def _hll_final(spark: SparkSession, store) -> DataFrame:
    out = store.latest(spark)
    return out.select(
        "event_type",
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("reg").cast("bigint").alias("reg"),
    )


@register("evt_hll_streaming", _HLL_STREAM_ORACLE)
def evt_hll_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain the HLL register table incrementally over the landed event
    stream; the final registers must equal the one-pass batch fold —
    MAX-semilattice merge, bounded state, idempotent under replay. Runs
    concurrently with the rest of the evt_* family."""
    return _evt_streaming_results(spark, sf_dir)["evt_hll_streaming"]


# ---------------------------------------------------------------------------
# Streaming CUSUM drift monitor (round 8, VERDICT r07 item 7): the
# operational twin of the batch evt_cusum_drift — drift detection is a
# continuously-running job in practice, not a nightly batch. Split of
# labor: the UNBOUNDED part (per-(type, hour) event counts) is maintained
# incrementally — per micro-batch one map-side-combined hash agg, merged
# into the versioned state store by cell-wise SUM (a monoid: micro-batch
# boundaries can never change the hourly table, re-delivered batches are
# absorbed by the replay guard). The BOUNDED part (the two-sided CUSUM
# fold over the last 512 hourly rates per type) runs at read time on the
# final state via the SAME cusum_from_hourly the batch query uses — so
# the oracle is the batch oracle, verbatim. State is time-bounded
# (types × hours), never event-bounded; at 100 TB/day the store holds
# ~24 new cells per type per day.
# ---------------------------------------------------------------------------
from hive_server_spark.plans.events_pack import (  # noqa: E402
    _CUSUM_ORACLE,
    cusum_from_hourly,
)


def _cusum_partial(batch: DataFrame) -> DataFrame:
    return batch.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.count("*").alias("cnt"))


def start_cusum_stream(
    spark: SparkSession, sf_dir: str, chunks: int = 2, work: str | None = None
):
    """Start (without awaiting) the incremental hourly-rate stream behind
    the CUSUM monitor; returns (StreamingQuery, ParquetStateStore).
    `work` pins the checkpoint + state dir across retries (see
    start_cms_stream)."""
    from hive_server_spark.streaming.incremental import ParquetStateStore

    stream, fresh_work = _events_stream_in_ts_order(spark, sf_dir, chunks)
    work = work or fresh_work
    ckpt = os.path.join(work, "cusum_ckpt")
    store = ParquetStateStore(os.path.join(work, "cusum_state"), run_id=ckpt)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        # no-freeze: the CUSUM partials fold as an ordered-segment monoid
        # — no batch-0 seed artifact, commit_seed_state does not apply.
        if store.already_applied(batch_id):
            return
        part = _cusum_partial(batch_df)
        cur = store.latest(batch_df.sparkSession)
        merged = (
            part
            if cur is None
            else cur.unionByName(part)
            .groupBy("event_type", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        store.commit(merged, batch_id)

    q = (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    return q, store


def _cusum_final(spark: SparkSession, store) -> DataFrame:
    hourly = store.latest(spark).select(
        "event_type", "bucket", F.col("cnt").cast("double").alias("cnt")
    )
    return cusum_from_hourly(hourly)


@register("evt_cusum_streaming", _CUSUM_ORACLE)
def evt_cusum_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain the hourly rate table incrementally over the landed event
    stream and compute the two-sided CUSUM drift maxima from the final
    state — must equal the batch evt_cusum_drift exactly (see block
    comment; SUM-monoid state, bounded read-side fold, exactly-once under
    replay). Runs in the evt_* family wave."""
    return _evt_streaming_results(spark, sf_dir)["evt_cusum_streaming"]
# ---------------------------------------------------------------------------
# Streaming media near-dup ingest (round-12 second pass; REGISTRATION
# STAGED FOR ROUND 14 — the round-13 window is exactly full per the
# rotation note in gate.py; flip the commented @register). The MEDIA twin
# of docs_neardup_streaming, completing the ingest matrix: text has
# batch-incremental (docs_neardup_incremental) + streaming
# (docs_neardup_streaming) near-dup; media had only the batch-incremental
# members (multimodal_phash_incremental, green r11; the fused audio/video
# refresh staged this round). This is the arrival-time shape: media lands
# in micro-batches, each batch is decoded ONCE (the expensive leg — the
# T.81 decode runs only on arriving payloads, never on the corpus), its
# dHash band partials MIN-merge into the versioned parquet band index,
# and the batch is flagged against the POST-merge index — catching dups
# against everything already ingested AND within the batch with one rule.
#
# Exactness argument (same as the docs twin): chunks are media_id-ordered,
# so when a batch flags, every smaller media_id's bands are already in
# the index — the as-of-batch flags equal the full-corpus occupied-band
# rule, which is the oracle below (_PHASH_BANDS_CTES + the bmin/j chain,
# unrestricted). Chunk count must not change the answer (pinned by
# tests/test_streaming.py). Crash/replay: the band merge is an idempotent
# semilattice; the flags append is guarded by already_applied — a crash
# between the two commits replays into a bands-skip + flags-commit that
# reads identical post-merge state.
#
# Scale: state is (band_idx, band_val, min_media_id) — bytes per image,
# not pixels; payloads never shuffle (partition-preserving mapInPandas
# decode inside the batch); the merge and flag joins are band-keyed like
# the batch incremental path. At 100 TB the stream ingests at decode
# speed and the index grows with DISTINCT band values only.
# ---------------------------------------------------------------------------
from hive_server_spark.functions import multimodal as _M  # noqa: E402
from hive_server_spark.plans.multimodal_pack import _phash_bands_ctes  # noqa: E402

# The streaming ingest runs over the doc_id % 3 == 0 slice of documents —
# the docs carrying a thumbnail attachment in this synthetic layout. Two
# reasons: (a) a media stream is naturally sparser than the text corpus it
# rides with (not every document has media), and (b) it bounds the
# decode-dominated bench cost of the ONLY query that cold-decodes the
# whole corpus per run (VERDICT r13 item 2: 28.7 s at sf0.1 unsliced —
# the batch near-dup queries amortize one shared decode across the
# family, the arrival-time ingest by design cannot). The slice predicate
# appears identically in the Spark batch filter and the oracle `src`, so
# the gate still hash-checks every derived value end-to-end.
_MEDIA_STREAM_MOD = 3

_MEDIA_NEARDUP_STREAM_ORACLE = f"""
WITH {_phash_bands_ctes(
    f"(SELECT * FROM documents WHERE doc_id % {_MEDIA_STREAM_MOD} = 0)"
)},
bmin AS (
  SELECT band_idx, band_val, MIN(doc_id) AS min_id
  FROM bands GROUP BY band_idx, band_val
),
j AS (
  SELECT b.doc_id, m.min_id
  FROM bands b
  JOIN bmin m ON b.band_idx = m.band_idx AND b.band_val = m.band_val
  WHERE m.min_id < b.doc_id
)
SELECT CAST(j.doc_id AS BIGINT)      AS media_id,
       CAST(COUNT(*) AS BIGINT)      AS n_occupied_bands,
       CAST(MIN(j.min_id) AS BIGINT) AS partner_media_id
FROM j GROUP BY j.doc_id
"""


def streamed_media_neardup(
    spark: SparkSession, sf_dir: str, chunks: int = 2,
    media_mod: int = _MEDIA_STREAM_MOD,
) -> DataFrame:
    """Run the incremental dHash band near-dup index over the media corpus
    landed in `chunks` media_id-ordered micro-batches; each batch decodes
    ONLY its own payloads. Returns the final flags table (media_id,
    n_occupied_bands, partner_media_id); chunk count must not change the
    answer (tests/test_streaming.py). `media_mod` selects the
    media-bearing corpus slice (doc_id % media_mod == 0): the gate query
    uses the default (see the corpus contract above), the media pipeline's
    --incremental proof passes 1 so the streaming ingest covers the same
    full corpus as the batch rule it must equal."""
    from hive_server_spark.streaming.incremental import (
        ParquetStateStore,
        await_stream_with_retry,
    )

    # checkpoint + state dirs must be FRESH per run (reusing a checkpoint
    # would replay the finished stream into a no-op), so mkdtemp — but
    # anchored under the per-process scratch root so interpreter exit
    # reaps them (the ADVICE r11 /tmp-accumulation fix)
    work = tempfile.mkdtemp(dir=session_scratch("media_neardup_stream"))
    d = _land_documents(spark, sf_dir, chunks)
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    ckpt = os.path.join(work, "ckpt")
    bands_store = ParquetStateStore(os.path.join(work, "bands"), run_id=ckpt)
    flags_store = ParquetStateStore(os.path.join(work, "flags"), run_id=ckpt)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        # no-freeze: the dHash band index is a MIN semilattice — no
        # id-windowed bootstrap artifact, commit_seed_state does not
        # apply (static audit: test_streaming).
        ss = batch_df.sparkSession
        # decode THIS batch only — and only the media-bearing slice (the
        # doc_id % _MEDIA_STREAM_MOD corpus contract above, mirrored in
        # the oracle src): synthesize -> T.81 decode -> dHash, at full
        # parallelism (the landed chunk is one file = one partition).
        # persist(): the merge commit and the flags commit are two Spark
        # actions — without the cache each would re-run the mapInPandas
        # decode, doubling the expensive leg (round-12 review)
        wide = _M.dhash_bands(
            _M.synthesize_dhash_jpeg_media(
                batch_df.where(F.col("doc_id") % media_mod == 0)
                .repartition(ss.sparkContext.defaultParallelism)
            )
        )
        bands = _M.band_long(wide).persist()
        try:
            # 1. MIN-merge the batch's band partials into the index
            #    (idempotent semilattice; the guard just skips replay work)
            if not bands_store.already_applied(batch_id):
                part = bands.groupBy("band_idx", "band_val").agg(
                    F.min("media_id").alias("min_media_id")
                )
                cur = bands_store.latest(ss)
                merged = (
                    part
                    if cur is None
                    else cur.unionByName(part)
                    .groupBy("band_idx", "band_val")
                    .agg(F.min("min_media_id").alias("min_media_id"))
                )
                bands_store.commit(merged, batch_id)
            # 2. flag this batch against the POST-merge index. Appends are
            #    NOT idempotent — this guard is load-bearing (see docs twin).
            if not flags_store.already_applied(batch_id):
                state = bands_store.latest(ss)
                flagged = (
                    bands.join(state, ["band_idx", "band_val"])
                    .where(F.col("min_media_id") < F.col("media_id"))
                    .groupBy("media_id")
                    .agg(
                        F.count("*").alias("n_occupied_bands"),
                        F.min("min_media_id").alias("partner_media_id"),
                    )
                )
                prev = flags_store.latest(ss)
                flags_store.commit(
                    flagged if prev is None else prev.unionByName(flagged),
                    batch_id,
                )
        finally:
            bands.unpersist()

    with _scoped_shuffle_partitions(spark):
        writer = (
            stream.writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
        )
        await_stream_with_retry(writer.start)
    out = flags_store.latest(spark)
    return out.select(
        F.col("media_id").cast("bigint").alias("media_id"),
        F.col("n_occupied_bands").cast("bigint").alias("n_occupied_bands"),
        F.col("partner_media_id").cast("bigint").alias("partner_media_id"),
    )


@register("media_neardup_streaming", _MEDIA_NEARDUP_STREAM_ORACLE)
def media_neardup_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the media corpus in media_id-ordered chunks, decode each
    micro-batch once, and maintain the dHash band near-dup index
    incrementally; return the flagged-media table, which must equal the
    batch LSH occupied-band rule (see block comment)."""
    return streamed_media_neardup(spark, sf_dir, chunks=2)


# ---------------------------------------------------------------------------
# Streaming IVF census ingest (round-12 second pass; REGISTRATION STAGED
# FOR ROUND 14 per the rotation note in gate.py; flip the commented
# @register). Completes the incremental/streaming symmetry across the
# three corpus families: text has docs_neardup_incremental +
# docs_neardup_streaming, media has multimodal_phash_incremental (+ the
# staged fused refresh) + media_neardup_streaming, and embeddings had
# only the batch-incremental member (emb_ivf_incremental, green r11).
# This is the arrival-time shape for an ANN index: embeddings land in
# vec_id-ordered micro-batches; batch 0 freezes the coarse quantizer
# (the vec_id < k seed convention every IVF query here uses — in a
# deployed index the trained centroids are a bootstrap artifact exactly
# like this); every batch assigns ONLY its own vectors against the
# read-back centroids and folds its additive census partials (n_vecs,
# posting_checksum, sum_d2_micro — a commutative monoid) into the
# versioned parquet state store. The final census must equal the
# full-corpus rebuild (emb_ivf_build's oracle), and chunk count must not
# change the answer (tests/test_streaming.py). Replay: partial-census
# merges are guarded by already_applied (sums are NOT idempotent — the
# guard is load-bearing, same as the ingest twin's flags append).
#
# Scale: per micro-batch the work is one broadcast-assign scan of the
# BATCH (map-side argmin) + a k-row monoid merge; the state is k rows,
# not the corpus; vectors are never rescanned after their batch. This is
# the emb_ivf_incremental claim (0.9x at 100x — fixed-cost domination)
# driven by a stream instead of a nightly refresh.
# ---------------------------------------------------------------------------
def _land_embeddings(spark: SparkSession, sf_dir: str, chunks: int) -> str:
    """Embeddings range-partitioned by vec_id into `chunks` files with
    ascending mtimes — the _land_documents protocol for the embedding
    corpus (vec_id-ordered delivery; batch 0 carries the seed ids)."""

    def land() -> str:
        d = os.path.join(tempfile.mkdtemp(dir=session_scratch("emb_land")), "emb")
        load_table(spark, sf_dir, "embeddings").repartitionByRange(
            chunks, "vec_id"
        ).write.parquet(d)
        _stamp_ascending_mtimes(sorted(glob.glob(os.path.join(d, "part-*.parquet"))))
        return d

    return _LANDED.get_or_create(spark, ("embeddings", sf_dir, chunks), land)


def streamed_ivf_census(
    spark: SparkSession, sf_dir: str, chunks: int = 2
) -> DataFrame:
    """Run the IVF census over the embedding corpus landed in `chunks`
    vec_id-ordered micro-batches; returns the final build census
    (cluster_id, n_vecs, share, posting_checksum, sum_d2_micro,
    mean_d2_micro), which must equal the full-corpus rebuild."""
    from hive_server_spark.functions import embeddings as _E
    from hive_server_spark.plans.embedding_pack import (
        _IVF_K,
        _census_report,
        _ivf_partial_census,
        _merge_census,
    )
    from hive_server_spark.streaming.incremental import (
        ParquetStateStore,
        await_stream_with_retry,
        commit_seed_state,
    )

    work = tempfile.mkdtemp(dir=session_scratch("ivf_stream"))
    d = _land_embeddings(spark, sf_dir, chunks)
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    ckpt = os.path.join(work, "ckpt")
    cent_store = ParquetStateStore(os.path.join(work, "centroids"), run_id=ckpt)
    census_store = ParquetStateStore(os.path.join(work, "census"), run_id=ckpt)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        ss = batch_df.sparkSession
        vec = _E._vecs(batch_df).select("vec_id", "v")
        # batch 0 freezes the coarse quantizer (vec_id-ordered landing
        # guarantees the seed ids arrive first); later batches read it
        # back — never re-derive seeds from their own slice
        if cent_store.latest(ss) is None:
            if not cent_store.already_applied(batch_id):
                # ADVICE r12: the freeze assumes ALL k seed ids landed in
                # batch 0 (vec_id-ordered landing); the helper counts the
                # seed rows BEFORE committing (ADVICE r13), so an
                # incomplete quantizer is never persisted and every
                # replay re-hits the completeness check.
                commit_seed_state(
                    cent_store,
                    batch_id,
                    vec.where(F.col("vec_id") < _IVF_K).select(
                        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
                    ),
                    _IVF_K,
                    f"IVF (vec_id < {_IVF_K})",
                )
        cent = cent_store.latest(ss)
        # additive census fold: sums are not idempotent — the guard is
        # load-bearing on replay
        if not census_store.already_applied(batch_id):
            part = _ivf_partial_census(vec, cent)
            prev = census_store.latest(ss)
            merged = (
                part if prev is None else _merge_census(prev.unionByName(part))
            )
            census_store.commit(merged, batch_id)

    with _scoped_shuffle_partitions(spark):
        writer = (
            stream.writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
        )
        await_stream_with_retry(writer.start)
    return _census_report(census_store.latest(spark))


from hive_server_spark.plans.embedding_pack import _ivf_build_oracle  # noqa: E402


@register("emb_ivf_streaming", _ivf_build_oracle())
def emb_ivf_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the embedding corpus in vec_id-ordered chunks, freeze the
    coarse quantizer at batch 0, and fold each batch's additive census
    partials into the versioned state store; return the final build
    census, which must equal the full-corpus rebuild (see block
    comment)."""
    return streamed_ivf_census(spark, sf_dir, chunks=2)


# ---------------------------------------------------------------------------
# Streaming PQ-codes ingest (round-13 second pass; staged r13-r14,
# REGISTERED ROUND 15 per the rotation note in gate.py). Completes the
# streaming leg of the PQ lifecycle the same way emb_ivf_streaming
# completed it for the coarse index: train (emb_pq_train) -> encode
# (emb_pq_codes) -> serve (emb_pq_adc_topk / ivfpq) -> maintain
# batch-incrementally (emb_pq_incremental) -> and now maintain under
# ARRIVAL-TIME ingest. Embeddings land in vec_id-ordered micro-batches;
# batch 0 freezes the sub-quantizer codebook (the vec_id < ksub seed
# convention every PQ query here uses, guarded to fail loudly if the
# seed batch is short — the emb_ivf_streaming ADVICE r12 contract);
# every batch encodes ONLY its own vectors against the read-back
# codebook and APPENDS its codes to the versioned parquet state store.
#
# Exactness argument: assignment is a pure per-(vector, subspace)
# function of (v, codebook) with the deterministic (d2, cid) struct-min
# tie-break and per-subspace micro-flooring BEFORE the per-vector sum —
# exactly pq_codes_from_vecs — so batch-encoded rows are bit-identical
# to full-rebuild rows, and the union of disjoint per-vector row sets
# IS the merge. Final codes table ≡ the full-corpus rebuild, which is
# emb_pq_codes' DuckDB oracle. Replay: the append is NOT idempotent, so
# the already_applied guard is load-bearing (same as the docs/media
# ingest twins' flags append); the codebook freeze is idempotent but
# guarded anyway to skip replay work.
#
# Scale: per micro-batch the work is a broadcast of the ksub×m
# sub-codebook + one map-side-combined hash aggregate over the BATCH
# (bounded m-row explode per vector, no corpus rescan, no self-join);
# state grows by exactly the batch's row count — codes are storage, not
# compute. At 100 TB the stream encodes at arrival speed; the prior
# codes are never RE-ENCODED, though ParquetStateStore.commit does
# physically rewrite the state file per batch — O(state), with the
# production fixes (Delta/Iceberg MERGE; bucket-partial overwrite)
# noted at streaming/incremental.py:114-120.
# ---------------------------------------------------------------------------
from hive_server_spark.functions.embeddings import pq_codes_oracle


@register("emb_pq_streaming", pq_codes_oracle())
def emb_pq_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the embedding corpus in vec_id-ordered chunks, freeze the
    PQ sub-quantizer codebook at batch 0, encode each batch against the
    read-back codebook, and append to the versioned codes store; return
    the final codes table, which must equal the full-corpus rebuild
    (see block comment)."""
    return streamed_pq_codes(spark, sf_dir, chunks=2)


def streamed_pq_codes(
    spark: SparkSession, sf_dir: str, chunks: int = 2
) -> DataFrame:
    """Run the PQ encode over the embedding corpus landed in `chunks`
    vec_id-ordered micro-batches; returns the final codes table
    (vec_id, pq_code, distortion_micro, n_subspaces), which must equal
    the full-corpus rebuild."""
    from hive_server_spark.functions import embeddings as _E
    from hive_server_spark.streaming.incremental import (
        ParquetStateStore,
        await_stream_with_retry,
        commit_seed_state,
    )

    work = tempfile.mkdtemp(dir=session_scratch("pq_stream"))
    d = _land_embeddings(spark, sf_dir, chunks)
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    ckpt = os.path.join(work, "ckpt")
    cb_store = ParquetStateStore(os.path.join(work, "codebook"), run_id=ckpt)
    codes_store = ParquetStateStore(os.path.join(work, "codes"), run_id=ckpt)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        ss = batch_df.sparkSession
        vec = _E._vecs(batch_df).select("vec_id", "v")
        # batch 0 freezes the sub-quantizer codebook (vec_id-ordered
        # landing guarantees the seed ids arrive first); later batches
        # read it back — never re-derive seeds from their own slice
        if cb_store.latest(ss) is None:
            if not cb_store.already_applied(batch_id):
                # a short seed batch would freeze an incomplete codebook
                # and silently diverge from the rebuild; the helper
                # counts the seed rows BEFORE committing (ADVICE r13) so
                # an incomplete codebook is never persisted and every
                # replay re-hits the check
                commit_seed_state(
                    cb_store,
                    batch_id,
                    vec.where(F.col("vec_id") < _E.PQ_KSUB).select(
                        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
                    ),
                    _E.PQ_KSUB,
                    f"PQ (vec_id < {_E.PQ_KSUB})",
                )
        cb = cb_store.latest(ss)
        # encode THIS batch only and append: per-vector rows are
        # disjoint across batches, so the union IS the merge. Appends
        # are NOT idempotent — the guard is load-bearing on replay.
        if not codes_store.already_applied(batch_id):
            batch_codes = _E.pq_codes_from_vecs(vec, cent=cb)
            prev = codes_store.latest(ss)
            codes_store.commit(
                batch_codes if prev is None else prev.unionByName(batch_codes),
                batch_id,
            )

    with _scoped_shuffle_partitions(spark):
        writer = (
            stream.writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
        )
        await_stream_with_retry(writer.start)
    out = codes_store.latest(spark)
    return out.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("pq_code").cast("bigint").alias("pq_code"),
        F.col("distortion_micro").cast("bigint").alias("distortion_micro"),
        F.col("n_subspaces").cast("bigint").alias("n_subspaces"),
    )


# ---------------------------------------------------------------------------
# Streaming DELETE ingest into positional deletion vectors (round-13
# second pass; staged r13-r14, REGISTERED ROUND 15 per the rotation note
# in gate.py). Completes the lakehouse-layout family's streaming leg the way
# the ingest twins completed text/media/embeddings: layout_zorder
# clusters, layout_compaction compacts, layout_zonemap prunes,
# layout_deletion_vectors mutates ONE-SHOT, layout_snapshot_expiry
# expires — and THIS maintains the deletion vectors under arrival-time
# ingest, the shape a CDC-fed lakehouse table actually runs (a stream
# of row-level DELETEs folding into per-file position bitmaps without
# rewriting data files).
#
# Events land in event_id-ordered micro-batches. A row's deleted
# POSITION is its rank within its 512-row file across the WHOLE table,
# so a file whose rows straddle a batch boundary needs cross-batch
# state: the counts store carries per-file (n_rows, n_deleted,
# pos_checksum) as a SUM monoid, and each batch offsets its local
# row_number by the prior n_rows for that file — id-ordered landing
# guarantees a file's rows arrive in rank order, so offset + local rank
# IS the global position. Deleted positions append to the delpos store
# (disjoint across batches by construction); the final report groups
# them into the ordered-position md5 and joins the counts — and must
# equal layout_deletion_vectors' one-shot DELETE row for row, which is
# why it shares that query's DuckDB oracle.
#
# Replay discipline: BOTH commits are guarded, and the delpos append
# commits FIRST — it is computed from the PRE-merge offsets, so a crash
# between the two commits replays into delpos-skip + counts-recompute
# against the still-unmerged counts state (same offsets, same result).
# Committing counts first would poison a replay: the recomputed offsets
# would include the batch's own rows. Sums and appends are not
# idempotent; the guards are load-bearing.
#
# Scale: per batch the work is one local row_number window (partitioned
# by file_id WITHIN the batch — bounded by batch size, never the
# corpus), one broadcast-sized offsets join (touched files only), one
# map-side-combined counts aggregate, and an append of the batch's own
# deleted positions; state is per-file counters + per-delete rows
# (positions, not payloads). Prior batches are never rescanned. At
# 100 TB this ingests at CDC arrival speed; the one-shot DELETE's scan
# cost is amortized across triggers.
# ---------------------------------------------------------------------------
from hive_server_spark.plans.sources_pack import (  # noqa: E402
    _DV_PRED,
    _ZM_FILE_ROWS,
)


def _land_events_by_id(spark: SparkSession, sf_dir: str, chunks: int) -> str:
    """Events range-partitioned by event_id into `chunks` files with
    ascending mtimes — the _land_documents protocol for the raw events
    table (event_id-ordered delivery, so per-file ranks arrive in
    order)."""

    def land() -> str:
        d = os.path.join(tempfile.mkdtemp(dir=session_scratch("dv_land")), "ev")
        load_table(spark, sf_dir, "events").repartitionByRange(
            chunks, "event_id"
        ).write.parquet(d)
        _stamp_ascending_mtimes(sorted(glob.glob(os.path.join(d, "part-*.parquet"))))
        return d

    return _LANDED.get_or_create(spark, ("events_by_id", sf_dir, chunks), land)


def streamed_deletion_vectors(
    spark: SparkSession, sf_dir: str, chunks: int = 2
) -> DataFrame:
    """Run the predicate DELETE over the events table landed in `chunks`
    event_id-ordered micro-batches, maintaining per-file deletion-vector
    state incrementally; returns the final per-touched-file report
    (file_id, n_rows, n_deleted, n_live, pos_checksum, dv_md5), which
    must equal the one-shot layout_deletion_vectors."""
    from pyspark.sql import Window

    from hive_server_spark.streaming.incremental import (
        ParquetStateStore,
        await_stream_with_retry,
    )

    work = tempfile.mkdtemp(dir=session_scratch("dv_stream"))
    d = _land_events_by_id(spark, sf_dir, chunks)
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    ckpt = os.path.join(work, "ckpt")
    counts_store = ParquetStateStore(os.path.join(work, "counts"), run_id=ckpt)
    delpos_store = ParquetStateStore(os.path.join(work, "delpos"), run_id=ckpt)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        # no-freeze: per-file counts are a SUM monoid with the offset
        # discipline below — no batch-0 seed artifact,
        # commit_seed_state does not apply.
        ss = batch_df.sparkSession
        ev = batch_df.select(
            F.expr(f"event_id DIV {_ZM_FILE_ROWS}").alias("file_id"),
            "event_id",
            F.expr(f"({_DV_PRED})").alias("deleted"),
        )
        w = Window.partitionBy("file_id").orderBy("event_id")
        loc = ev.withColumn("rn", F.row_number().over(w))
        prior = counts_store.latest(ss)
        if prior is None:
            pos = loc.withColumn("pos", F.col("rn").cast("bigint"))
        else:
            pos = loc.join(
                prior.select("file_id", F.col("n_rows").alias("off")),
                "file_id",
                "left",
            ).withColumn(
                "pos",
                (F.col("rn") + F.coalesce(F.col("off"), F.lit(0))).cast(
                    "bigint"
                ),
            )
        # persist(): the delpos append and the counts merge are two Spark
        # actions over the same positioned batch — without the cache each
        # would re-run the window + offsets join
        pos = pos.persist()
        try:
            # 1. append this batch's deleted positions (PRE-merge offsets;
            #    see the replay-discipline block comment — this MUST
            #    commit before the counts merge)
            if not delpos_store.already_applied(batch_id):
                dels = pos.where("deleted").select("file_id", "pos")
                prev = delpos_store.latest(ss)
                delpos_store.commit(
                    dels if prev is None else prev.unionByName(dels), batch_id
                )
            # 2. fold the batch's per-file counters into the SUM monoid
            if not counts_store.already_applied(batch_id):
                part = pos.groupBy("file_id").agg(
                    F.count("*").cast("bigint").alias("n_rows"),
                    F.sum(F.when(F.col("deleted"), 1).otherwise(0))
                    .cast("bigint")
                    .alias("n_deleted"),
                    F.coalesce(
                        F.sum(F.when(F.col("deleted"), F.col("pos"))),
                        F.lit(0),
                    )
                    .cast("bigint")
                    .alias("pos_checksum"),
                )
                cur = counts_store.latest(ss)
                merged = (
                    part
                    if cur is None
                    else cur.unionByName(part)
                    .groupBy("file_id")
                    .agg(
                        F.sum("n_rows").cast("bigint").alias("n_rows"),
                        F.sum("n_deleted").cast("bigint").alias("n_deleted"),
                        F.sum("pos_checksum")
                        .cast("bigint")
                        .alias("pos_checksum"),
                    )
                )
                counts_store.commit(merged, batch_id)
        finally:
            pos.unpersist()

    with _scoped_shuffle_partitions(spark):
        writer = (
            stream.writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
        )
        await_stream_with_retry(writer.start)

    counts = counts_store.latest(spark)
    delpos = delpos_store.latest(spark)
    dv = delpos.groupBy("file_id").agg(
        F.md5(
            F.array_join(F.sort_array(F.collect_list("pos")), ",")
        ).alias("dv_md5")
    )
    return (
        counts.where(F.col("n_deleted") > 0)
        .join(dv, "file_id")
        .select(
            F.col("file_id").cast("bigint").alias("file_id"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("n_deleted").cast("bigint").alias("n_deleted"),
            (F.col("n_rows") - F.col("n_deleted"))
            .cast("bigint")
            .alias("n_live"),
            F.col("pos_checksum").cast("bigint").alias("pos_checksum"),
            "dv_md5",
        )
    )


from hive_server_spark.plans.sources_pack import _DV_ORACLE


@register("layout_dv_streaming", _DV_ORACLE)
def layout_dv_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the events table in event_id-ordered chunks, folding each
    micro-batch's predicate DELETEs into per-file deletion-vector state;
    return the final per-touched-file report, which must equal the
    one-shot layout_deletion_vectors (see block comment)."""
    return streamed_deletion_vectors(spark, sf_dir, chunks=2)


# ---------------------------------------------------------------------------
# Streaming zone-map maintenance (round-14 second pass; REGISTRATION
# STAGED FOR ROUND 16 — flip the commented @register). The WRITE-side
# twin of layout_zonemap_skipping: that query computes the per-file
# min/max statistics one-shot and then measures what they prune; THIS
# maintains the same statistics under arrival-time ingest — the shape
# every lakehouse write path actually runs (Delta/Iceberg collect file
# stats at commit time; parquet writes row-group stats as pages land).
# Events land in event_id-ordered micro-batches; each batch folds its
# per-file partials (COUNT + MIN/MAX of ts, value, event_type) into the
# versioned state store. A 512-row file whose rows straddle a batch
# boundary is exactly the interesting case: the partials merge as a
# MIN/MAX semilattice + COUNT sum keyed on file_id, so the final map is
# batch-boundary invariant (tests pin 1 vs 3 chunks), and the result
# must equal the batch derivation — the `files` CTE of
# layout_zonemap_skipping's oracle, verbatim.
#
# Replay: MIN/MAX legs are idempotent, but n_rows is a SUM — the
# already_applied guard is load-bearing (same as the census twin).
# Timestamps cross the engine boundary as integer microseconds
# (unix_micros ≡ DuckDB epoch_us — the events_pack convention).
#
# Scale: per micro-batch the work is ONE map-side-combined aggregate of
# the batch keyed by file_id (no join, no corpus rescan); state is
# file-count-sized metadata, not data. At 100 TB stats maintenance rides
# the ingest scan for free — which is precisely why deployed formats do
# it at write time instead of re-deriving zone maps by scan.
# ---------------------------------------------------------------------------
_ZM_STREAM_ORACLE = f"""
SELECT CAST(event_id // {_ZM_FILE_ROWS} AS BIGINT) AS file_id,
       CAST(COUNT(*) AS BIGINT)                    AS n_rows,
       CAST(MIN(epoch_us(ts)) AS BIGINT)           AS min_ts_us,
       CAST(MAX(epoch_us(ts)) AS BIGINT)           AS max_ts_us,
       CAST(MIN(value) AS DOUBLE)                  AS min_value,
       CAST(MAX(value) AS DOUBLE)                  AS max_value,
       MIN(event_type)                             AS min_type,
       MAX(event_type)                             AS max_type
FROM events GROUP BY event_id // {_ZM_FILE_ROWS}
"""


def streamed_zonemaps(
    spark: SparkSession, sf_dir: str, chunks: int = 2
) -> DataFrame:
    """Run the zone-map maintenance over the events table landed in
    `chunks` event_id-ordered micro-batches; returns the final per-file
    statistics table (file_id, n_rows, min/max ts-micros, value, type),
    which must equal the one-shot batch derivation."""
    from hive_server_spark.streaming.incremental import (
        ParquetStateStore,
        await_stream_with_retry,
    )

    work = tempfile.mkdtemp(dir=session_scratch("zm_stream"))
    d = _land_events_by_id(spark, sf_dir, chunks)
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    ckpt = os.path.join(work, "ckpt")
    store = ParquetStateStore(os.path.join(work, "zonemaps"), run_id=ckpt)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        # no-freeze: zone-map state is a MIN/MAX semilattice plus a COUNT
        # sum — no batch-0 seed artifact, commit_seed_state does not
        # apply. The n_rows sum makes replay non-idempotent, so the
        # already_applied guard is load-bearing.
        if store.already_applied(batch_id):
            return
        ss = batch_df.sparkSession
        part = batch_df.groupBy(
            F.expr(f"event_id DIV {_ZM_FILE_ROWS}").cast("bigint").alias(
                "file_id"
            )
        ).agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min(F.unix_micros("ts")).cast("bigint").alias("min_ts_us"),
            F.max(F.unix_micros("ts")).cast("bigint").alias("max_ts_us"),
            F.min("value").cast("double").alias("min_value"),
            F.max("value").cast("double").alias("max_value"),
            F.min("event_type").alias("min_type"),
            F.max("event_type").alias("max_type"),
        )
        prev = store.latest(ss)
        merged = (
            part
            if prev is None
            else prev.unionByName(part)
            .groupBy("file_id")
            .agg(
                F.sum("n_rows").cast("bigint").alias("n_rows"),
                F.min("min_ts_us").cast("bigint").alias("min_ts_us"),
                F.max("max_ts_us").cast("bigint").alias("max_ts_us"),
                F.min("min_value").cast("double").alias("min_value"),
                F.max("max_value").cast("double").alias("max_value"),
                F.min("min_type").alias("min_type"),
                F.max("max_type").alias("max_type"),
            )
        )
        store.commit(merged, batch_id)

    with _scoped_shuffle_partitions(spark):
        writer = (
            stream.writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
        )
        await_stream_with_retry(writer.start)
    return store.latest(spark).select(
        "file_id",
        "n_rows",
        "min_ts_us",
        "max_ts_us",
        "min_value",
        "max_value",
        "min_type",
        "max_type",
    )


@register("layout_zonemap_streaming", _ZM_STREAM_ORACLE)  # flipped r16 per plan
def layout_zonemap_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the events table in event_id-ordered chunks, folding each
    micro-batch's per-file COUNT/MIN/MAX partials into the versioned
    zone-map state; return the final per-file statistics table, which
    must equal the one-shot batch derivation (see block comment)."""
    return streamed_zonemaps(spark, sf_dir, chunks=2)


# ---------------------------------------------------------------------------
# Streaming BPE tokenization census (round-14 second pass; REGISTRATION
# STAGED FOR ROUND 17 — flip the commented lines). Completes the
# tokenizer family's streaming leg: text_bpe_merge_step trains one
# merge, text_bpe_train the K-merge table, text_bpe_encode censuses the
# corpus one-shot, text_bpe_token_stats profiles — and THIS tokenizes at
# ARRIVAL: documents land in doc_id-ordered micro-batches, each batch's
# per-(source, token) counts join the FROZEN tokenizer artifact (the
# trained vocab's token -> n_syms table, persisted once and read back
# per batch — exactly how a deployed pipeline ships a tokenizer: trained
# offline, immutable at ingest), and the per-source additive partials
# (n_pretokens, n_bpe_tokens — a SUM monoid) fold into the versioned
# state store. The micro-ratio is derived at READ from the folded sums,
# so the final census equals text_bpe_encode's full-corpus oracle row
# for row, and chunk count cannot change the answer.
#
# Replay: sums are NOT idempotent — the already_applied guard is
# load-bearing (the census twin's contract).
#
# Scale: per micro-batch the work is one tokenize pass over the BATCH
# (regexp extract + explode, map-side), one broadcast join against the
# vocab-sized artifact, and a |sources|-row monoid merge; state is
# |sources| rows, the corpus is never rescanned, and the tokenizer
# artifact is read, never retrained. At 100 TB the stream tokenizes at
# arrival speed — the shape every LLM-ingest pipeline runs.
# ---------------------------------------------------------------------------
def streamed_bpe_census(
    spark: SparkSession, sf_dir: str, chunks: int = 2
) -> DataFrame:
    """Run the BPE tokenization census over the documents corpus landed in
    `chunks` doc_id-ordered micro-batches against the frozen trained
    vocab; returns the final per-source census (source, n_pretokens,
    n_bpe_tokens, syms_per_pretoken_micro), which must equal the
    full-corpus one-shot text_bpe_encode."""
    from hive_server_spark.functions import text as _T
    from hive_server_spark.plans.text_pack import _bpe_train
    from hive_server_spark.streaming.incremental import (
        ParquetStateStore,
        await_stream_with_retry,
    )

    work = tempfile.mkdtemp(dir=session_scratch("bpe_stream"))
    # the frozen tokenizer artifact: train once (session-cached), persist
    # the token -> n_syms table, and read it back per batch — the
    # prior-snapshot discipline (emb_pq_incremental), not a batch-0 freeze
    _merges, vocab = _bpe_train(spark, sf_dir)
    enc_path = os.path.join(work, "enc")
    vocab.select(
        "token", F.size(F.split("symseq", " ")).cast("bigint").alias("n_syms")
    ).write.mode("overwrite").parquet(enc_path)

    d = _land_documents(spark, sf_dir, chunks)
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    ckpt = os.path.join(work, "ckpt")
    store = ParquetStateStore(os.path.join(work, "census"), run_id=ckpt)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        # no-freeze: the tokenizer artifact is persisted TRAIN metadata
        # (token -> n_syms), shipped frozen and read back per batch — it
        # is not derived from any batch's slice, so the batch-0
        # commit_seed_state contract does not apply. The census sums are
        # NOT idempotent — the already_applied guard is load-bearing.
        if store.already_applied(batch_id):
            return
        ss = batch_df.sparkSession
        enc = ss.read.parquet(enc_path)
        part = (
            batch_df.select(
                "source",
                F.explode(F.expr(_T.bpe_tokens_expr("text", "s"))).alias(
                    "token"
                ),
            )
            .groupBy("source", "token")
            .agg(F.count("*").alias("cnt"))
            .join(F.broadcast(enc), "token")
            .groupBy("source")
            .agg(
                F.sum("cnt").cast("bigint").alias("n_pretokens"),
                F.sum(F.col("cnt") * F.col("n_syms"))
                .cast("bigint")
                .alias("n_bpe_tokens"),
            )
        )
        prev = store.latest(ss)
        merged = (
            part
            if prev is None
            else prev.unionByName(part)
            .groupBy("source")
            .agg(
                F.sum("n_pretokens").cast("bigint").alias("n_pretokens"),
                F.sum("n_bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
            )
        )
        store.commit(merged, batch_id)

    with _scoped_shuffle_partitions(spark):
        writer = (
            stream.writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
        )
        await_stream_with_retry(writer.start)
    out = store.latest(spark)
    return out.select(
        "source",
        "n_pretokens",
        "n_bpe_tokens",
        F.round(
            1000000.0 * F.col("n_bpe_tokens") / F.col("n_pretokens")
        )
        .cast("bigint")
        .alias("syms_per_pretoken_micro"),
    )


# round 17 (flip both lines):
# from hive_server_spark.plans.text_pack import _BPE_ENCODE_ORACLE
# @register("text_bpe_streaming", _BPE_ENCODE_ORACLE)
def text_bpe_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the documents corpus in doc_id-ordered chunks, tokenize each
    micro-batch against the frozen trained vocab, and fold the per-source
    census partials into the versioned state store; return the final
    census, which must equal the one-shot text_bpe_encode (see block
    comment)."""
    return streamed_bpe_census(spark, sf_dir, chunks=2)


# ---------------------------------------------------------------------------
# Streaming AUDIO-fingerprint near-dup ingest (round-14 second pass;
# REGISTRATION STAGED FOR ROUND 17 — flip the commented @register).
# Closes the last modality gap in the streaming ingest matrix: text,
# image, embeddings (IVF + PQ), and layout (DV + zone maps) all have
# arrival-time members; audio had only the batch near-dup and the fused
# batch-incremental refresh. Same shape as the image twin
# (streamed_media_neardup): the media-bearing corpus slice
# (doc_id % _MEDIA_STREAM_MOD — the SAME slice; a doc's bundle carries
# its thumbnail and its audio track together) lands in media_id-ordered
# micro-batches, each batch synthesizes + WAV-decodes ONLY its own
# clips, its frame-energy fingerprint band partials MIN-merge into the
# versioned band index, and the batch flags against the post-merge
# index. Replay: the merge is an idempotent semilattice; the flags
# append is guarded (load-bearing). The final flags table must equal
# the batch occupied-band rule on the same slice — the slice-scoped
# _audio_fp_bands_ctes oracle.
#
# Scale: state is (band_idx, band_val, min_media_id) — bytes per clip,
# not samples; payloads never shuffle (partition-preserving decode
# inside the batch); at 100 TB the stream ingests at WAV-decode speed
# and the index grows with DISTINCT band values only.
# ---------------------------------------------------------------------------
from hive_server_spark.plans.multimodal_pack import _audio_fp_bands_ctes  # noqa: E402

_AUDIO_NEARDUP_STREAM_ORACLE = f"""
WITH {_audio_fp_bands_ctes(
    f"(SELECT * FROM documents WHERE doc_id % {_MEDIA_STREAM_MOD} = 0)"
)},
bmin AS (
  SELECT band_idx, band_val, MIN(doc_id) AS min_id
  FROM bands GROUP BY band_idx, band_val
),
j AS (
  SELECT b.doc_id, m.min_id
  FROM bands b
  JOIN bmin m ON b.band_idx = m.band_idx AND b.band_val = m.band_val
  WHERE m.min_id < b.doc_id
)
SELECT CAST(j.doc_id AS BIGINT)      AS media_id,
       CAST(COUNT(*) AS BIGINT)      AS n_occupied_bands,
       CAST(MIN(j.min_id) AS BIGINT) AS partner_media_id
FROM j GROUP BY j.doc_id
"""


def streamed_audio_neardup(
    spark: SparkSession, sf_dir: str, chunks: int = 2,
    media_mod: int = _MEDIA_STREAM_MOD,
) -> DataFrame:
    """Run the incremental audio-fingerprint band index over the media
    corpus landed in `chunks` media_id-ordered micro-batches; each batch
    WAV-decodes ONLY its own clips. Returns the final flags table
    (media_id, n_occupied_bands, partner_media_id); chunk count must not
    change the answer. `media_mod` selects the media-bearing slice, as
    in the image twin."""
    from hive_server_spark.streaming.incremental import (
        ParquetStateStore,
        await_stream_with_retry,
    )

    work = tempfile.mkdtemp(dir=session_scratch("audio_neardup_stream"))
    d = _land_documents(spark, sf_dir, chunks)
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    ckpt = os.path.join(work, "ckpt")
    bands_store = ParquetStateStore(os.path.join(work, "bands"), run_id=ckpt)
    flags_store = ParquetStateStore(os.path.join(work, "flags"), run_id=ckpt)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        # no-freeze: the fingerprint band index is a MIN semilattice —
        # no id-windowed bootstrap artifact, commit_seed_state does not
        # apply (static audit: test_streaming). The flags append is NOT
        # idempotent — that guard is load-bearing.
        ss = batch_df.sparkSession
        wide = _M.audio_fingerprint_bands(
            _M.synthesize_fpwav_media(
                batch_df.where(F.col("doc_id") % media_mod == 0)
                .repartition(ss.sparkContext.defaultParallelism)
            )
        )
        bands = _M.band_long(wide).persist()
        try:
            if not bands_store.already_applied(batch_id):
                part = bands.groupBy("band_idx", "band_val").agg(
                    F.min("media_id").alias("min_media_id")
                )
                cur = bands_store.latest(ss)
                merged = (
                    part
                    if cur is None
                    else cur.unionByName(part)
                    .groupBy("band_idx", "band_val")
                    .agg(F.min("min_media_id").alias("min_media_id"))
                )
                bands_store.commit(merged, batch_id)
            if not flags_store.already_applied(batch_id):
                state = bands_store.latest(ss)
                flagged = (
                    bands.join(state, ["band_idx", "band_val"])
                    .where(F.col("min_media_id") < F.col("media_id"))
                    .groupBy("media_id")
                    .agg(
                        F.count("*").alias("n_occupied_bands"),
                        F.min("min_media_id").alias("partner_media_id"),
                    )
                )
                prev = flags_store.latest(ss)
                flags_store.commit(
                    flagged if prev is None else prev.unionByName(flagged),
                    batch_id,
                )
        finally:
            bands.unpersist()

    with _scoped_shuffle_partitions(spark):
        writer = (
            stream.writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
        )
        await_stream_with_retry(writer.start)
    out = flags_store.latest(spark)
    return out.select(
        F.col("media_id").cast("bigint").alias("media_id"),
        F.col("n_occupied_bands").cast("bigint").alias("n_occupied_bands"),
        F.col("partner_media_id").cast("bigint").alias("partner_media_id"),
    )


# round 17: @register("audio_neardup_streaming", _AUDIO_NEARDUP_STREAM_ORACLE)
def audio_neardup_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the media corpus in media_id-ordered chunks, WAV-decode each
    micro-batch once, and maintain the audio-fingerprint band near-dup
    index incrementally; return the flagged-media table, which must equal
    the batch occupied-band rule on the same slice (see block comment)."""
    return streamed_audio_neardup(spark, sf_dir, chunks=2)
