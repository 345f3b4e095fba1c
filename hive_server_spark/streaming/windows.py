"""Watermarked event-time windows over the `events` stream (SURVEY ST2).

The reference needs no watermark (chain events arrive in block order); the
extension `events` table is a general out-of-order stream, so the streaming
twins of the batch rollup/sessionization use event-time watermarks:

- `hourly_rollup_stream`: tumbling 1-hour windows, append mode — a window
  finalizes (and becomes immutable output) once the watermark passes its
  end; later-than-watermark events are dropped, the documented late-data
  policy.
- `session_stream`: `session_window(ts, gap)` — Spark's native gap-based
  session assignment, the streaming twin of the lag/island batch
  sessionization (plans/events_pack.py evt_sessions).

Scale posture: both are standard partial-aggregate + state-store plans;
state is bounded by (watermark horizon × key cardinality), and the
watermark bounds memory — without it session state would grow forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_rollup_stream(events_stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("bucket"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_stream(
    events_stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def sliding_rollup_stream(
    events_stream: DataFrame,
    size: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Overlapping (sliding) event-time windows: every event lands in
    size/slide windows (4 here). Same append-mode finalization contract as
    the tumbling rollup — a window emits once the watermark passes its end.
    State is size/slide × the tumbling window count: the multiplier is the
    overlap factor, still bounded by (watermark horizon × key cardinality)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size, slide).alias("win"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("bucket"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
