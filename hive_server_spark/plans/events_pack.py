"""Event-stream analytics pack over the driver `events` table.

The reference's stream is an ordered blockchain event log folded into state
(SURVEY §2.9); this pack covers the *general* event-analytics surface a user
of the engine needs on top of that: time-bucketed aggregation, gap-based
sessionization, JSON property extraction, funnel conversion, and top-k users.
Batch forms here (gate-checkable vs DuckDB); the streaming module
(hive_server_spark/streaming/) maintains the same results incrementally.

Cross-engine determinism notes:
- durations use integer microseconds (`unix_micros` ≡ DuckDB `epoch_us`);
- event `value` (2-decimal double) is cast to DECIMAL(18,2) before any sum;
- every window order includes `event_id` as a total tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_server_spark.catalog import load_table
from hive_server_spark.registry import register

_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min in microseconds


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# Tumbling time windows
# ---------------------------------------------------------------------------
@register(
    "evt_hourly_rollup",
    """
SELECT date_trunc('hour', ts) AS bucket, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
)
def evt_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window per event type — the batch twin of the
    streaming `groupBy(window(ts, '1 hour'), event_type)` aggregation. One
    hash aggregate; bucket+type cardinality is bounded, so partial agg
    collapses nearly everything map-side at any scale."""
    e = _events(spark, sf_dir)
    return e.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"), "event_type"
    ).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Gap-based sessionization (lag → new-session flag → prefix sum → group)
# ---------------------------------------------------------------------------
@register(
    "evt_sessions",
    """
WITH seq AS (
  SELECT user_id, event_id, ts, value,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
), flagged AS (
  SELECT *, CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END AS is_new
  FROM seq
), numbered AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT) AS duration_us,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM numbered
GROUP BY user_id, session_no
""",
)
def evt_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap: lag → new-session flag
    → running sum (the classic island-numbering idiom). All three windows
    share one (user_id) partitioning, so Spark plans a single sort+exchange
    reused across them; the final group-by is co-partitioned — no extra
    shuffle. Streaming twin: `session_window(ts, '30 minutes')`."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    sessions = (
        e.select("user_id", "event_id", "ts", "value")
        .withColumn("gap_us", us - F.lag(us).over(w))
        .withColumn(
            "is_new",
            F.when(
                F.col("gap_us").isNull() | (F.col("gap_us") > _SESSION_GAP_US), 1
            ).otherwise(0),
        )
        .withColumn(
            "session_no",
            F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return sessions.groupBy(
        "user_id", F.col("session_no").cast("bigint").alias("session_no")
    ).agg(
        F.count("*").cast("bigint").alias("n_events"),
        (F.max(us) - F.min(us)).cast("bigint").alias("duration_us"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"),
    )


# ---------------------------------------------------------------------------
# Semi-structured props: JSON extraction
# ---------------------------------------------------------------------------
@register(
    "evt_props_stats",
    """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(k) AS BIGINT)   AS sum_k,
       CAST(MIN(k) AS BIGINT)   AS min_k,
       CAST(MAX(k) AS BIGINT)   AS max_k
FROM (SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events)
GROUP BY event_type
""",
)
def evt_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction at the edge (`get_json_object`), integer
    aggregation after — mirrors the reference's JSON-blob values parsed only
    when read (reference src/models/order-book.ts:61,71,77)."""
    e = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# Funnel: signup → later purchase, by signup-day cohort
# ---------------------------------------------------------------------------
@register(
    "evt_funnel_cohorts",
    """
WITH first_signup AS (
  SELECT user_id, MIN(ts) AS signup_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), converted AS (
  SELECT DISTINCT f.user_id
  FROM first_signup f JOIN events e
    ON e.user_id = f.user_id AND e.event_type = 'purchase' AND e.ts > f.signup_ts
)
SELECT CAST(date_trunc('day', f.signup_ts) AS DATE) AS cohort_day,
       CAST(COUNT(*) AS BIGINT) AS n_signups,
       CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_converted
FROM first_signup f LEFT JOIN converted c ON f.user_id = c.user_id
GROUP BY date_trunc('day', f.signup_ts)
""",
)
def evt_funnel_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel: first signup per user, then a semi-join-shaped probe
    for a later purchase, aggregated into daily cohorts. Both joins key on
    user_id — with the fact pre-filtered by event_type at the scan, the heavy
    table is touched twice but each pass is column-pruned to 3 columns."""
    e = _events(spark, sf_dir)
    first_signup = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = e.where(F.col("event_type") == "purchase").select("user_id", "ts")
    converted = (
        first_signup.join(
            purchases,
            (first_signup.user_id == purchases.user_id)
            & (purchases.ts > first_signup.signup_ts),
            "left_semi",
        )
        .select("user_id")
        .withColumn("_conv", F.lit(1))
    )
    return (
        first_signup.join(converted, "user_id", "left_outer")
        .groupBy(F.date_trunc("day", "signup_ts").cast("date").alias("cohort_day"))
        .agg(
            F.count("*").cast("bigint").alias("n_signups"),
            F.sum(F.coalesce(F.col("_conv"), F.lit(0))).cast("bigint").alias("n_converted"),
        )
    )


# ---------------------------------------------------------------------------
# Top-k users by total value
# ---------------------------------------------------------------------------
@register(
    "evt_top_users",
    """
WITH per_user AS (
  SELECT user_id,
         SUM(CAST(value AS DECIMAL(18,2))) AS total_value,
         COUNT(*) AS n_events
  FROM events GROUP BY user_id
)
SELECT user_id, CAST(total_value AS DOUBLE) AS total_value,
       CAST(n_events AS BIGINT) AS n_events, CAST(rk AS BIGINT) AS rk
FROM (SELECT *, row_number() OVER (ORDER BY total_value DESC, user_id ASC) AS rk
      FROM per_user)
WHERE rk <= 20
""",
)
def evt_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-then-rank top-k: the global row_number runs over the already
    reduced per-user rows (|users| ≪ |events|), with a total tiebreak order.
    Exact-decimal totals make rank boundaries deterministic cross-engine."""
    e = _events(spark, sf_dir)
    per_user = e.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
        F.count("*").alias("n_events"),
    )
    from hive_server_spark.operators.topk import global_topk

    return global_topk(
        per_user, [F.desc("total_value"), F.asc("user_id")], 20
    ).select(
        "user_id",
        F.col("total_value").cast("double").alias("total_value"),
        F.col("n_events").cast("bigint").alias("n_events"),
        "rk",
    )


# ---------------------------------------------------------------------------
# Range-frame moving aggregate (event-time trailing window)
# ---------------------------------------------------------------------------
@register(
    "evt_trailing_hour_value",
    """
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS trailing_hour_value,
       CAST(COUNT(*) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS trailing_hour_events
FROM events WHERE user_id % 3 = 0
""",
)
def evt_trailing_hour_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time (trailing 1 hour in integer microseconds —
    the value-based frame spec, distinct from every ROWS frame elsewhere).
    Exact decimal sums; frame bounds are integers so both engines agree on
    inclusion at the boundary."""
    e = _events(spark, sf_dir).where(F.col("user_id") % 3 == 0)
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_hour_value"),
        F.count("*").over(w).cast("bigint").alias("trailing_hour_events"),
    )


# ---------------------------------------------------------------------------
# Pivot-style conditional aggregation (portable pivot)
# ---------------------------------------------------------------------------
@register(
    "evt_type_pivot",
    """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(SUM(CASE WHEN event_type = 'purchase'
                     THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_value
FROM events GROUP BY user_id
""",
)
def evt_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-user activity matrix via groupBy().pivot() — Spark plans the
    pivot as exactly the conditional aggregation the oracle spells out; one
    shuffle on user_id."""
    e = _events(spark, sf_dir)
    piv = (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("v"),
        )
    )
    return piv.select(
        "user_id",
        F.coalesce("click_n", F.lit(0)).cast("bigint").alias("n_click"),
        F.coalesce("view_n", F.lit(0)).cast("bigint").alias("n_view"),
        F.coalesce("purchase_n", F.lit(0)).cast("bigint").alias("n_purchase"),
        F.coalesce("signup_n", F.lit(0)).cast("bigint").alias("n_signup"),
        F.coalesce("error_n", F.lit(0)).cast("bigint").alias("n_error"),
        F.col("purchase_v").cast("double").alias("purchase_value"),
    )


# ---------------------------------------------------------------------------
# Cohort retention matrix
# ---------------------------------------------------------------------------
@register(
    "evt_retention_matrix",
    """
WITH first_seen AS (
  SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS DATE) AS cohort_day
  FROM events GROUP BY user_id
)
SELECT f.cohort_day,
       CAST(date_diff('day', f.cohort_day, CAST(date_trunc('day', e.ts) AS DATE))
            AS BIGINT) AS day_offset,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
FROM events e JOIN first_seen f ON e.user_id = f.user_id
GROUP BY f.cohort_day,
         date_diff('day', f.cohort_day, CAST(date_trunc('day', e.ts) AS DATE))
""",
)
def evt_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention: users bucketed by first-seen day, activity counted
    per day offset. Two passes over events, both pruned to (user_id, ts);
    the first-seen side reduces to one row per user before the join."""
    e = _events(spark, sf_dir)
    first_seen = (
        e.groupBy("user_id")
        .agg(F.date_trunc("day", F.min("ts")).cast("date").alias("cohort_day"))
    )
    return (
        e.select("user_id", F.date_trunc("day", "ts").cast("date").alias("day"))
        .join(first_seen, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).cast("bigint").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").cast("bigint").alias("active_users"))
    )


# ---------------------------------------------------------------------------
# MAD-based anomaly report (round 6): the robust outlier detector a feature
# pipeline runs where winsorization (evt_winsor_stats) would clip — flag
# values beyond median ± 3·MAD per event type. Median and MAD are exact
# interpolated percentiles (bit-identical cross-engine, the
# rel_mad_by_priority discipline); the 3·MAD threshold and |value − med|
# comparisons are single IEEE ops on those identical doubles, so even the
# boolean flag counts are hash-stable. Scale: two tiny per-type percentile
# aggregates broadcast back over one scan.
# ---------------------------------------------------------------------------
@register(
    "evt_mad_outliers",
    """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
d AS (
  SELECT e.event_type, any_value(m.med) AS med,
         quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type) GROUP BY e.event_type
)
SELECT e.event_type,
       any_value(d.med) AS median_value,
       any_value(d.mad) AS mad,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN abs(e.value - d.med) > 3 * d.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       MAX(CASE WHEN abs(e.value - d.med) > 3 * d.mad
                THEN abs(e.value - d.med) END) AS max_outlier_dev
FROM events e JOIN d USING (event_type)
GROUP BY e.event_type
""",
)
def evt_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: exact median/MAD, total and outlier counts beyond
    the 3-MAD fence, and the largest outlying deviation."""
    e = _events(spark, sf_dir)
    med = e.groupBy("event_type").agg(F.percentile("value", 0.5).alias("med"))
    d = (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("med").alias("med"),
            F.percentile(F.abs(F.col("value") - F.col("med")), 0.5).alias("mad"),
        )
    )
    dev = F.abs(F.col("value") - F.col("med"))
    out = F.col("dev") > 3 * F.col("mad")
    return (
        e.join(F.broadcast(d), "event_type")
        .withColumn("dev", dev)
        .groupBy("event_type")
        .agg(
            F.any_value("med").alias("median_value"),
            F.any_value("mad").alias("mad"),
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.when(out, 1).otherwise(0)).cast("bigint").alias("n_outliers"),
            F.max(F.when(out, F.col("dev"))).alias("max_outlier_dev"),
        )
    )
