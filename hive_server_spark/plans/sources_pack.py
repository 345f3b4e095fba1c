"""Source-format coverage: JSONL and CSV round trips, value-gated.

The reference ingests JSON exclusively (JSON-RPC responses and Redis JSON
blobs, reference src/utils/ethers.ts, src/models/order-book.ts:61-77); an
engine replacing it must read the same data from text formats without
corrupting types. Each gate query here lands the events table in a text
format, reads it back with an explicit schema, and aggregates — the oracle
aggregates the ORIGINAL parquet, so any loss in the round trip (timestamp
precision, double formatting, quoting/escaping) breaks the value hash.

Scale posture: schema-on-read with an explicit schema (no inference pass —
inference scans the data twice and is O(input)); timestamps are pinned to a
microsecond-precision format; the aggregation itself is the same one-shuffle
rollup as evt_hourly_rollup.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_server_spark.catalog import load_table
from hive_server_spark.registry import register
from hive_server_spark.session_cache import SessionCache

# microsecond-precision wire format: Spark's default JSON/CSV timestamp
# pattern keeps millis only, which would silently truncate event times
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

_ROLLUP_ORACLE = """
SELECT date_trunc('hour', ts) AS bucket, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
"""


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    work = tempfile.mkdtemp(prefix=f"hss_{fmt}_")
    path = os.path.join(work, f"events_{fmt}")
    writer = ev.write
    reader = spark.read.schema(ev.schema)
    if fmt in ("json", "csv"):
        writer = writer.option("timestampFormat", _TS_FMT)
        reader = reader.option("timestampFormat", _TS_FMT)
    if fmt == "csv":
        writer = writer.option("header", "true")
        reader = reader.option("header", "true")
    getattr(writer, fmt)(path)
    return getattr(reader, fmt)(path)


def _rollup(e: DataFrame) -> DataFrame:
    return e.groupBy(F.date_trunc("hour", "ts").alias("bucket"), "event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


@register("src_jsonl_roundtrip", _ROLLUP_ORACLE)
def src_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _rollup(_roundtrip(spark, sf_dir, "json"))


@register("src_csv_roundtrip", _ROLLUP_ORACLE)
def src_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _rollup(_roundtrip(spark, sf_dir, "csv"))


@register("src_orc_roundtrip", _ROLLUP_ORACLE)
def src_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC is binary/typed like parquet, so the round trip checks the
    columnar path rather than text parsing — timestamps survive at full
    microsecond precision without a format pin."""
    return _rollup(_roundtrip(spark, sf_dir, "orc"))


# ---------------------------------------------------------------------------
# Z-order layout manifest: rows assigned to Z-contiguous files over two
# dimensions, manifest = per-file count + bounding boxes. Closed-form bit
# arithmetic, so the layout decision itself is value-gated.
# ---------------------------------------------------------------------------
from hive_server_spark.sources.zorder import zorder_manifest, zvalue_sql  # noqa: E402

_Z_X = "user_id % 256"
_Z_Y = "CAST(floor(value) AS BIGINT) % 256"
_Z_STRIDE = (1 << 16) // 16

_ZORDER_ORACLE = f"""
WITH pts AS (
  SELECT {_Z_X} AS zx, {_Z_Y} AS zy FROM events
), z AS (
  SELECT zx, zy, {zvalue_sql('zx', 'zy')} AS zval FROM pts
)
SELECT CAST(zval // {_Z_STRIDE} AS BIGINT) AS file_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(zx) AS BIGINT) AS x_min,
       CAST(MAX(zx) AS BIGINT) AS x_max,
       CAST(MIN(zy) AS BIGINT) AS y_min,
       CAST(MAX(zy) AS BIGINT) AS y_max
FROM z GROUP BY 1
"""


@register("layout_zorder_manifest", _ZORDER_ORACLE)
def layout_zorder_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-curve file assignment over (user bucket, value bucket): each
    file's manifest row carries its (x, y) bounding box, which is what lets
    a 2-D range predicate prune to a handful of files — the Z-ORDER layout
    primitive of lakehouse tables, value-gated as pure integer math."""
    e = load_table(spark, sf_dir, "events")
    return zorder_manifest(
        e,
        x=F.expr(_Z_X),
        y=F.expr(_Z_Y),
        bits=8,
        files=16,
    )


# ---------------------------------------------------------------------------
# Hive-partitioned layout round trip (round 6): write events partitioned by
# event_type (the §2 layout primitive: partition columns become directory
# keys), read back ONE partition through a pushed filter, and aggregate.
# The oracle filters the original table, so partition-column type recovery
# and row routing are both value-gated; tests/test_scale_utils.py pins that
# the physical scan actually prunes (PartitionFilters, one directory).
# ---------------------------------------------------------------------------
_PART_TYPE = "purchase"

_PART_ORACLE = f"""
SELECT date_trunc('hour', ts) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
WHERE event_type = '{_PART_TYPE}'
GROUP BY date_trunc('hour', ts)
"""


# the partitioned layout is identical for every caller in a session (gate
# hash, bench timing loops, pruning test) — land it once per (session,
# sf_dir) like streaming_pack._LANDED, and delete evicted dirs so
# long-lived processes don't leak disk
_PARTITIONED: SessionCache[str] = SessionCache(
    on_evict=lambda d: shutil.rmtree(os.path.dirname(d), ignore_errors=True)
)


def partitioned_events_path(spark: SparkSession, sf_dir: str) -> str:
    """Write events hive-partitioned by event_type once per (session,
    sf_dir); callers read specific partitions back through pushed
    filters."""

    def land() -> str:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "value", "event_type"
        )
        work = tempfile.mkdtemp(prefix="hss_part_")
        path = os.path.join(work, "events_by_type")
        ev.write.partitionBy("event_type").parquet(path)
        return path

    return _PARTITIONED.get_or_create(spark, ("events_by_type", sf_dir), land)


@register("src_partitioned_roundtrip", _PART_ORACLE)
def src_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = partitioned_events_path(spark, sf_dir)
    back = spark.read.parquet(path).where(F.col("event_type") == _PART_TYPE)
    return back.groupBy(F.date_trunc("hour", "ts").alias("bucket")).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Compaction plan (round 7): the lakehouse small-file maintenance
# primitive — given a file manifest (documents standing in as the
# per-partition file listing: doc_id = file, n_chars = bytes, source =
# partition directory), assign input files to target-size output files by
# streaming first-fit: within each partition, files in manifest order are
# packed into output file floor(bytes_before / TARGET). Pure integer
# prefix-sum arithmetic, so the layout decision itself is value-gated.
# Scale shape: ONE shuffle keyed by the partition directory; the running
# sum is a per-partition ROWS window (parallel across partitions — a real
# lakehouse has orders of magnitude more partition dirs than executors);
# the per-output-file rollup is map-side combined. No global sort, no
# driver-side file listing loop.
# ---------------------------------------------------------------------------
_COMPACT_TARGET = 16384  # target output size (chars standing in for bytes)

_COMPACT_ORACLE = f"""
WITH c AS (
  SELECT source, doc_id, n_chars,
         COALESCE(SUM(n_chars) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bytes_before
  FROM documents
)
SELECT source,
       CAST(bytes_before // {_COMPACT_TARGET} AS BIGINT) AS out_file,
       CAST(COUNT(*) AS BIGINT) AS n_inputs,
       CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
       CAST(MIN(doc_id) AS BIGINT) AS first_input,
       CAST(MAX(doc_id) AS BIGINT) AS last_input
FROM c GROUP BY source, out_file
"""


def compaction_plan(manifest: DataFrame, target: int = _COMPACT_TARGET) -> DataFrame:
    """Streaming first-fit bin packing of small files into target-size
    outputs, one plan row per output file with its input count, byte
    total, and input-id range — what an OPTIMIZE/compaction job executes.
    `manifest` columns: source (partition dir), doc_id (file), n_chars
    (bytes). See the block comment above for the plan shape."""
    docs = manifest.select("source", "doc_id", "n_chars")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = docs.withColumn(
        "bytes_before", F.coalesce(F.sum("n_chars").over(w), F.lit(0))
    )
    return c.groupBy(
        "source",
        F.expr(f"CAST(bytes_before DIV {target} AS BIGINT)").alias("out_file"),
    ).agg(
        F.count("*").cast("bigint").alias("n_inputs"),
        F.sum("n_chars").cast("bigint").alias("total_bytes"),
        F.min("doc_id").cast("bigint").alias("first_input"),
        F.max("doc_id").cast("bigint").alias("last_input"),
    )


@register("layout_compaction_plan", _COMPACT_ORACLE)
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return compaction_plan(load_table(spark, sf_dir, "documents"))
