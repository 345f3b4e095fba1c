"""Gate entries for the multimodal surface. No SQL oracle — byte-level
codec/histogram work is not SQL-expressible, so the driver records the
weaker rows-only check for these (documented divergence; the operator
semantics are pinned by tests/test_multimodal.py instead)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_server_spark.catalog import load_table
from hive_server_spark.functions import multimodal as M
from hive_server_spark.registry import register


@register(
    "multimodal_inventory",
    """
WITH media AS (
  SELECT 'image' AS kind, encode(text) AS payload, n_chars FROM documents
  UNION ALL
  SELECT 'audio' AS kind, encode(text) AS payload, n_chars FROM documents
)
SELECT kind,
       CAST(COUNT(*) AS BIGINT)                  AS n_media,
       CAST(SUM(octet_length(payload)) AS BIGINT) AS payload_bytes,
       CAST(MAX(octet_length(payload)) AS BIGINT) AS max_payload_bytes,
       CAST(SUM(n_chars) AS BIGINT)              AS declared_bytes
FROM media GROUP BY kind
""",
)
def multimodal_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The binary-column plumbing, value-gated: synthesize image and audio
    payloads (opaque binary + typed metadata struct — the multimodal table
    layout), then inventory actual vs declared sizes per kind. The payload
    bytes are measured on the BINARY column, so the utf-8 encode step and
    the metadata struct both face the DuckDB oracle; only the codec stub
    itself (multimodal_decode_profile) stays rows-only."""
    docs = load_table(spark, sf_dir, "documents")
    media = M.synthesize_media(docs, kind="image").unionAll(
        M.synthesize_media(docs, kind="audio")
    )
    return media.groupBy("kind").agg(
        F.count("*").cast("bigint").alias("n_media"),
        F.sum(F.length("payload")).cast("bigint").alias("payload_bytes"),
        F.max(F.length("payload")).cast("bigint").alias("max_payload_bytes"),
        F.sum(F.col("meta.n_bytes")).cast("bigint").alias("declared_bytes"),
    )


@register(
    "multimodal_frame_inventory",
    """
WITH media AS (
  SELECT doc_id AS media_id, octet_length(encode(text)) AS n FROM documents
), f AS (
  SELECT media_id, unnest(range(4)) AS frame_idx, n,
         greatest(n // 4, 1) AS step
  FROM media
)
SELECT CAST(COUNT(DISTINCT media_id) AS BIGINT) AS n_media,
       CAST(COUNT(*) AS BIGINT)                 AS n_frames,
       CAST(SUM(greatest(least(n, (frame_idx+1)*step) - frame_idx*step, 0)) AS BIGINT)
         AS total_frame_bytes,
       CAST(MAX(greatest(least(n, (frame_idx+1)*step) - frame_idx*step, 0)) AS BIGINT)
         AS max_frame_bytes
FROM f
""",
)
def multimodal_frame_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling, value-gated: uniform byte-slice 'keyframes' are
    deterministic arithmetic over payload lengths, so the mapInPandas
    explode (one row per frame, payload never transits the driver) faces a
    closed-form DuckDB oracle — the batch shape and slicing logic are both
    checked, leaving only the real codec stubbed."""
    media = M.synthesize_media(load_table(spark, sf_dir, "documents"), kind="video")
    frames = M.sample_frames(media, n_frames=4)
    return frames.agg(
        F.count_distinct("media_id").cast("bigint").alias("n_media"),
        F.count("*").cast("bigint").alias("n_frames"),
        F.sum(F.length("frame_payload")).cast("bigint").alias("total_frame_bytes"),
        F.max(F.length("frame_payload")).cast("bigint").alias("max_frame_bytes"),
    )


@register("multimodal_decode_profile")  # rows-only: codec stub, not SQL-expressible
def multimodal_decode_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize media from documents, decode via mapInPandas (deterministic
    stub codec), join with the 16-bin byte-histogram features, and aggregate
    per decoder/kind — exercises the full binary-column pipeline."""
    media = M.synthesize_media(load_table(spark, sf_dir, "documents"))
    # fused decode+feature pass: one mapInPandas, no join, no second
    # Python-worker round trip
    both = M.decode_and_featurize(media).withColumn(
        "f0", F.element_at("features", 1)
    )
    return (
        both.groupBy("kind", "decoder")
        .agg(
            F.count("*").cast("bigint").alias("n_media"),
            F.min("width").cast("bigint").alias("min_width"),
            F.max("height").cast("bigint").alias("max_height"),
            F.sum(F.col("f0").cast("decimal(18,9)")).cast("double").alias("sum_f0"),
        )
    )
