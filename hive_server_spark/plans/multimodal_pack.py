"""Gate entries for the multimodal surface. Every entry is value-gated:
the codec step is a deterministic stub (functions/multimodal.py), so even
the decode profile faces a closed-form byte-level DuckDB oracle; operator
semantics are additionally pinned by tests/test_multimodal.py."""

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


# The stub codec (functions/multimodal.py:_fake_decode) is a deterministic
# pure function of the payload bytes — width/height from the first/last
# byte, mean luma from the first 256 bytes, histogram bin 0 from bytes <16 —
# so the whole decode+featurize pass faces a closed-form DuckDB oracle that
# recomputes the same quantities byte-by-byte (hex-string extraction). The
# float32 outputs are folded back to the integer quantities they encode
# (round() recovers them exactly: worst-case reconstruction error is
# 65280·2⁻²⁴ ≈ 0.004 for luma, n_bytes·2⁻²⁴ for bin0 — both ≪ 0.5).
@register(
    "multimodal_decode_profile",
    """
WITH m AS (
  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
), fl AS (
  SELECT media_id, n,
         16 + (CASE WHEN n > 0 THEN ('0x'||substr(hx, 1, 2))::BIGINT ELSE 0 END) % 240
           AS width,
         16 + (CASE WHEN n > 0 THEN ('0x'||substr(hx, 2*n-1, 2))::BIGINT ELSE 0 END) % 240
           AS height
  FROM m
), b AS (
  SELECT media_id, n, unnest(range(1, n+1)) AS i, hx FROM m
), byteagg AS (
  SELECT media_id,
         SUM(CASE WHEN i <= 256 THEN ('0x'||substr(hx, 2*i-1, 2))::BIGINT ELSE 0 END)
           AS first256,
         SUM(CASE WHEN ('0x'||substr(hx, 2*i-1, 2))::BIGINT < 16 THEN 1 ELSE 0 END)
           AS bin0
  FROM b GROUP BY media_id
)
SELECT 'image' AS kind, 'fake-deterministic' AS decoder,
       CAST(COUNT(*) AS BIGINT)                       AS n_media,
       CAST(MIN(width) AS BIGINT)                     AS min_width,
       CAST(MAX(height) AS BIGINT)                    AS max_height,
       CAST(SUM(width) AS BIGINT)                     AS sum_width,
       CAST(SUM(height) AS BIGINT)                    AS sum_height,
       CAST(SUM(COALESCE(first256, 0)) AS BIGINT)     AS sum_first256_bytes,
       CAST(SUM(COALESCE(bin0, 0)) AS BIGINT)         AS bin0_bytes
FROM fl LEFT JOIN byteagg USING (media_id)
""",
)
def multimodal_decode_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize media from documents, run the fused decode+featurize pass
    (one mapInPandas, one Python-worker round trip), then fold the float32
    decode outputs back to the integer byte quantities they encode so the
    profile is hash-comparable with the byte-level DuckDB oracle."""
    media = M.synthesize_media(load_table(spark, sf_dir, "documents"))
    both = M.decode_and_featurize(media).select(
        "kind",
        "decoder",
        "width",
        "height",
        "n_bytes",
        # mean_luma = sum(payload[:256]) / min(n,256) / 255 as float32;
        # invert it to the exact integer byte sum
        F.round(
            F.col("mean_luma").cast("double")
            * F.lit(255.0)
            * F.least(F.col("n_bytes"), F.lit(256)).cast("double")
        )
        .cast("bigint")
        .alias("first256"),
        # f0 = count(bytes < 16) / max(n,1) as float32; invert to the count
        F.round(
            F.element_at("features", 1).cast("double")
            * F.greatest(F.col("n_bytes"), F.lit(1)).cast("double")
        )
        .cast("bigint")
        .alias("bin0"),
    )
    return both.groupBy("kind", "decoder").agg(
        F.count("*").cast("bigint").alias("n_media"),
        F.min("width").cast("bigint").alias("min_width"),
        F.max("height").cast("bigint").alias("max_height"),
        F.sum("width").cast("bigint").alias("sum_width"),
        F.sum("height").cast("bigint").alias("sum_height"),
        F.sum("first256").cast("bigint").alias("sum_first256_bytes"),
        F.sum("bin0").cast("bigint").alias("bin0_bytes"),
    )
