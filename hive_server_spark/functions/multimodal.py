"""Multimodal (image/audio/video) column plumbing (north-star extension).

Media are opaque `binary` payload columns + typed metadata structs; all
compute-heavy per-item work (decode, feature extraction, frame sampling)
runs as Arrow-batched `mapInPandas` generators — the pattern that scales:
executors stream RecordBatches through Python, nothing is collected, batch
size bounded by spark.sql.execution.arrow.maxRecordsPerBatch.

The actual codec step is STUBBED: this container has no image/audio libs,
so `decode_media` uses a clearly-marked deterministic fake (seeded from the
payload bytes) and raises NotImplementedError when a real codec is requested
via strict=True. Everything Spark-side — schema, partitioning, UDF
signatures, Arrow batch shapes — is real and tested.

Scale posture: mapInPandas preserves partitioning (no shuffle); payload
bytes stay columnar end-to-end via Arrow; feature vectors come back as
array<float> ready for functions/embeddings.py similarity ops."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), False),
        StructField("meta", StructType([
            StructField("declared_format", StringType(), True),
            StructField("n_bytes", LongType(), True),
        ]), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mean_luma", FloatType(), True),
        StructField("decoder", StringType(), False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("features", ArrayType(FloatType()), False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_payload", BinaryType(), False),
    ]
)


def synthesize_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic media fixtures: payload = utf8 bytes of the document
    text (stands in for compressed media bytes). Pure column expressions."""
    from hive_server_spark.functions.text import spread

    docs = spread(docs)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("fake/%s" % kind).alias("declared_format"),
            F.col("n_chars").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for a codec: dimensions and mean luminance
    derived from the bytes themselves. STUB — replace with PIL/ffmpeg on a
    cluster image that ships codecs."""
    n = len(payload)
    width = 16 + (payload[0] if n else 0) % 240
    height = 16 + (payload[-1] if n else 0) % 240
    mean_luma = (sum(payload[:256]) / min(n, 256) / 255.0) if n else 0.0
    return width, height, float(mean_luma)


def decode_media(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode payloads to (width, height, mean_luma) via mapInPandas.

    strict=True demands a real codec and raises NotImplementedError (none is
    available in this environment); strict=False uses the deterministic fake
    so the full pipeline stays testable."""
    if strict:
        raise NotImplementedError(
            "real media codecs (PIL/libav) are not available in this "
            "environment; run with strict=False for the deterministic stub"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mean_luma": [d[2] for d in decoded],
                    "decoder": "fake-deterministic",
                }
            )

    return media.mapInPandas(decode, schema=DECODED_SCHEMA)


def extract_features(media: DataFrame, n_bins: int = 16) -> DataFrame:
    """Byte-histogram feature vector (n_bins, L1-normalized) per payload —
    the feature-extraction slot; output plugs into the similarity-search
    operators (functions/embeddings.py)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                hist = np.bincount(arr // (256 // n_bins), minlength=n_bins)[:n_bins]
                total = max(int(hist.sum()), 1)
                feats.append((hist / total).astype("float32").tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.mapInPandas(featurize, schema=FEATURE_SCHEMA)


DECODED_FEATURES_SCHEMA = StructType(
    DECODED_SCHEMA.fields
    + [
        StructField("n_bytes", LongType(), False),
        StructField("features", ArrayType(FloatType()), False),
    ]
)


def decode_and_featurize(media: DataFrame, n_bins: int = 16) -> DataFrame:
    """Fused decode + feature pass: one mapInPandas, one trip through the
    Python workers — for pipelines that need both outputs, this halves the
    Arrow transfer and worker overhead versus running decode_media and
    extract_features separately."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            decoded, feats, sizes = [], [], []
            for p in pdf["payload"]:
                b = bytes(p)
                decoded.append(_fake_decode(b))
                sizes.append(len(b))
                arr = np.frombuffer(b, dtype=np.uint8)
                hist = np.bincount(arr // (256 // n_bins), minlength=n_bins)[:n_bins]
                total = max(int(hist.sum()), 1)
                feats.append((hist / total).astype("float32").tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mean_luma": [d[2] for d in decoded],
                    "decoder": "fake-deterministic",
                    "n_bytes": sizes,
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=DECODED_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Uniform frame sampling for 'video' payloads: slice the byte stream
    into n_frames equal chunks (stand-in for keyframe extraction), exploded
    one row per frame. mapInPandas so a 100 MB payload never transits the
    driver."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    payloads.append(b[i * step : (i + 1) * step])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return media.where(F.col("kind") == "video").mapInPandas(frames, schema=FRAME_SCHEMA)
