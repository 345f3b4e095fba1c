"""Multimodal (image/audio/video) column plumbing (north-star extension).

Media are opaque `binary` payload columns + typed metadata structs; all
compute-heavy per-item work (decode, feature extraction, frame sampling)
runs as Arrow-batched `mapInPandas` generators — the pattern that scales:
executors stream RecordBatches through Python, nothing is collected, batch
size bounded by spark.sql.execution.arrow.maxRecordsPerBatch.

The codec: this container has no image/audio libs, so the decode step ships
its own pure-Python decoders for the uncompressed raster formats — PPM
(P6 binary and P3 ascii) and BMP (24-bit uncompressed BI_RGB) — doing real
header parsing and numpy pixel math in the Arrow worker. strict=True
requires every payload to be one of those formats (ValueError otherwise);
strict=False falls back to a clearly-marked deterministic fake for payloads
in formats that would need external codecs (JPEG/PNG/audio/video), keeping
the full pipeline testable. `synthesize_ppm_media` builds REAL P6 payloads
with pure column expressions, so the strict path is exercised end-to-end
by the decode-profile gate query.

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


def synthesize_ppm_media(docs: DataFrame) -> DataFrame:
    """REAL P6 PPM payloads from documents, built entirely with JVM column
    expressions: header `P6\\n<w> <h>\\n255\\n` + exactly w*h*3 pixel bytes
    (the uppercase hex expansion of the text, cycled to length — pure ASCII
    by construction, so char length == byte length regardless of the text's
    encoding). w, h ∈ [8, 15] derive from the utf-8 byte count, keeping
    payloads bounded (≤ 689 B) while every image is genuinely decodable."""
    n = F.octet_length(F.encode("text", "utf-8"))
    w = (F.lit(8) + n % 8).alias("w")
    h = (F.lit(8) + (n / F.lit(8)).cast("long") % 8).alias("h")
    sized = docs.select(F.col("doc_id"), w, h, F.col("text"))
    px_len = F.col("w") * F.col("h") * 3
    hx = F.hex(F.encode("text", "utf-8"))
    # rpad cycles the pad string and truncates past len in both Spark and
    # DuckDB — one expression covers short and long texts; empty text
    # degenerates to all-'0' pixels rather than an invalid pad
    px = F.rpad(F.when(F.length(hx) > 0, hx).otherwise(F.lit("0")), px_len,
                F.when(F.length(hx) > 0, hx).otherwise(F.lit("0")))
    payload = F.concat(
        F.encode(F.format_string("P6\n%d %d\n255\n", F.col("w"), F.col("h")), "utf-8"),
        F.encode(px, "utf-8"),
    )
    return sized.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit("image/x-portable-pixmap").alias("declared_format"),
            (px_len + F.length(F.format_string("P6\n%d %d\n255\n", F.col("w"), F.col("h"))))
            .cast("long")
            .alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_ppm(payload: bytes) -> tuple[int, int, float] | None:
    """Pure-Python PPM decode: P6 (binary) and P3 (ascii) headers, real
    pixel math. Returns (width, height, mean_luma) or None if not PPM."""
    import numpy as np

    if payload[:2] not in (b"P6", b"P3"):
        return None
    # header tokens: magic, width, height, maxval; comments (#...) allowed
    tokens: list[bytes] = []
    pos = 2
    while len(tokens) < 3 and pos < len(payload):
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos >= len(payload):
            break  # EOF during whitespace skip: fall through to truncated
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(payload[start:pos])
    if len(tokens) < 3:
        raise ValueError("truncated PPM header")
    width, height, maxval = (int(t) for t in tokens)
    if maxval <= 0 or maxval >= 65536:
        # PPM spec: 0 < maxval < 65536; a non-positive value would flow a
        # negative/garbage mean_luma downstream as a "successful" decode
        raise ValueError(f"invalid PPM maxval {maxval}")
    if payload[:2] == b"P6":
        if maxval > 255:
            # 2-bytes-per-sample P6; reading it as 8-bit would silently
            # return a wrong mean — refuse instead of mis-decoding
            raise ValueError(f"unsupported PPM maxval {maxval} (> 255 needs 16-bit samples)")
        pos += 1  # exactly one whitespace byte after maxval
        need = width * height * 3
        if len(payload) - pos < need:
            raise ValueError("truncated PPM pixel data")
        pixels = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
        mean = float(pixels.mean()) if pixels.size else 0.0
    else:  # P3: ascii sample values
        samples = np.array(payload[pos:].split(), dtype=np.int64)
        if samples.size != width * height * 3:
            raise ValueError("P3 sample count mismatch")
        mean = float(samples.mean()) if samples.size else 0.0
    return width, height, mean / maxval if maxval else 0.0


def _decode_bmp(payload: bytes) -> tuple[int, int, float] | None:
    """Pure-Python BMP decode: BITMAPFILEHEADER + BITMAPINFOHEADER, 24-bit
    uncompressed (BI_RGB), bottom-up or top-down, honoring the 4-byte row
    stride padding. Returns (width, height, mean_luma) or None if not BMP."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        return None
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, width, height_raw = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    height = abs(height_raw)
    stride = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    need = data_offset + stride * height
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * height,
                         offset=data_offset).reshape(height, stride)
    pixels = rows[:, : width * 3]  # drop stride padding
    mean = float(pixels.mean()) if pixels.size else 0.0
    return width, height, mean / 255.0


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for formats needing external codecs
    (JPEG/PNG/audio): dimensions and mean luminance derived from the bytes
    themselves. Only reachable with strict=False."""
    n = len(payload)
    width = 16 + (payload[0] if n else 0) % 240
    height = 16 + (payload[-1] if n else 0) % 240
    mean_luma = (sum(payload[:256]) / min(n, 256) / 255.0) if n else 0.0
    return width, height, float(mean_luma)


def _decode_one(payload: bytes, strict: bool) -> tuple[int, int, float, str]:
    b = bytes(payload)
    try:
        real = _decode_ppm(b)
        if real is None:
            real = _decode_bmp(b)
    except ValueError:
        # magic bytes collided with PPM/BMP but the payload is not a valid
        # raster (e.g. text starting "BMW…"): a strict decode propagates the
        # codec's diagnostic; non-strict falls back to the fake like any
        # other unsupported format instead of failing the whole task
        if strict:
            raise
        real = None
    if real is not None:
        decoder = "ppm" if b[:1] == b"P" else "bmp"
        return (*real, decoder)
    if strict:
        raise ValueError(
            f"unsupported media format (magic {b[:2]!r}); strict decode "
            "handles PPM (P6/P3) and uncompressed 24-bit BMP"
        )
    return (*_fake_decode(b), "fake-deterministic")


def decode_media(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode payloads to (width, height, mean_luma) via mapInPandas.

    Real pure-Python decoders handle PPM (P6/P3) and uncompressed 24-bit
    BMP — actual header parsing + numpy pixel math in the Arrow worker.
    strict=True errors on any other format; strict=False falls back to the
    deterministic fake for them so the full pipeline stays testable."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_one(p, strict) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mean_luma": [d[2] for d in decoded],
                    "decoder": [d[3] for d in decoded],
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


def decode_and_featurize(
    media: DataFrame, n_bins: int = 16, strict: bool = False
) -> DataFrame:
    """Fused decode + feature pass: one mapInPandas, one trip through the
    Python workers — for pipelines that need both outputs, this halves the
    Arrow transfer and worker overhead versus running decode_media and
    extract_features separately. Same codec dispatch as decode_media."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            decoded, feats, sizes = [], [], []
            for p in pdf["payload"]:
                b = bytes(p)
                decoded.append(_decode_one(b, strict))
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
                    "decoder": [d[3] for d in decoded],
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
