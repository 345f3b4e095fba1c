"""Multimodal plumbing: schema/partitioning/batch-shape are real; the codec
is a deterministic stub (no image libs in this environment)."""

from __future__ import annotations

import pytest

from hive_server_spark.catalog import load_table
from hive_server_spark.functions import multimodal as M
from tests.conftest import SF_SMALL


@pytest.fixture()
def media(spark):
    return M.synthesize_media(load_table(spark, SF_SMALL, "documents"))


def test_media_schema(media):
    # names+types must match the declared contract (nullability flags may
    # differ: parquet-derived columns arrive nullable)
    got = [(f.name, f.dataType.simpleString()) for f in media.schema.fields]
    want = [(f.name, f.dataType.simpleString()) for f in M.MEDIA_SCHEMA.fields]
    assert got == want
    r = media.first()
    assert bytes(r.payload) and r.meta.n_bytes == len(bytes(r.payload))


def test_decode_deterministic(media):
    a = {r.media_id: (r.width, r.height, r.mean_luma) for r in M.decode_media(media).collect()}
    b = {r.media_id: (r.width, r.height, r.mean_luma) for r in M.decode_media(media).collect()}
    assert a == b and len(a) == media.count()
    assert all(16 <= w < 256 and 16 <= h < 256 and 0 <= m <= 1 for (w, h, m) in a.values())


def test_decode_strict_raises(media):
    with pytest.raises(NotImplementedError):
        M.decode_media(media, strict=True)


def test_features_are_normalized_histograms(media):
    rows = M.extract_features(media).collect()
    assert rows
    for r in rows[:50]:
        assert len(r.features) == 16
        assert abs(sum(r.features) - 1.0) < 1e-3
        assert all(f >= 0 for f in r.features)


def test_frame_sampling_partitions_payload(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(20)
    vids = M.synthesize_media(docs, kind="video")
    frames = M.sample_frames(vids, n_frames=4).collect()
    assert len(frames) == 20 * 4
    by_media = {}
    for f in frames:
        by_media.setdefault(f.media_id, []).append(f)
    for mid, fs in by_media.items():
        assert sorted(x.frame_idx for x in fs) == [0, 1, 2, 3]
        assert all(len(bytes(x.frame_payload)) > 0 for x in fs)


def test_features_feed_similarity_ops(spark, media):
    """Feature vectors must be consumable by the embedding operators."""
    from pyspark.sql import functions as F

    from hive_server_spark.functions.embeddings import cosine_expr

    feats = M.extract_features(media).limit(50)
    q = feats.where(F.col("media_id") == feats.first().media_id).select(
        F.col("features").alias("qf")
    )
    scored = (
        feats.crossJoin(F.broadcast(q))
        .withColumn("v", F.expr("CAST(features AS ARRAY<DOUBLE>)"))
        .withColumn("qv", F.expr("CAST(qf AS ARRAY<DOUBLE>)"))
        .withColumn("cosine", F.expr(cosine_expr("v", "qv", "s")))
    )
    rows = scored.collect()
    assert rows and any(abs(r.cosine - 1.0) < 1e-9 for r in rows)  # self-match
