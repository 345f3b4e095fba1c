"""Text-analysis / dedup operator semantics (SURVEY §5.6): recall of the
LSH candidate set against exact Jaccard, fingerprint determinism, profile
invariants. Gate parity (vs DuckDB) is covered by test_gate_parity.py."""

from __future__ import annotations

from hive_server_spark.catalog import load_table
from hive_server_spark.functions import text as T
from tests.conftest import SF_SMALL


def _docs(spark):
    return load_table(spark, SF_SMALL, "documents")


def test_minhash_candidates_recall_planted_dups(spark):
    """Every true near-dup pair (3-gram Jaccard >= 0.8) must appear in the
    MinHash-LSH candidate set — banding with 4 bands x 2 rows has >=98%
    per-pair recall at J=0.8; the planted corpus must be fully recovered."""
    docs = _docs(spark)
    true_pairs = {
        (r.doc_a, r.doc_b)
        for r in T.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    cands = {(r.doc_a, r.doc_b) for r in T.minhash_candidates(docs).collect()}
    assert true_pairs, "corpus should contain planted near-duplicates"
    missed = true_pairs - cands
    assert not missed, f"LSH missed true near-dup pairs: {missed}"


def test_exact_dedup_partitions_corpus(spark):
    docs = _docs(spark)
    n_docs = docs.count()
    groups = T.exact_dedup(docs).collect()
    assert sum(g.group_size for g in groups) == n_docs
    assert all(g.group_size >= 1 for g in groups)


def test_profile_invariants(spark):
    rows = T.doc_profile(_docs(spark)).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_distinct_tokens <= r.n_tokens
        assert r.n_subtokens >= r.n_tokens  # every word >= 1 subtoken
        assert 0.0 < r.ttr <= 1.0
        assert 0.0 <= r.stop_ratio <= 1.0
        assert 0.0 <= r.quality_score <= 1.0
        assert r.predicted_lang in {"en", "es", "de", "fr", "zh"}
        assert len(r.fingerprint_md5) == 32
        assert 0 <= r.fingerprint_roll < T.ROLL_MOD


def test_simhash_near_for_near_texts(spark):
    """Near-dup docs (J>=0.8) should have small simhash hamming distance;
    sanity-check on the planted pairs."""
    docs = _docs(spark)
    fps = {r.doc_id: r.simhash for r in T.simhash_fingerprints(docs).collect()}
    pairs = T.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    assert pairs
    close = sum(
        1 for p in pairs if bin(fps[p.doc_a] ^ fps[p.doc_b]).count("1") <= 6
    )
    # most planted near-dups should be within 6/32 bits
    assert close >= len(pairs) * 0.7
