"""Gate queries for the similarity-search surface (functions/embeddings.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_server_spark.catalog import load_table
from hive_server_spark.functions import embeddings as E
from hive_server_spark.registry import register


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


@register("emb_cosine_topk", E.topk_oracle(query_vec_id=0, k=10, within_label=False))
def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for stored query vector 0 — the exactness
    baseline every ANN variant is measured against."""
    return E.cosine_topk(_emb(spark, sf_dir), query_vec_id=0, k=10)


@register("emb_ivf_topk", E.topk_oracle(query_vec_id=0, k=10, within_label=True))
def emb_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style top-10: scan restricted to the query's label partition (the
    coarse-quantizer cell). At scale: partition the table by label and this
    prunes to one partition."""
    return E.cosine_topk(_emb(spark, sf_dir), query_vec_id=0, k=10, within_label=True)


@register("emb_lsh_buckets", E.buckets_oracle())
def emb_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucket assignment for every vector (1024 buckets)."""
    return E.lsh_buckets(_emb(spark, sf_dir))


@register("emb_lsh_neardup_topk", E.neardup_oracle(k=20))
def emb_lsh_neardup_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-similar pairs among LSH same-bucket candidates — the
    scale path for embedding near-dup detection."""
    return E.lsh_neardup_topk(_emb(spark, sf_dir), k=20)
