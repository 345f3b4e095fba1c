"""Python-UDF surface (SURVEY §2.10), value-gated.

The reference's per-event handlers are arbitrary JS functions
(src/services/hive-listener.ts:228-335); the Spark equivalents are Arrow-
vectorized pandas UDFs (scalar) and grouped-map applyInPandas (whole-group
transforms). UDFs are the engine's slow path — everything else in this repo
stays JVM-side — so the two gate entries here pin the contract that makes
them safe to use at all: byte-identical results to the declarative oracle.

Exactness recipe:
- integer outputs from the UDF (counts) are trivially exact;
- float means use math.fsum — the correctly-rounded exact sum — which equals
  DuckDB's fsum() aggregate bit-for-bit, then one division;
- a - b on doubles is a single IEEE op, identical everywhere.

Scale posture: scalar pandas UDFs pipeline Arrow batches (no shuffle);
grouped-map shuffles once on the group key and streams each group through a
worker — group size, not table size, bounds worker memory.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from hive_server_spark.catalog import load_table
from hive_server_spark.registry import register


# ---------------------------------------------------------------------------
# Scalar (vectorized) pandas UDF: per-row text measurement.
# Built lazily — decorating at module import would require an active
# SparkContext, and this module must be importable before any session exists
# (the driver imports __spark_entry__ first).
# ---------------------------------------------------------------------------
def _alpha_count_udf():
    @pandas_udf("long")
    def _alpha_count(texts: pd.Series) -> pd.Series:
        return texts.str.count(r"[a-zA-Z]").astype("int64")

    return _alpha_count


@register(
    "udf_alpha_quality",
    """
SELECT doc_id,
       CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g'))
            AS BIGINT) AS n_alpha,
       CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g'))
            AS DOUBLE) / n_chars AS alpha_ratio
FROM documents
WHERE doc_id % 3 = 0
""",
)
def udf_alpha_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Letter-density quality score via an Arrow-batched scalar pandas UDF.
    The UDF returns an exact integer; the one float division happens after,
    so the Python path is hash-identical to the oracle's regexp counting."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 0)
    return d.select(
        "doc_id", _alpha_count_udf()("text").alias("n_alpha"), "n_chars"
    ).select(
        "doc_id",
        "n_alpha",
        (F.col("n_alpha").cast("double") / F.col("n_chars")).alias("alpha_ratio"),
    )


# ---------------------------------------------------------------------------
# Grouped-map applyInPandas: per-user value centering
# ---------------------------------------------------------------------------
def _center(pdf: pd.DataFrame) -> pd.DataFrame:
    mean = math.fsum(pdf["value"]) / len(pdf)
    out = pdf[["event_id", "user_id", "value"]].copy()
    out["user_mean"] = mean
    out["centered"] = pdf["value"] - mean
    return out


@register(
    "udf_user_centered_values",
    """
WITH base AS (
  SELECT event_id, user_id, value FROM events WHERE user_id % 5 = 0
), stats AS (
  SELECT user_id, fsum(value) / COUNT(*) AS user_mean
  FROM base GROUP BY user_id
)
SELECT b.event_id, b.user_id, b.value,
       s.user_mean,
       b.value - s.user_mean AS centered
FROM base b JOIN stats s USING (user_id)
""",
)
def udf_user_centered_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-group Python transform: each user's events stream through one
    worker as an Arrow batch and come back centered on the user mean. The
    mean uses math.fsum (exact summation), which the oracle matches with
    DuckDB's fsum() — so even this float pipeline is hash-gated, unlike the
    usual order-dependent float aggregation."""
    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") % 5 == 0)
        .select("event_id", "user_id", "value")
    )
    return e.groupBy("user_id").applyInPandas(
        _center,
        schema="event_id long, user_id long, value double, user_mean double, centered double",
    )
