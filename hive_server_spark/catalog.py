"""Table catalog: load the driver parquet tables and register temp views.

Replaces the reference's source layer — Redis KV + Ethereum JSON-RPC scans
(reference src/utils/ethers.ts, src/models/order-book.ts:31-53) — with
columnar Parquet scans. Filters/projections declared on these DataFrames reach
the scan (PushedFilters / ReadSchema), which is the 100 TB analogue of the
reference pushing (address, topic, block-range) predicates into eth_getLogs
(reference src/services/hive-listener.ts:152-175).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_server_spark.schemas import DRIVER_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_read_confs(spark: SparkSession) -> None:
    """Pin the reader confs this catalog depends on, on WHATEVER session we
    are handed.

    The correctness driver (and any embedding application) constructs its own
    vanilla SparkSession — it does not go through our session.get_spark().
    Both confs here are runtime-settable SQLConfs, so setting them lazily at
    first read makes every entry point (driver, bench, tests, user code)
    behave identically:

    * nanosAsLong — events.ts is TIMESTAMP(NANOS) in the driver parquet;
      without this the scan throws PARQUET_TYPE_ILLEGAL on Spark 4.
    * UTC session timezone — timestamp→string/date functions must agree with
      the DuckDB oracle (which is UTC) regardless of host timezone.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver table. Parquet supplies the schema (footer-exact).

    `events.ts` has changed physical encoding across driver testdata
    regenerations, so normalize every known encoding to the session
    TimestampType (LTZ) here — the single catalog boundary — rather than in
    each consumer:

    * TIMESTAMP(NANOS): Spark reads it as long under nanosAsLong (pinned
      below); convert ns→µs with integer division (truncation — matching
      DuckDB, whose timestamps are microsecond too).
    * timestamp[us] isAdjustedToUTC=false → TIMESTAMP_NTZ: cast to session
      TIMESTAMP. Session timezone is pinned UTC, so wall-clock values are
      unchanged; downstream `unix_micros` / `withWatermark` require LTZ.
    * timestamp[us] UTC → already session TIMESTAMP; no-op.
    """
    _ensure_read_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integer division — ns epochs (~1.7e18) overflow double precision,
            # so a float divide here would corrupt the microsecond digit
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in DRIVER_TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every driver table as a temp view so `spark.sql` serves the
    full relational surface (SURVEY.md §7 step 4)."""
    tables = load_all(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
