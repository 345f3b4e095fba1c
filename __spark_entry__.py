"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query (order-book levels from a raw event
log — the reference's heaviest read path, SURVEY §3.2) at sf0.001.
`queries()` / `oracle_sql()` expose the gate registry
(hive_server_spark.gate): every entry is backed by a library operator and a
DuckDB-oracle SQL string, cross-checked in tests/test_gate_parity.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hive_server_spark import gate  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return gate.spark_queries()["order_book_levels"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return gate.spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    return gate.oracle_sql()
