"""hive_server_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference `akbaridria/hive-server`
(a streaming order-book / incremental-view-maintenance service), re-expressed
Spark-first, plus large-scale training-data pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Design stance (SURVEY.md §7): the event log is the source of truth; all state
is a deterministic fold over it. No mutable KV — derived tables. Everything is
DecimalType-exact (SURVEY Q1) and event-time based (Q2). Declarative
DataFrame/SQL plans so Catalyst supplies pushdown, pruning, join planning and
whole-stage codegen; Python only inside Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"

from hive_server_spark.session import get_spark  # noqa: F401
