"""Tuned SparkSession factory.

The reference is a single-threaded Node service (async I/O interleaving only,
reference src/index.ts); our engine runs on Spark executors. These configs are
the 100 TB posture defaults: AQE on (runtime re-plan, skew-join splitting),
explicit broadcast threshold for the small dimension tables, Arrow for any
pandas-UDF exchange, shuffle partitions sized by env.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


class scoped_shuffle_partitions:
    """Temporarily pin spark.sql.shuffle.partitions around a bounded-size
    stage (streaming state stores, recursive-CTE iterations — places where
    AQE cannot coalesce at runtime). Results are partition-count invariant;
    this is a latency knob only. On a real cluster the session owner sizes
    it to the actual state/graph cardinality. 4 measured fastest for the
    gate's state sizes (8 doubles the per-micro-batch state-store overhead
    for no win; 2 starves the join stages)."""

    def __init__(self, spark: SparkSession, n: int = 4):
        self.spark, self.n = spark, n

    def __enter__(self) -> None:
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))

    def __exit__(self, *exc) -> None:
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)


def get_spark(app_name: str = "hive-server-spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Local test mode uses ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the
    master/executor topology comes from spark-submit and everything here still
    applies (AQE, broadcast threshold, partitioning hints are cluster-safe).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        # --- determinism / correctness ---
        .config("spark.sql.session.timeZone", "UTC")
        # ANSI off deliberately: matches DuckDB's permissive casts in the
        # oracle comparisons. Decimal overflow would return null silently, so
        # exactness relies on the bounded value ranges guaranteed by
        # sources/synthetic.py and the explicit narrow casts in operators.
        .config("spark.sql.ansi.enabled", "false")
        # --- adaptive execution: runtime shuffle-partition coalescing,
        # skew-join splitting, broadcast-join conversion. Core of the
        # 100 TB posture: plans self-correct from runtime stats.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle sizing ---
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # --- scan efficiency: pushdown + pruning are on by default, keep
        # them pinned so a misconfigured site profile can't disable them.
        .config("spark.sql.parquet.filterPushdown", "true")
        # driver testdata stores events.ts as TIMESTAMP(NANOS), which the
        # vectorized reader rejects; read as long and convert in the catalog
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # --- pandas-UDF exchange ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # dims (pools/tokens/nation/region) are tiny; broadcast eagerly
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # bound StreamingQuery.stop(): the default waits indefinitely, so
        # stopping a WEDGED stream (the silent py4j-callback failure the
        # stall window in streaming/incremental.py detects) would itself
        # hang; with a timeout, stop() raises, the stall path still fires,
        # and the retry resumes the checkpoint (a timed-out stop can leave
        # the query briefly ACTIVE — the stall path waits for isActive to
        # clear, and the retry also treats CONCURRENT_QUERY/'already
        # active' start failures as retryable, so the resume still holds)
        .config("spark.sql.streaming.stopTimeout", "30000")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


# ---------------------------------------------------------------------------
# Per-process scratch for queries that persist an index mid-plan (the
# incremental band / IVF / PQ refreshes write a "prior snapshot" parquet
# index, then dedup or encode a batch against the read-back files). A raw
# tempfile.mkdtemp per invocation accumulates in /tmp across gate + bench
# runs (ADVICE r11); this anchor is STABLE within the process — every
# rerun of a query lands on the same path with mode("overwrite") — and is
# removed at interpreter exit, so a full driver round leaves nothing
# behind. On a real deployment the index would live at a durable table
# location (S3/HDFS) and this helper would not be in the path at all.
# ---------------------------------------------------------------------------

_SCRATCH_ROOT: str | None = None
# Stale-root age cutoff: anything this old is reclaimed even if a live
# (recycled-PID) process matches its suffix. Two days comfortably exceeds
# any single gate/bench/pytest run.
_SCRATCH_MAX_AGE_S = 2 * 24 * 3600


def session_scratch(name: str) -> str:
    """Return ``<tmp>/hss_scratch_<pid>/<name>``, creating the root once
    per process and registering its removal at interpreter exit. Callers
    must write with mode("overwrite") so repeated runs replace, never
    append to, a previous run's files."""
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        import atexit
        import glob
        import shutil
        import tempfile

        tmp = tempfile.gettempdir()
        # reap roots left by DEAD processes: atexit does not run under
        # SIGTERM/os._exit (the per-query watchdogs hard-exit), so a
        # killed harness can orphan its root — each new process sweeps
        # them, keeping /tmp bounded across crashes too. PID liveness
        # alone is not enough (ADVICE r12): a recycled PID belonging to
        # an unrelated live process would shield a stale root forever,
        # so roots older than _SCRATCH_MAX_AGE_S are reclaimed
        # regardless — and because every session_scratch() call below
        # refreshes the owning root's mtime (ADVICE r13: the root's
        # st_mtime is otherwise set at creation and never advances —
        # later writes land in subdirectories — so a legitimately live
        # long-soak process would cross the cutoff and lose its live
        # streaming checkpoints to a newly started sweeper), "older than
        # the cutoff" genuinely means "no session_scratch call in 2
        # days", which no live gate/bench process exhibits.
        import time

        now = time.time()
        for stale in glob.glob(os.path.join(tmp, "hss_scratch_*")):
            try:
                too_old = now - os.stat(stale).st_mtime > _SCRATCH_MAX_AGE_S
            except OSError:
                too_old = False  # vanished mid-sweep
            if too_old:
                shutil.rmtree(stale, ignore_errors=True)
                continue
            try:
                pid = int(stale.rsplit("_", 1)[-1])
                os.kill(pid, 0)  # raises if no such process
            except (ValueError, ProcessLookupError):
                shutil.rmtree(stale, ignore_errors=True)
            except PermissionError:
                pass  # live process owned elsewhere — leave it
        _SCRATCH_ROOT = os.path.join(tmp, f"hss_scratch_{os.getpid()}")
        os.makedirs(_SCRATCH_ROOT, exist_ok=True)
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    # keep the age-based sweep honest: touch the root on every call so a
    # live process's root never looks abandoned (see the sweep comment)
    try:
        os.utime(_SCRATCH_ROOT)
    except OSError:
        pass  # root raced away (concurrent sweep); recreated below
    path = os.path.join(_SCRATCH_ROOT, name)
    os.makedirs(path, exist_ok=True)
    return path
