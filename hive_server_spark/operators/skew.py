"""Skew-mitigation utilities for hot-key joins (100 TB posture).

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. This module covers the
case AQE cannot: a *broadcast-infeasible* dimension joined on a key whose
distribution is pathologically hot (one pool/trader dominating the log —
the realistic shape for this engine's data, where one pool can carry most
events).

`salted_join` fans the hot side out over `salt` sub-keys and replicates the
other side once per sub-key: shuffle partitions shrink by ~salt× for the hot
key at the cost of salt× duplication of the (smaller) right side. Semantics
are exactly an inner equi-join — pinned by the equivalence test."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
) -> DataFrame:
    """Inner equi-join on `on` with `salt`-way key salting.

    left gets a uniform pseudo-random salt derived from its full row hash
    (deterministic — no rand(), so retries/speculative tasks agree);
    right is exploded across all salt values.
    """
    lcols, rcols = set(left.columns), set(right.columns)
    overlap = (lcols & rcols) - {on}
    if overlap:
        raise ValueError(f"ambiguous columns would collide: {sorted(overlap)}")

    l_salted = left.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt))
    )
    r_salted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l_salted.join(r_salted, [on, "_salt"], "inner").drop("_salt")
    return out
