"""Z-order (Morton) clustering for multi-dimensional data layout.

A table queried by ranges over TWO columns cannot be partition-pruned well
by sorting on either alone; interleaving the bits of both (the Z-order
curve) makes files cover compact rectangles in (x, y) space, so a 2-D range
predicate prunes to the few files whose Z-range intersects the query box —
the technique behind Delta/Iceberg Z-ORDER table layout.

Everything here is closed-form integer bit arithmetic (shift/and/or), which
makes the layout decision itself oracle-checkable — a rerun, another
engine, or another cluster assigns every row to the same file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton code of (x, y): bit i of x lands at position 2i, bit i of y
    at 2i+1. Inputs must already be bounded to `bits` bits."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(
            F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return z


def zvalue_sql(x: str, y: str, bits: int = 8) -> str:
    """The identical Morton code as portable SQL (DuckDB oracle side)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_manifest(
    df: DataFrame, x: Column, y: Column, bits: int = 8, files: int = 16
) -> DataFrame:
    """Assign each row to one of `files` Z-contiguous files and return the file
    manifest: row count plus per-dimension min/max. Compact (x, y) bounding
    boxes per file are the property that makes 2-D range predicates prune —
    the manifest IS the pruning index a lakehouse keeps per data file."""
    z = zvalue(x, y, bits)
    stride = (1 << (2 * bits)) // files
    withz = df.select(
        x.cast("long").alias("zx"), y.cast("long").alias("zy"), z.alias("zval")
    )
    return (
        withz.groupBy(F.expr(f"zval div {stride}").alias("file_id"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("zx").cast("bigint").alias("x_min"),
            F.max("zx").cast("bigint").alias("x_max"),
            F.min("zy").cast("bigint").alias("y_min"),
            F.max("zy").cast("bigint").alias("y_max"),
        )
    )
