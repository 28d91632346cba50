"""Data-layout operators — write-side clustering for scan pruning.

At 100 TB the fastest scan is the one that never happens: parquet
row-group min/max stats prune files, but only if rows that are close in
query space are close on disk. For single-column locality,
``repartitionByRange(col).sortWithinPartitions(col)`` before the write is
enough. For TWO-dimensional predicates (user AND time, region AND date) a
linear sort can only cluster one axis — the Z-order (Morton) curve
interleaves the bits of both keys so that range predicates on EITHER
dimension map to a bounded number of z-ranges, and row-group stats prune
on both.

The encoding is pure integer bit arithmetic generated as a shared
expression — any engine (or a later reader deciding which files to open)
reproduces the same codes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_interleave_sql(
    a_expr: str, b_expr: str, bits: int = 16, dialect: str = "spark"
) -> str:
    """SQL text computing the Morton interleave of two ``bits``-bit
    non-negative ints (a in even positions, b in odd) — generated from one
    template per dialect (Spark spells shifts shiftleft/shiftright; ANSI-ish
    engines use << and >>) so the CODES are identical everywhere.
    2*bits ≤ 62 keeps every shifted term positive in signed int64."""
    if 2 * bits > 62:
        raise ValueError("2*bits must fit signed int64")
    if dialect == "spark":
        shl = "shiftleft({x}, {n})"
        shr = "shiftright({x}, {n})"
    else:  # duckdb / ansi operator spelling
        shl = "(({x}) << {n})"
        shr = "(({x}) >> {n})"
    terms = []
    for i in range(bits):
        a_bit = shr.format(x=a_expr, n=i) + " & 1"
        b_bit = shr.format(x=b_expr, n=i) + " & 1"
        terms.append("(" + shl.format(x=a_bit, n=2 * i) + ")")
        terms.append("(" + shl.format(x=b_bit, n=2 * i + 1) + ")")
    return "(" + " + ".join(terms) + ")"


def zorder_code(df: DataFrame, col_a: str, col_b: str, bits: int = 16) -> DataFrame:
    """df + ``z`` column: the Morton code of (col_a, col_b), each masked to
    ``bits`` bits. Pure per-row expression — zero shuffle; the shuffle
    belongs to the caller's ``repartitionByRange('z')`` before the write."""
    mask = (1 << bits) - 1
    expr = morton_interleave_sql(f"({col_a} & {mask})", f"({col_b} & {mask})", bits)
    return df.withColumn("z", F.expr(expr))


def zorder_write_layout(
    df: DataFrame, col_a: str, col_b: str, n_files: int = 64, bits: int = 16
) -> DataFrame:
    """The write-side recipe: z-code, range-partition on z, sort within
    partitions — each output file then covers a compact z-range, so
    row-group min/max on BOTH underlying columns stay tight and a reader
    with a 2-D predicate opens O(boundary) files instead of all of them."""
    return (
        zorder_code(df, col_a, col_b, bits)
        .repartitionByRange(n_files, "z")
        .sortWithinPartitions("z")
    )
