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


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_file_mb: int = 256,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-files compaction — the other half of write-side layout: a
    long-lived table accumulating per-micro-batch / per-task files pays
    O(#files) listing + footer reads on EVERY scan, and a 100 TB table
    with 10 MB files is 10M files. Rewrite ``src`` into ``dst`` with
    file sizes near ``target_file_mb``; returns the output file count.

    File count = ceil(source bytes / target): sizing from the SOURCE
    listing (file metadata only — no data pass, no sampling job). With
    ``sort_cols`` the rewrite is range-partitioned + sorted within
    partitions, so compaction doubles as single-axis clustering
    (row-group min/max stay tight — see zorder_write_layout for the
    2-D form); without, a round-robin repartition balances file sizes.

    Compression usually tightens on rewrite (bigger row groups,
    sorted runs), so actual files land somewhat under target — the safe
    side of the trade.
    """
    import math

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(src)
    fs = path.getFileSystem(conf)
    total = fs.getContentSummary(path).getLength()
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))

    df = spark.read.parquet(src)
    if sort_cols:
        out = df.repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
        out = out.sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst)
    dst_path = jvm.org.apache.hadoop.fs.Path(dst)
    statuses = fs.listStatus(dst_path)
    return sum(
        1 for s in statuses if s.getPath().getName().endswith(".parquet")
    )
