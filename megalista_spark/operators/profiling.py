"""Table profiling — per-column data-quality stats in one pass.

The first thing a pipeline owner runs against a new 100 TB drop: row
count, null count, distinct count, min/max per column. One scan: all
per-column aggregates live in a single agg (Spark plans the multiple
DISTINCT aggregates via one Expand — input rows replicate ×#distinct-aggs
map-side, but the table is still read once), then the single stats row
pivots into one output row per column with a zero-shuffle inline explode.

Min/max surface as strings so heterogeneous column types share one output
schema — the cross-engine rendering contract is the SQL CAST, which both
Spark and DuckDB define identically for ints, doubles, strings, and
timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column_name, n_rows, n_nulls, n_distinct, min_value, max_value) —
    one row per profiled column, computed in a single scan."""
    cols = columns if columns is not None else df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}")
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"__dist_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}"))
    stats = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nulls_{c}").cast("bigint").alias("n_nulls"),
            F.col(f"__dist_{c}").cast("bigint").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_value"),
            F.col(f"__max_{c}").alias("max_value"),
        )
        for c in cols
    ]
    return stats.select(F.inline(F.array(*rows)))
