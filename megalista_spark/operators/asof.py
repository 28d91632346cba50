"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as the scalable union+window composition (SURVEY guide's
"bucketize or merge_asof" suggestion is the pandas path; this one stays
fully JVM-side):

  1. tag both inputs and union them on (key, ts) with aligned columns
  2. one window per key ordered by (ts, tag): ``last_value(ignorenulls)``
     carries the most recent right-side values forward
  3. keep only left rows

Exactly ONE shuffle on the join key + one sort — the same cost as a
sort-merge join, with no range-explosion. Ties (left.ts == right.ts)
include the right row ("backward" as-of, matching DuckDB/pandas
``ASOF JOIN`` / ``merge_asof`` semantics) because the right tag sorts
first at equal timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the latest right row (per ``key``) with
    right.ts <= left.ts. Missing match → NULL values.

    Output: all left columns + ``<value_col><suffix>`` for each value col.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (key, right_ts)]

    left_cols = left.columns
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        *[F.col(c).alias(f"_l_{c}") for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in left_cols],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    unioned = l.unionByName(r)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in value_cols
        ],
    )
    out = carried.where(F.col("_tag") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in left_cols],
        *[F.col(f"_c_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out
