"""Time-series densification: fill the missing buckets of a regular
series and forward-fill state columns — the resample/ffill step between
event logs and anything that consumes a gapless series (dashboards,
feature windows, rate-of-change math).

Scale shape:
- the grid explode is data-independent: (range/step) rows per key from a
  2-scalar bounds row — never proportional to the event count;
- densify join is a (key, bucket) equi-join; the forward-fill window is
  one shuffle partitioned by key, ordered by bucket, running `last(...,
  ignorenulls=True)` — O(buckets-per-key) state, spillable sort;
- total: one bounds aggregate + one join shuffle + one window shuffle.
  A 100 TB event log collapses to its bucket grid before anything wide.

Engine-portable: buckets are integer epoch math (no timezone/date_trunc
divergence); forward fill is LAST ... IGNORE NULLS in any SQL dialect.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def densify_ffill(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    step: int,
    ffill_cols: Sequence[str] = (),
    zero_cols: Sequence[str] = (),
) -> DataFrame:
    """Densify a per-key integer bucket series to every ``step`` between
    that key's min and max bucket, then forward-fill ``ffill_cols``
    (state semantics: last observed value carries) and zero-fill
    ``zero_cols`` (count semantics: absence means zero).

    Input must be one row per (key, bucket). Output: one row per
    (key, grid bucket), plus ``is_observed`` marking real rows.

    The grid is the step sequence from each key's min bucket UNION the
    observed buckets themselves — so a bucket that is not step-aligned
    with the key's minimum still appears (on a pure sequence grid it
    would silently miss the left join and the row would vanish).
    """
    bounds = df.groupBy(key_col).agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    grid = (
        bounds.select(
            key_col,
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step))
            ).alias(bucket_col),
        )
        .unionByName(df.select(key_col, bucket_col))
        .distinct()
    )
    out = grid.join(
        df.withColumn("_obs", F.lit(True)), [key_col, bucket_col], "left"
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in ffill_cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    for c in zero_cols:
        out = out.withColumn(
            c, F.coalesce(F.col(c), F.lit(0).cast(out.schema[c].dataType))
        )
    return out.withColumn("is_observed", F.coalesce(F.col("_obs"), F.lit(False))).drop(
        "_obs"
    )
