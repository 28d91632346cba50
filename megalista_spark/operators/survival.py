"""Survival analysis: Kaplan-Meier product-limit estimator (Kaplan &
Meier 1958; public method) — the retention/churn curve primitive. Given
one row per subject with an integer duration and an event/censored flag,
produce the per-group life table and survival curve.

The reference ETL ships audience/retention exports; the survival curve is
the analytics-side twin every marketing team derives from them (time to
repurchase, churn-by-cohort). It also serves training-data pipelines as
label-horizon analysis (time to document re-crawl / update).

Scale shape:
- one (group, duration) groupBy over subjects — the only data-sized
  shuffle; everything after operates on the LIFE TABLE, whose row count
  is bounded by the duration grid (e.g. days in the study window), not
  by subject count;
- the risk set n_t = N - Σ_{s<t}(d_s + c_s) is one key-partitioned
  cumulative window over that bounded table;
- the product-limit recurrence S_t = S_{t-1}·(n_t-d_t)/n_t is inherently
  sequential, so it folds per group over a collect_list of the (few
  hundred) life-table rows with ``aggregate`` — driver never sees data,
  and the fold state is O(timepoints), not O(subjects).

Engine-portable: survival is exact integer parts-per-million with floor
division at every step, S_k = (S_{k-1}·(n_k-d_k)) div n_k — the same
fixed-point discipline as the iterative graph operators, so any engine
reproduces the curve bit-for-bit (a float product would drift across
multiplication orders).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from megalista_spark.operators.batching import (
    GLOBAL_WINDOW_MAX_ROWS,
    guard_global_window,
)


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    key_cols: Sequence[str] = (),
    ppm_scale: int = 1_000_000,
    max_global_rows: int | None = None,
) -> DataFrame:
    """Kaplan-Meier life table + survival curve per group.

    Input: one row per subject; ``duration_col`` integer time-to-outcome,
    ``event_col`` boolean/0-1 (1 = event observed, 0 = right-censored at
    that duration). Output one row per (group, distinct duration):
    (key..., t, n_risk, d_events, c_censored, survival_ppm), ordered by
    (key..., t), survival_ppm starting from ``ppm_scale`` and stepping
    down only at event timepoints.

    Censoring follows the standard convention: subjects censored AT t are
    still in the risk set for events at t (leave after).
    """
    keys = list(key_cols)
    ev = F.col(event_col).cast("int")
    life = df.groupBy(*keys, F.col(duration_col).cast("bigint").alias("t")).agg(
        F.sum(ev).cast("bigint").alias("d_events"),
        F.sum(1 - ev).cast("bigint").alias("c_censored"),
    )
    if not keys:
        # the window sorts the LIFE TABLE, not subjects — guard that
        guard_global_window(
            life, "kaplan_meier",
            max_global_rows=(
                GLOBAL_WINDOW_MAX_ROWS if max_global_rows is None else max_global_rows
            ),
        )
    w = (
        Window.partitionBy(*keys).orderBy("t")
        if keys
        else Window.orderBy("t")
    )
    prior = w.rowsBetween(Window.unboundedPreceding, -1)
    totals = life.groupBy(*keys).agg(
        F.sum(F.col("d_events") + F.col("c_censored")).alias("_N")
    )
    with_n = (
        (life.join(totals, keys) if keys else life.crossJoin(F.broadcast(totals)))
        .withColumn(
            "n_risk",
            (
                F.col("_N")
                - F.coalesce(
                    F.sum(F.col("d_events") + F.col("c_censored")).over(prior),
                    F.lit(0),
                )
            ).cast("bigint"),
        )
        .drop("_N")
    )
    # fold the product-limit recurrence over each group's sorted life table
    pts = with_n.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(F.struct("t", "n_risk", "d_events", "c_censored"))
        ).alias("_pts")
    )
    folded = pts.select(
        *keys,
        F.expr(
            f"""
            aggregate(
              _pts,
              struct(
                cast({int(ppm_scale)} as bigint) as s,
                cast(array() as array<struct<
                  t: bigint, n_risk: bigint, d_events: bigint,
                  c_censored: bigint, survival_ppm: bigint>>) as out
              ),
              (acc, x) -> struct(
                cast(if(x.d_events > 0,
                        (acc.s * (x.n_risk - x.d_events)) div x.n_risk,
                        acc.s) as bigint) as s,
                array_append(acc.out, struct(
                  x.t as t, x.n_risk as n_risk, x.d_events as d_events,
                  x.c_censored as c_censored,
                  cast(if(x.d_events > 0,
                          (acc.s * (x.n_risk - x.d_events)) div x.n_risk,
                          acc.s) as bigint) as survival_ppm))
              ),
              acc -> acc.out
            )
            """
        ).alias("_curve"),
    )
    out = folded.select(*keys, F.explode("_curve").alias("_r")).select(
        *keys,
        F.col("_r.t").alias("t"),
        F.col("_r.n_risk").alias("n_risk"),
        F.col("_r.d_events").alias("d_events"),
        F.col("_r.c_censored").alias("c_censored"),
        F.col("_r.survival_ppm").alias("survival_ppm"),
    )
    return out.orderBy(*keys, "t")


def retention_triangle(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period: str = "week",
    max_offset: int = 12,
) -> DataFrame:
    """Cohort retention triangle — the product-analytics companion to
    ``kaplan_meier``: users grouped by their FIRST activity period
    (cohort), then for each later period offset, the fraction of the
    cohort still active, in integer ppm.

    Output: ``(cohort, offset, cohort_size, active_users,
    retention_ppm)`` with offset 0..max_offset; offset 0 is 1e6 by
    construction (every cohort member is active in their first period).

    Scale shape: one groupBy(user) for first-activity (map-side
    combined), one distinct on (user, period) — both hash aggregates on
    high-cardinality keys, shuffle-partitioned, no windows — then a
    broadcast of the per-cohort sizes (O(periods) rows) onto the
    O(periods²/2) triangle. Nothing beyond the two aggregates touches
    raw events.
    """
    ev = df.select(
        F.col(user_col).alias("_u"), F.date_trunc(period, F.col(ts_col)).alias("_p")
    )
    first = ev.groupBy("_u").agg(F.min("_p").alias("_cohort"))
    active = ev.distinct().join(first, "_u")
    # calendar months have no fixed day width — offsets are day-based
    days = {"week": 7, "day": 1}.get(period)
    if days is None:
        raise ValueError(f"unsupported period: {period!r} (week or day)")
    tri = (
        active.select(
            "_cohort",
            (F.datediff(F.col("_p"), F.col("_cohort")) / days)
            .cast("long")
            .alias("offset"),
            "_u",
        )
        .where(F.col("offset") <= max_offset)
        .groupBy("_cohort", "offset")
        .agg(F.count(F.lit(1)).cast("long").alias("active_users"))
    )
    sizes = first.groupBy("_cohort").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return (
        tri.join(F.broadcast(sizes), "_cohort")
        .select(
            F.col("_cohort").alias("cohort"),
            "offset",
            "cohort_size",
            "active_users",
            F.expr("1000000 * active_users div cohort_size").alias("retention_ppm"),
        )
        .orderBy("cohort", "offset")
    )
