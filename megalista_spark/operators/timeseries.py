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

from megalista_spark.operators.batching import (
    GLOBAL_WINDOW_MAX_ROWS,
    guard_global_window,
)


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


def ewma_trailing(
    df: DataFrame,
    bucket_col: str,
    value_col: str,
    key_cols: Sequence[str] = (),
    alpha_num: int = 1,
    alpha_den: int = 4,
    horizon: int = 12,
) -> DataFrame:
    """Trailing-horizon EWMA over an integer-bucketed series with EXACT
    integer weight arithmetic: (key..., bucket, value, ewma) where

        ewma(t) = Σ_{lag=0..h} w(lag)·x(t-lag) / Σ w(lag present)

    with α = alpha_num/alpha_den and weights scaled by den^(h+1) to pure
    integers: w(lag) = num·(den-num)^lag·den^(h-lag). Numerator and
    denominator are BIGINT sums (order-independent, bit-identical on any
    engine — float pow() is not); one double division at the output,
    rounded. Missing buckets inside the horizon simply contribute
    nothing — the present-weight denominator renormalizes, so series
    heads and gaps get an unbiased local mean instead of a zero-pulled
    one (run ``densify_ffill`` first for strict gap-as-zero semantics).

    The smoother is the standard EWMA control-chart statistic (Roberts
    1959; public method); pair with a deviation test downstream for
    anomaly flags.

    Scale shape — NO window over the raw log and NO range join:
      1. the input is already bucket-aggregated (caller groupBy — one
         shuffle proportional to |buckets|, not |events|);
      2. each bucket row EXPLODES to its h+1 target buckets with a
         precomputed literal weight per lag (data-independent ×(h+1));
      3. one (key, bucket) groupBy sums num/denom map-side;
      4. inner join back to real buckets drops phantom targets past the
         series end.
    Everything shuffles O(|buckets|·(h+1)) 16-byte rows.
    """
    keys = list(key_cols)
    beta = alpha_den - alpha_num
    # w(lag) = num * beta^lag * den^(h-lag), exact bigint literals
    weights = [
        alpha_num * beta**lag * alpha_den ** (horizon - lag)
        for lag in range(horizon + 1)
    ]
    lagw = F.array(
        *[
            F.struct(F.lit(i).alias("lag"), F.lit(w).cast("bigint").alias("w"))
            for i, w in enumerate(weights)
        ]
    )
    x = F.col(value_col).cast("bigint")
    contrib = df.select(
        *keys,
        F.col(bucket_col).alias("_src"),
        x.alias("_x"),
        F.inline(lagw),
    ).select(
        *keys,
        (F.col("_src") + F.col("lag")).alias(bucket_col),
        (F.col("_x") * F.col("w")).alias("_xw"),
        F.col("w"),
    )
    sums = contrib.groupBy(*keys, bucket_col).agg(
        F.sum("_xw").alias("_num"), F.sum("w").alias("_den")
    )
    real = df.select(*keys, bucket_col, x.alias(value_col))
    return real.join(sums, keys + [bucket_col]).select(
        *keys,
        bucket_col,
        value_col,
        F.round(F.col("_num") / F.col("_den"), 6).alias("ewma"),
    )


def cusum_flags(
    df: DataFrame,
    bucket_col: str,
    value_col: str,
    key_cols: Sequence[str] = (),
    slack: int = 0,
    threshold: int = 0,
    max_global_rows: int | None = None,
) -> DataFrame:
    """Two-sided CUSUM change-point statistic (Page 1954; public method)
    over an integer-bucketed series, centered on each key's own series
    mean: (key..., bucket, value, cusum_pos_milli, cusum_neg_milli,
    shift_up, shift_down).

    The textbook form is a per-step recurrence
    ``S_t = max(0, S_{t-1} + (x_t - mean - slack))`` — sequential, which
    would serialize the series. The CLOSED FORM removes the recurrence:
    with D_t = x_t - mean - slack and prefix sums P_t = Σ_{j≤t} D_j,

        S_t = P_t - min(0, min_{j≤t} P_j)

    i.e. one cumulative sum plus one running minimum — two frames of the
    SAME key-partitioned, bucket-ordered window (one sort, one shuffle).
    The mirrored statistic uses -D'_t with D'_t = x_t - mean + slack.

    Exact integer arithmetic: the mean never materializes as a fraction —
    everything is scaled by n (the key's bucket count):

        n·D_t = n·x_t - Σx - n·slack

    so prefix sums and minima are bigint and bit-identical on any engine.
    Outputs are rescaled once at the boundary: cusum_*_milli =
    (1000·S_t) div n. ``shift_up``/``shift_down`` flag S_t > n·threshold
    (slack and threshold are in VALUE units; callers with money pass
    cents, per the fixed-point convention of session_stats).

    Scale shape: input is already bucket-aggregated (|buckets| rows, not
    |events|); one mean aggregate joined back (broadcast — one row per
    key), then ONE window shuffle serving both sides and both frames.
    Per-key series length is bounded by the bucket grid (time range /
    step), so the window sort state is bounded regardless of raw volume.
    """
    keys = list(key_cols)
    if not keys:
        guard_global_window(
            df, "cusum_flags",
            max_global_rows=(
                GLOBAL_WINDOW_MAX_ROWS if max_global_rows is None else max_global_rows
            ),
        )
    x = F.col(value_col).cast("bigint")
    stats = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum(x).cast("bigint").alias("_sx"),
    )
    base = df.join(stats, keys) if keys else df.crossJoin(F.broadcast(stats))
    up = F.col("_n") * x - F.col("_sx") - F.col("_n") * F.lit(int(slack))
    dn = -(F.col("_n") * x - F.col("_sx") + F.col("_n") * F.lit(int(slack)))
    w = (
        Window.partitionBy(*keys).orderBy(bucket_col)
        if keys
        else Window.orderBy(bucket_col)
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored = base.select(
        *keys,
        bucket_col,
        x.alias(value_col),
        F.col("_n"),
        F.sum(up).over(run).alias("_pu"),
        F.sum(dn).over(run).alias("_pd"),
    ).select(
        *keys,
        bucket_col,
        value_col,
        F.col("_n"),
        (F.col("_pu") - F.least(F.lit(0), F.min("_pu").over(run))).alias("_su"),
        (F.col("_pd") - F.least(F.lit(0), F.min("_pd").over(run))).alias("_sd"),
    )
    thr = F.col("_n") * F.lit(int(threshold))
    return scored.select(
        *keys,
        bucket_col,
        value_col,
        F.expr("(1000 * _su) div _n").cast("bigint").alias("cusum_pos_milli"),
        F.expr("(1000 * _sd) div _n").cast("bigint").alias("cusum_neg_milli"),
        (F.col("_su") > thr).alias("shift_up"),
        (F.col("_sd") > thr).alias("shift_down"),
    )


def linear_trend(
    df: DataFrame,
    x_col: str,
    y_col: str,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-key closed-form least-squares line fit over integer (x, y):
    (key..., n, slope, intercept) with x shifted to each key's minimum
    (x' = x - min_x) before the moment sums — the shift leaves the slope
    unchanged, keeps the bigint moments small (Σx'² grows with the SPAN,
    not the epoch magnitude), and anchors the intercept at the series
    start, which is the number anyone plotting a trend wants anyway.

    All five moments (n, Σx', Σy, Σx'y, Σx'²) are exact bigint sums —
    order-independent, so map-side partial aggregation applies and any
    engine reproduces them bit-for-bit. The two closing divisions

        slope     = (n·Σx'y − Σx'·Σy) / D,   D = n·Σx'² − (Σx')²
        intercept = (Σy·Σx'² − Σx'·Σx'y) / D

    are single bigint→double divisions rounded at the boundary (never a
    rounded value re-entering arithmetic). D = 0 (one point, constant x)
    yields NULLs rather than a division error.

    Scale: one key-partitioned min-agg + join back + one moments agg —
    two shuffles total, state O(1) per key. The fit is the trend/
    drift-detection primitive next to ewma_trailing's smoother.
    Keyless input needs NO raise-above-threshold guard (unlike
    cusum_flags/mad_outliers): there is no window sort anywhere — the
    keyless path is a 1-row broadcast crossJoin plus a map-side-partial
    global aggregate, which scales to any row count.
    """
    keys = list(key_cols)
    x = F.col(x_col).cast("bigint")
    y = F.col(y_col).cast("bigint")
    mins = df.groupBy(*keys).agg(F.min(x).alias("_x0"))
    base = df.join(mins, keys) if keys else df.crossJoin(F.broadcast(mins))
    xs = (x - F.col("_x0")).alias("_xs")
    m = base.select(*keys, xs, y.alias("_y")).groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_xs").cast("bigint").alias("_sx"),
        F.sum("_y").cast("bigint").alias("_sy"),
        F.sum(F.col("_xs") * F.col("_y")).cast("bigint").alias("_sxy"),
        F.sum(F.col("_xs") * F.col("_xs")).cast("bigint").alias("_sxx"),
    )
    d = F.col("n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = (F.col("n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / d
    intercept = (
        F.col("_sy") * F.col("_sxx") - F.col("_sx") * F.col("_sxy")
    ) / d
    return m.select(
        *keys,
        "n",
        F.when(d != 0, F.round(slope, 6)).alias("slope"),
        F.when(d != 0, F.round(intercept, 6)).alias("intercept"),
    )


def mad_outliers(
    df: DataFrame,
    bucket_col: str,
    value_col: str,
    key_cols: Sequence[str] = (),
    thresh_num: int = 5,
    thresh_den: int = 1,
    max_global_rows: int | None = None,
) -> DataFrame:
    """Robust outlier detection via median / MAD (Hampel filter family;
    public method): flag buckets where

        |x - median| > (thresh_num/thresh_den) · MAD

    per key, with median and MAD as LOWER MEDIANS (the ⌈n/2⌉-th order
    statistic) so every quantity is an exact integer of the input's own
    units — no interpolation, no floats, engine-portable bit-for-bit.
    The mean/σ z-score flags (hourly_anomaly_flags) melt when the
    contamination is heavy (outliers inflate σ); median/MAD has a 50%
    breakdown point — the robust twin.

    Scale shape: two key-partitioned window sorts over the BUCKET grid
    (series length, not event count): one ranks x to select the median,
    one ranks |x - median|. The medians travel back via per-key 1-row
    broadcast joins. The all-constant degenerate case (MAD = 0) flags
    any deviation ≥ 1 unit, matching the Hampel convention of falling
    back to a minimum scale.

    Returns (key..., bucket, value, median, mad, abs_dev, is_outlier).
    """
    keys = list(key_cols)
    if not keys:
        guard_global_window(
            df, "mad_outliers",
            max_global_rows=(
                GLOBAL_WINDOW_MAX_ROWS if max_global_rows is None else max_global_rows
            ),
        )
    x = F.col(value_col).cast("bigint")
    wk = (
        Window.partitionBy(*keys)
        if keys
        else Window.partitionBy(F.lit(1))
    )

    def lower_median(frame: DataFrame, col: str, out: str) -> DataFrame:
        ranked = frame.withColumn(
            "_rn", F.row_number().over(wk.orderBy(F.col(col), bucket_col))
        ).withColumn("_n", F.count(F.lit(1)).over(wk))
        med = ranked.where(
            F.col("_rn") == F.expr("(_n + 1) div 2")
        ).select(*keys, F.col(col).cast("bigint").alias(out))
        return med

    base = df.select(*keys, bucket_col, x.alias(value_col))
    med = lower_median(base, value_col, "median")
    with_med = (
        base.join(F.broadcast(med), keys)
        if keys
        else base.crossJoin(F.broadcast(med))
    )
    dev = with_med.withColumn(
        "abs_dev", F.abs(F.col(value_col) - F.col("median")).cast("bigint")
    )
    mad = lower_median(dev, "abs_dev", "mad")
    out = (
        dev.join(F.broadcast(mad), keys)
        if keys
        else dev.crossJoin(F.broadcast(mad))
    )
    scale = F.greatest(F.col("mad"), F.lit(1))
    return out.select(
        *keys,
        bucket_col,
        value_col,
        "median",
        "mad",
        "abs_dev",
        (
            F.col("abs_dev") * F.lit(int(thresh_den))
            > scale * F.lit(int(thresh_num))
        ).alias("is_outlier"),
    )

def theil_sen_trend(
    df: DataFrame,
    x_col: str,
    y_col: str,
    key_cols: Sequence[str] = (),
    max_points_per_key: int = 2_000,
) -> DataFrame:
    """Per-key Theil-Sen robust trend (Theil 1950 / Sen 1968, public
    method): the LOWER MEDIAN of all pairwise slopes (y_j−y_i)/(x_j−x_i)
    — the slope estimator that shrugs off the outliers that drag
    ``linear_trend``'s least squares around (breakdown point ~29%).

    Slopes are integer ppm via integral division truncating toward
    zero — slope_ppm = 1e6·Δy div Δx with Δx > 0 under the sorted-x
    pair order. Both Spark's ``div`` and DuckDB's ``//`` truncate
    toward zero (verified empirically at sf1 on negative slopes), so
    plain integral division IS the portable form. The median is the
    exact k-th smallest (k = (n_pairs+1) div 2). Output per key:
    ``(key..., n_points, n_pairs, ts_slope_ppm)``.

    Scale contract: pairwise slopes are inherently O(m²) PER KEY — this
    operator is for MANY SHORT series (per-type/source hourly rollups:
    m ≤ a few thousand), never raw logs. ``max_points_per_key`` makes
    that contract explicit: any key past it raises with the remediation
    (aggregate to a coarser grain first); the cap also bounds the
    keyless path, whose single global series funnels its pairs through
    one rank window. Plan: a count-only guard aggregate FIRST (so an
    over-cap key raises before any array is ever built — collect_list
    on a runaway series would OOM the task, not raise), then one
    per-key sorted collect_list (the series fits by contract,
    checkpointed once for the pair explode), one pair explode, one
    per-key rank window for the order statistic — every stage keyed,
    so skew = the largest single series, which the guard bounds.
    """
    keys = list(key_cols)
    # guard FIRST with a cheap count-only aggregate: an over-cap key
    # (especially the keyless single-series case) would otherwise OOM
    # the task materializing the full sorted collect_list below before
    # the intended ValueError ever fired
    chk = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_m"))
        .agg(F.max("_m").alias("_mx"))
        .collect()[0]["_mx"]
        or 0
    )
    if chk > max_points_per_key:
        raise ValueError(
            f"theil_sen_trend: a key holds {chk} points (> "
            f"max_points_per_key={max_points_per_key}); pairwise slopes "
            "are O(m^2) per key - aggregate the series to a coarser "
            "grain first, or raise the cap deliberately"
        )
    sized = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_m"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(x_col).cast("bigint").alias("x"),
                    F.col(y_col).cast("bigint").alias("y"),
                )
            )
        ).alias("_pts"),
    ).localCheckpoint(eager=True)
    pairs = (
        sized.where(F.size("_pts") >= 2)
        .select(
            *keys,
            F.col("_m").cast("bigint").alias("n_points"),
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(2), F.size("_pts")),
                        lambda i: F.transform(
                            F.sequence(F.lit(1), i - F.lit(1)),
                            lambda j: F.struct(
                                F.element_at(F.col("_pts"), i)
                                .getField("x")
                                .alias("x2"),
                                F.element_at(F.col("_pts"), j)
                                .getField("x")
                                .alias("x1"),
                                F.element_at(F.col("_pts"), i)
                                .getField("y")
                                .alias("y2"),
                                F.element_at(F.col("_pts"), j)
                                .getField("y")
                                .alias("y1"),
                            ),
                        ),
                    )
                )
            ).alias("p"),
        )
        .where(F.expr("p.x2 != p.x1"))
        .select(
            *keys,
            "n_points",
            # plain `div`: BOTH Spark's div and DuckDB's // truncate
            # toward zero (verified empirically: -5 // 3 = -1 in DuckDB
            # 1.x), so integral division is already engine-portable for
            # negative slopes — a floor-emulating form is what diverges
            F.expr("1000000 * (p.y2 - p.y1) div (p.x2 - p.x1)").alias("_s"),
        )
    )
    w = Window.partitionBy(*keys) if keys else Window.partitionBy()
    ranked = pairs.withColumn(
        "_rk", F.row_number().over(w.orderBy("_s"))
    ).withColumn("_np", F.count(F.lit(1)).over(w))
    return (
        ranked.where(F.col("_rk") == F.expr("(_np + 1) div 2"))
        .select(
            *keys,
            "n_points",
            F.col("_np").cast("bigint").alias("n_pairs"),
            F.col("_s").alias("ts_slope_ppm"),
        )
    )

def best_mean_shift(
    df: DataFrame,
    x_col: str,
    y_col: str,
    key_cols: Sequence[str] = (),
    max_global_rows: int | None = None,
) -> DataFrame:
    """Per-key single changepoint by binary segmentation: the split
    point t maximizing the between-segment contrast of a mean shift —
    where did this series change level? (CUSUM's ``cusum_flags`` says
    WHETHER drift crossed a threshold; this says WHERE the one best
    split is — the first step of binary-segmentation changepoint
    detection, public method.)

    The maximized statistic is the centered cumulative sum scaled to
    stay integer: contrast(t) = |n·S_t − t·S_n| over prefix sums S_t of
    y ordered by x (equivalent to the two-segment mean-difference test
    statistic up to a per-t positive factor... NOTE: the UNNORMALIZED
    form — deliberately: it is exact bigint, monotone enough for level
    shifts, and engine-portable; the √(t(n−t)) normalization needs
    floats). Ties break to the smallest x. Output per key:
    ``(key..., n_points, split_x, contrast)`` — split AFTER x = split_x.

    Scale shape: ONE window sort per key (prefix sum, rank and totals
    share the frame) + one hash-aggregate argmax via lexicographic
    max(struct(contrast, −x)). Keyless input raises above
    ``max_global_rows`` (the assign_batches contract) — pass key_cols
    so the sort is per-group and parallel.
    """
    keys = list(key_cols)
    if not keys:
        guard_global_window(
            df,
            "best_mean_shift",
            "key_cols",
            GLOBAL_WINDOW_MAX_ROWS if max_global_rows is None else max_global_rows,
        )
    x = F.col(x_col).cast("bigint")
    y = F.col(y_col).cast("bigint")
    wp = Window.partitionBy(*keys) if keys else Window.partitionBy()
    w = wp.orderBy(x_col).rowsBetween(Window.unboundedPreceding, 0)
    base = (
        df.select(*keys, x.alias("_x"), y.alias("_y"))
        .withColumn("_st", F.sum("_y").over(w.orderBy("_x")))
        .withColumn("_t", F.row_number().over(wp.orderBy("_x")))
        .withColumn("_n", F.count(F.lit(1)).over(wp))
        .withColumn("_sn", F.sum("_y").over(wp))
    )
    contrast = F.abs(
        F.col("_n") * F.col("_st") - F.col("_t") * F.col("_sn")
    ).cast("bigint")
    best = (
        base.where(F.col("_t") < F.col("_n"))  # a split needs both sides
        .select(
            *keys,
            F.col("_n").cast("bigint").alias("n_points"),
            F.struct(
                contrast.alias("c"), (-F.col("_x")).alias("nx")
            ).alias("_cand"),
        )
        .groupBy(*keys, "n_points")
        .agg(F.max("_cand").alias("_best"))
        .select(
            *keys,
            "n_points",
            (-F.col("_best.nx")).cast("bigint").alias("split_x"),
            F.col("_best.c").alias("contrast"),
        )
    )
    return best.orderBy(*keys) if keys else best
