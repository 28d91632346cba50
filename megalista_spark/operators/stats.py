"""Cross-column statistics for dataset auditing: chi-squared independence,
empirical-Bayes rate shrinkage, winsorized robust group statistics.

These are the checks a training-data pipeline runs before trusting a
categorical feature (is it independent of the label / another feature?),
before ranking small groups by a rate (raw small-sample rates are noise —
shrink toward the prior), and before feeding heavy-tailed numerics to a
normalizer (winsorize the tails away).

All arithmetic is integer / decimal(38,0) with explicit integral division
(ppm fixed-point), so every statistic reproduces bit-for-bit on any engine
— the same portability contract as operators/expectations.py and
operators/profiling.py. No floats, no logs; the chi-squared statistic here
is the exact textbook Σ(O−E)²/E scaled to ppm with per-cell floor division
(rank-equivalent for thresholding; documented as ``chi2_ppm``).

The reference (an API-bound ETL) has no analogue; closest are its
count-based run summaries (megalista_dataflow/steps/last_step.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_D38 = "decimal(38,0)"


def chi2_independence(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Pearson chi-squared test of independence between two categorical
    columns, in exact integer ppm.

    Per contingency cell with observed count o, row sum rs, column sum
    cs, total N, the textbook term (o − rs·cs/N)²/(rs·cs/N) equals
    N·(o·N − rs·cs)² / (N²·rs·cs); we fold one N and compute

        term_ppm = (1e6 · (o·N − rs·cs)²) div (N · rs · cs)

    in decimal(38,0) (o·N can reach ~1e19 at petascale and its square
    ~1e38 — right at the decimal ceiling, so the statistic ENFORCES a
    guard: |o·N − rs·cs| ≤ ~1e16 stays exact, i.e. tables to ~1e8 rows
    per shard; beyond it a per-cell overflow yields NULL in non-ANSI
    Spark and a silent F.sum skip would UNDERSTATE chi2_ppm, so the
    aggregate counts overflowed cells and raises at execution time —
    audit bigger tables on a sampled or sharded basis instead.
    Output is ONE row: chi2_ppm (Σ term_ppm), dof, n, plus the grid
    dimensions — compare chi2_ppm against 1e6× the critical value.

    Scale shape: one hash aggregate over (a,b) — map-side combined —
    then broadcast joins of the marginal sums (R and C rows) onto the
    R·C cell table. Nothing beyond the first aggregate touches raw rows.
    """
    # cells feeds four consumers, but its map-side partial aggregation
    # bounds the shuffle at R·C rows per map task and the exchange is
    # runtime-reused across all of them — an eager materialization was
    # TRIED (r12) and measured flat-to-worse (it only adds a barrier job;
    # the duplicated final aggregate over the tiny shuffle is free)
    cells = df.groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("_o"))
    # NULL is a legitimate category level: groupBy keys NULLs together,
    # so the marginal joins must be null-safe or NULL cells silently
    # vanish from the statistic (the t_closeness_report lesson)
    rows = cells.groupBy(col_a).agg(F.sum("_o").alias("_rs")).select(
        F.col(col_a).alias("_ka"), "_rs"
    )
    colsums = cells.groupBy(col_b).agg(F.sum("_o").alias("_cs")).select(
        F.col(col_b).alias("_kb"), "_cs"
    )
    n = cells.agg(F.sum("_o").alias("_n"))
    g = (
        cells.join(F.broadcast(rows), F.col(col_a).eqNullSafe(F.col("_ka")))
        .join(F.broadcast(colsums), F.col(col_b).eqNullSafe(F.col("_kb")))
        .crossJoin(F.broadcast(n))
    )
    term = g.select(
        F.col(col_a),
        F.col(col_b),
        F.expr(
            f"(CAST(1000000 AS {_D38})"
            f" * (CAST(_o AS {_D38}) * _n - CAST(_rs AS {_D38}) * _cs)"
            f" * (CAST(_o AS {_D38}) * _n - CAST(_rs AS {_D38}) * _cs))"
            f" div (CAST(_n AS {_D38}) * _rs * _cs)"
        )
        .cast("long")
        .alias("_term_ppm"),
    )
    # count_distinct ignores NULL — add the NULL level back when present
    levels_a = F.count_distinct(col_a) + F.coalesce(
        F.max(F.col(col_a).isNull().cast("int")), F.lit(0)
    )
    levels_b = F.count_distinct(col_b) + F.coalesce(
        F.max(F.col(col_b).isNull().cast("int")), F.lit(0)
    )
    # overflow-to-NULL guard: _term_ppm inputs are never NULL (cells are
    # non-empty counts), so a NULL term can only be decimal/long overflow
    # — fail loudly instead of summing past it (a plain F.sum skips NULL
    # and quietly understates the statistic)
    n_overflow = F.sum(F.when(F.col("_term_ppm").isNull(), F.lit(1)).otherwise(F.lit(0)))
    chi2 = (
        F.when(
            n_overflow > 0,
            F.raise_error(
                F.concat(
                    n_overflow.cast("string"),
                    F.lit(
                        " chi2_independence contingency cells overflowed the "
                        "decimal(38,0)/long headroom (|o*N - rs*cs| beyond "
                        "~1e16; see docstring) - the statistic would be "
                        "silently understated. Audit this table on a sampled "
                        "or sharded basis."
                    ),
                )
            ).cast("long"),
        )
        .otherwise(F.sum("_term_ppm"))
    )
    return term.agg(
        chi2.alias("chi2_ppm"),
        ((levels_a - F.lit(1)) * (levels_b - F.lit(1))).cast("long").alias("dof"),
    ).crossJoin(F.broadcast(n.select(F.col("_n").cast("long").alias("n_rows"))))


def shrunk_rates(
    df: DataFrame,
    group_cols: list[str],
    success_col: str,
    prior_strength: int = 500,
) -> DataFrame:
    """Empirical-Bayes rate shrinkage: per-group success rate pulled
    toward the global rate with ``prior_strength`` pseudo-observations —
    how to rank campaigns/segments/cohorts by a rate without small
    groups winning on noise (beta-binomial posterior mean with
    m = prior_strength).

        global_ppm = (1e6·ΣS) div ΣN
        shrunk_ppm = (1e6·S + m·global_ppm) div (N + m)

    Exact long arithmetic (1e6·S overflows only past ~9e12 successes per
    group). ``success_col`` is a 0/1 int or boolean column.

    Scale shape: one hash aggregate on the group key (map-side combined)
    plus a 1-row broadcast of the global totals — no second pass over
    raw rows.
    """
    per = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum(F.col(success_col).cast("long")).alias("n_success"),
    )
    tot = per.agg(
        F.expr("1000000 * sum(n_success) div sum(n_obs)").alias("_gppm")
    )
    m = int(prior_strength)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            *group_cols,
            "n_obs",
            "n_success",
            F.expr("1000000 * n_success div n_obs").alias("raw_ppm"),
            F.expr(f"(1000000 * n_success + {m} * _gppm) div (n_obs + {m})").alias(
                "shrunk_ppm"
            ),
            F.col("_gppm").alias("global_ppm"),
        )
        .orderBy(*group_cols)
    )


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo_pct: int = 5,
    hi_pct: int = 95,
    decimals: int = 2,
) -> DataFrame:
    """Per-group winsorized mean: clip each group's values to its exact
    [lo_pct, hi_pct] percentile boundaries, then average — the robust
    location estimate for heavy-tailed numerics before normalization.

    Boundaries are exact order statistics: the value at 1-based rank
    ceil(p·n/100) ordered by (value, then value again for a total
    order) — deterministic and engine-portable, no interpolation.
    Values are fixed-pointed to ``decimals`` places (the money contract,
    see profiling.binned_drift); the mean is integer-divided back to
    fixed-point. Portability of the closing division: Spark ``div`` and
    DuckDB ``//`` BOTH truncate toward zero (verified empirically at sf1
    on negative inputs — an earlier note here claimed DuckDB floors;
    it does not), so signed sums divide identically on both engines.

    Scale shape: one window rank per group (single shuffle on the group
    key), a broadcast of the per-group boundary rows (2 rows per group),
    and one hash aggregate. Groups are assumed numerous-but-bounded
    (brands, categories); a single giant group serializes its window —
    same caveat family as assign_batches, acceptable because the rank
    window is on the group key, which IS the partition key here.
    """
    scale = 10**decimals
    cents = df.select(
        F.col(group_col).alias("grp"),
        F.round(F.col(value_col) * scale).cast("long").alias("_cents"),
    ).where(F.col("_cents").isNotNull())
    w = Window.partitionBy("grp").orderBy("_cents")
    ranked = cents.withColumn("_rk", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy("grp"))
    )
    lo_rk = F.expr(f"CAST(greatest(1, ceil({lo_pct} * _n / 100)) AS INT)")
    hi_rk = F.expr(f"CAST(greatest(1, ceil({hi_pct} * _n / 100)) AS INT)")
    bounds = (
        ranked.withColumn("_lo_rk", lo_rk)
        .withColumn("_hi_rk", hi_rk)
        .where((F.col("_rk") == F.col("_lo_rk")) | (F.col("_rk") == F.col("_hi_rk")))
        .groupBy("grp")
        .agg(
            F.min(F.when(F.col("_rk") == F.col("_lo_rk"), F.col("_cents"))).alias(
                "lo_cents"
            ),
            F.min(F.when(F.col("_rk") == F.col("_hi_rk"), F.col("_cents"))).alias(
                "hi_cents"
            ),
        )
    )
    # null-safe: NULL is a legitimate group key (the window and the bounds
    # aggregate both keep it; a plain equi-join would silently drop it)
    bounds = bounds.select(F.col("grp").alias("_bg"), "lo_cents", "hi_cents")
    return (
        cents.join(F.broadcast(bounds), F.col("grp").eqNullSafe(F.col("_bg")))
        .select(
            "grp",
            F.expr(
                "CASE WHEN _cents < lo_cents THEN lo_cents "
                "WHEN _cents > hi_cents THEN hi_cents ELSE _cents END"
            ).alias("_w"),
            "lo_cents",
            "hi_cents",
        )
        .groupBy("grp", "lo_cents", "hi_cents")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_values"),
            F.expr("sum(_w) div count(1)").alias("winsorized_mean_cents"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_values",
            "lo_cents",
            "hi_cents",
            "winsorized_mean_cents",
        )
        .orderBy(group_col)
    )

def binary_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    decimals: int = 2,
    n_coarse: int = 4096,
) -> DataFrame:
    """Exact ROC-AUC of a numeric score against a binary label, in
    integer ppm — the audit every learned quality/toxicity/fluency
    classifier gets before its scores gate a training corpus.

    AUC is the Mann-Whitney rank statistic: over all (positive,
    negative) pairs, the fraction where the positive scores higher,
    ties counting half. Grouping by distinct score value makes it

        AUC = Σ_s (neg_below(s)·pos(s) + pos(s)·neg(s)/2) / (P·N)

    computed here in units-of-2 integers (no halves), then one ppm
    division. Scores are fixed-pointed to ``decimals`` (the money
    contract); labels are 0/1 or boolean. Degenerate inputs (no
    positives or no negatives) yield NULL ``auc_ppm`` rather than a
    made-up 0.5 — the caller should treat them as "not measurable".

    Scale shape — the naive form sorts ALL distinct scores through one
    keyless window; this one never does: (1) one hash aggregate to the
    distinct-score table (score → pos/neg counts), (2) coarse-bucket
    totals (≤ ``n_coarse`` rows: bucket = (score−lo) div width) whose
    prefix sum runs in one bounded window, (3) the fine prefix sum
    runs per-bucket — a window PARTITIONED BY bucket, parallel and
    spillable. neg_below = coarse prefix + in-bucket prefix. Products
    accumulate in decimal(38,0) (Σ ≤ 2·P·N ~ 1e24 at petascale — far
    under the ceiling).
    """
    scale = 10**decimals
    g = (
        df.select(
            F.round(F.col(score_col) * scale).cast("long").alias("_s"),
            F.col(label_col).cast("int").alias("_y"),
        )
        .where(F.col("_s").isNotNull() & F.col("_y").isNotNull())
        .groupBy("_s")
        .agg(
            F.sum("_y").cast("long").alias("_pos"),
            F.sum(1 - F.col("_y")).cast("long").alias("_neg"),
        )
        # three consumers (bounds, coarse totals, fine window) would each
        # re-run the raw-row aggregate lazily — materialize the
        # distinct-score table once (the simhash_near_pairs lesson)
        .localCheckpoint(eager=True)
    )
    bounds = g.agg(
        F.min("_s").alias("_lo"),
        F.expr(f"(max(_s) - min(_s)) div {int(n_coarse)} + 1").alias("_w"),
    )
    b = g.crossJoin(F.broadcast(bounds)).withColumn(
        "_bkt", F.expr("(_s - _lo) div _w")
    )
    coarse = b.groupBy("_bkt").agg(F.sum("_neg").alias("_bneg"))
    wc = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    coarse = coarse.select(
        F.col("_bkt").alias("_cb"),
        F.coalesce(F.sum("_bneg").over(wc), F.lit(0)).alias("_neg_before_bkt"),
    )
    wf = (
        Window.partitionBy("_bkt")
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    fine = (
        b.withColumn("_neg_in_bkt", F.coalesce(F.sum("_neg").over(wf), F.lit(0)))
        .join(F.broadcast(coarse), F.col("_bkt") == F.col("_cb"))
        .withColumn("_nb", F.col("_neg_before_bkt") + F.col("_neg_in_bkt"))
    )
    num2 = F.sum(
        F.expr(
            f"CAST(2 AS {_D38}) * _nb * _pos + CAST(_pos AS {_D38}) * _neg"
        )
    )
    return fine.agg(
        F.sum("_pos").cast("long").alias("n_pos"),
        F.sum("_neg").cast("long").alias("n_neg"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_scores"),
        num2.alias("_num2"),
    ).select(
        "n_pos",
        "n_neg",
        "n_distinct_scores",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.expr(
                f"CAST((CAST(1000000 AS {_D38}) * _num2)"
                f" div (CAST(2 AS {_D38}) * n_pos * n_neg) AS BIGINT)"
            ),
        ).alias("auc_ppm"),
    )


def gains_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    decimals: int = 2,
) -> DataFrame:
    """Cumulative gains / lift table: rows binned into equal-frequency
    score bins (exact boundaries, no global sort — rides
    sketches.exact_quantile_select like quantile_bins), then per bin the
    positive rate, and walking from the HIGHEST-score bin down the
    cumulative share of all positives captured — the "top decile holds
    X% of conversions" audit that decides whether a score is worth
    gating on.

    Output per non-empty bin (1 = lowest scores):
      ``n_rows, n_pos, rate_ppm`` — the bin alone,
      ``cum_pos, cum_rows, capture_ppm`` — this bin and above,
      ``lift_ppm`` — bin rate ÷ global rate, in ppm (1e6 = average).

    All-integer (ppm floor division). Scale shape: the three
    histogram-pruned boundary passes + ONE scan folding each row against
    the broadcast (n_bins−1)-element boundary array + one n_bins-group
    aggregate; the cumulative walk is a window over ≤ n_bins rows.
    """
    from .sketches import exact_quantile_select

    scale = 10**decimals
    qs = tuple(i * 1000 // n_bins for i in range(1, n_bins))
    bounds = exact_quantile_select(df, score_col, q_permilles=qs).agg(
        F.sort_array(F.collect_list("value")).alias("_bs")
    )
    x = F.col(score_col)
    binned = (
        df.select(
            x.alias("_x"),
            F.col(label_col).cast("int").alias("_y"),
        )
        .where(F.col("_x").isNotNull() & F.col("_y").isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            (
                F.lit(1) + F.size(F.filter(F.col("_bs"), lambda b: F.col("_x") > b))
            ).alias("bin"),
            F.round(F.col("_x") * scale).cast("long").alias("_cents"),
            "_y",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("_y").cast("long").alias("n_pos"),
            F.min("_cents").alias("lo_cents"),
        )
    )
    wd = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = binned.agg(
        F.sum("n_rows").alias("_n"), F.sum("n_pos").alias("_p")
    )
    return (
        binned.withColumn("cum_pos", F.sum("n_pos").over(wd).cast("long"))
        .withColumn("cum_rows", F.sum("n_rows").over(wd).cast("long"))
        .crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_rows",
            "n_pos",
            "lo_cents",
            F.expr(
                f"CAST(CAST(1000000 AS {_D38}) * n_pos div n_rows AS BIGINT)"
            ).alias("rate_ppm"),
            "cum_pos",
            "cum_rows",
            F.when(
                F.col("_p") > 0,
                F.expr(
                    f"CAST(CAST(1000000 AS {_D38}) * cum_pos div _p AS BIGINT)"
                ),
            ).alias("capture_ppm"),
            F.when(
                F.col("_p") > 0,
                F.expr(
                    f"CAST((CAST(1000000 AS {_D38}) * n_pos * _n)"
                    f" div (CAST(n_rows AS {_D38}) * _p) AS BIGINT)"
                ),
            ).alias("lift_ppm"),
        )
        .orderBy("bin")
    )


def cuped_lift(
    df: DataFrame,
    unit_col: str,
    arm_col: str,
    metric_col: str,
    covariate_col: str,
    control_value: str = "control",
    treatment_value: str = "treatment",
) -> DataFrame:
    """CUPED variance-reduced experiment lift (Deng et al. 2013, public
    method): adjust the treatment-vs-control difference of a metric by a
    PRE-EXPERIMENT covariate, removing the variance the covariate
    explains —

        θ   = cov(x, y) / var(x)          (pooled over both arms)
        Δ*  = (ȳ_t − ȳ_c) − θ·(x̄_t − x̄_c)

    ``df`` is one row per experiment unit with its arm, metric y and
    covariate x (both numeric, integer-valued units — cents are the
    caller's job). Output is ONE row: n per arm, raw and CUPED-adjusted
    diffs, θ and the variance-reduction fraction ρ² = cov²/(var_x·var_y)
    — all rounded to 6dp. The moments are EXACT integer/decimal(38,0)
    sums (Σx, Σy, Σxy, Σx², Σy² — one hash aggregate); only the final
    few ratios are shared-operand double arithmetic (the
    experiment-lift z-stat precedent: identical integer operands give
    identical IEEE results on any engine).

    Scale shape: one per-arm hash aggregate over units (map-side
    combined), then everything happens on a 2-row table. Sum headroom:
    Σx² in decimal(38,0) overflows only past ~1e19 per-unit values.
    """
    per = (
        df.select(
            F.col(arm_col).alias("_arm"),
            F.col(metric_col).cast(_D38).alias("_y"),
            F.col(covariate_col).cast(_D38).alias("_x"),
        )
        .where(F.col("_x").isNotNull() & F.col("_y").isNotNull())
        .groupBy("_arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum("_x").alias("_sx"),
            F.sum("_y").alias("_sy"),
            F.sum(F.expr("_x * _y")).alias("_sxy"),
            F.sum(F.expr("_x * _x")).alias("_sxx"),
            F.sum(F.expr("_y * _y")).alias("_syy"),
        )
        # the control/treatment filters each consume this 2-row result;
        # without materialization the unit-grain aggregate (the heavy
        # scan) runs twice
        .localCheckpoint(eager=True)
    )
    c = per.where(F.col("_arm") == control_value).select(
        F.col("_n").alias("nc"), F.col("_sx").alias("sxc"),
        F.col("_sy").alias("syc"), F.col("_sxy").alias("sxyc"),
        F.col("_sxx").alias("sxxc"), F.col("_syy").alias("syyc"),
    )
    t = per.where(F.col("_arm") == treatment_value).select(
        F.col("_n").alias("nt"), F.col("_sx").alias("sxt"),
        F.col("_sy").alias("syt"), F.col("_sxy").alias("sxyt"),
        F.col("_sxx").alias("sxxt"), F.col("_syy").alias("syyt"),
    )
    g = c.crossJoin(t).select(
        "*",
        (F.col("nc") + F.col("nt")).alias("_np"),
        (F.col("sxc") + F.col("sxt")).alias("_sx"),
        (F.col("syc") + F.col("syt")).alias("_sy"),
        (F.col("sxyc") + F.col("sxyt")).alias("_sxy"),
        (F.col("sxxc") + F.col("sxxt")).alias("_sxx"),
        (F.col("syyc") + F.col("syyt")).alias("_syy"),
    )
    # pooled central moments as exact decimals; ratios in double
    cov = F.col("_np") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    varx = F.col("_np") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vary = F.col("_np") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    theta = F.when(varx > 0, cov.cast("double") / varx.cast("double")).otherwise(
        F.lit(0.0)
    )
    raw_diff = (
        F.col("syt").cast("double") / F.col("nt")
        - F.col("syc").cast("double") / F.col("nc")
    )
    x_diff = (
        F.col("sxt").cast("double") / F.col("nt")
        - F.col("sxc").cast("double") / F.col("nc")
    )
    rho2 = F.when(
        (varx > 0) & (vary > 0),
        (cov.cast("double") * cov.cast("double"))
        / (varx.cast("double") * vary.cast("double")),
    ).otherwise(F.lit(0.0))
    return g.select(
        F.col("nc").cast("long").alias("n_control"),
        F.col("nt").cast("long").alias("n_treatment"),
        F.round(raw_diff, 6).alias("raw_diff"),
        F.round(raw_diff - theta * x_diff, 6).alias("cuped_diff"),
        F.round(theta, 6).alias("theta"),
        F.round(rho2, 6).alias("rho2"),
    )

def srm_check(
    df: DataFrame,
    arm_col: str,
    expected_ppm: dict,
) -> DataFrame:
    """Sample-Ratio Mismatch audit — the experiment guardrail that runs
    BEFORE any lift readout: do the realized arm counts match the
    designed allocation? A biased splitter (bot filtering, redirect
    loss, a broken hash) silently invalidates every downstream metric,
    and SRM is the standard detector (chi-squared goodness-of-fit
    against the design ratios).

    ``expected_ppm`` maps arm value → designed share in ppm (must sum
    to ~1e6 and be positive). Output one row per DESIGNED arm (arms
    missing from the data appear with n_obs = 0 — that IS the worst
    mismatch): ``arm, n_obs, obs_ppm, expected_ppm, expected_n`` plus
    the global ``chi2_ppm`` (Σ 1e6·(o−e)²/e in exact decimal(38,0)
    floor arithmetic, repeated per row) — compare against 1e6× the
    critical value at k−1 dof.

    Scale shape: ONE hash aggregate on the arm column (map-side
    combined), then everything happens on the ≤ |arms| row table with a
    1-row total broadcast. Nothing else touches raw rows.
    """
    if not expected_ppm or any(v <= 0 for v in expected_ppm.values()):
        raise ValueError("srm_check needs positive expected_ppm per arm")
    spark = df.sparkSession
    exp = spark.createDataFrame(
        [(str(k), int(v)) for k, v in sorted(expected_ppm.items())],
        f"arm string, expected_ppm long",
    )
    # counts is read twice (total + design join) but its partial
    # aggregation bounds the shuffle at |arms| rows per map task and the
    # exchange is runtime-reused — an eager materialization was TRIED
    # (r12) and measured flat (barrier cost ≈ the duplicate final agg)
    counts = (
        df.select(F.col(arm_col).cast("string").alias("arm"))
        .groupBy("arm")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    tot = counts.agg(F.sum("n_obs").cast("long").alias("_n"))
    g = (
        exp.join(counts, "arm", "left")
        .select(
            "arm",
            F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
            "expected_ppm",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "arm",
            "n_obs",
            F.expr(f"CAST(CAST(1000000 AS {_D38}) * n_obs div _n AS BIGINT)").alias(
                "obs_ppm"
            ),
            "expected_ppm",
            F.expr("_n * expected_ppm div 1000000").alias("expected_n"),
            F.expr(
                f"CAST((CAST(1000000 AS {_D38})"
                " * (n_obs - _n * expected_ppm div 1000000)"
                " * (n_obs - _n * expected_ppm div 1000000))"
                " div greatest(_n * expected_ppm div 1000000, 1) AS BIGINT)"
            ).alias("_term_ppm"),
        )
    )
    chi2 = g.agg(F.sum("_term_ppm").cast("long").alias("chi2_ppm"))
    return (
        g.crossJoin(F.broadcast(chi2))
        .select(
            "arm", "n_obs", "obs_ppm", "expected_ppm", "expected_n", "chi2_ppm"
        )
        .orderBy("arm")
    )
