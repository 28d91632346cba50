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
    fixed-point. NOTE the portability contract assumes NON-NEGATIVE
    values: Spark ``div`` truncates toward zero while DuckDB ``//``
    floors, and the two diverge exactly when sum(_w) is negative —
    true-by-construction for prices/amounts, not for signed deltas
    (normalize such inputs to a non-negative offset first).

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
