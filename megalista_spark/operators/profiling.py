"""Table profiling — per-column data-quality stats.

The first thing a pipeline owner runs against a new 100 TB drop: row
count, null count, distinct count, min/max per column. Distinct counting
is the cost driver and has three modes:

``approx`` (DEFAULT) — Spark's native ``approx_count_distinct`` (HLL++).
    All columns in ONE aggregate over ONE scan with NO Expand: each
    column's aggregation state is a fixed-size register set, so the
    shuffle carries a few KB per column instead of every distinct value.
    This is the mode a first-touch 100 TB user should be in.

``exact`` — ``countDistinct`` per column. Spark plans multi-distinct
    aggregates via Expand: input rows replicate ×(#distinct aggs) and
    every column's full distinct value set shuffles. Correct and
    oracle-hashable, but ~#cols× the scan work — use for small/medium
    tables or when exact cardinalities are contractually required.

``portable`` — the repo's deterministic HLL (operators/sketches.py) over
    the portable 60-bit md5 hash: the ESTIMATE is a pure function any
    engine reproduces bit-for-bit, so approximate profiling still gets an
    exact cross-engine oracle. Costs a second (column-pruned) scan for
    the register build; per-column state collapses map-side to ≤ m=512
    registers, so the shuffle stays sketch-sized like ``approx``.

Min/max surface as strings so heterogeneous column types share one output
schema — the cross-engine rendering contract is the SQL CAST, which both
Spark and DuckDB define identically for ints, doubles, strings, and
timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _portable_distinct_estimates(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column_name, n_distinct) — per-column deterministic HLL estimate.

    One scan: each row fans out to ≤ #cols (column, hash) pairs, which
    collapse map-side into per-(column, register) maxima — the shuffle is
    ≤ #cols × 512 rows regardless of input size. Nulls are excluded, as
    countDistinct excludes them.
    """
    from megalista_spark.operators.dedup import portable_hash64
    from megalista_spark.operators.sketches import (
        HLL_RMAX,
        HLL_W,
        bitlen_case_sql,
        hll_estimate_case_sql,
    )

    shift = 1 << HLL_W
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            portable_hash64(F.col(c).cast("string")).alias("h"),
        )
        for c in cols
    ]
    regs = (
        df.select(F.inline(F.array(*structs)))
        .where(F.col("h").isNotNull())
        .selectExpr("column_name", f"h DIV {shift} AS bucket", f"h % {shift} AS rem")
        .selectExpr(
            "column_name",
            "bucket",
            f"CASE WHEN rem = 0 THEN {HLL_RMAX} "
            f"ELSE {HLL_RMAX} - ({bitlen_case_sql('rem', HLL_W)}) END AS rho",
        )
        .groupBy("column_name", "bucket")
        .agg(F.max("rho").alias("m_reg"))
    )
    agg = regs.groupBy("column_name").agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RMAX} - m_reg)")).alias(
            "s_present"
        ),
    )
    return agg.selectExpr(
        "column_name", f"{hll_estimate_case_sql()} AS n_distinct"
    )


def binned_drift(
    baseline: DataFrame,
    current: DataFrame,
    value_col: str,
    n_bins: int = 20,
    decimals: int = 2,
) -> DataFrame:
    """Distribution-drift monitor between two cuts of the same feature —
    the chi-square/PSI-style check a feature store runs before letting a
    new data drop into training.

    All arithmetic is integer, so the statistic reproduces bit-for-bit on
    any engine (chi-square proper and PSI both need float division/log;
    this is their integer-rate twin, rank-equivalent for alerting):

      cents     = round(value·10^decimals)  (values assumed ≤ ``decimals``
                  decimal places — the money contract, see sessions.py)
      width     = ceil((max−min+1)/n_bins) over the COMBINED range
      rate ppm  = bin_count·1e6 div side_total
      contrib   = (rate_b − rate_a)² div (rate_a + 1)

    Scale shape: one union scan → one hash aggregate on the bin id
    (≤ n_bins groups, map-side combined), with the combined min/max and
    the two side totals each a 1-row broadcast. Nothing here grows with
    input size except the two scans.
    """
    scale = 10**decimals
    tagged = baseline.select(
        F.round(F.col(value_col) * scale).cast("bigint").alias("cents"),
        F.lit(0).alias("side"),
    ).unionAll(
        current.select(
            F.round(F.col(value_col) * scale).cast("bigint").alias("cents"),
            F.lit(1).alias("side"),
        )
    ).where(F.col("cents").isNotNull())
    bounds = tagged.agg(
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
        F.sum(F.expr("CASE WHEN side = 0 THEN 1 ELSE 0 END")).alias("n_a"),
        F.sum(F.expr("CASE WHEN side = 1 THEN 1 ELSE 0 END")).alias("n_b"),
    ).withColumn("width", F.expr(f"(hi - lo + {n_bins}) div {n_bins}"))
    binned = (
        tagged.crossJoin(F.broadcast(bounds))
        .withColumn("bin_id", F.expr("(cents - lo) div width"))
        .groupBy("bin_id")
        .agg(
            F.min(F.expr("lo + bin_id * width")).alias("bin_lo_cents"),
            F.sum(F.expr("CASE WHEN side = 0 THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_baseline"),
            F.sum(F.expr("CASE WHEN side = 1 THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_current"),
            F.min("n_a").alias("_na"),
            F.min("n_b").alias("_nb"),
        )
    )
    return (
        binned.withColumn(
            "rate_a_ppm", F.expr("n_baseline * 1000000 div _na")
        )
        .withColumn("rate_b_ppm", F.expr("n_current * 1000000 div _nb"))
        .withColumn(
            "drift_contrib",
            F.expr(
                "(rate_b_ppm - rate_a_ppm) * (rate_b_ppm - rate_a_ppm)"
                " div (rate_a_ppm + 1)"
            ),
        )
        .select(
            "bin_id",
            "bin_lo_cents",
            "n_baseline",
            "n_current",
            "rate_a_ppm",
            "rate_b_ppm",
            "drift_contrib",
        )
        .orderBy("bin_id")
    )


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    distinct_mode: str = "approx",
    rsd: float = 0.05,
) -> DataFrame:
    """(column_name, n_rows, n_nulls, n_distinct, min_value, max_value) —
    one row per profiled column.

    ``distinct_mode``: "approx" (default, Spark HLL++, single scan, no
    Expand), "exact" (countDistinct, Expand multi-distinct), or
    "portable" (deterministic cross-engine HLL, see module docstring).
    ``rsd`` applies to "approx" only.
    """
    if distinct_mode not in ("approx", "exact", "portable"):
        raise ValueError(f"unknown distinct_mode: {distinct_mode!r}")
    cols = columns if columns is not None else df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(
            # coalesce: sum over ZERO rows is NULL — an empty table's
            # null count is 0, matching n_rows=0 / n_distinct=0
            F.coalesce(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)), F.lit(0)
            ).alias(f"__nulls_{c}")
        )
        if distinct_mode == "approx":
            aggs.append(F.approx_count_distinct(F.col(c), rsd).alias(f"__dist_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}"))
    stats = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nulls_{c}").cast("bigint").alias("n_nulls"),
            (
                F.col(f"__dist_{c}").cast("bigint")
                if distinct_mode == "approx"
                else F.lit(None).cast("bigint")
            ).alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_value"),
            F.col(f"__max_{c}").alias("max_value"),
        )
        for c in cols
    ]
    base = stats.select(F.inline(F.array(*rows)))
    if distinct_mode == "approx":
        return base
    if distinct_mode == "exact":
        # One column-pruned distinct branch per column instead of a
        # single multi-countDistinct aggregate: Spark plans the latter
        # via Expand — every input row replicates ×#cols and EVERY
        # column's full value set crosses one shuffle. Per-column
        # ``distinct`` branches get map-side partial aggregation (only
        # per-partition-distinct values shuffle, a huge cut for
        # low-cardinality columns), and the branches parallelize as
        # independent stages. Identical counts (countDistinct and
        # DISTINCT share null-excluding value equality).
        #
        # Contract: exact mode evaluates df's lineage once per column —
        # the win assumes df is a (column-prunable) scan, where each
        # branch reads ONE column's pages. Profiling a computed/joined
        # relation whose lineage is expensive should persist it first
        # (caller's choice — persisting here would materialize all
        # columns and defeat the per-column pruning for the scan case).
        est = None
        for c in cols:
            b = (
                df.select(F.col(c).alias("_v"))
                .where(F.col("_v").isNotNull())
                .distinct()
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_distinct"))
                .select(F.lit(c).alias("column_name"), "n_distinct")
            )
            est = b if est is None else est.unionByName(b)
    else:
        est = _portable_distinct_estimates(df.select(*cols), cols)
    return (
        base.drop("n_distinct")
        .join(F.broadcast(est), "column_name", "left")
        .select(
            "column_name",
            "n_rows",
            "n_nulls",
            # an all-null column has no registers — its distinct count is 0
            F.coalesce(F.col("n_distinct"), F.lit(0)).cast("bigint").alias(
                "n_distinct"
            ),
            "min_value",
            "max_value",
        )
    )


def join_skew_audit(df: DataFrame, key_col: str, salt_threshold_ratio: int = 10) -> DataFrame:
    """Join-key skew profile — the pre-flight check before shuffling a
    100 TB table on ``key_col``: how hot is the hottest key relative to
    the average, and should the join be salted / left to AQE skew-split
    (operators/skew.py::salted_join is the mitigation this audit gates).

    Output is ONE row: ``(n_rows, n_keys, max_freq, p50_freq, p99_freq,
    top_key, skew_ratio_ppm, recommend_salting)`` where skew_ratio_ppm =
    1e6·max_freq·n_keys div n_rows (max/avg in ppm; 1e6 = perfectly
    uniform) and recommend_salting fires above ``salt_threshold_ratio``×
    average.

    Scale shape — deliberately NO global sort over the key-count table
    (at 100 TB the count table itself is billions of rows): percentiles
    of the per-key frequency come from the frequency HISTOGRAM
    (aggregate the count table by freq value — the domain is small, a
    key occurs 1..k times — then one prefix-sum window over that
    bounded histogram). Two hash aggregates + an O(distinct-freq)
    window + two 1-row broadcasts.
    """
    from pyspark.sql.window import Window as _W

    # r12 materialized the per-key count table (five consumers, two under
    # independent broadcast jobs that race a lazy cache). But that table
    # is billions of rows at the scale the docstring budgets — a
    # localCheckpoint of it truncates lineage (one executor loss aborts
    # the audit) and persist variants measured 1.15-1.4× slower at sf0.1
    # (r13 alternating A/Bs: columnar cache encode/decode + the extra
    # materialization job). r13 restructure: the count table now has
    # exactly ONE consumer — the bounded frequency histogram, which
    # additionally carries each frequency's minimum key — so the
    # corpus-sized relation is never materialized anywhere and every
    # other output derives from the ≤O(distinct-freq)-row checkpoint:
    #   n_keys   = Σ _nk          n_rows = Σ _freq·_nk
    #   max_freq = max(_freq)     top_key = _minkey at max_freq
    # (identical values: min over string-cast keys at the hottest
    # frequency is what the old top-key probe computed).
    hist = (
        df.groupBy(F.col(key_col).alias("_key"))
        .agg(F.count(F.lit(1)).cast("long").alias("_freq"))
        .groupBy("_freq")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_nk"),
            F.min(F.col("_key").cast("string")).alias("_minkey"),
        )
        .localCheckpoint(eager=True)  # bounded rows — no durability cost
    )
    w = _W.orderBy("_freq").rowsBetween(_W.unboundedPreceding, 0)
    cum = hist.withColumn("_cum", F.sum("_nk").over(w))
    totals = hist.agg(
        F.sum("_nk").cast("long").alias("n_keys"),
        F.sum(F.col("_freq") * F.col("_nk")).cast("long").alias("n_rows"),
        F.max("_freq").cast("long").alias("max_freq"),
    )
    # smallest freq whose cumulative key count reaches ceil(p·n_keys)
    pct = (
        cum.crossJoin(F.broadcast(totals))
        .select(
            F.min(
                F.when(
                    F.col("_cum") * 100 >= F.expr("50 * n_keys"), F.col("_freq")
                )
            ).alias("p50_freq"),
            F.min(
                F.when(
                    F.col("_cum") * 100 >= F.expr("99 * n_keys"), F.col("_freq")
                )
            ).alias("p99_freq"),
        )
    )
    top = (
        hist.crossJoin(F.broadcast(totals.select("max_freq")))
        .where(F.col("_freq") == F.col("max_freq"))
        .agg(F.min("_minkey").alias("top_key"))
    )
    return (
        totals.crossJoin(F.broadcast(pct))
        .crossJoin(F.broadcast(top))
        .select(
            "n_rows",
            "n_keys",
            "max_freq",
            "p50_freq",
            "p99_freq",
            "top_key",
            # decimal(38,0): 1e6·max_freq·n_keys wraps int64 right at the
            # billions-of-keys scale this audit exists for
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * max_freq * n_keys)"
                " div CAST(n_rows AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("skew_ratio_ppm"),
        )
        .withColumn(
            "recommend_salting",
            F.col("skew_ratio_ppm") > F.lit(int(salt_threshold_ratio) * 1_000_000),
        )
    )


# Benford first-digit expectation, ppm of log10(1 + 1/d) — public constants
BENFORD_PPM = (301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757)


def benford_audit(df: DataFrame, value_col: str, decimals: int = 2) -> DataFrame:
    """Benford's-law first-digit audit — the classic fabricated-data /
    broken-upstream detector for naturally-occurring amounts (fraud
    analytics staple; synthetic uniform generators fail it loudly, which
    is itself the signal that a feed is not organic).

    Values are fixed-pointed (``decimals``, the money contract), zero /
    NULL dropped, and the leading digit of the absolute value counted.
    Output: 9 rows ``(digit, n, obs_ppm, expected_ppm, abs_dev_ppm)``;
    Σ abs_dev_ppm is the portable L1 deviation statistic (integer ppm
    throughout — no logs at query time, the Benford expectations are
    baked constants).

    Scale shape: one scan → one 9-group hash aggregate (map-side
    combined) + a 1-row total broadcast. Nothing grows with input.
    """
    scale = 10**decimals
    digits = (
        df.select(
            F.abs(F.round(F.col(value_col) * scale)).cast("long").alias("_cents")
        )
        .where(F.col("_cents").isNotNull() & (F.col("_cents") > 0))
        .select(F.substring(F.col("_cents").cast("string"), 1, 1).cast("int").alias("digit"))
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    total = counts.agg(F.sum("n").alias("_total"))
    expected = "CASE digit " + " ".join(
        f"WHEN {d + 1} THEN {ppm}" for d, ppm in enumerate(BENFORD_PPM)
    ) + " END"
    # decimal(38,0): a single digit's count exceeds 1e6-overflow headroom
    # (~9.2e12 rows) well inside the 100 TB regime
    obs = (
        "CAST((CAST(1000000 AS DECIMAL(38,0)) * n)"
        " div CAST(_total AS DECIMAL(38,0)) AS BIGINT)"
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.expr(obs).alias("obs_ppm"),
            F.expr(expected).cast("long").alias("expected_ppm"),
            F.abs(F.expr(obs) - F.expr(expected)).alias("abs_dev_ppm"),
        )
        .orderBy("digit")
    )
