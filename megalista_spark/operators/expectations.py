"""Data-quality expectations — declarative constraint checking over a
table (the Deequ/Great-Expectations shape, engine-native): each rule
compiles into the SAME scan's aggregate, so a whole rule suite costs one
pass over the data plus one groupBy per uniqueness rule.

The output is a small (rule, n_violations, passed) relation — the thing a
pipeline gate persists and alerts on. The reference's per-destination
schema validation (megalista_dataflow/error/error_handling.py and the
required-column asserts in each uploader) is the row-level cousin; this
operator is the table-level contract a 100 TB ingest runs BEFORE the
pipeline touches anything.

Scale: row rules are sums of boolean expressions — one scan, map-side
partial agg, a #rules-column single row out. Uniqueness rules each cost
one hash-groupBy on the key (map-side combine collapses unique keys);
NULLs are ignored by uniqueness (SQL UNIQUE convention — use a row rule
for NOT NULL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_constraints(
    df: DataFrame,
    row_rules: dict[str, str] | None = None,
    unique_cols: list[str] | None = None,
) -> DataFrame:
    """Evaluate constraints; returns (rule, n_violations, passed) ordered
    by rule name.

    ``row_rules``: {rule_name: boolean SQL over the row} — a row violates
    the rule when the expression is FALSE **or NULL** (a rule that cannot
    be evaluated is a violation, the conservative gate).
    ``unique_cols``: column names that must be unique among non-null
    values; n_violations counts the EXCESS rows (total non-null minus
    distinct), so one duplicated value contributes duplicates-1.
    """
    row_rules = row_rules or {}
    unique_cols = unique_cols or []
    spark = df.sparkSession
    parts: list[DataFrame] = []

    if row_rules:
        aggs = [
            F.sum(
                F.when(F.expr(cond), F.lit(0)).otherwise(F.lit(1))
            ).cast("bigint").alias(name)
            for name, cond in row_rules.items()
        ]
        one = df.agg(*aggs)
        rows = [
            F.struct(
                F.lit(name).alias("rule"), F.col(name).alias("n_violations")
            )
            for name in row_rules
        ]
        parts.append(one.select(F.inline(F.array(*rows))))

    for col in unique_cols:
        dup = (
            df.where(F.col(col).isNotNull())
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("_c"))
            .agg(
                F.coalesce(F.sum(F.col("_c") - 1), F.lit(0))
                .cast("bigint")
                .alias("n_violations")
            )
            .select(
                F.lit(f"unique_{col}").alias("rule"),
                "n_violations",
            )
        )
        parts.append(dup)

    if not parts:
        return spark.createDataFrame([], "rule string, n_violations bigint, passed boolean")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "rule", "n_violations", (F.col("n_violations") == 0).alias("passed")
    ).orderBy("rule")


def quarantine(
    df: DataFrame,
    row_rules: dict[str, str],
    reason_col: str = "quarantine_reason",
) -> tuple[DataFrame, DataFrame]:
    """Dead-letter split: (valid_rows, quarantined_rows) — the flow
    control counterpart of ``check_constraints``'s report. A row is
    quarantined when ANY rule evaluates FALSE or NULL; the quarantine
    side carries the FIRST violated rule's name (dict order — the same
    first-fail attribution contract as curation.filter_cascade) so the
    dead-letter table is triage-able by rule.

    The reference isolates failing batches and keeps the run alive
    (megalista uploaders' safe_process / error accumulators); this is
    that policy for ROWS at table scale: bad rows leave the flow with a
    reason instead of failing the job or silently vanishing.

    Scale: the verdict is one CASE chain evaluated in the scan
    projection — both outputs are filters over the same lineage (two
    passes over the scan, or one if the caller persists/observes);
    no shuffle, no Python.
    """
    verdict = F.lit(None).cast("string")
    for name, cond in reversed(list(row_rules.items())):
        bad = ~F.coalesce(F.expr(cond), F.lit(False))
        verdict = F.when(bad, F.lit(name)).otherwise(verdict)
    tagged = df.withColumn(reason_col, verdict)
    valid = tagged.where(F.col(reason_col).isNull()).drop(reason_col)
    quarantined = tagged.where(F.col(reason_col).isNotNull())
    return valid, quarantined


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 50,
) -> DataFrame:
    """Privacy-threshold audit: how many rows sit in quasi-identifier
    groups smaller than ``k`` — the k-anonymity check a PII-bearing
    export runs BEFORE shipping (the ad platforms the reference uploads
    to enforce the same idea as minimum audience sizes: a list smaller
    than the floor is rejected because it identifies its members).

    One groupBy on the quasi-identifier tuple (map-side combine), then a
    group-size histogram — the report is O(distinct QI combinations),
    the scan is one pass. Output: (group_size, n_groups, n_rows,
    violates) ordered by group_size; ``violates`` marks sizes < k.
    """
    sizes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("_gs"))
    return (
        sizes.groupBy(F.col("_gs").alias("group_size"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_groups"))
        .select(
            F.col("group_size").cast("long").alias("group_size"),
            "n_groups",
            (F.col("group_size") * F.col("n_groups")).cast("long").alias("n_rows"),
            (F.col("group_size") < k).alias("violates"),
        )
        .orderBy("group_size")
    )


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007; public method) —
    the companion check to ``k_anonymity_report``: a quasi-identifier
    group can be large (k-anonymous) yet still leak if every member
    shares the SAME sensitive value. Reports, per distinct-sensitive
    count, how many QI groups and rows sit at that diversity level;
    ``violates`` marks diversity < ``l``.

    Scale: one (QI..., sensitive) groupBy collapses duplicates map-side,
    one (QI...) count gives per-group diversity (no countDistinct over
    raw rows), then an O(distinct diversities) histogram. Same shape and
    cost class as the k-anonymity audit.

    Output: (diversity, n_groups, n_rows, violates) ordered by
    diversity.
    """
    per_val = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    per_group = per_val.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("_div"),
        F.sum("_c").cast("long").alias("_rows"),
    )
    return (
        per_group.groupBy(F.col("_div").alias("diversity"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("_rows").cast("long").alias("n_rows"),
        )
        .select(
            "diversity",
            "n_groups",
            "n_rows",
            (F.col("diversity") < l).alias("violates"),
        )
        .orderBy("diversity")
    )


def enforce_min_group_size(
    df: DataFrame, quasi_cols: list[str], k: int = 50
) -> DataFrame:
    """Suppression: drop every row whose quasi-identifier group has
    fewer than ``k`` members — the generalize-or-suppress endgame of a
    failed k-anonymity audit, and exactly the minimum-audience-size
    floor applied at row level. One groupBy + one (broadcastable when
    violators are few) anti-join."""
    small = (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("_gs"))
        .where(F.col("_gs") < k)
        .select(*quasi_cols)
    )
    return df.join(small, quasi_cols, "left_anti")


def schema_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Schema drift report between two table versions: one row per
    added / removed / retyped column — what an ingest gate logs before
    `read_evolving_parquet`'s contract projection silently absorbs the
    drift. Pure metadata (driver-side schemas), zero jobs."""
    o = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    n = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    rows = []
    for c in sorted(set(o) | set(n)):
        if c not in n:
            rows.append((c, "removed", o[c], None))
        elif c not in o:
            rows.append((c, "added", None, n[c]))
        elif o[c] != n[c]:
            rows.append((c, "retyped", o[c], n[c]))
    spark = old.sparkSession
    return spark.createDataFrame(
        rows, "column string, change string, old_type string, new_type string"
    )


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t_ppm: int = 200_000,
    ordered: bool = False,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007, ICDE —
    public method): the third rung after ``k_anonymity_report`` and
    ``l_diversity_report``. A QI group can be k-anonymous AND l-diverse
    yet still leak when its sensitive-value DISTRIBUTION diverges from
    the table's (e.g. one nation's customers are 90% one segment while
    the corpus is uniform). Reports, per QI group, the distance between
    the group's sensitive distribution and the global one; ``violates``
    marks distance > ``t_ppm``.

    Distance, in exact integer ppm (bit-identical across engines —
    no float ratios anywhere):

    - categorical (``ordered=False``): total variation distance
      ``½·Σ_v |p_v − q_v|``, computed over a common denominator:
      ``(1e6 · Σ_v |cnt_gv·N − cnt_v·n_g|) div (2·n_g·N)``.
    - ordered (``ordered=True``): Earth-Mover's with unit ground
      distance over the m ranked values (the paper's ordered-attribute
      form) — same rational trick over CUMULATIVE counts, normalized by
      ``(m−1)``.

    Scale: one (QI, sensitive) groupBy collapses the table map-side to
    O(groups·values-present); the dense grid needed for absent values is
    groups × m where m = distinct sensitive values (small by
    construction for any attribute t-closeness applies to), built by a
    broadcast join against the m-row value list — never a shuffle of raw
    rows. Output is one row per QI group: O(groups).

    NULL handling: NULL is a legitimate QI-group key AND a legitimate
    sensitive value (groupBy keys NULLs together); the grid re-join uses
    null-safe equality so NULL-bearing cells match their counts instead
    of silently coalescing to 0. Arithmetic runs in decimal(38,0) so the
    ppm numerator cannot wrap a 64-bit long at petascale (n_g·N up to
    ~1e31 stays exact), then the integral quotient comes back as long.
    """
    import functools
    import operator as _op

    from pyspark.sql.window import Window as _W

    cell = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    values = df.groupBy(sensitive_col).agg(
        F.count(F.lit(1)).cast("long").alias("_gc")
    )
    groups = cell.groupBy(*quasi_cols).agg(F.sum("_c").cast("long").alias("_ng"))
    total = df.count()  # one scalar; the audit is a terminal report
    m = values.count()  # sensitive-domain size (small by construction)
    keys = [*quasi_cols, sensitive_col]
    g = groups.join(F.broadcast(values), how="cross").alias("_g")
    c = cell.alias("_cell")
    cond = functools.reduce(
        _op.and_,
        [F.col(f"_g.{k}").eqNullSafe(F.col(f"_cell.{k}")) for k in keys],
    )
    grid = g.join(c, cond, "left").select(
        *[F.col(f"_g.{k}") for k in keys],
        F.col("_g._ng"),
        F.col("_g._gc"),
        F.coalesce(F.col("_cell._c"), F.lit(0)).cast("decimal(38,0)").alias("_c"),
    )
    dec_total = F.lit(total).cast("decimal(38,0)")
    if ordered:
        w = _W.partitionBy(*quasi_cols).orderBy(sensitive_col)
        # EMD over cumulatives; the m-th cumulative term is identically
        # zero, so summing all m keeps the aggregate unconditional
        num_term = F.abs(
            F.sum("_c").over(w) * dec_total
            - F.sum(F.col("_gc").cast("decimal(38,0)")).over(w) * F.col("_ng")
        )
        norm = max(m - 1, 1)
    else:
        num_term = F.abs(
            F.col("_c") * dec_total
            - F.col("_gc").cast("decimal(38,0)") * F.col("_ng")
        )
        norm = 2
    return (
        grid.withColumn("_term", num_term)
        .groupBy(*quasi_cols, "_ng")
        .agg(F.sum("_term").cast("decimal(38,0)").alias("_dn"))
        .select(
            *quasi_cols,
            F.col("_ng").alias("group_rows"),
            F.expr(
                "(CAST(1000000 AS DECIMAL(38,0)) * _dn)"
                f" div (CAST(_ng AS DECIMAL(38,0)) * {total} * {norm})"
            )
            .cast("long")
            .alias("distance_ppm"),
        )
        .withColumn("violates", F.col("distance_ppm") > F.lit(t_ppm))
        .orderBy(*quasi_cols)
    )
