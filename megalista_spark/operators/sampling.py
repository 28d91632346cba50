"""Deterministic sampling & dataset-mixing operators for training-data
pipelines.

Spark's built-in ``df.sample`` is seed-based but partition-layout
dependent — resplitting the input changes which rows are picked, which is
unacceptable for reproducible corpus construction. These operators sample
on a portable content hash instead (same md5-derived family as the dedup
operators, ``operators/dedup.py::portable_hash64``):

- the decision is a pure function of the ROW (key + salt), so any engine,
  any partitioning, any run picks the identical subset;
- it composes with incremental pipelines: yesterday's sampled rows stay
  sampled when new data arrives;
- it is oracle-checkable bit-for-bit by an external SQL engine.

Cost model at 100 TB: ``hash_sample`` is a pure scan-speed filter (no
shuffle; Catalyst pushes the projection, the md5 runs in codegen).
``stratified_sample`` is one window shuffle keyed by the stratum —
partial top-k per partition would need a per-stratum pre-aggregation only
when strata are huge; rank-over-hash keeps it exact and deterministic.
``weighted_mix`` is a union of scan-speed filters — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from megalista_spark.operators.dedup import portable_hash64

# hash buckets for rate quantization: rates resolve to 1/10_000 precision
_BUCKETS = 10_000


def sample_bucket(key: Column, salt: str) -> Column:
    """Deterministic bucket in [0, 10000) for a row key — the sampling
    decision is ``bucket < rate * 10000``."""
    return portable_hash64(F.concat(F.lit(salt), F.lit("|"), key.cast("string"))) % _BUCKETS


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str,
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows, decided per-row by
    content hash (partition-layout independent, reproducible anywhere)."""
    return df.where(sample_bucket(F.col(key_col), salt) < int(rate * _BUCKETS))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_col: str,
    salt: str = "strata",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller), chosen by hash order with the key as tiebreak — a
    deterministic reservoir. One window shuffle on the stratum key."""
    w = Window.partitionBy(strata_col).orderBy(
        sample_bucket(F.col(key_col), salt).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def weighted_mix(
    parts: list[tuple[DataFrame, float]],
    key_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Training-mix construction: union of per-source deterministic
    samples at per-source rates (e.g. books at 1.0, web at 0.3). Each
    part's decision hash is salted with its position so the same document
    appearing in two sources is decided independently."""
    out = None
    for i, (df, rate) in enumerate(parts):
        piece = hash_sample(df, rate, key_col, salt=f"{salt}{i}")
        out = piece if out is None else out.unionByName(piece)
    return out


def temperature_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    budget: int,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-flattened corpus mixing (the multilingual-sampling
    rule of mBERT/XLM-R, p_g ∝ n_g^α with α = 0.5; public method):
    allocate a global row ``budget`` across groups proportionally to
    √n_g, then draw each group's quota deterministically by portable-hash
    order. Low-resource groups are up-weighted relative to their share,
    high-resource groups down-weighted — the standard fix for head-group
    domination in training mixes.

    Exact integer end-to-end, so the allocation is engine-portable:
    weight_g = floor(sqrt(n_g)) (sqrt is IEEE correctly-rounded on any
    engine, floor collapses the last-ulp), take_g = (budget · weight_g)
    div Σ weights, and the draw is rank-over-(hash, key) ≤ take_g.
    Returns the sampled rows plus plan columns (group_rows, group_weight,
    group_take, sample_rank).

    Scale: one count aggregate, a 1-row total broadcast back, and ONE
    rank window partitioned by group — same shuffle shape as
    ``stratified_sample``. The decision is a pure function of (row key,
    corpus counts): appends change quotas but never un-sample a row
    below its old rank.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).cast("bigint").alias("group_rows"))
    weights = counts.select(
        group_col,
        "group_rows",
        F.floor(F.sqrt(F.col("group_rows"))).cast("bigint").alias("group_weight"),
    )
    total = weights.agg(F.sum("group_weight").cast("bigint").alias("_tw"))
    plan = weights.crossJoin(F.broadcast(total)).select(
        group_col,
        "group_rows",
        "group_weight",
        F.expr(f"({int(budget)} * group_weight) div _tw").cast("bigint").alias("group_take"),
    )
    h = portable_hash64(
        F.concat(F.lit(salt), F.lit("|"), F.col(key_col).cast("string"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    ranked = df.withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
    return ranked.join(F.broadcast(plan), group_col).where(
        F.col("sample_rank") <= F.col("group_take")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    k: int = 100,
    salt: str = "wrs",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis): each
    row gets key = ln(u)/w for a hash-derived uniform u, and the k largest
    keys are the sample — inclusion probability proportional to weight,
    exactly one pass, no rejection loop.

    Deterministic like every sampler here: u comes from the portable
    60-bit hash of (salt, key), so the same rows are chosen under any
    partitioning, any engine, and across incremental re-runs — and a
    merge of per-shard top-k lists IS the global sample (the reservoir
    property), which is what TakeOrderedAndProject exploits: per-partition
    heaps, k rows to the driver, no global sort.

    Rows with weight ≤ 0 are excluded (E-S is undefined there).
    """
    from megalista_spark.operators.dedup import portable_hash64

    h = portable_hash64(F.concat(F.lit(salt), F.lit("|"), F.col(key_col).cast("string")))
    # u in (0, 1]: +1 keeps ln defined at h = 0
    u = (h + F.lit(1).cast("double")) / F.lit(float(1 << 60))
    es_key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.where(F.col(weight_col).cast("double") > 0)
        .withColumn("es_key", es_key)
        .orderBy(F.desc("es_key"), F.asc(key_col))
        .limit(k)
    )


def weighted_sample_by_group(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    group_col: str,
    k: int = 10,
    salt: str = "wrs",
) -> DataFrame:
    """Per-stratum Efraimidis-Spirakis weighted sampling — the
    training-mix workhorse: the top-``k`` weighted picks WITHIN each
    group (language, source, domain), same deterministic hash-derived
    keys as ``weighted_sample`` so the choice is stable under any
    partitioning/engine and across re-runs.

    Scale: ONE shuffle, partitioned by the group — the rank window never
    orders more than a group's rows, so no global sort exists anywhere
    (the global form uses TakeOrdered; the grouped form is the
    per-stratum counterpart). Output keeps ``es_key`` and the in-group
    ``rank`` for auditability.
    """
    from pyspark.sql import Window

    from megalista_spark.operators.dedup import portable_hash64

    h = portable_hash64(
        F.concat(F.lit(salt), F.lit("|"), F.col(key_col).cast("string"))
    )
    u = (h + F.lit(1).cast("double")) / F.lit(float(1 << 60))
    es_key = F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(group_col).orderBy(F.desc("es_key"), F.asc(key_col))
    return (
        df.where(F.col(weight_col).cast("double") > 0)
        # + 0.0 normalizes IEEE negative zero: a key like ln(u)/w ≈ -1e-9
        # rounds to -0.0, whose sign bit renders engine-dependently
        .withColumn("es_key", F.round(es_key, 6) + F.lit(0.0))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Deterministic dataset split: df + ``split`` column assigning each
    row to a named part with probability ∝ weight — the train/val/test
    primitive. Assignment is a pure function of (salt, key): stable under
    any partitioning, any engine, and across incremental appends (a new
    row never moves an old row between splits — the property random
    splits lack).

    Buckets: hash mod 10_000 against cumulative per-mille-of-10k
    thresholds (integer compares, no float boundaries).
    """
    from megalista_spark.operators.dedup import portable_hash64

    total = sum(weights.values())
    h = portable_hash64(
        F.concat(F.lit(salt), F.lit("|"), F.col(key_col).cast("string"))
    )
    bucket = h % 10_000
    cum = 0.0
    expr = None
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total * 10_000
        cond = bucket < int(round(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def budget_fill(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    budget: int,
    order_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy per-group budget fill — the token-budget corpus assembly
    step: within each group (source, language, domain) take rows in
    preference order until the group's cumulative weight (token count,
    char count) would exceed ``budget``; a row is kept only if the
    running total INCLUDING it stays ≤ budget (strict greedy prefix —
    the first row over budget and everything after it drop).

    Preference order is ``order_col`` DESCENDING (e.g. a quality score,
    or document length for the longest-first heuristic), tie-broken by
    ascending id so the prefix is total-ordered and deterministic.
    ``order_col=None`` fills in ascending-id (arrival) order.

    Output: the surviving rows + their in-group fill ``rank`` and
    running ``cum_weight`` for auditability.

    Weights must be positive (token/char counts are) — the kept set is
    a PREFIX only because the running sum is monotone; a nonpositive
    weight would let later rows dip back under budget.

    Scale: ONE shuffle, partitioned by the group — the window orders
    only within a group. The cumulative sum is a running window
    aggregate (no self-join); weights sum as bigint, exact. A group
    whose rows all fit costs the same as one that truncates — the
    window still scans the group once. Skewed group sizes take the
    standard hot-key remedies upstream; the operator itself never
    materializes a group in memory (window agg streams in sort order).
    """
    ordering = (
        [F.col(order_col).desc(), F.col(id_col).asc()]
        if order_col is not None
        else [F.col(id_col).asc()]
    )
    w = Window.partitionBy(group_col).orderBy(*ordering)
    cum = F.sum(F.col(weight_col).cast("long")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("cum_weight", cum)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("cum_weight") <= budget)
    )


def global_shuffle_index(
    df: DataFrame,
    key_col: str,
    salt: str = "shuffle",
    n_shards: int = 8,
    n_buckets: int = 1024,
) -> DataFrame:
    """Deterministic global training order WITHOUT a global sort: every
    row gets a dense position 0..n-1 in pseudo-random (hash) order plus
    a contiguous shard id — the "shuffle the corpus, then shard it"
    step before training, reproducible under any partitioning/engine.

    The classic trap is ``orderBy(hash)`` + a row-number window with no
    partition key: one reducer sorts the world. Instead, two phases:

      1. bucket = hash % n_buckets; count rows per bucket (tiny agg),
         prefix-sum the counts DRIVER-SIDE (n_buckets scalars) into
         bucket start offsets, broadcast back;
      2. pos = offset[bucket] + rank within bucket (window partitioned
         BY bucket, ordered by (hash, key) — sorts are per-bucket,
         parallel, spillable).

    Because ranks concatenate bucket-by-bucket in bucket order, the
    result is byte-identical to the global ``row_number() OVER (ORDER BY
    bucket, hash, key)`` an oracle computes — at 1/n_buckets the sort
    span. Shard = pos·n_shards//n — contiguous equal-size ranges of the
    shuffled order, so shard files stream sequentially.
    """
    h = portable_hash64(
        F.concat(F.lit(salt), F.lit("|"), F.col(key_col).cast("string"))
    )
    b = df.withColumn("_h", h).withColumn("_b", F.col("_h") % n_buckets)
    counts = {
        r["_b"]: r["c"]
        for r in b.groupBy("_b").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    n = sum(counts.values())
    offsets, acc = {}, 0
    for bucket in range(n_buckets):
        offsets[bucket] = acc
        acc += counts.get(bucket, 0)
    spark = df.sparkSession
    off = spark.createDataFrame(
        [(k, v) for k, v in offsets.items()], "_b bigint, _off bigint"
    )
    w = Window.partitionBy("_b").orderBy(F.col("_h").asc(), F.col(key_col).asc())
    return (
        b.join(F.broadcast(off), "_b")
        .withColumn(
            "shuffle_pos",
            (F.col("_off") + F.row_number().over(w) - 1).cast("bigint"),
        )
        .withColumn(
            "shard",
            # exact integer math (pos·shards DIV n) — no float boundary
            F.expr(f"CAST((shuffle_pos * {n_shards}) DIV {max(n, 1)} AS INT)"),
        )
        .drop("_h", "_b", "_off")
    )


def stratified_kfold(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    k: int = 5,
    salt: str = "kfold",
    exact: bool = True,
) -> DataFrame:
    """Stratified k-fold assignment — the cross-validation primitive:
    every stratum is spread across all ``k`` folds with exactly-balanced
    counts (±1 per stratum), so no fold is missing a rare class.

    Assignment is a pure function of (salt, id): rows rank within their
    stratum by portable 60-bit hash (ties broken by id) and take fold =
    1 + (rank−1) mod k — round-robin over the hash order, deterministic
    on any engine and stable under repartitioning.

    ``exact=True`` (default) pays one rank window per stratum (shuffle
    on the stratum key; a single giant stratum serializes its window —
    the assign_batches caveat family). ``exact=False`` is the
    scan-speed path for strata too large to sort: fold = 1 + h mod k,
    balanced in expectation (±√n), zero shuffle.
    """
    from megalista_spark.operators.dedup import portable_hash64

    if k < 2:
        raise ValueError(f"k must be ≥ 2, got {k}")
    h = portable_hash64(
        F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string"))
    )
    if not exact:
        return df.withColumn("fold", (F.pmod(h, F.lit(k)) + 1).cast("int"))
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(id_col).asc())
    return df.withColumn(
        "fold", ((F.row_number().over(w) - 1) % k + 1).cast("int")
    )
