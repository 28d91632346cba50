"""Sketch operators — approximate answers with deterministic, portable
math.

Spark's built-in approx_count_distinct (HLL++) is engine-specific: its
estimate depends on murmur hashing and internal bucketing, so no external
system can reproduce it. The KMV (k-minimum-values) sketch here uses the
repo's portable 60-bit md5 hash family instead: ANY engine computes the
identical k smallest hash values and therefore the identical estimate —
an approximate algorithm with an exact oracle.

Math: for n distinct values uniformly hashed into [0, 2^60), the k-th
smallest hash h_k estimates n ≈ (k-1) * 2^60 / h_k (the classic KMV/
bottom-k estimator; relative error ~ 1/sqrt(k)).

Cost at 100 TB: one scan + a distinct-ish aggregation on the 8-byte hash
(partial agg collapses duplicates map-side) + a global top-k (TakeOrdered,
k rows per partition cross the wire — never a full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from megalista_spark.operators.dedup import portable_hash32, portable_hash64

HASH_SPACE = float(1 << 60)


def kmv_distinct_count(
    df: DataFrame,
    col: str,
    k: int = 256,
) -> DataFrame:
    """One-row DataFrame: (est_distinct bigint).

    If fewer than ``k`` distinct hashes exist the count is exact (that IS
    the KMV small-cardinality regime).
    """
    h = portable_hash64(F.col(col).cast("string"))
    mins = (
        df.select(h.alias("h"))
        .groupBy("h")
        .agg(F.lit(1))
        .select("h")
        .orderBy("h")
        .limit(k)
    )
    return mins.agg(
        F.when(
            F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("bigint")
        )
        .otherwise(
            F.round((F.lit(float(k - 1)) * F.lit(HASH_SPACE)) / F.max("h")).cast(
                "bigint"
            )
        )
        .alias("est_distinct")
    )


def bitlen_case_sql(expr: str, width: int) -> str:
    """Portable integer bit-length as a generated CASE chain — exact on any
    engine (no floating log2, whose rounding near powers of two differs)."""
    whens = " ".join(
        f"WHEN {expr} >= {1 << (b - 1)} THEN {b}" for b in range(width, 0, -1)
    )
    return f"CASE {whens} ELSE 0 END"


# HLL geometry over the 60-bit portable hash: top HLL_P bits pick the
# register, the remaining width is the rho domain.
HLL_P = 9
HLL_M = 1 << HLL_P
HLL_W = 60 - HLL_P  # rho operates on this many bits
HLL_RMAX = HLL_W + 1  # rho for an all-zero remainder


def hll_alpha(m: int) -> float:
    return 0.7213 / (1 + 1.079 / m)


def hll_estimate_case_sql(nb: str = "nb", s_present: str = "s_present") -> str:
    """The final HLL estimate as one SQL CASE expression over the register
    aggregate (``nb`` = populated registers, ``s_present`` = integer
    harmonic sum of present registers). Shared verbatim by the Spark
    selectExpr and the DuckDB oracles so the estimate is the same
    character-for-character formula on both engines (Spark and DuckDB
    both accept this dialect-neutral form)."""
    numer = hll_alpha(HLL_M) * (HLL_M * HLL_M) * float(1 << HLL_RMAX)
    return f"""CASE
          WHEN ({numer!r} / ({s_present} + ({HLL_M} - {nb}) * {1 << HLL_RMAX}))
                 <= {2.5 * HLL_M!r}
               AND {nb} < {HLL_M}
          THEN CAST(round({HLL_M} * ln({HLL_M} / CAST({HLL_M} - {nb} AS DOUBLE))) AS BIGINT)
          ELSE CAST(round({numer!r}
                 / ({s_present} + ({HLL_M} - {nb}) * {1 << HLL_RMAX})) AS BIGINT)
        END"""


def hll_distinct_count(df: DataFrame, col: str) -> DataFrame:
    """One-row DataFrame: (est_distinct bigint) — Flajolet et al.'s
    HyperLogLog, but over the portable md5-derived hash so the ESTIMATE is
    a pure deterministic function any engine reproduces bit-for-bit
    (Spark's approx_count_distinct HLL++ is engine-private).

    Exactness across engines: rho comes from an integer CASE chain (no
    floating log), and the harmonic denominator is accumulated as the
    INTEGER sum(2^(RMAX - M_j)) — 512 terms ≤ 2^52 fit bigint — so the
    only floating op is one shared-literal multiply/divide at the end.
    The small-range linear-counting branch (E ≤ 2.5m with empty
    registers) uses ln identically on both engines.

    Cost at 100 TB: scan → map-side partial max per (register) → 512-row
    final aggregate. No distinct, no sort, shuffle carries ≤ m rows per
    partition.
    """
    shift = 1 << HLL_W
    h = portable_hash64(F.col(col).cast("string"))
    regs = (
        df.select(h.alias("h"))
        .selectExpr(f"h DIV {shift} AS bucket", f"h % {shift} AS rem")
        .selectExpr(
            "bucket",
            f"CASE WHEN rem = 0 THEN {HLL_RMAX} "
            f"ELSE {HLL_RMAX} - ({bitlen_case_sql('rem', HLL_W)}) END AS rho",
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("m_reg"))
    )
    agg = regs.agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RMAX} - m_reg)")).alias(
            "s_present"
        ),
    )
    return agg.selectExpr(f"{hll_estimate_case_sql()} AS est_distinct")


def hll_distinct_count_grouped(
    df: DataFrame, col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group portable HLL distinct estimates: (group..., est_distinct)
    — the grouped form of ``hll_distinct_count``, same integer register
    math with the group key riding both aggregates. Aggregation state is
    ≤ m registers PER GROUP (map-side partial max applies), so the
    shuffle carries |groups|·m small rows where an exact
    ``countDistinct`` per group would shuffle every distinct value — the
    same Expand-free story as the profiler's approx mode, but with an
    estimate an external engine reproduces bit-for-bit.
    """
    shift = 1 << HLL_W
    gs = list(group_cols)
    h = portable_hash64(F.col(col).cast("string"))
    regs = (
        df.select(*gs, h.alias("h"))
        .selectExpr(*gs, f"h DIV {shift} AS bucket", f"h % {shift} AS rem")
        .selectExpr(
            *gs,
            "bucket",
            f"CASE WHEN rem = 0 THEN {HLL_RMAX} "
            f"ELSE {HLL_RMAX} - ({bitlen_case_sql('rem', HLL_W)}) END AS rho",
        )
        .groupBy(*gs, "bucket")
        .agg(F.max("rho").alias("m_reg"))
    )
    agg = regs.groupBy(*gs).agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RMAX} - m_reg)")).alias(
            "s_present"
        ),
    )
    return agg.selectExpr(*gs, f"{hll_estimate_case_sql()} AS est_distinct")


# Count-min geometry: d affine hash rows over the 32-bit portable hash
# (same LCG-derived family as MinHash — int64-safe, engine-portable),
# each mapping into w buckets.
CM_D = 4
CM_W = 1024


def cms_build(df: DataFrame, col: str, d: int = CM_D, w: int = CM_W) -> DataFrame:
    """Count-min sketch counters: (r, bkt, c bigint), ≤ d·w rows.

    One scan; the explode multiplies shuffle rows by d (=4) but each is a
    12-byte (row, bucket) pair and the groupBy map-side-combines into at
    most d·w counters per partition — the shuffle is effectively constant
    size regardless of input scale. Mergeable: sketches of two datasets
    add counter-wise (union + re-agg), the property that makes CM usable
    as a distributed accumulator.
    """
    from megalista_spark.operators.dedup import MINHASH_P, minhash_params

    base = portable_hash32(F.col(col).cast("string"))
    rows = [
        F.struct(
            F.lit(i).alias("r"),
            ((F.lit(a) * base + F.lit(b)) % MINHASH_P % w).alias("bkt"),
        )
        for i, (a, b) in enumerate(minhash_params(d))
    ]
    return (
        df.select(F.inline(F.array(*rows)))
        .groupBy("r", "bkt")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    counters: DataFrame, keys: DataFrame, col: str, d: int = CM_D, w: int = CM_W
) -> DataFrame:
    """Point-frequency estimates for ``keys[col]`` from a cms_build sketch:
    (key, est_count). The classic guarantee holds exactly: est ≥ true,
    with overestimates only from bucket collisions (P[err > 2n/w] < 2^-d).

    The sketch side is ≤ d·w rows — broadcast it; the keys side stays
    distributed, so estimating millions of keys is a map-side join.
    """
    from megalista_spark.operators.dedup import MINHASH_P, minhash_params

    base = portable_hash32(F.col(col).cast("string"))
    rows = [
        F.struct(
            F.lit(i).alias("r"),
            ((F.lit(a) * base + F.lit(b)) % MINHASH_P % w).alias("bkt"),
        )
        for i, (a, b) in enumerate(minhash_params(d))
    ]
    probes = keys.select(F.col(col).alias("key"), F.inline(F.array(*rows)))
    return (
        probes.join(F.broadcast(counters), ["r", "bkt"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("bigint").alias("est_count"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    col: str,
    phi_permille: int = 5,
    sample_mod: int = 8,
    d: int = CM_D,
    w: int = CM_W,
) -> DataFrame:
    """Frequent-item detection WITHOUT enumerating the distinct domain:
    (key, est_count) for every value whose estimated frequency is at least
    ``phi_permille``/1000 of the row count. The three-stage shape is the
    standard sketch-based heavy-hitters pipeline (Cormode & Muthukrishnan
    2005 §4; public method), made deterministic for the cross-engine
    oracle:

      1. CANDIDATES from a deterministic 1/``sample_mod`` row sample
         (hash of the full row text, so identical values in different
         rows sample independently). A true heavy hitter occurs ≥ φN
         times; the chance it misses an s-rate sample is (1-s)^(φN) —
         at φ=0.5%, s=1/8, N=10^6 that is e^-625. The sample is the
         only stage that touches per-distinct state, and it is 1/s
         smaller than the input.
      2. ESTIMATE each candidate against the d×w count-min sketch
         (broadcast, map-side — see ``cms_estimate``).
      3. THRESHOLD est ≥ ceil(φ·N) with N carried as a 1-row frame
         (no driver collect). CMS never under-counts, so no true heavy
         hitter is dropped at this stage; false survivors are bounded by
         the classic 2N/w overestimate.

    vs SpaceSaving/Misra-Gries: those are merge-order-dependent (useless
    for a reproducibility contract); this pipeline is a pure function of
    the data. Scale: one scan for the sketch (constant-size state), one
    1/s scan for candidates, broadcast probe — no shuffle carries more
    than d·w + |sample distinct| rows.

    CONTRACT: the miss bound assumes rows sample INDEPENDENTLY, which
    requires the row content to distinguish them — ``df`` must carry at
    least one high-cardinality column beside ``col`` (an event id, a
    timestamp). Identical rows hash identically and sample jointly; a
    key-only frame would drop ~(s-1)/s of heavy keys all-or-nothing, so
    that degenerate shape is rejected loudly instead of returning a
    silently-incomplete answer.
    """
    if len(df.columns) <= 1:
        raise ValueError(
            "cms_heavy_hitters needs a row-identity column besides the key "
            "(e.g. event id): identical rows sample jointly and the "
            "(1-s)^(phi*N) miss bound no longer holds"
        )
    counters = cms_build(df, col, d, w)
    # row digest uses the null-tagged, length-prefixed encoding (same as
    # cdc.table_checksum): raw concat_ws silently SKIPS nulls, so rows
    # differing only in which column is NULL would collapse to one hash
    # and sample jointly, weakening the (1-s)^(phi*N) miss bound
    row_parts = [
        F.coalesce(
            F.concat(
                F.lit("v"),
                F.length(F.col(c).cast("string")).cast("string"),
                F.lit(":"),
                F.col(c).cast("string"),
            ),
            F.lit("n"),
        )
        for c in df.columns
    ]
    sampled = df.where(
        F.pmod(
            portable_hash64(F.concat_ws("\x1f", *row_parts)), F.lit(sample_mod)
        )
        == 0
    )
    cands = sampled.select(col).distinct()
    est = cms_estimate(counters, cands, col, d, w)
    total = df.agg(F.count(F.lit(1)).alias("_n"))
    return (
        est.crossJoin(total)
        .where(
            F.col("est_count")
            >= F.ceil(F.col("_n") * F.lit(phi_permille) / F.lit(1000))
        )
        .select("key", "est_count")
    )


def kmv_set_estimates(
    df_a: DataFrame,
    col_a: str,
    df_b: DataFrame,
    col_b: str,
    k: int = 256,
) -> DataFrame:
    """Union/intersection cardinality estimates from ONE shared bottom-k
    sketch — the closure property that makes KMV a set algebra, not just a
    counter: the bottom-k of A ∪ B is computable from the two per-set
    sketches, and the fraction ρ of those k minima present in BOTH sets
    estimates the Jaccard index, so |A∩B| ≈ ρ · |A∪B|.

    One row: (est_union, est_intersection) bigint. Below k distinct
    hashes both answers are EXACT (every hash is in the sketch).

    Scale: each side is a scan + map-side-combined distinct on the 8-byte
    hash; the merge is a union of two ≤k-row sketches under flag-OR, then
    a k-row aggregate. Nothing wide ever exceeds k rows per partition.
    """
    ha = (
        df_a.select(portable_hash64(F.col(col_a).cast("string")).alias("h"))
        .groupBy("h")
        .agg(F.lit(1))
        .select("h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .orderBy("h")
        .limit(k)
    )
    hb = (
        df_b.select(portable_hash64(F.col(col_b).cast("string")).alias("h"))
        .groupBy("h")
        .agg(F.lit(1))
        .select("h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
        .orderBy("h")
        .limit(k)
    )
    merged = (
        ha.unionByName(hb)
        .groupBy("h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
        .orderBy("h")
        .limit(k)
    )
    cnt = F.count(F.lit(1))
    est_union = F.when(cnt < k, cnt.cast("bigint")).otherwise(
        F.round((F.lit(float(k - 1)) * F.lit(HASH_SPACE)) / F.max("h")).cast("bigint")
    )
    both = F.sum(F.col("in_a") * F.col("in_b"))
    est_inter = F.when(cnt < k, both.cast("bigint")).otherwise(
        F.round(
            both.cast("double") / F.lit(float(k)) * est_union.cast("double")
        ).cast("bigint")
    )
    return merged.agg(
        est_union.alias("est_union"), est_inter.alias("est_intersection")
    )


def binned_quantiles(
    df: DataFrame,
    col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    bins: int = 1024,
) -> DataFrame:
    """Histogram-sketch quantile estimates: (q double, est double), one row
    per requested quantile.

    Spark's approx_percentile (Greenwald-Khanna) and DuckDB's approx_quantile
    (t-digest) are both engine-private — their estimates cannot be
    reproduced externally. This fixed-bin histogram is the portable
    alternative: bin edges derive from (min, max) by one shared float
    division, counts are integers, and the estimate is a bin's upper edge —
    every step reproduces bit-for-bit on any engine. Error ≤ (max-min)/bins.

    Scale: two scans (min/max, then bin counts — the first collapses to two
    scalars, the second map-side-combines into ≤ `bins` groups), a ≤bins-row
    cumulative window, and a tiny cross join. Nothing driver-side, nothing
    engine-specific. For a known fixed domain, pass-1 can be skipped by
    providing the bounds — this two-pass form is the general case.
    """
    from pyspark.sql import Window

    x = F.col(col).cast("double")
    bounds = df.agg(
        F.min(x).alias("lo"), F.max(x).alias("hi"), F.count(x).alias("n")
    )
    binned = (
        df.select(x.alias("x"))
        .where(F.col("x").isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            F.when(F.col("hi") == F.col("lo"), F.lit(0))  # degenerate domain
            .otherwise(
                F.least(
                    F.lit(bins - 1),
                    F.floor(
                        (F.col("x") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / bins)
                    ),
                )
            )
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cum = binned.withColumn(
        "cum",
        F.sum("c").over(
            Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    qdf = df.sparkSession.createDataFrame([(float(q),) for q in qs], ["q"])
    # first bin whose cumulative count reaches ceil(q*n): its upper edge
    hit = (
        qdf.crossJoin(cum)
        .crossJoin(F.broadcast(bounds))
        .where(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("q", "lo", "hi")
        .agg(F.min("bin").alias("bin"))
    )
    return hit.select(
        "q",
        F.round(
            F.col("lo") + ((F.col("hi") - F.col("lo")) / bins) * (F.col("bin") + 1), 6
        ).alias("est"),
    )


def cms_inner_product(
    counters_a: DataFrame, counters_b: DataFrame, d: int = CM_D
) -> DataFrame:
    """One-row (est bigint): the count-min inner-product estimate of
    equi-join cardinality, min over rows r of Σ_b cA[r,b]·cB[r,b] — the
    classic sketch a planner consults to size a join without running it.
    For non-negative counts est ≥ |A ⋈ B| exactly (collisions only add).

    Both inputs are ≤ d·w counter relations, so this costs one tiny join
    regardless of how large the sketched tables were — the sketches are
    built in one scan each and can be persisted/merged incrementally.
    """
    a = counters_a.select("r", "bkt", F.col("c").alias("ca"))
    b = counters_b.select("r", "bkt", F.col("c").alias("cb"))
    return (
        a.join(b, ["r", "bkt"])
        .groupBy("r")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("ip"))
        .agg(F.min("ip").cast("bigint").alias("est"))
    )


# Bloom geometry: k affine hash rows into m bits, packed into 63-bit words
# (bit index < 63 keeps 1<<bit positive in signed int64 on every engine).
BLOOM_M = 16384
BLOOM_K = 4
BLOOM_WORD = 63


def _bloom_probes(col_expr, m: int, k: int) -> list:
    from megalista_spark.operators.dedup import MINHASH_P, minhash_params

    base = portable_hash32(col_expr.cast("string"))
    out = []
    for a, b in minhash_params(k):
        pos = (F.lit(a) * base + F.lit(b)) % MINHASH_P % m
        out.append(
            F.struct(
                (pos / BLOOM_WORD).cast("bigint").alias("word"),
                (pos % BLOOM_WORD).alias("bit"),
            )
        )
    return out


def bloom_build(
    df: DataFrame, col: str, m: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """Portable Bloom filter of ``df[col]`` as a (word, bits) relation,
    ≤ ceil(m/63) rows — the join-pruning primitive (Spark's own runtime
    bloom-join uses an engine-private filter; this one any system can
    probe). bit_or is idempotent, so no pre-distinct pass is needed and
    filters of two datasets merge by word-wise OR.

    Scale: one scan exploding k=4 probes/row, map-side bit_or collapses to
    ≤ 261 words per partition — constant-size shuffle and a filter small
    enough to broadcast anywhere.
    """
    probes = df.select(F.inline(F.array(*_bloom_probes(F.col(col), m, k))))
    return probes.groupBy("word").agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("bits")
    )


def bloom_might_contain(
    keys: DataFrame, col: str, words: DataFrame, m: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """The DISTINCT subset of ``keys`` possibly present in the filter (no
    false negatives; false positives at the classic (1-e^(-kn/m))^k rate).
    Probe rows join the broadcast word table, so pruning a billion-key
    column is map-side work.

    Keys are deduplicated before probing: a duplicated key would contribute
    dup_count*k probe rows and the ``hits == k`` test would wrongly reject
    it (a false NEGATIVE). The output was always one row per distinct key
    (the groupBy), so the pre-distinct changes no result shape — callers
    pruning a join column semi-join back against this distinct key set.
    """
    probes = keys.select(F.col(col).alias("key")).distinct()
    probes = probes.select(
        "key", F.inline(F.array(*_bloom_probes(F.col("key"), m, k)))
    )
    hit = F.expr("(bits & shiftleft(CAST(1 AS BIGINT), bit)) <> 0")
    return (
        probes.join(F.broadcast(words), "word", "left")
        .select("key", F.when(hit, 1).otherwise(0).alias("h"))
        .groupBy("key")
        .agg(F.sum("h").alias("hits"))
        .where(F.col("hits") == k)
        .select("key")
    )


def binned_quantiles_grouped(
    df: DataFrame,
    col: str,
    group_cols: list[str],
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    bins: int = 1024,
) -> DataFrame:
    """Per-group histogram quantiles: (group..., q, est) — the grouped form
    of ``binned_quantiles`` with per-group bin domains, so skewed groups
    don't steal resolution from narrow ones.

    Scale: the bounds aggregate collapses to |groups| rows (join back is
    broadcast when groups are few, plain shuffle otherwise), bin counts
    map-side-combine into ≤ |groups|·bins rows, and the cumulative window
    partitions BY GROUP — no global ordering anywhere.
    """
    from pyspark.sql import Window

    x = F.col(col).cast("double")
    bounds = df.groupBy(*group_cols).agg(
        F.min(x).alias("lo"), F.max(x).alias("hi"), F.count(x).alias("n")
    )
    binned = (
        df.select(*group_cols, x.alias("x"))
        .where(F.col("x").isNotNull())
        .join(bounds, group_cols)
        .select(
            *group_cols,
            F.when(F.col("hi") == F.col("lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(bins - 1),
                    F.floor(
                        (F.col("x") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / bins)
                    ),
                )
            )
            .alias("bin"),
        )
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cum = binned.withColumn(
        "cum",
        F.sum("c").over(
            Window.partitionBy(*group_cols)
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    qdf = df.sparkSession.createDataFrame([(float(q),) for q in qs], ["q"])
    hit = (
        cum.join(bounds, group_cols)
        .crossJoin(F.broadcast(qdf))
        .where(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy(*group_cols, "q", "lo", "hi")
        .agg(F.min("bin").alias("bin"))
    )
    return hit.select(
        *group_cols,
        "q",
        F.round(
            F.col("lo") + ((F.col("hi") - F.col("lo")) / bins) * (F.col("bin") + 1), 6
        ).alias("est"),
    )


def hll_sliding_distinct(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    window_hours: int = 24,
    p: int = 7,
) -> DataFrame:
    """Distinct keys per trailing ``window_hours`` window, estimated from
    hourly HLL register tables — the canonical mergeable-sketch
    composition: registers merge by max, so each hour is sketched ONCE
    and every trailing window is a register-wise max over its hours,
    never a re-scan of raw data. Exact sliding distinct counts would
    need the full key set per window; this needs m registers per hour.

    Output: (win_hour bigint — the window's last hour, hours since
    epoch — est_distinct bigint), for every hour present in the data.
    Same integer-exact arithmetic as hll_distinct_count, parameterized
    by ``p`` (small m keeps the raw estimator branch active at modest
    per-window cardinalities).

    Scale: hourly registers are ≤ m rows/hour however large the input;
    the window explode replicates those register rows ×window_hours (a
    bounded, data-independent factor), and the final two aggregates are
    over (window, register) — everything downstream of the first
    aggregate is sketch-sized.
    """
    m = 1 << p
    w_bits = 60 - p
    rmax = w_bits + 1
    shift = 1 << w_bits
    h = portable_hash64(F.col(key_col).cast("string"))
    regs = (
        df.select(
            F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP)) div 3600000000").alias(
                "hour"
            ),
            h.alias("h"),
        )
        .selectExpr("hour", f"h DIV {shift} AS bucket", f"h % {shift} AS rem")
        .selectExpr(
            "hour",
            "bucket",
            f"CASE WHEN rem = 0 THEN {rmax} "
            f"ELSE {rmax} - ({bitlen_case_sql('rem', w_bits)}) END AS rho",
        )
        .groupBy("hour", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    hours = regs.select("hour").distinct()
    wins = (
        regs.select(
            F.explode(
                F.sequence(F.col("hour"), F.col("hour") + (window_hours - 1))
            ).alias("win_hour"),
            "bucket",
            "rho",
        )
        .join(hours.withColumnRenamed("hour", "win_hour"), "win_hour", "left_semi")
        .groupBy("win_hour", "bucket")
        .agg(F.max("rho").alias("m_reg"))
    )
    numer = hll_alpha(m) * (m * m) * float(1 << rmax)
    agg = wins.groupBy("win_hour").agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {rmax} - m_reg)")).alias(
            "s_present"
        ),
    )
    return agg.selectExpr(
        "win_hour",
        f"""CASE
          WHEN ({numer!r} / (s_present + ({m} - nb) * {1 << rmax})) <= {2.5 * m!r}
               AND nb < {m}
          THEN CAST(round({m} * ln({m} / CAST({m} - nb AS DOUBLE))) AS BIGINT)
          ELSE CAST(round({numer!r}
                 / (s_present + ({m} - nb) * {1 << rmax})) AS BIGINT)
        END AS est_distinct""",
    )


def winsorize_by_group(
    df: DataFrame,
    col: str,
    group_cols: list[str],
    lower: float = 0.05,
    upper: float = 0.95,
    bins: int = 1024,
) -> DataFrame:
    """Robust feature clipping (winsorization): clamp ``col`` to its
    per-group [q_lower, q_upper] quantile bounds — the standard defense
    against outliers poisoning normalization/training statistics, per
    stratum so a heavy-tailed group doesn't dictate another's clip
    range.

    Bounds come from the portable histogram quantiles
    (``binned_quantiles_grouped``) so the clip thresholds — and
    therefore every clipped value and flag — reproduce bit-for-bit on
    any engine, unlike approx_percentile-derived clips.

    Scale: the quantile pass is two scans collapsing to |groups|-sized
    relations; the clip itself is a broadcast join of the |groups|-row
    bounds table plus pure expressions — scan speed, no extra shuffle
    on the data side.

    Output: input columns + ``<col>_w`` (clamped double),
    ``clipped_low`` / ``clipped_high`` flags, ``clip_lo`` / ``clip_hi``
    bounds.
    """
    qd = binned_quantiles_grouped(df, col, group_cols, qs=(lower, upper), bins=bins)
    bounds = qd.groupBy(*group_cols).agg(
        F.min(F.when(F.col("q") == lower, F.col("est"))).alias("clip_lo"),
        F.min(F.when(F.col("q") == upper, F.col("est"))).alias("clip_hi"),
    )
    x = F.col(col).cast("double")
    return (
        df.join(F.broadcast(bounds), group_cols)
        .withColumn(f"{col}_w", F.least(F.greatest(x, F.col("clip_lo")), F.col("clip_hi")))
        .withColumn("clipped_low", x < F.col("clip_lo"))
        .withColumn("clipped_high", x > F.col("clip_hi"))
    )


def cms_merge(*counter_dfs: DataFrame) -> DataFrame:
    """Counter-wise sum of count-min sketches — the property that makes
    CM a distributed/incremental accumulator: sketch(A ∪ B) EQUALS
    sketch(A) + sketch(B) exactly (cell-wise bigint addition), so daily
    partition sketches persist and merge instead of rescanning history.
    Input/output shape is the (r, bkt, c) relation of ``cms_build``;
    the merge is one union + one ≤ d·w-row aggregate.
    """
    merged = counter_dfs[0]
    for c in counter_dfs[1:]:
        merged = merged.unionByName(c)
    return merged.groupBy("r", "bkt").agg(F.sum("c").cast("bigint").alias("c"))


def exact_quantile_select(
    df: DataFrame,
    col: str,
    q_permilles: tuple[int, ...] = (500, 990, 999),
    bins: int = 4096,
) -> DataFrame:
    """EXACT global quantiles WITHOUT a global sort — distributed
    selection by histogram pruning: (q_permille, value) where value is
    the k-th smallest with k = max(1, ceil(q·n/1000)) (1-based discrete
    quantile — the contract an ORDER BY ... OFFSET k-1 oracle states
    explicitly).

    Spark's exact ``percentile`` collects each group's values into one
    aggregation buffer — fine per group, a single-node sort for a GLOBAL
    quantile of a 100 TB column. Here instead:

      pass 1: (min, max, n) scalars;
      pass 2: ≤``bins`` bin counts + cumulative sum (a window over the
              bin table, NOT the data);
      pass 3: only the ONE bin containing rank k is re-scanned and
              ranked — expected n/bins rows, a per-bin window sort.

    Every rank lookup is a 1-row frame joined back (no driver collect).
    All three passes are column-pruned scans; nothing ever sorts more
    than one bin. Degenerate distributions (a single value holding >
    n/bins duplicates) make the final window larger — exactly the rows
    equal to the answer — and min==max short-circuits via bin 0.

    The ties contract is exact: row_number among equal values is
    partition-order-dependent, but the VALUE at any rank inside a run
    of ties is the tie value itself, so the output is deterministic.

    Output has ONE row per DISTINCT requested permille (duplicates in
    ``q_permilles`` are deduplicated at entry — the single-plan rank
    table groups by permille, so a duplicate could never produce a
    second row anyway; stating it at the boundary makes the contract
    explicit).
    """
    from pyspark.sql import Window

    # dedupe, order-preserving: the output is sorted by q_permille, so
    # set semantics are what any caller observes regardless of order
    q_permilles = tuple(dict.fromkeys(q_permilles))

    x = F.col(col)
    # persist the shared frames: bounds is 1 row; binned is (value, bin)
    # for the whole column and feeds BOTH the cumulative bin counts and
    # every per-quantile hit branch — without the persist each requested
    # quantile would rescan the base table twice (the documented 3-pass
    # cost model would silently become ~2 passes per quantile)
    bounds = df.agg(
        F.min(x).alias("_lo"), F.max(x).alias("_hi"),
        F.count(x).alias("_n"),
    ).persist()
    width = (F.col("_hi") - F.col("_lo")) / F.lit(bins)
    binned = df.select(x.alias("_x")).where(x.isNotNull()).crossJoin(
        F.broadcast(bounds)
    ).select(
        "_x",
        F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(bins - 1),
                F.floor((F.col("_x") - F.col("_lo")) / width).cast("int"),
            )
        )
        .alias("_b"),
    ).persist()
    # NOT eagerly counted (r13, tried + reverted): binned/bounds do race
    # their consumers' independent AQE jobs like the min_label/semdedup
    # caches do, but the duplicated lineage here is a column-pruned
    # parquet scan — cheap by design — and the barrier count measured
    # flat-to-slightly-worse in a same-JVM alternating A/B (decile 0.56×
    # but QTE 1.05×/egq 1.33× on an unusable control window; quiet
    # rounds leaned against). The eager count only pays when the cached
    # lineage is an expensive COMPUTED relation.
    cum = (
        binned.groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_c"))
        .withColumn(
            "_cum",
            F.sum("_c").over(
                Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    # ALL requested ranks resolve in ONE plan: a per-quantile loop of
    # broadcast(limit(1)) branches used to schedule ~7 driver jobs PER
    # quantile (75 jobs for decile binning — measured r12); instead the
    # (q, k) table rides one explode, every quantile's target bin is an
    # argmin over the ≤bins-row cumulative table, and one broadcast join
    # ranks only the hit bins. Same selection contract, same values.
    ks = bounds.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("_q"),
                        F.greatest(
                            F.lit(1), F.ceil(F.col("_n") * q / 1000)
                        ).alias("_k"),
                    )
                    for q in q_permilles
                ]
            )
        ).alias("_qk")
    ).select(F.col("_qk._q").alias("_q"), F.col("_qk._k").alias("_k"))
    # first bin with cum >= k, carrying that bin's rank offset: min on
    # (_b, _before) structs is lexicographic, so it picks the lowest bin
    tgt = (
        cum.crossJoin(F.broadcast(ks))
        .where(F.col("_cum") >= F.col("_k"))
        .groupBy("_q", "_k")
        .agg(
            F.min(
                F.struct(
                    F.col("_b"), (F.col("_cum") - F.col("_c")).alias("_before")
                )
            ).alias("_t")
        )
        .select(
            "_q",
            "_k",
            F.col("_t._b").alias("_b"),
            F.col("_t._before").alias("_before"),
        )
    )
    out = (
        binned.join(F.broadcast(tgt), "_b")
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("_q").orderBy("_x")),
        )
        .where(F.col("_rn") == F.col("_k") - F.col("_before"))
        .select(F.col("_q").alias("q_permille"), F.col("_x").alias("value"))
    )
    # ≤ len(q_permilles) rows: eager-materialize, then free the shared
    # persisted frames so repeated calls in one session don't accumulate
    # (value, bin) blocks in executor storage
    out = out.orderBy("q_permille").localCheckpoint(eager=True)
    binned.unpersist()
    bounds.unpersist()
    return out


def quantile_bins(
    df: DataFrame,
    col: str,
    n_bins: int = 10,
    decimals: int = 2,
) -> DataFrame:
    """Equal-frequency discretization (quantile binning) WITHOUT a global
    sort — the feature-engineering primitive for heavy-tailed numerics:
    boundaries come from ``exact_quantile_select`` (histogram-pruned
    distributed selection), then every row buckets against the
    broadcast boundary array at scan speed.

    Bin i (1-based) holds values v with b_{i-1} < v ≤ b_i where b_i is
    the exact discrete quantile at permille i·1000/n_bins (the k-th
    smallest, k = max(1, ceil(q·n/1000)) — exact_quantile_select's
    stated contract); bin n_bins is open above. Duplicate boundary
    values (a single value spanning multiple quantiles) leave the
    intermediate bins legitimately empty — the exact equal-frequency
    semantics, not an error.

    Output: ``(bin, n_values, lo_cents, hi_cents)`` per non-empty bin,
    fixed-pointed to ``decimals`` (the money contract).

    Scale shape: exact_quantile_select's three passes (histogram-pruned,
    one-bin window) + ONE more scan with a broadcast (n_bins−1)-row
    boundary array folded per-row — no row inflation, no global sort,
    one final n_bins-group aggregate.
    """
    qs = tuple(i * 1000 // n_bins for i in range(1, n_bins))
    bounds = (
        exact_quantile_select(df, col, q_permilles=qs)
        .agg(F.sort_array(F.collect_list("value")).alias("_bs"))
    )
    x = F.col(col)
    scale = 10**decimals
    return (
        df.select(x.alias("_x"))
        .where(x.isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            (
                F.lit(1)
                + F.size(F.filter(F.col("_bs"), lambda b: F.col("_x") > b))
            ).alias("bin"),
            F.round(F.col("_x") * scale).cast("long").alias("_cents"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_values"),
            F.min("_cents").alias("lo_cents"),
            F.max("_cents").alias("hi_cents"),
        )
        .orderBy("bin")
    )
