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

from megalista_spark.operators.dedup import portable_hash64

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
