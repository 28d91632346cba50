"""Audience bitmap indexes: exact segment set-algebra at sketch cost.

The reference engine's whole purpose is building and shipping AUDIENCES
(customer-match user lists, remarketing segments). The questions a
marketer asks before shipping — "how many users are in clickers AND
purchasers?", "how big is the union of these three segments?" — are
exact distinct-set algebra, and the classic warehouse answer is a
bitmap index (the dense-domain cousin of roaring bitmaps; public
technique): pack segment membership into 63-bit words keyed by
``word = uid div 63``, then every set operation is a word-wise integer
op + popcount.

vs ``kmv_set_estimates``: KMV gives ~1/sqrt(k) ESTIMATES for arbitrary
key domains; bitmaps give EXACT counts when ids are (or are mapped to)
a bounded integer domain — the usual case after an id-dictionary step.

Portability: 63-bit words keep ``1 << bit`` positive in signed int64
everywhere (the Bloom trick, operators/sketches.py); ``bit_count``/
``shiftleft``/``&``/``|`` are exact integer ops on any engine, so the
DuckDB oracle reproduces counts bit-for-bit.

Scale: a bitmap relation is ≤ ceil(|domain|/63) rows per segment —
16 M rows per billion-user domain, one bigint each. Build is one
map-side ``bit_or`` aggregate over the membership scan; AND/OR counts
join bitmap relations on the word index (equi join of word tables,
broadcast when one side is a small segment). Nothing ever touches the
raw membership rows twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bits packed per word — 63 keeps 1<<bit positive in signed int64 on
#: every engine (same constant discipline as BLOOM_WORD).
BITMAP_WORD = 63


def bitmap_build(
    df: DataFrame,
    id_col: str,
    segment_cols: list[str] | None = None,
) -> DataFrame:
    """Membership bitmaps: (segment..., word, bits) from integer ids.

    ``segment_cols`` groups rows into one bitmap per segment value
    combination (e.g. per event_type); ``None`` builds a single bitmap.
    Duplicate memberships collapse for free (bit_or is idempotent), and
    bitmaps of two loads MERGE by word-wise OR — the same incremental
    accumulator property as the CMS counters.
    """
    segs = list(segment_cols or [])
    # floor semantics for BOTH word and bit, NOT truncating div + signed %:
    # a negative id under truncation lands on word 0 with a negative bit
    # index that shiftleft masks mod 64, silently colliding with a
    # positive id (-2 vs 62). pmod is non-negative everywhere, and
    # word = (uid - pmod) div 63 is the exact floor quotient. Integer
    # arithmetic throughout — double division would lose ids past 2^53.
    return (
        df.select(
            *segs,
            F.expr(
                f"(CAST({id_col} AS BIGINT) - pmod(CAST({id_col} AS BIGINT),"
                f" {BITMAP_WORD})) div {BITMAP_WORD}"
            ).alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT),"
                f" CAST(pmod(CAST({id_col} AS BIGINT), {BITMAP_WORD}) AS INT))"
            ).alias("_bit"),
        )
        .groupBy(*segs, "word")
        .agg(F.bit_or("_bit").alias("bits"))
    )


def bitmap_cardinality(bm: DataFrame, segment_cols: list[str] | None = None) -> DataFrame:
    """Exact member count per segment: sum of per-word popcounts."""
    segs = list(segment_cols or [])
    return bm.groupBy(*segs).agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_members")
    )


def bitmap_overlap(
    bm_a: DataFrame,
    bm_b: DataFrame,
) -> DataFrame:
    """One row (n_and, n_or, n_only_a, n_only_b): the full exact overlap
    report between two single-segment bitmap relations (word, bits).

    The inner join covers AND; full-outer with zero-fill covers OR and
    the exclusive sides — one word-keyed join total, every aggregate a
    popcount sum.
    """
    a = bm_a.select("word", F.col("bits").alias("_a"))
    b = bm_b.select("word", F.col("bits").alias("_b"))
    j = a.join(b, "word", "full_outer").select(
        F.coalesce("_a", F.lit(0)).alias("_a"),
        F.coalesce("_b", F.lit(0)).alias("_b"),
    )
    band = F.bit_count(F.expr("_a & _b"))
    bor = F.bit_count(F.expr("_a | _b"))
    only_a = F.bit_count(F.expr("_a & ~_b"))
    only_b = F.bit_count(F.expr("_b & ~_a"))
    return j.agg(
        F.sum(band).cast("bigint").alias("n_and"),
        F.sum(bor).cast("bigint").alias("n_or"),
        F.sum(only_a).cast("bigint").alias("n_only_a"),
        F.sum(only_b).cast("bigint").alias("n_only_b"),
    )


def bitmap_sliding_distinct(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    window_hours: int = 24,
) -> DataFrame:
    """EXACT distinct ids per trailing ``window_hours`` window —
    (win_hour, n_distinct) for every hour present in the data — via
    mergeable hourly bitmaps: each hour's membership is packed ONCE,
    every trailing window is a word-wise OR over its hours.

    The exact twin of ``sketches.hll_sliding_distinct``: where that
    operator's register tables cost m rows/hour and ESTIMATE, hourly
    bitmaps cost ceil(|id domain|/63) words/hour and are EXACT — the
    right trade whenever ids live in a bounded integer domain (after an
    id-dictionary step, always). Raw data is scanned once; the window
    composition is data-independent: each hourly word explodes to its
    ``window_hours`` target windows (same shape as the EWMA horizon
    explode), map-side bit_or collapses per (window, word), popcounts
    sum. An inner join back to the observed hours drops phantom windows
    past the series end.
    """
    hour = F.expr(f"CAST({ts_col} AS BIGINT) div 3600")
    hourly = bitmap_build(
        df.select(hour.alias("_hr"), F.col(id_col)), id_col, ["_hr"]
    )
    contrib = hourly.select(
        F.col("_hr"),
        F.explode(F.sequence(F.lit(0), F.lit(window_hours - 1))).alias("_off"),
        "word",
        "bits",
    ).select((F.col("_hr") + F.col("_off")).alias("win_hour"), "word", "bits")
    merged = contrib.groupBy("win_hour", "word").agg(
        F.bit_or("bits").alias("bits")
    )
    counts = merged.groupBy("win_hour").agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_distinct")
    )
    real = df.select(hour.alias("win_hour")).distinct()
    return real.join(counts, "win_hour")
