"""Binned range join — points joined to containing time intervals.

A raw ``p.ts BETWEEN i.start AND i.end`` join with no equality key is a
cartesian product to Spark (BroadcastNestedLoopJoin): O(|points| ×
|intervals|) comparisons, the classic interval-join trap. The standard
fix (cf. range-join optimizations in warehouse engines) turns it into an
EQUI join on a time bin:

  - every interval explodes to the bins it covers
    (floor(start/w) .. floor(end/w));
  - every point computes its single bin (floor(ts/w));
  - equi-join on bin, then the exact containment filter.

Each point lives in exactly one bin, so a multi-bin interval can meet a
given point only once — no dedup pass needed. Cost is linear in
|points| + |intervals| × avg_bins_per_interval, shuffled on the bin key;
pick ``bin_seconds`` ≈ the typical interval length so intervals cover
O(1) bins. Hot bins (a viral moment) are orthogonal to hot keys — salt by
sub-bin if needed, same trick as ``operators/skew.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 300,
) -> DataFrame:
    """Inner-join every point row to every interval row containing it
    (``start <= ts <= end``). Input column sets must be disjoint; all
    columns of both sides survive."""
    p = points.withColumn(
        "_bin", (F.unix_timestamp(F.col(point_ts)) / bin_seconds).cast("bigint")
    )
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / bin_seconds).cast("bigint"),
                (F.unix_timestamp(F.col(end_col)) / bin_seconds).cast("bigint"),
            )
        ),
    )
    return (
        p.join(i, "_bin")
        .where(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("_bin")
    )


def range_join_binned_salted(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 300,
    salt: int = 16,
) -> DataFrame:
    """``range_join_binned`` with the hot-bin fix: a viral moment packs
    most points into ONE time bin, and since the bin is the shuffle key,
    that whole bin lands on one reducer regardless of cluster size.

    Points (the big side) get a deterministic sub-bin salt (xxhash of the
    full row, so it needs no designated key column and is stable across
    retries); each interval's bin rows replicate across all ``salt``
    values. The join key becomes (bin, salt): the hot bin now spreads
    over ``salt`` reducers, the output is row-for-row identical, and the
    cost is ``salt``× replication of the interval side only — intervals
    are the small side by construction (same trade as
    ``skew.salted_join``)."""
    p = points.withColumn(
        "_bin", (F.unix_timestamp(F.col(point_ts)) / bin_seconds).cast("bigint")
    ).withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in points.columns]), F.lit(salt)).cast(
            "int"
        ),
    )
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / bin_seconds).cast("bigint"),
                (F.unix_timestamp(F.col(end_col)) / bin_seconds).cast("bigint"),
            )
        ),
    ).withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return (
        p.join(i, ["_bin", "_salt"])
        .where(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("_bin", "_salt")
    )
