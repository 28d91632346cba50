"""Skew-mitigation join: explicit key salting.

AQE's skew-join handling (on by default in session.py) splits oversized
partitions at runtime, but only for sort-merge joins and only after a
shuffle materializes; salting is the plan-level fix when a handful of keys
dominate (e.g. the null/"unknown" user, a viral document's shingle).

``salted_join``: left rows get a deterministic salt in [0, salt); the right
side is replicated once per salt value; the join key becomes (key, salt).
Result is row-for-row identical to the plain join — the salt only spreads
one hot key over ``salt`` reducers. Replication multiplies the right side,
so use it when right is the smaller input (or broadcast would almost fit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the left side salted and the right side
    replicated ``salt`` times. Supported how: inner, left."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l = left.withColumn("_salt", salt_col.cast("int"))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l.join(r, on=[on, "_salt"], how=how)
    return out.drop("_salt")


def skew_report(df, key_col: str, top_n: int = 10):
    """Key-distribution diagnostic: the top-N heaviest keys with their row
    counts and share of the table — the measurement that decides whether a
    join needs ``salted_join`` / AQE skew handling at all.

    (key, n_rows, pct_of_total, rank): one hash-agg on the key (map-side
    combined), a 1-row total broadcast, and a TakeOrdered top-N — no
    global sort. pct is rounded from an integer ratio, so it reproduces
    exactly on any engine.
    """
    from pyspark.sql import Window, functions as F

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = counts.agg(F.sum("n_rows").alias("total"))
    # top-N FIRST via orderBy+limit (TakeOrderedAndProject: per-partition
    # heaps + a k-row driver merge); ranking a global window over all keys
    # would be a real global sort at scale
    top = (
        counts.crossJoin(F.broadcast(total))
        .orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(top_n)
    )
    w = Window.orderBy(F.desc("n_rows"), F.asc("key"))
    return top.withColumn("rank", F.row_number().over(w).cast("bigint")).select(
        "key",
        "n_rows",
        F.round(F.col("n_rows") / F.col("total") * 100, 4).alias("pct_of_total"),
        "rank",
    )
