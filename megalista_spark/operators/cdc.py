"""Change-data-capture operators: last-writer-wins merge/upsert and
SCD type-2 history builds.

This generalizes the reference's transactional semantics — its control
table is an append-only "already uploaded" log merged against new reads
(transactional_events_results_writer.py / data sources' left-anti dedup,
re-expressed in ``sources/data_source.py``) — into the two standard
warehouse maintenance shapes a Spark user needs around that log:

- ``merge_upsert``: apply a CDC change feed (insert/update/delete rows,
  last writer wins per key) onto a base snapshot — the MERGE INTO
  statement as a pure DataFrame transform.
- ``scd2_history``: collapse an event log into type-2 dimension history
  (one row per consecutive attribute run, with ``valid_from`` /
  ``valid_to`` / ``version`` / ``is_current``).

Scale notes:
- ``merge_upsert`` is ONE window shuffle over the (small) change feed
  plus one key-partitioned full-outer join; when the feed is tiny
  relative to the base, Catalyst/AQE broadcasts it and the base never
  shuffles. No driver-side state.
- ``scd2_history`` is two window passes over the same ``(key, ts)``
  partitioning — Catalyst reuses one Exchange for both (same
  partitioning expression), then a partial-agg groupBy on the same key.
  Everything is whole-stage-codegen expressions; no UDFs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    update_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Last-writer-wins partial-image merge (MERGE INTO as a transform).

    ``changes`` carries ``keys`` + ``order_cols`` (change-time ordering,
    later wins; ties broken by the full ``order_cols`` tuple which must
    be unique per key) + ``op_col`` + ``update_cols``. Per key, only the
    LATEST change applies: ``delete_op`` drops the row; anything else
    upserts — ``update_cols`` take the change's values, every other base
    column is carried through (NULL for fresh inserts, matching SQL
    MERGE ... WHEN NOT MATCHED THEN INSERT of a partial image).

    Output: the merged snapshot plus a ``merge_action`` audit column
    (``insert`` / ``update`` / ``keep``); deleted keys are absent.
    """
    keys = list(keys)
    latest = (
        changes.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(*keys).orderBy(
                    *[F.col(c).desc() for c in order_cols]
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(
            *keys,
            F.col(op_col).alias("_op"),
            *[F.col(c).alias(f"_new_{c}") for c in update_cols],
        )
    )
    joined = base.withColumn("_in_base", F.lit(True)).join(
        latest, keys, "full_outer"
    ).filter(F.col("_op").isNull() | (F.col("_op") != delete_op))
    has_change = F.col("_op").isNotNull()
    base_attr = [c for c in base.columns if c not in keys]
    out = [
        *keys,
        *[
            F.when(has_change, F.col(f"_new_{c}")).otherwise(F.col(c)).alias(c)
            if c in update_cols
            else F.col(c)
            for c in base_attr
        ],
        F.when(~has_change, F.lit("keep"))
        .when(F.col("_in_base").isNull(), F.lit("insert"))
        .otherwise(F.lit("update"))
        .alias("merge_action"),
    ]
    return joined.select(*out)


def scd2_history(
    df: DataFrame,
    key: str,
    ts_col: str,
    attr_cols: Sequence[str],
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Type-2 dimension history from an event log: consecutive rows per
    ``key`` (ordered by ``ts_col`` then ``order_cols``) with identical
    ``attr_cols`` collapse into one validity interval.

    Output per (key, run): the attributes, ``valid_from`` (first ts of
    the run), ``valid_to`` (next run's valid_from, NULL while current),
    ``version`` (1-based per key), ``is_current``. Attribute comparison
    is null-safe (NULL-to-NULL is "unchanged"), matching warehouse SCD2
    loaders.
    """
    attr_cols = list(attr_cols)
    order = [F.col(ts_col), *[F.col(c) for c in order_cols]]
    w = Window.partitionBy(key).orderBy(*order)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    changed = (
        F.lag(attrs).over(w).isNull() | ~F.lag(attrs).over(w).eqNullSafe(attrs)
    ).cast("int")
    # two selects: a window function can't nest inside another window's
    # argument; both windows share one Exchange (same partitioning/order)
    flagged = df.select(
        key, ts_col, *order_cols, *attr_cols, changed.alias("_chg")
    )
    runs = flagged.select(
        key, ts_col, *attr_cols, F.sum("_chg").over(w).alias("version")
    )
    per_run = runs.groupBy(key, "version").agg(
        F.min(ts_col).alias("valid_from"),
        *[F.first(c).alias(c) for c in attr_cols],
    )
    wv = Window.partitionBy(key).orderBy("version")
    return per_run.select(
        key,
        *attr_cols,
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.col("version").cast("long").alias("version"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
    )


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Reconciliation between two snapshots of the same table: one row per
    differing key with a verdict in {'left_only', 'right_only', 'changed'}
    (identical rows are dropped — the overwhelmingly common case, so the
    output is tiny even when the inputs are huge).

    Change detection compares an md5 over the concatenated compare
    columns (null-tagged, unit-separated), NOT column-by-column equality —
    the full-outer join then carries key + two 32-char digests per row
    instead of two full row payloads. At 100 TB this is the difference
    between shuffling 64 bytes/row and shuffling the table twice.
    """
    cmp_l = compare_cols if compare_cols is not None else [
        c for c in left.columns if c not in key_cols
    ]

    def digest(df: DataFrame) -> Column:
        # null-tagged AND length-prefixed ("v<len>:<value>" / "n") so the
        # encoding is prefix-free: a value that itself contains the join
        # separator can never shift column boundaries and alias two
        # different rows to one digest (('a\x1fvb','c') vs ('a','b\x1fvc'))
        parts = [
            F.coalesce(
                F.concat(
                    F.lit("v"),
                    F.length(F.col(c).cast("string")).cast("string"),
                    F.lit(":"),
                    F.col(c).cast("string"),
                ),
                F.lit("n"),
            )
            for c in cmp_l
        ]
        return F.md5(F.concat_ws("\x1f", *parts))

    l = left.select(*key_cols, digest(left).alias("_lh"))
    r = right.select(*key_cols, digest(right).alias("_rh"))
    j = l.join(r, key_cols, "full_outer")
    verdict = (
        F.when(F.col("_rh").isNull(), F.lit("left_only"))
        .when(F.col("_lh").isNull(), F.lit("right_only"))
        .when(F.col("_lh") != F.col("_rh"), F.lit("changed"))
    )
    return (
        j.withColumn("verdict", verdict)
        .where(F.col("verdict").isNotNull())
        .select(*key_cols, "verdict")
    )


def table_checksum(
    df: DataFrame,
    key_cols: Sequence[str] | None = None,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Order-independent table signature for cross-engine/cross-replica
    verification: (group..., n_rows, xor_sig, sum_sig) — the cheap
    anti-entropy precheck that decides WHETHER to run the row-level
    ``table_diff``. All three aggregates commute, so the signature is a
    pure function of the multiset of rows regardless of partitioning,
    ordering, or engine:

      n_rows   — count
      xor_sig  — bit_xor of the 60-bit row digest (overflow-free; its
                 known weakness — an EVEN number of identical rows
                 cancels to 0 — is exactly what sum_sig covers)
      sum_sig  — sum of digest mod 10^9 (n·10^9 stays in int64 up to
                 ~9·10^9 rows per group; group finer for more)

    The row digest reuses ``table_diff``'s prefix-free null-tagged
    length-prefixed encoding, so no value — including one containing
    the separator — can alias two different rows. ``group_cols`` yields
    per-partition signatures (e.g. per day) so a mismatch localizes
    without rescanning the whole table.
    """
    from megalista_spark.operators.dedup import portable_hash64

    cols = (
        list(key_cols)
        if key_cols is not None
        else [c for c in df.columns if c not in group_cols]
    )
    parts = [
        F.coalesce(
            F.concat(
                F.lit("v"),
                F.length(F.col(c).cast("string")).cast("string"),
                F.lit(":"),
                F.col(c).cast("string"),
            ),
            F.lit("n"),
        )
        for c in cols
    ]
    h = portable_hash64(F.concat_ws("\x1f", *parts))
    gcols = list(group_cols)
    return (
        df.select(*gcols, h.alias("_h"))
        .groupBy(*gcols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.bit_xor("_h").cast("bigint").alias("xor_sig"),
            F.sum(F.col("_h") % F.lit(10**9)).cast("bigint").alias("sum_sig"),
        )
    )
