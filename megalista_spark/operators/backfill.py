"""Partition-scoped backfill — the operational pattern for repairing or
re-running slices of a date-partitioned table without touching the rest.

At 100 TB a backfill is never "rewrite the table": it is "recompute
2024-03-07 and swap exactly that partition in". Spark's dynamic
partition overwrite does the swap atomically per partition: a write in
``overwrite`` mode with ``partitionOverwriteMode=dynamic`` replaces ONLY
the partitions present in the incoming frame and leaves every other
partition's files untouched (static overwrite — the default — would
truncate the whole table first; that distinction is the whole point).

The reference's control-table retention (file_data_source.py:144,
big_query_data_source.py:125-139) relies on the same date-partition
layout; this module is the maintenance side of that design.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_date_partitioned(
    df: DataFrame, path: str, partition_col: str = "dt"
) -> None:
    """Initial load / full refresh: overwrite everything, laid out by the
    partition column so later backfills and retention scans prune."""
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def backfill_partitions(
    df: DataFrame, path: str, partition_col: str = "dt"
) -> None:
    """Replace exactly the partitions present in ``df`` (dynamic
    partition overwrite), leaving all others' files untouched — the
    idempotent re-run primitive: running the same backfill twice
    converges, and a bad day is repaired by recomputing that day only.

    The option is set per-write (not globally on the session) so other
    writers keep the safer static default.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


def backfill_dates(
    compute, dates: Sequence[str], path: str, partition_col: str = "dt"
) -> None:
    """Recompute a set of date partitions with a caller-supplied
    ``compute(date) -> DataFrame`` (frame must carry ``partition_col``)
    and swap each one in. Dates process independently — a failure leaves
    completed dates durable and the rest untouched, so the retry is just
    the remaining dates."""
    for d in dates:
        backfill_partitions(
            compute(d).where(F.col(partition_col) == d), path, partition_col
        )
