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


def expire_partitions(
    spark, path: str, cutoff: str, partition_col: str = "dt"
) -> list[str]:
    """Retention sweep: DELETE date partitions older than ``cutoff``
    (exclusive) from a ``partition_col``-partitioned parquet table — the
    Spark-side twin of the reference control table's 15-day expiry
    (BigQuery partition expiration, big_query_data_source.py:125-139;
    read-time cutoff in file_data_source.py:144). Read-time filtering
    keeps queries correct; this reclaims the storage.

    Uses the Hadoop FileSystem API (works on HDFS/GCS/S3A like every
    other path here), deletes whole partition directories — O(#expired
    partitions) metadata calls, no data read. Returns the deleted
    partition values, lexicographically compared (ISO dates compare
    correctly as strings).
    """
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    deleted: list[str] = []
    if not fs.exists(p):
        return deleted
    prefix = f"{partition_col}="
    for status in fs.listStatus(p):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith(prefix):
            value = name[len(prefix):]
            if value < cutoff:
                fs.delete(status.getPath(), True)
                deleted.append(value)
    return sorted(deleted)
