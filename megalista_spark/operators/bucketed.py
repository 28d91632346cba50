"""Bucketed co-located joins — pay the shuffle once at write time.

Spark's bucketed tables (``.bucketBy(n, key).sortBy(key)``) persist data
pre-hash-partitioned and pre-sorted on the join key. When BOTH sides of a
join are bucketed on that key with the same bucket count, the sort-merge
join needs **no Exchange and no Sort**: each task zips bucket i of one
table with bucket i of the other.

At 100 TB this is the difference between re-shuffling the fact tables on
every query and shuffling them once at ingest: the bucket layout is an
invariant the planner exploits for every subsequent join *and* any
aggregation keyed on the bucket column (partial agg becomes final — no
exchange there either). The reference engine has no equivalent; on Spark
it comes free from the table format (cf. reference's per-run full scans,
e.g. megalista/sources/batches_from_dataframe.py which re-groups every
run).

Caveats encoded here:
- bucketed tables must go through the session catalog (``saveAsTable``);
  a plain ``.parquet(path)`` write silently drops the bucket spec.
- bucket counts must match on both sides (or be multiples, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
- we create the backing database at an explicit LOCATION so demo tables
  never land inside the repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _delete_path(spark: SparkSession, path: str) -> None:
    """Remove a table location through the Hadoop FS API (works for any
    scheme the session can reach, not just local disk)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(hpath, True)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int,
    location: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed and sorted on ``key``.

    The session catalog is in-memory, so a previous process's table files
    can outlive their catalog entry — drop both before writing so re-runs
    (and scale-factor switches) are idempotent.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if location is not None:
        _delete_path(spark, location)
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def ensure_demo_database(spark: SparkSession, db: str, location: str) -> None:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{location}'")


def colocated_order_lines(
    spark: SparkSession,
    orders: DataFrame,
    lineitem: DataFrame,
    num_buckets: int = 8,
    db: str = "bucket_demo",
    location: str = "/tmp/megalista_spark_bucket_demo",
) -> DataFrame:
    """Join orders ⋈ lineitem on the order key via co-located buckets and
    aggregate per order — the whole plan runs without a single shuffle
    Exchange (verified by tests/test_plans.py).

    The ``merge`` hint pins sort-merge join so a broadcast doesn't mask
    the co-location at small scale; on a cluster at 100 TB neither side
    broadcasts anyway.
    """
    ensure_demo_database(spark, db, location)
    write_bucketed(
        orders, f"{db}.orders_b", "o_orderkey", num_buckets,
        location=f"{location}/orders_b",
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        f"{db}.lineitem_b",
        "o_orderkey",
        num_buckets,
        location=f"{location}/lineitem_b",
    )
    o = spark.table(f"{db}.orders_b")
    l = spark.table(f"{db}.lineitem_b")
    from pyspark.sql import functions as F

    return (
        o.hint("merge")
        .join(l, "o_orderkey")
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,2)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
        )
    )
