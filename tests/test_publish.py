"""Atomic manifest-publish protocol: snapshot isolation for batch
outputs — readers resolve manifests, never directory listings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from megalista_spark.operators.publish import (
    current_snapshot_id,
    expire_snapshots,
    publish_snapshot,
    read_snapshot,
)


def test_publish_read_time_travel_expire(spark, tmp_path):
    base = str(tmp_path / "tbl")
    df1 = spark.range(10).withColumn("v", F.col("id") * 2)
    m1 = publish_snapshot(df1, base)
    assert m1["snapshot"] == 1 and m1["n_files"] >= 1
    assert current_snapshot_id(spark, base) == 1
    assert read_snapshot(spark, base).count() == 10

    df2 = spark.range(25).withColumn("v", F.col("id") * 3)
    m2 = publish_snapshot(df2, base)
    assert m2["snapshot"] == 2
    # current reads see snap 2; time travel still reads snap 1
    assert read_snapshot(spark, base).count() == 25
    assert read_snapshot(spark, base, snapshot_id=1).count() == 10

    df3 = spark.range(5)
    publish_snapshot(df3.withColumn("v", F.col("id")), base)
    removed = expire_snapshots(spark, base, keep=2)
    assert removed == [1]
    with pytest.raises(Exception):
        read_snapshot(spark, base, snapshot_id=1)
    assert read_snapshot(spark, base, snapshot_id=2).count() == 25
    assert read_snapshot(spark, base).count() == 5


def test_unpublished_write_is_invisible(spark, tmp_path):
    base = str(tmp_path / "tbl")
    publish_snapshot(spark.range(4), base)
    # simulate a concurrent writer mid-flight: data directory exists but
    # no manifest was committed — readers must not see it
    spark.range(100).write.parquet(f"{base}/data/snap=99")
    assert current_snapshot_id(spark, base) == 1
    assert read_snapshot(spark, base).count() == 4


def test_snapshots_are_immutable(spark, tmp_path):
    base = str(tmp_path / "tbl")
    publish_snapshot(spark.range(3), base)
    with pytest.raises(ValueError, match="immutable"):
        publish_snapshot(spark.range(3), base, snapshot_id=1)
