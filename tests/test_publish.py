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


def test_pointer_swap_hook_receives_commit_contract(spark, tmp_path):
    """The conditional-put seam: the hook gets (spark, pointer_path,
    payload, expected_current_id) and OWNS the commit — nothing else
    touches the pointer."""
    base = str(tmp_path / "tbl")
    publish_snapshot(spark.range(2), base)
    calls = []

    def fake_conditional_put(s, pointer_path, payload, expected_cur):
        calls.append((pointer_path, expected_cur))
        import json as _json

        assert _json.loads(payload)["snapshot"] == 2
        # emulate the store's conditional PUT succeeding
        from megalista_spark.operators.publish import _write_file

        _write_file(s, pointer_path, payload)

    publish_snapshot(spark.range(7), base, pointer_swap=fake_conditional_put)
    assert calls == [(f"{base}/_MANIFEST.json", 1)]
    assert current_snapshot_id(spark, base) == 2
    assert read_snapshot(spark, base).count() == 7


def test_concurrent_publish_detected(spark, tmp_path):
    """Optimistic concurrency: a pointer that advanced between manifest
    read and swap fails the commit instead of silently clobbering."""
    base = str(tmp_path / "tbl")
    publish_snapshot(spark.range(2), base)

    def racing_swap(s, pointer_path, payload, expected_cur):
        raise AssertionError("unused")

    # simulate the race by publishing 2 normally, then attempting a
    # publish whose pointer re-check must observe the advance: we patch
    # current_snapshot_id's view by advancing AFTER the initial read via
    # the hookless path — easiest deterministic simulation is the direct
    # guard: expected cur=1 while pointer already names 2
    publish_snapshot(spark.range(3), base)  # pointer now at 2
    import megalista_spark.operators.publish as pub

    with pytest.raises(RuntimeError, match="concurrent publish"):
        # re-entering with a stale expected-current: force by calling the
        # internal guard path with snapshot_id=4 and a monkeypatched
        # current reader that returns the stale value on first call only
        real = pub.current_snapshot_id
        seen = {"n": 0}

        def stale_then_real(s, b):
            seen["n"] += 1
            return 1 if seen["n"] == 1 else real(s, b)

        pub.current_snapshot_id = stale_then_real
        try:
            pub.publish_snapshot(spark.range(4), base, snapshot_id=4)
        finally:
            pub.current_snapshot_id = real
    # no orphan artifacts: the conflict fired BEFORE the snapshot manifest
    # landed and the uncommitted data dir was cleaned, so the id is reusable
    import os

    assert not os.path.exists(f"{base}/snapshots/4.json")
    assert not os.path.exists(f"{base}/data/snap=4")
    publish_snapshot(spark.range(9), base, snapshot_id=4)
    assert read_snapshot(spark, base, snapshot_id=4).count() == 9


class _CASPointerStore:
    """Minimal object-store commit service: a generation-checked
    conditional PUT (the S3 if-match / GCS x-goog-if-generation
    contract). The store is the single source of commit truth — a PUT
    whose expected generation is stale raises instead of clobbering."""

    class Conflict(Exception):
        pass

    def __init__(self):
        self.generation = 0  # 0 = pointer never written
        self.swap = None  # the pointer_swap callable, built per writer

    def conditional_put(self, spark, pointer_path, payload, expected_cur):
        expected_gen = 0 if expected_cur is None else int(expected_cur)
        if self.generation != expected_gen:
            raise self.Conflict(
                f"conditional PUT failed: generation {self.generation} "
                f"!= expected {expected_gen}"
            )
        from megalista_spark.operators.publish import _write_file

        _write_file(spark, pointer_path, payload)
        import json as _json

        self.generation = int(_json.loads(payload)["snapshot"])


def test_two_writer_cas_race_one_wins_loser_cleaned(spark, tmp_path):
    """End-to-end two-writer race through the conditional-put seam:
    both writers read the same current snapshot; writer A commits first
    (CAS generation advances); writer B's CAS must fail, its snapshot
    manifest and data directory must be cleaned up, and its id stays
    reusable for the retry."""
    base = str(tmp_path / "tbl")
    store = _CASPointerStore()
    publish_snapshot(spark.range(2), base, pointer_swap=store.conditional_put)
    assert store.generation == 1

    # Writer B enters publish_snapshot having read cur=1. Its swap hook
    # models A committing in the window between B's read and B's CAS:
    # A's full publish (snapshot 2) runs first, THEN B's own CAS attempt
    # goes to the store with the now-stale expectation.
    def b_swap(s, pointer_path, payload, expected_cur):
        publish_snapshot(  # writer A wins the race
            spark.range(7), base, snapshot_id=2, pointer_swap=store.conditional_put
        )
        store.conditional_put(s, pointer_path, payload, expected_cur)

    with pytest.raises(_CASPointerStore.Conflict, match="conditional PUT"):
        publish_snapshot(spark.range(3), base, snapshot_id=3, pointer_swap=b_swap)

    # exactly one commit won: the pointer and store agree on A's snapshot
    assert store.generation == 2
    assert current_snapshot_id(spark, base) == 2
    assert read_snapshot(spark, base).count() == 7
    # the loser's fully-formed manifest + data were cleaned up — no
    # orphan visible to time travel, id 3 not burned
    import os

    assert not os.path.exists(f"{base}/snapshots/3.json")
    assert not os.path.exists(f"{base}/data/snap=3")
    # B retries from the fresh current and succeeds with the same id
    publish_snapshot(spark.range(3), base, snapshot_id=3, pointer_swap=store.conditional_put)
    assert store.generation == 3
    assert read_snapshot(spark, base, snapshot_id=3).count() == 3
