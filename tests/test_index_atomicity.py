"""Crash-atomicity of the persisted index meta pointer (round-12 task 1).

The meta pointer is the index's commit record. These tests prove the
lifecycle's failure contract:

- a crash BETWEEN the compacted data write and the meta flip leaves the
  previous commit fully readable (old pointer + old data dir intact),
  and a later compact recovers (entry GC removes the orphan, then the
  rewrite re-runs);
- a crash MID meta write leaves only a ``_meta_tmp`` directory that
  readers never resolve and GC reclaims;
- rebuilding over a previously-compacted path strands no versioned
  orphan directories (ADVICE r11);
- pre-scheme indexes (legacy un-versioned ``meta/``) keep reading and
  migrate to versioned meta on their first compact.

Single-writer per index path is the documented contract; none of this
coordinates concurrent writers.
"""

import os

import pytest
from pyspark.sql import functions as F

import megalista_spark.operators.similarity as sim

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _queries(spark):
    emb = spark.read.parquet(EMB)
    return emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _ivf_setup(spark, path):
    emb = spark.read.parquet(EMB)
    sim.ivf_build_index(emb.where(F.col("vec_id") < 400), path, num_centroids=16)
    sim.ivf_append_to_index(emb.where(F.col("vec_id") >= 400), path)


def _ivf_res(spark, path):
    return sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
        for r in sim.ivf_search_index(
            spark, path, _queries(spark), k=10, nprobe=2
        ).collect()
    )


def _pq_setup(spark, path):
    emb = spark.read.parquet(EMB)
    sim.ivfpq_build_index(
        emb.where(F.col("vec_id") < 400), path, num_coarse=8, m_subs=8
    )
    sim.ivfpq_append_to_index(emb.where(F.col("vec_id") >= 400), path)


def _pq_res(spark, path):
    return sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["adc_dist"])
        for r in sim.ivfpq_search_index(
            spark, path, _queries(spark), k=10, nprobe=2
        ).collect()
    )


FAMILIES = {
    "ivf": (_ivf_setup, _ivf_res, "cells"),
    "ivfpq": (_pq_setup, _pq_res, "codes"),
}
COMPACT = {"ivf": lambda s, p: sim.ivf_compact_index(s, p),
           "ivfpq": lambda s, p: sim.ivfpq_compact_index(s, p)}
GC = {"ivf": lambda s, p: sim.ivf_gc_index(s, p),
      "ivfpq": lambda s, p: sim.ivfpq_gc_index(s, p)}


@pytest.mark.parametrize("family", ["ivf", "ivfpq"])
def test_crash_between_data_write_and_meta_flip_keeps_old_index(
    spark, tmp_path, family, monkeypatch
):
    setup, res, base = FAMILIES[family]
    p = str(tmp_path / f"{family}_idx")
    setup(spark, p)
    before = res(spark, p)

    real_write = sim._write_index_meta

    def _die_before_flip(*a, **k):
        raise RuntimeError("simulated crash before the meta flip")

    monkeypatch.setattr(sim, "_write_index_meta", _die_before_flip)
    with pytest.raises(RuntimeError, match="simulated crash"):
        COMPACT[family](spark, p)
    monkeypatch.setattr(sim, "_write_index_meta", real_write)

    # the new data generation landed but was never committed …
    assert os.path.isdir(os.path.join(p, f"{base}_v2"))
    # … and the index is FULLY readable on the old commit
    assert res(spark, p) == before
    assert os.path.isdir(os.path.join(p, base))

    # recovery = just compact again: entry GC removes the uncommitted
    # orphan, the rewrite re-runs, the flip commits
    COMPACT[family](spark, p)
    assert res(spark, p) == before
    nm, ver = sim._latest_meta_dir(spark, p)
    assert nm == f"meta_v{ver}" and ver >= 2
    assert sim._read_index_meta(spark, p)[f"{base}_dir"] == f"{base}_v2"


@pytest.mark.parametrize("family", ["ivf", "ivfpq"])
def test_crashed_meta_tmp_never_resolves_and_is_gcd(
    spark, tmp_path, family
):
    setup, res, base = FAMILIES[family]
    p = str(tmp_path / f"{family}_idx")
    setup(spark, p)
    before = res(spark, p)
    # simulate a crash mid meta write: a partial _meta_tmp on disk
    tmp = os.path.join(p, sim._META_TMP)
    os.makedirs(tmp)
    with open(os.path.join(tmp, "part-00000.parquet"), "wb") as fh:
        fh.write(b"\x00garbage: not parquet")
    # readers resolve the committed pointer, never the tmp dir
    assert res(spark, p) == before
    removed = GC[family](spark, p)
    assert sim._META_TMP in removed
    assert not os.path.exists(tmp)
    assert res(spark, p) == before


@pytest.mark.parametrize("family", ["ivf", "ivfpq"])
def test_rebuild_over_compacted_path_strands_no_orphans(
    spark, tmp_path, family
):
    # ADVICE r11: rebuild used to reset the pointer but leave the old
    # versioned data directories (stale full corpus copies) behind
    setup, res, base = FAMILIES[family]
    p = str(tmp_path / f"{family}_idx")
    setup(spark, p)
    COMPACT[family](spark, p)  # data now in {base}_v2, orphan {base}
    emb = spark.read.parquet(EMB)
    if family == "ivf":
        sim.ivf_build_index(emb, p, num_centroids=16)
    else:
        sim.ivfpq_build_index(emb, p, num_coarse=8, m_subs=8)
    names = set(os.listdir(p))
    assert base in names
    assert not any(n.startswith(f"{base}_v") for n in names), names
    assert not any(n == "meta" or (n.startswith("meta_v") and n != "meta_v1")
                   for n in names), names
    # and the rebuilt index searches like a fresh-path build
    p2 = str(tmp_path / f"{family}_fresh")
    if family == "ivf":
        sim.ivf_build_index(emb, p2, num_centroids=16)
    else:
        sim.ivfpq_build_index(emb, p2, num_coarse=8, m_subs=8)
    assert res(spark, p) == res(spark, p2)


@pytest.mark.parametrize("family", ["ivf", "ivfpq"])
def test_build_compute_failure_leaves_old_index_readable(
    spark, tmp_path, family
):
    # the build failure contract: bad inputs surface during the
    # MATERIALIZED compute phase (centroid/coarse/codebook fit), before
    # the old index is touched on disk — a failed rebuild must not
    # destroy a working index
    setup, res, base = FAMILIES[family]
    p = str(tmp_path / f"{family}_idx")
    setup(spark, p)
    before = res(spark, p)
    bad = spark.range(10).select(
        F.col("id").alias("vec_id")
    )  # no embedding column: fails at analysis inside the compute phase
    with pytest.raises(Exception):
        if family == "ivf":
            sim.ivf_build_index(bad, p, num_centroids=4)
        else:
            sim.ivfpq_build_index(bad, p, num_coarse=4, m_subs=8)
    assert os.path.isdir(os.path.join(p, base))
    assert res(spark, p) == before


def test_legacy_unversioned_meta_reads_and_migrates(spark, tmp_path):
    # indexes written before the versioned-meta scheme carry a plain
    # meta/ directory (the committed sf0.1 fixture is one): they must
    # keep reading, and their first compact must commit a versioned
    # meta while leaving the legacy one for GC
    p = str(tmp_path / "legacy_idx")
    _ivf_setup(spark, p)
    before = _ivf_res(spark, p)
    os.rename(os.path.join(p, "meta_v1"), os.path.join(p, "meta"))
    nm, ver = sim._latest_meta_dir(spark, p)
    assert (nm, ver) == ("meta", 0)
    assert _ivf_res(spark, p) == before
    sim.ivf_compact_index(spark, p)
    assert _ivf_res(spark, p) == before
    nm, ver = sim._latest_meta_dir(spark, p)
    assert nm == "meta_v1"
    assert os.path.isdir(os.path.join(p, "meta"))  # deferred
    removed = sim.ivf_gc_index(spark, p)
    assert "meta" in removed and "cells" in removed
    assert _ivf_res(spark, p) == before
