"""Committed search-only evidence for the persisted index lifecycles.

The build-once/search-many split is the lifecycle's whole point (sf1:
build ~138s, search ~2.7s cold — SCALE.md); these tests make the search
half a committed, re-runnable artifact instead of prose, for BOTH
on-disk formats:

- tests/fixtures/ivf_index_sf0.1 — plain IVF, written by a ROUND-11
  session under the legacy un-versioned ``meta/`` pointer layout
  (compacted → cells_v2). Its value is backward compatibility: current
  readers must keep reading the pre-versioned format.
- tests/fixtures/ivfpq_index_sf0.1 — IVF-PQ, written by a round-12
  session through the full maintained lifecycle (build → append →
  compact → GC) under the crash-atomic versioned ``meta_vN`` layout.

Gates per fixture: (a) bit-identical search results vs the recorded
RESULTS.json rows — a reader change that breaks either on-disk layout
fails here first; (b) layout shape asserts; (c) a coarse search-time
ceiling. The time gate exists to catch pathological regressions (a
full-corpus scan where partition pruning used to be), NOT host noise:
the budget is max(5× recorded, 15 s) best-of-two, far above this host's
measured jitter but far below any scan-the-world plan. Skipped (like
the whole module) when the recorded sf_dir isn't mounted on this host.

Rebuild with scripts/build_fixture_index.py after an INTENTIONAL format
or geometry change (rebuilding the plain-IVF fixture forfeits the
legacy-layout coverage — don't, without replacing that evidence).
"""

import json
import os
import time

import pytest

FIXTURES = {
    "ivf": os.path.join(
        os.path.dirname(__file__), "fixtures", "ivf_index_sf0.1"
    ),
    "ivfpq": os.path.join(
        os.path.dirname(__file__), "fixtures", "ivfpq_index_sf0.1"
    ),
}


def _recorded(family):
    with open(os.path.join(FIXTURES[family], "RESULTS.json")) as fh:
        rec = json.load(fh)
    if not os.path.isdir(rec["sf_dir"]):
        pytest.skip(f"recorded dataset {rec['sf_dir']} not mounted here")
    return rec


def _search(spark, family, rec):
    from pyspark.sql import functions as F

    from megalista_spark.operators.similarity import (
        ivf_search_index,
        ivfpq_search_index,
    )

    emb = spark.read.parquet(f"{rec['sf_dir']}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    if family == "ivf":
        df = ivf_search_index(
            spark, FIXTURES[family], queries, k=rec["k"], nprobe=rec["nprobe"]
        )
        cols = ["query_id", "rank", "neighbor_id", "cos_sim"]
    else:
        df = ivfpq_search_index(
            spark, FIXTURES[family], queries, k=rec["k"], nprobe=rec["nprobe"]
        )
        cols = ["query_id", "rank", "neighbor_id", "adc_dist"]
    return df.orderBy("query_id", "rank").select(*cols)


@pytest.mark.parametrize("family", ["ivf", "ivfpq"])
def test_fixture_index_search_bit_identical(spark, family):
    rec = _recorded(family)
    rows = [list(r) for r in _search(spark, family, rec).collect()]
    assert rows == rec["rows"]


def test_ivf_fixture_layout_is_legacy_versioned_cells():
    # the committed plain-IVF artifact exercises the PRE-round-12 layout:
    # data in cells_v2/, original cells/ gone, legacy un-versioned meta/
    fx = FIXTURES["ivf"]
    assert os.path.isdir(os.path.join(fx, "cells_v2"))
    assert not os.path.exists(os.path.join(fx, "cells"))
    assert os.path.isdir(os.path.join(fx, "meta"))
    assert not any(n.startswith("meta_v") for n in os.listdir(fx))
    assert any(
        d.startswith("bucket=")
        for d in os.listdir(os.path.join(fx, "cells_v2"))
    )


def test_ivfpq_fixture_layout_is_crash_atomic_versioned():
    # the committed IVF-PQ artifact exercises the round-12 layout after
    # build → append → compact → GC: codes_v2 + meta_v2 only, no legacy
    # meta/, no superseded generation, no crashed-commit tmp
    fx = FIXTURES["ivfpq"]
    names = set(os.listdir(fx))
    assert "codes_v2" in names and "meta_v2" in names
    assert "codes" not in names and "meta" not in names and "meta_v1" not in names
    assert "_meta_tmp" not in names
    assert {"coarse", "codebooks"} <= names
    assert any(
        d.startswith("cell=")
        for d in os.listdir(os.path.join(fx, "codes_v2"))
    )


def test_legacy_fixture_rebuild_is_guarded():
    # scripts/build_fixture_index.py must refuse to regenerate the
    # legacy-layout plain-IVF fixture by accident: current code writes
    # the versioned layout, which would silently destroy the
    # backward-compat evidence this module gates
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "bfi",
        os.path.join(
            os.path.dirname(__file__), "..", "scripts", "build_fixture_index.py"
        ),
    )
    bfi = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bfi)
    assert _os.environ.get("SPARK_GRAFT_REPLACE_LEGACY_FIXTURE") != "1"
    with pytest.raises(SystemExit, match="LEGACY"):
        bfi.build_ivf(None)


@pytest.mark.parametrize("family", ["ivf", "ivfpq"])
def test_fixture_index_search_time_within_budget(spark, family):
    rec = _recorded(family)
    # pay plan codegen outside the timed window, then best-of-two
    _search(spark, family, rec).count()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _search(spark, family, rec).count()
        best = min(best, time.perf_counter() - t0)
    # coarse ceiling: catches scan-the-whole-corpus plan regressions,
    # deliberately far above host jitter (ADVICE r11: a 2× gate on a
    # ~1.3 s recording flakes on contended hosts with no code change)
    budget = max(5.0 * rec["search_sec_recorded"], 15.0)
    assert best <= budget, (
        f"{family} search-only regressed: {best:.3f}s > budget "
        f"{budget:.3f}s (recorded {rec['search_sec_recorded']}s)"
    )
