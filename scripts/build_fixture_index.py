"""Build the committed search-only fixture indexes.

The persisted-index lifecycles' headline claim is build-once /
search-many (sf1: build ~138s once, search ~2.7s cold — SCALE.md). The
build half is reproducible from the operators; this script makes the
SEARCH half a committed, re-runnable artifact:

  tests/fixtures/ivf_index_sf0.1/   plain-IVF index (auto-√n trained cells
                                    over the sf0.1 embeddings, compacted
                                    once). Written by a ROUND-11 session
                                    under the legacy un-versioned ``meta/``
                                    layout — do NOT rebuild it casually:
                                    its value is precisely that current
                                    readers must keep reading the old
                                    on-disk format.
  tests/fixtures/ivfpq_index_sf0.1/ IVF-PQ index (build + append + compact
                                    + GC under the round-12 crash-atomic
                                    ``meta_vN`` layout) — the versioned-
                                    layout stability twin.
  <fixture>/RESULTS.json            expected top-k for the standard 5-query
                                    batch + the recorded search-only seconds

tests/test_fixture_index.py replays the searches against the committed
indexes and gates on (a) bit-identical results — on-disk format
stability across rounds — and (b) search time within budget.

Usage: python scripts/build_fixture_index.py [ivf|pq|all]   (default pq;
quiet machine — the recorded timing becomes the regression budget)
"""

from __future__ import annotations

import json
import os
import shutil
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "tests", "fixtures", "ivf_index_sf0.1")
FIXTURE_PQ = os.path.join(REPO, "tests", "fixtures", "ivfpq_index_sf0.1")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _queries(spark):
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return emb, emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _record(fixture, search_fn, extra: dict) -> None:
    """Best-of-warmup search timing + bit-identity self-check, then
    write RESULTS.json (plan codegen paid outside the timed window —
    the gate's subject is search cost, not first-plan JIT)."""

    def run():
        t0 = time.perf_counter()
        rows = search_fn().collect()
        return time.perf_counter() - t0, rows

    _, rows = run()
    sec, rows2 = run()
    assert [tuple(r) for r in rows] == [tuple(r) for r in rows2]
    results = {
        "sf_dir": SF_DIR,
        "k": 10,
        "search_sec_recorded": round(sec, 3),
        "rows": [[v for v in r] for r in rows],
        **extra,
    }
    with open(os.path.join(fixture, "RESULTS.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"fixture: {fixture}, search {sec:.3f}s, {len(rows)} result rows")


def build_ivf(spark) -> None:
    from megalista_spark.operators.similarity import (
        ivf_build_index,
        ivf_compact_index,
        ivf_search_index,
    )

    emb, queries = _queries(spark)
    shutil.rmtree(FIXTURE, ignore_errors=True)
    ivf_build_index(emb, FIXTURE, num_centroids=None)
    n_cells = ivf_compact_index(spark, FIXTURE)

    def search():
        return ivf_search_index(
            spark, FIXTURE, queries, k=10, nprobe=4
        ).orderBy("query_id", "rank").select(
            "query_id", "rank", "neighbor_id", "cos_sim"
        )

    _record(FIXTURE, search, {"n_cells": int(n_cells), "nprobe": 4})


def build_pq(spark) -> None:
    """Full lifecycle under the round-12 crash-atomic layout: build on
    the first 1800 vectors, append the last 200 (frozen geometry),
    compact (versioned codes_v2 + meta_v2), GC the superseded
    generation — the committed artifact then exercises exactly what a
    maintained production index looks like on disk."""
    from pyspark.sql import functions as F

    from megalista_spark.operators.similarity import (
        ivfpq_append_to_index,
        ivfpq_build_index,
        ivfpq_compact_index,
        ivfpq_gc_index,
        ivfpq_search_index,
    )

    emb, queries = _queries(spark)
    shutil.rmtree(FIXTURE_PQ, ignore_errors=True)
    ivfpq_build_index(
        emb.where(F.col("vec_id") < 1800), FIXTURE_PQ, num_coarse=8, m_subs=8
    )
    ivfpq_append_to_index(emb.where(F.col("vec_id") >= 1800), FIXTURE_PQ)
    n_cells = ivfpq_compact_index(spark, FIXTURE_PQ)
    ivfpq_gc_index(spark, FIXTURE_PQ)

    def search():
        return ivfpq_search_index(
            spark, FIXTURE_PQ, queries, k=10, nprobe=2
        ).orderBy("query_id", "rank").select(
            "query_id", "rank", "neighbor_id", "adc_dist"
        )

    _record(FIXTURE_PQ, search, {"n_cells": int(n_cells), "nprobe": 2})


def main() -> None:
    import sys

    sys.path.insert(0, REPO)
    from megalista_spark.session import get_spark

    which = sys.argv[1] if len(sys.argv) > 1 else "pq"
    spark = get_spark(app_name="build_fixture_index")
    if which in ("ivf", "all"):
        build_ivf(spark)
    if which in ("pq", "all"):
        build_pq(spark)
    spark.stop()


if __name__ == "__main__":
    main()
