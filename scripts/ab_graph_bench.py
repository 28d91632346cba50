"""Focused fresh-session A/B timing for the graph-family bench creep
(VERDICT r6 item 2).

Times a fixed query subset in a FRESH Spark session — one warmup pass
then N measured passes per query — removing the session-depth confound
(r6's full-roster bench reads these at the ~180-query mark of a long
session; r5's at ~160). Run this at two commits (git worktree for the
old one) and diff the medians.

Usage: python scripts/ab_graph_bench.py [sf_dir] [repeats]
Prints one JSON line: {"queries": {name: {"runs": [...], "median": s}}}
"""

from __future__ import annotations

import importlib.util
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SUBSET = [
    "personalized_pagerank_weighted",
    "copurchase_assortativity",
    "contrastive_training_pairs",
    "link_prediction_ra",
    # control: a non-graph query that did NOT creep between r5 and r6,
    # to detect environment-level drift between the two A/B sessions
    "q1_pricing_summary",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-graph-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    qs = m.queries()

    out = {}
    for name in SUBSET:
        fn = qs[name]
        # warmup: JIT, code cache, file-footer cache
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(repeats):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.monotonic() - t0, 3))
        out[name] = {"runs": runs, "median": statistics.median(runs)}
        print(f"# {name}: {runs}", file=sys.stderr)

    print(json.dumps({"sf_dir": sf_dir, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
