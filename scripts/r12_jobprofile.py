"""Per-query job/stage/task profile: a NOISE-FREE structural signal for
the r12 optimization round. For each named query, runs fn(spark,
sf).count() inside its own job group and reports how many Spark jobs,
stages and tasks it scheduled, plus wall time. Many jobs = driver
barriers / eager materializations; many stages = exchanges.

Usage: python scripts/r12_jobprofile.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spec = importlib.util.spec_from_file_location(
        "spark_entry", f"{REPO}/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    from megalista_spark.session import get_spark

    spark = get_spark(app_name="r12_jobprofile")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    qs = m.queries()
    spark.range(1).count()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()
    print(f"{'query':40} {'wall':>7} {'jobs':>5} {'stages':>7} {'tasks':>7}")
    for name in names:
        tracker = sc.statusTracker()
        group = f"prof_{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        job_ids = tracker.getJobIdsForGroup(group)
        stages = 0
        tasks = 0
        for j in job_ids:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            stages += len(ji.stageIds)
            for s in ji.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    tasks += si.numTasks
        print(
            f"{name:40} {wall:7.2f} {len(job_ids):5d} {stages:7d} {tasks:7d}",
            flush=True,
        )
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
