"""Phase timing for the ann_ivf family: split query CONSTRUCTION time
(the eager count + per-iteration k-means collect jobs) from ACTION time
(the noop-sink execution of the returned plan), plus job counts per
phase. Usage: python scripts/r13_annprof.py [sf_dir] query [query ...]
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

    spark = get_spark(app_name="r13_annprof")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    qs = m.queries()
    spark.range(32).repartition(32).count()  # warm the executor pool
    print(f"{'query':28} {'build':>7} {'action':>7} {'bjobs':>6} {'ajobs':>6}")
    for name in names:
        spark.catalog.clearCache()
        tracker = sc.statusTracker()
        j0 = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.monotonic()
        df = qs[name](spark, sf_dir)
        t1 = time.monotonic()
        j1 = len(tracker.getJobIdsForGroup(None) or [])
        df.write.format("noop").mode("overwrite").save()
        t2 = time.monotonic()
        j2 = len(tracker.getJobIdsForGroup(None) or [])
        print(
            f"{name:28} {t1 - t0:7.2f} {t2 - t1:7.2f} "
            f"{j1 - j0:6d} {j2 - j1:6d}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
