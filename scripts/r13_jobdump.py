"""Per-job wall/name dump for one query via the Spark UI REST API:
run the query (construction + noop action), then list every job with
its duration and description. Usage:
    python scripts/r13_jobdump.py <sf_dir> <query> [runs]
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir, name = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    spec = importlib.util.spec_from_file_location(
        "spark_entry", f"{REPO}/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    from megalista_spark.session import get_spark

    spark = get_spark(app_name="r13_jobdump")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    qs = m.queries()
    spark.range(32).repartition(32).count()
    store = sc._jsc.sc().statusStore()  # works with spark.ui disabled

    def jobs():
        out = []
        it = store.jobsList(None).iterator()
        while it.hasNext():
            j = it.next()
            sub = j.submissionTime()
            end = j.completionTime()
            out.append(
                {
                    "jobId": j.jobId(),
                    "numTasks": j.numTasks(),
                    "dur": (
                        (end.get().getTime() - sub.get().getTime()) / 1000.0
                        if sub.isDefined() and end.isDefined()
                        else -1.0
                    ),
                    "desc": (
                        j.description().get()
                        if j.description().isDefined()
                        else j.name()
                    ),
                }
            )
        return out

    for run in range(runs):
        spark.catalog.clearCache()
        seen = {j["jobId"] for j in jobs()}
        t0 = time.monotonic()
        df = qs[name](spark, sf_dir)
        t_build = time.monotonic() - t0
        built = {j["jobId"] for j in jobs()} - seen
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        t_action = time.monotonic() - t0
        print(f"== run {run}: build {t_build:.2f}s  action {t_action:.2f}s")
        for j in sorted(jobs(), key=lambda j: j["jobId"]):
            if j["jobId"] in seen:
                continue
            phase = "build " if j["jobId"] in built else "action"
            print(
                f"  [{phase}] job {j['jobId']:3d} {j['dur']:6.2f}s "
                f"tasks={j['numTasks']:4d} {j['desc'][:90]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
