"""Measured scaling curves: how does each headline query's WARM time
grow when the data grows 10× (sf0.01 → sf0.1)?

For each query: one untimed warm-up pass then one timed pass at each
scale factor, same session (so JIT/codegen is paid before any timing).
Output: one JSON line per query {name, t_small, t_big, ratio}, then a
summary listing queries whose ratio exceeds the superlinear threshold.

A ratio ≈ 1 means the query is dominated by plan constants at these
sizes; ratio ≈ 10 is linear in the data; ratios well above 10 flag
superlinear work (pair explosion, window over-collection) — the things
that break first at 100 TB.

Usage: python scripts/scaling_curve.py [small_sf_dir big_sf_dir [query ...]]
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    big = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])

    spec = importlib.util.spec_from_file_location(
        "spark_entry", f"{REPO}/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    import bench

    from megalista_spark.session import get_spark

    spark = get_spark(app_name="scaling_curve")
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

    qs = m.queries()
    results = []
    for name in bench.HEADLINE:
        if only and name not in only:
            continue
        fn = qs[name]
        try:
            times = {}
            for sf_dir in (small, big):
                fn(spark, sf_dir).count()  # warm-up: codegen + shuffle files
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                times[sf_dir] = time.perf_counter() - t0
                spark.catalog.clearCache()
            row = {
                "name": name,
                "t_small": round(times[small], 3),
                "t_big": round(times[big], 3),
                "ratio": round(times[big] / max(times[small], 1e-9), 2),
            }
        except Exception as exc:  # keep sweeping; report the failure
            row = {"name": name, "error": str(exc)[:200]}
        results.append(row)
        print(json.dumps(row), flush=True)

    ok = [r for r in results if "ratio" in r]
    ok.sort(key=lambda r: -r["ratio"])
    print(
        json.dumps(
            {
                "summary": "scaling sf0.01->sf0.1 (10x data)",
                "n": len(ok),
                "superlinear_gt_12x": [
                    {k: r[k] for k in ("name", "t_small", "t_big", "ratio")}
                    for r in ok
                    if r["ratio"] > 12
                ],
                "top10_ratios": [
                    {"name": r["name"], "ratio": r["ratio"]} for r in ok[:10]
                ],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
