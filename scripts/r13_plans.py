"""Capture `.explain("formatted")` for r13-touched queries into
plans/r13/ of THIS repo (override with SPARK_GRAFT_PLANS_OUT so the
pinned base worktree can write its `before` dumps into the head repo).

Usage: python scripts/r13_plans.py <suffix> query [query ...]

Two dumps per query:
  <query>_<suffix>.txt        — the plan as declared (eager
      localCheckpoints collapse to `Scan ExistingRDD`, faithfully
      showing what executes downstream of each materialization barrier)
  <query>_lazy_<suffix>.txt   — same query with localCheckpoint and
      persist monkeypatched to identity, exposing the FULL lazy lineage
      across the barriers (the structural evidence for shuffle/join
      claims: e.g. the per-round SSSP frontier join that r13 removed is
      visible here and absent in the head dump).
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
OUT = os.environ.get("SPARK_GRAFT_PLANS_OUT") or os.path.join(
    REPO, "plans", "r13"
)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    spec = importlib.util.spec_from_file_location(
        "spark_entry", f"{REPO}/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    # Spark 4 concrete class (pyspark.sql.DataFrame is the abstract
    # base; patching it would not shadow the classic implementation)
    from pyspark.sql.classic.dataframe import DataFrame

    from megalista_spark.session import get_spark

    spark = get_spark(app_name="r13_plans")
    qs = m.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    os.makedirs(OUT, exist_ok=True)

    def dump(fname: str, df) -> None:
        txt = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(OUT, fname)
        with open(path, "w") as f:
            f.write(txt.rstrip() + "\n")
        print(f"wrote {path}")

    for name in names:
        dump(f"{name}_{suffix}.txt", qs[name](spark, SF))

    # lazy variants: barriers become identity so explain shows the whole
    # dataflow the operator builds (nothing is executed — explain only)
    orig_ckpt = DataFrame.localCheckpoint
    orig_persist = DataFrame.persist
    orig_count = DataFrame.count
    DataFrame.localCheckpoint = lambda self, *a, **k: self
    DataFrame.persist = lambda self, *a, **k: self
    DataFrame.count = lambda self: 0  # eager persist+count idiom
    try:
        for name in names:
            dump(f"{name}_lazy_{suffix}.txt", qs[name](spark, SF))
    finally:
        DataFrame.localCheckpoint = orig_ckpt
        DataFrame.persist = orig_persist
        DataFrame.count = orig_count
    spark.stop()


if __name__ == "__main__":
    main()
