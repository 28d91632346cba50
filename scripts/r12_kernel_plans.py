"""Supplementary plan evidence for r12: the declared graph queries end in
an eager localCheckpoint, so their `.explain` collapses to `Scan
ExistingRDD` (see plans/r12/*_before.txt). This captures the INTERNAL
lazy dataflows the round actually changed, from the kernels themselves:

  _kernel_triangle_default_<suffix>.txt    — _triangle_kernel, defensive
      canonicalize+distinct path (the pre-r12 behavior, still the default)
  _kernel_triangle_canonical_<suffix>.txt  — assume_canonical=True path
      (what triangle_count_copurchase / global_clustering_coefficient use
      now; note the absent Exchange+HashAggregate dedup of the edge list
      and the wedge self-join reading one co-partitioned cache)
  _kernel_supply_edges_union_<suffix>.txt  — the pre-r12 union-of-two-
      selects bipartite edge build (two final HashAggregates over a
      ReusedExchange)
  _kernel_supply_edges_bidir_<suffix>.txt  — _bidir_edges (one aggregate
      + Generate)

Usage: python scripts/r12_kernel_plans.py <suffix>
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
    spec = importlib.util.spec_from_file_location(
        "spark_entry", f"{REPO}/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    from pyspark.sql import functions as F

    from megalista_spark.operators.graph import _triangle_kernel
    from megalista_spark.session import get_spark

    spark = get_spark(app_name="r12_kernel_plans")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    outdir = os.path.join(REPO, "plans", "r12")
    os.makedirs(outdir, exist_ok=True)

    def dump(name: str, df) -> None:
        txt = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(outdir, f"_kernel_{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt.rstrip() + "\n")
        print(f"wrote {path}")

    pairs = m._copurchase_pairs(spark, SF).selectExpr(
        "id_a AS src", "id_b AS dst"
    )
    for label, canon in (("triangle_default", False), ("triangle_canonical", True)):
        _, oriented, tri = _triangle_kernel(pairs, "src", "dst", canon)
        dump(label, tri)
        oriented.unpersist()

    o = m._t(spark, SF, "orders").select("o_orderkey", "o_custkey")
    l = m._t(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    bip = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("cust"),
            (F.col("l_suppkey") + F.lit(1000000)).cast("long").alias("supp"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    union_form = bip.selectExpr("cust AS src", "supp AS dst", "w").union(
        bip.selectExpr("supp AS src", "cust AS dst", "w")
    )
    dump("supply_edges_union", union_form)
    dump("supply_edges_bidir", m._bidir_edges(bip, weighted=True))
    spark.stop()


if __name__ == "__main__":
    main()
