"""Regenerate PLANS.md: captured `.explain("formatted")` output for a
set of flagship queries, each with a short annotation of what to look
for. Run after plan-affecting changes:

    python scripts/dump_plans.py   # rewrites PLANS.md at the repo root
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.001"

# (query, what the plan must show)
FLAGSHIPS = [
    (
        "q1_pricing_summary",
        "Scan-level pushdown: `PushedFilters` carries the shipdate bound and "
        "`ReadSchema` only the 7 needed columns; two-phase HashAggregate "
        "(partial → final) so the shuffle moves group keys + partial states, "
        "not rows; everything inside WholeStageCodegen.",
    ),
    (
        "anti_join_dedup",
        "The transactional-dedup shape: BroadcastHashJoin LeftAnti against "
        "the control keys — the 100 TB side never shuffles for the dedup.",
    ),
    (
        "top_orders_per_segment",
        "Per-group top-k WITHOUT a global sort: the window sorts inside "
        "hash-partitioned groups only (no rangepartitioning Exchange before "
        "the filter).",
    ),
    (
        "curation_cascade_stats",
        "The whole per-rule attrition report is ONE scan + one two-phase "
        "aggregate: no joins, no Python, the CASE-chain verdict and every "
        "conditional sum fused into the same codegen stage.",
    ),
    (
        "budget_fill_by_source",
        "One hash-partition Exchange for the per-source window; running sum "
        "and rank share a single sort.",
    ),
    (
        "ann_ivfpq_topk",
        "IVF-PQ search: coarse table, codebooks, and LUT all arrive via "
        "BroadcastExchange; the corpus-side stages are id-keyed partial "
        "aggregates — vectors never cross a shuffle after encoding.",
    ),
    (
        "setsim_doc_pairs",
        "Prefix-filtered set-similarity join: every data join is an equi "
        "hash join on tok/id (the prefix filter IS the candidate "
        "generator); the per-doc rarity-rank window partitions by doc — "
        "no all-pairs stage anywhere.",
    ),
    (
        "ewma_hourly_by_type",
        "EWMA without a raw-log window: agg → inline-explode(h+1 literal "
        "weights) → re-agg → join back; no Window node in the plan, all "
        "integer arithmetic in codegen.",
    ),
    (
        "auc_purchase_by_value",
        "Exact ROC-AUC without a global sort: raw rows end at the FIRST "
        "hash aggregate (distinct-score table); the fine prefix sum is a "
        "window PARTITIONED by the coarse bucket, the only keyless window "
        "runs over the ≤ n_coarse bucket-total rows, and the bucket prefix "
        "joins back via BroadcastHashJoin.",
    ),
    (
        "decayed_user_scores",
        "Recency-decayed scoring: 1-row max(ts) via BroadcastNestedLoopJoin "
        "(broadcast scalar), ONE two-phase hash aggregate over events, "
        "top-50 via TakeOrderedAndProject — no window, no sort of users.",
    ),
    # semdedup special-cased in main(): materialize=False for a visible plan
    (
        "semdedup_cluster_prune",
        "SemDeDup: the k-row centroid table reaches the assignment via "
        "BroadcastExchange (corpus never shuffles to assign); the near-dup "
        "pair join is an equi SortMerge/Hash join ON cid — never cartesian; "
        "the three assignment consumers read one InMemoryTableScan.",
    ),
    (
        "dsir_importance_topk",
        "DSIR importance: bucket counts are a two-phase partial aggregate of "
        "≤1024 groups; the weight table comes back via BroadcastExchange so "
        "scoring is map-side; the final top-20 is TakeOrderedAndProject — "
        "no global sort.",
    ),
    (
        "tfidf_cosine_dup_pairs",
        "The round-9 sub-quadratic registered default: ONE tokenize shuffle "
        "feeds the checkpointed ranked index; candidate generation is an "
        "equi-join of the suffix-norm-bounded PREFIX index against the full "
        "index on term (never all-pairs); the positional filter is a hash "
        "aggregate (min-struct per pair, map-side combined); the verify "
        "stage joins two one-row-per-doc map relations and computes the dot "
        "as a map_zip_with fold — no |pairs|x|terms| posting re-explode "
        "anywhere, no CartesianProduct, no Python.",
    ),
    (
        "ann_ivf_index_search",
        "The persisted plain-IVF lifecycle's search plan: the cells scan "
        "carries `PartitionFilters: [bucket IN (...)]` — nprobe pruning "
        "happens at FILE-LISTING time (the un-probed cells' parquet is "
        "never opened); the query probes arrive via BroadcastExchange; "
        "ReadSchema shows only (id, vec); the per-query top-k is the "
        "standard window over the probed candidates. The n-by-k corpus "
        "assignment appears NOWHERE — it was paid once at build.",
    ),
    (
        "semdedup_index_prune",
        "SemDeDup over the persisted index with the round-12 work-REDUCING "
        "skew guard: the k-row per-cell counts arrive via BroadcastExchange "
        "onto the cells scan; cells at or under hot_cell_min pair through "
        "the plain cid-keyed join, cells above it through the secondary-"
        "quantizer route — ~sqrt(|c|) sampled sub-centroids broadcast onto "
        "the members, a map-side max-struct aggregate picks each member's "
        "nearest (the ACOS chain computes its angle), and exact spherical "
        "triangle-inequality bounds prune sub-cell pairs and member pairs "
        "before the cosine filter, so a mega-cell's comparisons DROP "
        "(Theta(c^2) -> O(c^1.5)+near-pairs) and the surviving join runs "
        "on (cid, sub-cell) keys, explicitly repartitioned so AQE cannot "
        "coalesce the expanding join to one task. Members are "
        "L2-normalized ONCE in the pre-join projections (one TRANSFORM "
        "per row), so the per-pair filter is a single AGGREGATE dot fold "
        "— no norm recomputation inside the O(c^2) stage. Lossless; same "
        "output either way (union + distinct).",
    ),
    (
        "dedup_ngram_jaccard",
        "Inverted-index exact Jaccard with the round-11 streamed "
        "small-bucket emission: pairs leave the bucket via chained "
        "Generate nodes (posexplode then explode(slice)) inside "
        "WholeStageCodegen — the full C(b,2) pair array never "
        "materializes as one column value; buckets above the cap route "
        "through the salted self-join. One shingle exchange feeds both "
        "paths (the window count annotation reuses the groupBy "
        "partitioning).",
    ),
]


def main() -> None:
    spec = importlib.util.spec_from_file_location(
        "spark_entry", f"{REPO}/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    from megalista_spark.session import get_spark

    spark = get_spark(app_name="dump_plans")
    qs = m.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )

    out = [
        "# Captured physical plans (generated by scripts/dump_plans.py)",
        "",
        f"`.explain(\"formatted\")` at {SF}, the session defaults of",
        "`megalista_spark/session.py` (AQE on, 64 MB broadcast threshold).",
        "Plan *shapes* are enforced by `tests/test_plans.py`; this file is the",
        "human-readable evidence. Regenerate after plan-affecting changes.",
        "",
    ]
    for name, note in FLAGSHIPS:
        if name == "semdedup_cluster_prune":
            # materialize=True eagerly checkpoints (the production path),
            # which collapses .explain to an RDD scan — capture the lazy
            # dataflow instead
            from megalista_spark.operators.dedup import semdedup_prune

            df = semdedup_prune(
                spark.read.parquet(f"{SF}/embeddings.parquet"),
                k=8,
                iters=2,
                threshold=0.45,
                materialize=False,
            )
        else:
            df = qs[name](spark, SF)
        txt = df._jdf.queryExecution().explainString(mode)
        out += [f"## {name}", "", note, "", "```", txt.rstrip(), "```", ""]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(FLAGSHIPS)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
