"""Three-point scaling trend from committed bench JSONs.

Merges per-query cold timings at sf0.01 / sf0.1 / sf1 into (a) a
per-family median-ratio table and (b) the per-query worst offenders, in
markdown ready for SCALE.md. Ratios are wall-clock multipliers for a 10×
data step; <= ~10 is linear-or-better, > 12 flags superlinear work
(SCALE.md's standing threshold).

Usage: python scripts/bench_trend.py BENCH_sf0.01.json BENCH_r07.json BENCH_sf1.json
"""

from __future__ import annotations

import json
import re
import sys

FAMILIES = [
    (r"^q\d+_|^top_orders|^orderkey|^dense_rank|^rank_family|^grouping_sets|^rollup|^cube_|^pivot|^unpivot|^collect_rollup|^set_(except|intersect)|^union_distinct|^merge_customer|^scd2|^table_diff|^salted_skew|^bucketed|^running_total|^trailing_window|^percentile_prices|^schema_project|^json_extract|^source_roundtrip|^quarantine|^validate_orders", "relational/ETL"),
    (r"^dedup_|^near_dup|^containment|^setsim|^fuzzy_name|^semdedup|^incremental_corpus|^corpus_after|^decontaminate|^customer_entity", "dedup"),
    (r"^ann_|^embedding_|^rrf|^kmeans|^contrastive|^dsir", "similarity/ANN"),
    (r"^text_|^corpus_|^bpe|^vocab_|^oov_|^ngram_|^collocation|^doc_l|^cross_domain|^bigram_lm|^lang_diversity|^repetition_filter|^chunk_docs|^heavy_hitter_langs|^source_quality", "text"),
    (r"pagerank|^kcore|^triangle|clustering_coefficient|^link_pred|^khop|^sssp|^copurchase|^harmonic", "graph"),
    (r"attribution|^conversion|^funnel|^rfm|^markov|^cohort|^retention|^km_|^experiment|^cuped|^behavior_pattern|^event_sequence|^windowed_funnel|^audience_|^user_activity|^session", "attribution/behavior"),
    (r"^hourly|^ewma|^cusum|^trend_|^gap_filled|^seasonal|^sliding|^robust_hourly|^hopping|^incremental_rollup|^streaming", "timeseries"),
    (r"^hll|^cms_|^kmv|^bloom|^quantile|^decile|^exact_global|^skew_report|^zorder|^orders_partition|^profile_orders|^value_drift|^doc_length", "sketches/profiling"),
    (r"sample|^stratified|^train_val|^training_|^temperature|^budget_fill|^pack_|^split_leakage", "sampling/mixing"),
    (r"^chi2|^shrunk|^winsorized|^benford|^join_skew|^auc_|^gains_|^k_anonymity|^l_diversity|^t_closeness|^grouped_zscore|^variant_props|^association_rules|^frequent_event|^dup_cluster", "stats/audit"),
    (r"^multimodal|^pii_|^anti_join|^semi_join|^batch_assignment|^budget", "pipeline/multimodal"),
]


def family(name: str) -> str:
    for pat, fam in FAMILIES:
        if re.search(pat, name):
            return fam
    return "other"


def load(path: str) -> dict[str, float]:
    d = json.load(open(path))
    if "queries" not in d and "parsed" in d:
        d = d["parsed"]
    return d.get("queries", {})


def median(xs: list[float]) -> float:
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2


def main() -> None:
    p001, p01, p1 = sys.argv[1], sys.argv[2], sys.argv[3]
    q001, q01, q1 = load(p001), load(p01), load(p1)
    common = sorted(set(q001) & set(q01) & set(q1))
    rows = []
    for n in common:
        r1 = q01[n] / q001[n] if q001[n] > 0 else float("nan")
        r2 = q1[n] / q01[n] if q01[n] > 0 else float("nan")
        rows.append((n, family(n), q001[n], q01[n], q1[n], r1, r2))

    fams: dict[str, list[tuple]] = {}
    for row in rows:
        fams.setdefault(row[1], []).append(row)
    print(f"{len(common)} queries in all three benches\n")
    print("| Family | n | median sf0.01→0.1 | median sf0.1→1 | worst sf0.1→1 (query) |")
    print("|---|---|---|---|---|")
    for fam in sorted(fams):
        rs = fams[fam]
        worst = max(rs, key=lambda r: r[6])
        print(
            f"| {fam} | {len(rs)} | {median([r[5] for r in rs]):.2f}× |"
            f" {median([r[6] for r in rs]):.2f}× |"
            f" {worst[6]:.1f}× (`{worst[0]}`) |"
        )
    print("\nPer-query top sf0.1→sf1 ratios (10× data), denominators > 0.2s:")
    print("\n| Query | sf0.01 | sf0.1 | sf1 | 0.1→1 ratio |")
    print("|---|---|---|---|---|")
    big = [r for r in rows if r[3] > 0.2]
    for r in sorted(big, key=lambda r: -r[6])[:15]:
        print(f"| `{r[0]}` | {r[2]:.2f}s | {r[3]:.2f}s | {r[4]:.2f}s | {r[6]:.2f}× |")
    over = [r for r in big if r[6] > 12]
    print(f"\n{len(over)} queries over the 12× superlinear threshold: "
          + ", ".join(f"`{r[0]}`" for r in over))


if __name__ == "__main__":
    main()
