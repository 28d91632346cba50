"""Training-data pipeline demo over the synthetic corpus — the end-to-end
corpus-construction flow: deterministic sampling → dedup cascade (exact →
fingerprint → MinHash-LSH) → quality gate → language rebalancing →
k-means-trained IVF ANN search.

    PYTHONPATH=. python examples/data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from megalista_spark.operators.clustering import kmeans_centroids
from megalista_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
from megalista_spark.operators.sampling import hash_sample, weighted_mix
from megalista_spark.operators.similarity import cosine_topk_gemm, ivf_cosine_topk
from megalista_spark.operators.text import document_fingerprint, quality_score
from megalista_spark.session import get_spark


def main(spark=None, sf_dir=None) -> dict:
    """Run the corpus-construction demo. ``spark=None`` (script use)
    owns its own session; an injected session (the pytest smoke test)
    is left running. Returns the stage counts so the caller can assert
    the funnel invariants."""
    owns_session = spark is None
    if sf_dir is None:
        sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if owns_session:
        spark = get_spark(app_name="example_pipeline")
    out: dict = {"sf_dir": sf_dir}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # 0. deterministic intake sample — reproducible under any partitioning
    intake = hash_sample(docs, 0.9, "doc_id", salt="intake")
    out["n_docs"], out["n_intake"] = docs.count(), intake.count()
    print(f"intake sample: {out['n_docs']} -> {out['n_intake']} docs")

    # 1. exact dedup — survivors only
    survivors = exact_dedup(intake)
    out["n_unique"] = survivors.count()
    print(f"exact dedup: -> {out['n_unique']} unique texts")

    # 2. near-dup candidates via MinHash LSH
    near = minhash_lsh_pairs(intake, num_hashes=16, bands=4)
    out["n_near_pairs"] = near.count()
    print(f"minhash-lsh candidate near-dup pairs: {out['n_near_pairs']}")

    # 3. formatting-robust fingerprint dedup
    fp = document_fingerprint(intake).groupBy("fingerprint").count().where("count > 1")
    print(f"fingerprint collisions: {fp.count()}")

    # 4. quality gate — stats relation joins back to the docs for text
    q = quality_score(intake)
    kept = intake.join(
        q.where(F.col("passes_quality")).select("doc_id"), "doc_id"
    )
    out["n_quality_pass"] = kept.count()
    print(f"quality gate: {q.count()} -> {out['n_quality_pass']} pass")

    # 5. language rebalance: downsample dominant en, keep the rest
    en = intake.where(F.col("lang") == "en")
    rest = intake.where(F.col("lang") != "en")
    mixed = weighted_mix([(en, 0.5), (rest, 1.0)], key_col="doc_id")
    mixed.groupBy("lang").count().orderBy("lang").show()

    # 6. ANN over embeddings: brute-force GEMM baseline, then IVF pruned
    #    search with k-means-trained centroids
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = cosine_topk_gemm(emb, queries, k=5)
    out["n_topk_rows"] = topk.count()
    topk.show(15, truncate=False)
    cents = kmeans_centroids(emb, k=8, iters=2)
    ivf = ivf_cosine_topk(emb, queries, k=5, nprobe=3, centroids=cents)
    out["n_ivf_rows"] = ivf.count()
    ivf.show(15, truncate=False)

    # 7. intake health checks: per-column profile + key-skew diagnostic
    from megalista_spark.operators.profiling import profile_columns
    from megalista_spark.operators.skew import skew_report

    profile_columns(docs).show(truncate=False)
    skew_report(docs, "lang", top_n=5).show()

    # 8. cardinality triage without exact counts: HLL distinct estimate
    from megalista_spark.operators.sketches import hll_distinct_count

    hll_distinct_count(docs, "text").show()

    # 9. pack the surviving corpus into fixed-budget training sequences
    from megalista_spark.operators.packing import pack_sequences

    packed = pack_sequences(kept.select("doc_id", "text"), budget=512)
    out["n_packed"] = packed.count()
    print(f"packed sequences: {out['n_packed']}")

    # 10. contract gate before anything ships: declarative expectations
    from megalista_spark.operators.expectations import check_constraints

    check_constraints(
        docs,
        row_rules={"text_nonempty": "length(trim(text)) > 0",
                   "lang_known": "lang IS NOT NULL"},
        unique_cols=["doc_id"],
    ).show()

    # 11. exact-substring hygiene: cross-doc repeated 13-gram spans kept
    #     only in their owner doc; then a tokenizer vocab off the result
    from megalista_spark.operators.curation import dedup_repeated_spans
    from megalista_spark.operators.text import build_vocab

    cleaned = dedup_repeated_spans(docs, n=13)
    out["span_tokens_removed"] = cleaned.agg(
        F.sum("n_tokens_removed")
    ).collect()[0][0]
    print("span-dedup tokens removed:", out["span_tokens_removed"])
    build_vocab(cleaned.select(
        F.col("doc_id"), F.col("clean_text").alias("text")
    ), max_terms=10).show()

    # 12. duplicate GROUPS from the near-dup pairs (exact components,
    #     O(log n) star contraction — depth-proof)
    from megalista_spark.operators.graph import star_contraction_components
    from megalista_spark.operators.similarity import embedding_near_dup_pairs_blocked

    pairs = embedding_near_dup_pairs_blocked(emb, threshold=0.45)
    groups = star_contraction_components(
        pairs, emb.select(F.col("vec_id").alias("id"))
    )
    out["n_grouped_dups"] = groups.where(~F.col("is_canonical")).count()
    print("non-singleton groups:", out["n_grouped_dups"])

    # 13. production-style funnel: rule cascade → domain blocklist →
    #     per-source token budget, with EVERY stage count collected by
    #     CollectMetrics taps during the single final action (no
    #     re-aggregation — compare the oracle-gated corpus_build_pipeline
    #     query, which recomputes prefixes to stay a one-DataFrame contract)
    from megalista_spark.operators.curation import (
        apply_source_blocklist,
        cascade_keep,
        source_quality_stats,
    )
    from megalista_spark.operators.observability import (
        observe_rows,
        observed_counts,
    )
    from megalista_spark.operators.sampling import budget_fill

    rules = [
        ("too_short", F.length("text") < 100),
        ("long_words", F.length("text") > F.size(F.split("text", r"\s+")) * 8),
    ]
    reg = {}
    f0 = observe_rows(docs, "raw", reg)
    f1 = observe_rows(cascade_keep(f0, rules), "quality_pass", reg)
    src_stats = source_quality_stats(docs, F.length("text") >= 100)
    f2 = observe_rows(apply_source_blocklist(f1, src_stats), "after_blocklist", reg)
    f3 = budget_fill(f2, group_col="source", weight_col="n_chars",
                     budget=3000, order_col="n_chars")
    final = f3.count()  # the one action — all taps collect here
    out["funnel"] = observed_counts(reg)
    out["n_budget_filled"] = final
    print("funnel:", out["funnel"], "-> budget_filled:", final)

    # 14. gapless hourly series from the event log (densify + ffill)
    from megalista_spark.operators.timeseries import densify_ffill

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = events.groupBy(
        "event_type",
        (F.floor(F.col("ts").cast("long") / 3600) * 3600).alias("hour_sec"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    densify_ffill(hourly, "event_type", "hour_sec", 3600,
                  zero_cols=["n_events"]).where(~F.col("is_observed")).show(5)
    if owns_session:
        spark.stop()
    return out


if __name__ == "__main__":
    main()
