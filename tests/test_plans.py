"""Physical-plan guards: the optimizations the engine depends on at scale
must stay in the plan (pushdown, pruning, broadcast anti-join, top-k
without global sort). A regression here is a performance bug even when
results stay correct."""

from __future__ import annotations

import importlib.util
import os

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_plans", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_q1_filter_pushdown_and_pruning(spark, entry):
    txt = formatted(entry.q1_pricing_summary(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in txt
    # only the 7 needed columns reach the scan — no l_orderkey/partkey/suppkey
    assert "l_orderkey" not in txt.split("ReadSchema")[1].splitlines()[0]


def test_anti_join_is_broadcast(spark, entry):
    txt = plan_of(entry.anti_join_dedup(spark, SF))
    assert "BroadcastHashJoin" in txt and "LeftAnti" in txt


def test_top_k_uses_take_ordered(spark, entry):
    txt = plan_of(entry.q3_shipping_priority(spark, SF))
    assert "TakeOrderedAndProject" in txt


def test_q1_partial_aggregation(spark, entry):
    # map-side combine: two HashAggregates around the exchange
    txt = plan_of(entry.q1_pricing_summary(spark, SF))
    assert txt.count("HashAggregate") >= 2


def test_hashing_stays_jvm_side(spark, entry):
    # no Python UDF evaluation in the PII hashing plan
    txt = plan_of(entry.pii_hash_customers(spark, SF))
    assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt


def test_minhash_no_python_and_single_tokenize(spark, entry):
    txt = plan_of(entry.dedup_minhash_lsh(spark, SF))
    assert "BatchEvalPython" not in txt
    # the O(len^2) regression: tokenizing split() must not appear inside a
    # slice() lambda (it would mean per-shingle re-tokenization)
    assert "slice(split(" not in txt.replace(" ", "")


def test_q19_disjunctive_predicates_pushed_to_both_scans(spark, entry):
    # the OR-of-ANDs predicate must reach BOTH parquet scans, split per
    # table (quantity windows → lineitem, brand/size windows → part)
    txt = formatted(entry.q19_disjunctive_revenue(spark, SF))
    assert "Or(Or(And(GreaterThanOrEqual(l_quantity" in txt.replace(" ", "") or (
        "GreaterThanOrEqual(l_quantity,1.0)" in txt
    )
    assert "EqualTo(p_brand,Brand#12)" in txt.replace(" ", "")


def test_q10_top_k_without_global_sort(spark, entry):
    txt = plan_of(entry.q10_returned_items(spark, SF))
    assert "TakeOrderedAndProject" in txt


def test_q15_scalar_max_is_broadcast(spark, entry):
    # the single-row max side must broadcast — never a shuffle join against
    # a 1-row relation
    txt = plan_of(entry.q15_top_supplier(spark, SF))
    assert "BroadcastHashJoin" in txt


def test_bucketed_join_zero_exchanges(spark, entry):
    # both sides bucketed on the join key → sort-merge join AND the
    # per-key aggregation run with no shuffle Exchange anywhere
    df = entry.bucketed_colocated_join(spark, SF)
    txt = formatted(df)
    assert "Exchange" not in txt
    assert "SortMergeJoin" in txt
    assert "Bucketed: true" in txt
    assert "SelectedBucketsCount: 8 out of 8" in txt


def test_range_join_is_equi_not_nested_loop(spark, entry):
    # the binned range join must plan as an EQUI join on the time bin —
    # a raw BETWEEN-only join would be a BroadcastNestedLoopJoin
    # (cartesian compare, the interval-join trap)
    txt = plan_of(entry.attribution_range_join(spark, SF))
    assert "NestedLoop" not in txt
    assert "Join" in txt


def test_sessionize_single_exchange_for_windows(spark, entry):
    # lag + running-sum share one partitioning: exactly one exchange before
    # the window sorts (plus the final aggregation exchanges)
    txt = formatted(entry.sessionize_stats(spark, SF))
    window_section = txt.split("Window")[0]
    assert window_section.count("Exchange") <= 2


def test_partition_pruned_write_read_cycle(spark, tmp_path):
    # a date-partitioned write must let a date predicate prune partitions
    # at the SCAN (PartitionFilters), not filter rows after reading all
    from pyspark.sql import functions as F

    path = str(tmp_path / "events_by_date")
    e = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "dt", F.to_date(F.col("ts").cast("timestamp"))
    )
    e.write.partitionBy("dt").mode("overwrite").parquet(path)
    back = spark.read.parquet(path).where(F.col("dt") == F.lit("2024-01-05"))
    txt = formatted(back)
    assert "PartitionFilters" in txt
    assert "dt" in txt.split("PartitionFilters", 1)[1].split("\n", 1)[0]
    # and the row count matches the unpartitioned filter
    expected = e.where(F.to_date("ts") == F.lit("2024-01-05")).count()
    assert back.count() == expected and expected > 0


def test_tfidf_pairs_no_python_term_joins_hashed(spark, entry):
    # the sparse cosine pair plans must stay JVM-side (no row-at-a-time
    # Python); document joins are equi joins on term/id (the only
    # nested-loop joins are crosses against ONE-ROW count aggregates —
    # bounded by construction); never a CartesianProduct of data.
    # Registered default = prefix-filtered form: candidate generation is
    # an equi join of the prefix index against the full index on term.
    txt = plan_of(entry.tfidf_cosine_dup_pairs(spark, SF))
    assert "BatchEvalPython" not in txt
    assert "CartesianProduct" not in txt
    assert "Join [term" in txt or "Join [id_a" in txt
    # exact/audit sibling keeps the broadcast term-join shape
    txt = plan_of(entry.tfidf_cosine_dup_pairs_exact(spark, SF))
    assert "BatchEvalPython" not in txt
    assert "CartesianProduct" not in txt
    assert "BroadcastHashJoin [term" in txt


def test_span_dedup_no_python_no_nested_loop(spark, entry):
    # corpus-internal span dedup: owner join is a hash join on the gram
    # hash; masking is pure expressions
    txt = plan_of(entry.dedup_spans_docs(spark, SF))
    assert "BatchEvalPython" not in txt
    assert "NestedLoopJoin" not in txt and "CartesianProduct" not in txt


def test_decontaminate_spans_benchmark_side_broadcast(spark, entry):
    # the benchmark shingle-hash set must BROADCAST (the 100 TB train
    # side never shuffles for the hash join)
    txt = plan_of(entry.decontaminate_spans_docs(spark, SF))
    assert "BroadcastHashJoin" in txt
    assert "BatchEvalPython" not in txt


def test_ivfpq_codebook_and_lut_joins_broadcast(spark, entry):
    # IVF-PQ: codebook and LUT joins broadcast; the only non-equi join is
    # the bounded coarse-centroid cross-score (8 rows)
    txt = plan_of(entry.ann_ivfpq_topk(spark, SF))
    assert txt.count("BroadcastHashJoin") >= 2
    assert "BatchEvalPython" not in txt


def test_cascade_stats_single_scan_no_join(spark, entry):
    # the whole attrition report must be one conditional-sum aggregate over
    # one scan: no join operators, no Python, and exactly the two-exchange
    # partial->final agg shape (plus nothing else)
    txt = plan_of(entry.curation_cascade_stats(spark, SF))
    assert "Join" not in txt and "BatchEvalPython" not in txt
    assert txt.count("Scan ") == 1


def test_source_blocklist_single_groupby_no_join(spark, entry):
    txt = plan_of(entry.source_quality_blocklist(spark, SF))
    assert "Join" not in txt and "BatchEvalPython" not in txt


def test_budget_fill_single_window_exchange(spark, entry):
    # one hash-partition exchange for the per-group window; no join, no
    # global-sort Exchange rangepartitioning except the final orderBy
    df = entry.budget_fill_by_source(spark, SF)
    txt = plan_of(df)
    assert "Join" not in txt and "BatchEvalPython" not in txt
    assert txt.count("hashpartitioning") >= 1


def test_variant_decode_stays_jvm_side(spark, entry):
    # VARIANT parse/extract are built-in expressions — no Python anywhere
    txt = plan_of(entry.variant_props_stats(spark, SF))
    assert "BatchEvalPython" not in txt and "Join" not in txt
    assert txt.count("Scan ") == 1


def test_shuffle_index_no_global_sort_exchange(spark, entry):
    # the whole point: dense global positions WITHOUT rangepartitioning
    # anywhere except the final presentation orderBy
    df = entry.training_shuffle_shards(spark, SF)
    txt = plan_of(df)
    # exactly one rangepartitioning: the final presentation orderBy on
    # the computed positions — the POSITION COMPUTATION itself uses only
    # the per-bucket hashpartitioning window exchange
    assert txt.count("rangepartitioning") == 1
    assert "rangepartitioning(shuffle_pos" in txt
    assert "hashpartitioning(_b" in txt


def test_setsim_prefix_join_all_equi_no_python(spark, entry):
    # candidate generation and verification are equi hash joins on
    # tok/id; no Python anywhere, no data-sized nested loop
    txt = plan_of(entry.setsim_doc_pairs(spark, SF))
    assert "BatchEvalPython" not in txt
    assert "CartesianProduct" not in txt


def test_bpe_round_windows_stay_jvm_side(spark, entry):
    # one training round = lead/row_number windows + a 1-row broadcast
    # argmax join-back; the only nested loop is that 1-row cross join
    txt = plan_of(entry.bpe_merge_table(spark, SF))
    assert "BatchEvalPython" not in txt
    assert "CartesianProduct" not in txt


def test_heavy_hitters_counter_probe_broadcast(spark, entry):
    # the d×w counter table must broadcast (candidate probing is
    # map-side; the corpus never shuffles for the estimate join)
    txt = plan_of(entry.heavy_hitter_langs(spark, SF))
    assert "BatchEvalPython" not in txt
    assert "BroadcastHashJoin [r" in txt


def test_khop_frontier_join_is_hash_join(spark, entry):
    # each BFS round's frontier⋈edges must be an equi hash join on the
    # node id, never a nested loop over the edge list
    txt = plan_of(entry.khop_supply_reach(spark, SF))
    assert "NestedLoopJoin" not in txt and "CartesianProduct" not in txt
    assert "BatchEvalPython" not in txt


def test_ewma_no_raw_log_window(spark, entry):
    # the EWMA plan must be agg → explode → agg → join: no Window node
    # over the event log (the explode-by-horizon design), no Python
    txt = plan_of(entry.ewma_hourly_by_type(spark, SF))
    assert "BatchEvalPython" not in txt
    assert "Window" not in txt


def test_copurchase_basket_cap_bounds_viral_order(spark, entry):
    # the sampling contract: one synthetic 10^4-item order must complete
    # and contribute at most cap*(cap-1)/2 pairs (its cap lowest part
    # keys), instead of 5*10^7 — the skew guard for the six co-purchase
    # graph queries
    from pyspark.sql import functions as F

    cap = entry.COPURCHASE_BASKET_CAP
    viral = spark.range(10_000).select(
        F.lit(1).alias("l_orderkey"), (F.col("id") + 10).alias("l_partkey")
    )
    normal = spark.createDataFrame(
        [(2, 1), (2, 2), (2, 3), (3, 1), (3, 2)], ["l_orderkey", "l_partkey"]
    )
    pairs = entry._copurchase_pairs_from(viral.unionByName(normal), cap=cap)
    n = pairs.count()
    # normal orders: {1,2,3} and {1,2} -> pairs {12,13,23}; viral: C(cap,2)
    assert n == cap * (cap - 1) // 2 + 3
    # the kept parts are the lowest part keys of the viral order
    kept = pairs.agg(F.max("id_b")).first()[0]
    assert kept <= 10 + cap - 1


def test_cusum_single_window_exchange(spark, entry):
    # closed form = both CUSUM sides + both frames in ONE window sort;
    # counting Window nodes guards against a per-side re-shuffle
    txt = plan_of(entry.cusum_hourly_shifts(spark, SF))
    assert "PythonUDF" not in txt
    import re

    # exchanges: one for the hourly agg, one for the key-partitioned
    # window (+ AQE reads); no exchange proliferation per statistic
    n_window = len(re.findall(r"\bRunningWindowFunction|\bWindow\b", txt))
    assert n_window <= 3, txt


def test_embedding_covariance_kernel_not_explode(spark, entry):
    # the scale path is the Arrow kernel: a MapInPandas/ArrowEvalPython
    # node must appear and NO Generate/Explode of components may exist
    # (the posexplode^2 formulation is the oracle's job, not ours)
    txt = plan_of(entry.embedding_covariance_matrix(spark, SF))
    assert "MapInPandas" in txt or "mapInPandas" in txt
    assert "Generate" not in txt


def test_sequential_pattern_no_cartesian(spark, entry):
    txt = plan_of(entry.event_sequence_support(spark, SF))
    assert "CartesianProduct" not in txt and "BroadcastNestedLoopJoin" not in txt


def test_kaplan_meier_no_python_no_cartesian(spark, entry):
    txt = plan_of(entry.km_repurchase_curves(spark, SF))
    assert "PythonUDF" not in txt
    assert "CartesianProduct" not in txt


def test_join_skew_audit_no_sort_of_count_table(spark, entry):
    # percentiles come from the bounded frequency histogram; the key-count
    # table (billions of rows at scale) must never be globally sorted —
    # the only Sort allowed is inside the tiny histogram window
    txt = plan_of(entry.join_skew_audit_keys(spark, SF))
    assert "CartesianProduct" not in txt
    assert "PythonUDF" not in txt


def test_retention_triangle_no_window(spark, entry):
    # two hash aggregates + broadcast; a Window here would mean raw
    # events are being rank-sorted per cohort
    txt = plan_of(entry.retention_triangle_weeks(spark, SF))
    assert "Window" not in txt, txt
    assert "BroadcastHashJoin" in txt or "BroadcastExchange" in txt


def test_quantile_bins_no_global_sort_of_raw_rows(spark, entry):
    # exact_quantile_select sorts only the ONE hit bin; bucketing folds a
    # broadcast array per row. A global Sort or a Generate (explode of
    # boundaries) would be the anti-patterns
    txt = plan_of(entry.decile_bins_prices(spark, SF))
    assert "Generate" not in txt
    assert "CartesianProduct" not in txt


def test_chi2_all_joins_broadcast(spark, entry):
    # marginals and the 1-row total join back onto the R·C cell table —
    # nothing here justifies a shuffle join
    txt = plan_of(entry.chi2_segment_priority(spark, SF))
    assert "SortMergeJoin" not in txt, txt


def test_binary_auc_windows_stay_off_raw_rows(spark, entry):
    # the fine prefix sum must be PARTITIONED by the coarse bucket (a
    # keyless window over the distinct-score table is the 100-TB trap
    # this operator exists to avoid); the only keyless window allowed is
    # the one over the <= n_coarse bucket-total rows
    txt = plan_of(entry.auc_purchase_by_value(spark, SF))
    assert "partitionBy: [_bkt" in txt.replace("partition By", "partitionBy").replace(
        "partitionspec", "partitionBy"
    ) or "_bkt" in txt, txt
    assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt
    # bounds + coarse prefix join back broadcast — no shuffle join
    assert "SortMergeJoin" not in txt, txt


def test_gains_table_no_row_inflation(spark, entry):
    # boundary array folds per row (no Generate/explode of boundaries;
    # no cartesian) — same contract as quantile_bins
    txt = plan_of(entry.gains_decile_purchases(spark, SF))
    assert "CartesianProduct" not in txt
    assert "BatchEvalPython" not in txt


def test_topk_recall_joins_tables_not_corpus(spark, entry):
    # the audit joins two top-k tables; the equality join must not
    # degenerate to a nested loop
    txt = plan_of(entry.ann_recall_audit(spark, SF))
    assert "CartesianProduct" not in txt


def test_containment_single_shingle_pass(spark, entry):
    # bucket-grouping form: the corpus is shingled once (no slice(split(
    # re-tokenization), no Python)
    txt = plan_of(entry.containment_dup_pairs(spark, SF))
    assert "BatchEvalPython" not in txt
    assert "slice(split(" not in txt.replace(" ", "")


def test_embedding_quality_single_aggregate(spark, entry):
    # one scan + one hash aggregate pair (partial + final); no window,
    # no join, no Python
    txt = plan_of(entry.embedding_quality_by_label(spark, SF))
    assert "Window" not in txt
    assert "Join" not in txt
    assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt


def test_ivf_index_search_prunes_cell_partitions(spark, tmp_path):
    # the persisted plain-IVF search must reach the cells scan with a
    # PartitionFilter on bucket (file-level nprobe pruning), never a
    # full-table scan + runtime join filter
    from pyspark.sql import functions as F

    from megalista_spark.operators.similarity import (
        ivf_build_index,
        ivf_search_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = str(tmp_path / "ivf_plan_idx")
    ivf_build_index(emb, path, num_centroids=8)
    res = ivf_search_index(spark, path, queries, k=5, nprobe=2)
    txt = formatted(res)
    assert "PartitionFilters" in txt
    import re

    pf_line = txt.split("PartitionFilters", 1)[1].split("\n", 1)[0]
    assert re.search(r"bucket#\d+ IN \(", pf_line), pf_line
    # and no Python evaluation anywhere in the search plan
    assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt
