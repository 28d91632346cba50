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


def test_sessionize_single_exchange_for_windows(spark, entry):
    # lag + running-sum share one partitioning: exactly one exchange before
    # the window sorts (plus the final aggregation exchanges)
    txt = formatted(entry.sessionize_stats(spark, SF))
    window_section = txt.split("Window")[0]
    assert window_section.count("Exchange") <= 2
