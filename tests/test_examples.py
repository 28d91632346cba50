"""Smoke test for the end-to-end ETL example — the best single
demonstration of the reference semantics (config → read → validate →
hash → batch → upload → control-table write), run on every seal.

The property under test is the reference's defining idempotency
contract (transactional_events_results_writer.py:29-78 +
big_query_data_source.py anti-join): a SECOND run over an unchanged
source reads and uploads ZERO transactional rows, because every
GCLID_TIME key now lives in the control table.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_data_pipeline_example_funnel_invariants(spark):
    import data_pipeline

    out = data_pipeline.main(spark, sf_dir="/root/testdata/sf0.001")
    # each curation stage can only shrink the corpus…
    assert 0 < out["n_intake"] <= out["n_docs"]
    assert 0 < out["n_unique"] <= out["n_intake"]
    assert 0 < out["n_quality_pass"] <= out["n_intake"]
    fun = out["funnel"]
    assert fun["raw"] >= fun["quality_pass"] >= fun["after_blocklist"]
    assert out["n_budget_filled"] <= fun["after_blocklist"]
    # …and the retrieval stages return full top-k for the 3 probe queries
    assert out["n_topk_rows"] == 3 * 5
    assert out["n_ivf_rows"] == 3 * 5
    assert out["n_packed"] > 0


def test_attribution_example_consistent_credits(spark):
    import attribution_analytics

    out = attribution_analytics.main(spark, sf_dir="/root/testdata/sf0.001")
    assert 0 < out["n_last_touch_attributed"] <= out["n_purchases"]
    assert out["n_rfm_users"] > 0
    assert out["markov"], "markov attribution returned no channels"
    effects = [m["removal_effect_micro"] for m in out["markov"]]
    assert all(e >= 0 for e in effects)
    assert effects == sorted(effects, reverse=True)  # ordered as shown


def test_tokenizer_example_trains_working_artifacts(spark):
    import tokenizer_training

    out = tokenizer_training.main(spark, sf_dir="/root/testdata/sf0.001")
    assert out["n_vocab"] == 15
    assert len(out["merges"]) == 5
    for m in out["merges"]:
        assert m["merged"] == m["lhs"] + m["rhs"]
    # applying the merge table shortens (or keeps) the symbol sequence
    # and reconstructs the original word exactly
    assert len(out["tokenized"]) <= len(out["word"]) + 1
    assert "".join(out["tokenized"]) == out["word"] + "</w>"
    assert out["heavy_hitters"], "no dominant language found"


def test_run_etl_example_idempotent_rerun(spark):
    import run_etl

    r1, r2 = run_etl.main(spark)

    s1 = {(b["source"], b["destination"]): b for b in r1}
    s2 = {(b["source"], b["destination"]): b for b in r2}
    conv1 = s1[("conversions", "offline_conv")]
    conv2 = s2[("conversions", "offline_conv")]
    aud2 = s2[("conversions", "crm_audience")]

    # run 1 uploads the full transactional source
    assert conv1["rows_read"] == 100
    assert conv1["rows_uploaded"] == 100
    assert all(b["ok"] for b in r1)

    # run 2: the anti-join against the control table leaves NOTHING to
    # read or upload on the transactional branch
    assert conv2["rows_read"] == 0
    assert conv2["rows_uploaded"] == 0
    # the non-transactional audience branch re-uploads as designed
    assert aud2["rows_read"] == 100
    assert all(b["ok"] for b in r2)
