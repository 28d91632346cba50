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
