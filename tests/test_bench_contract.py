"""bench.py JSON contract + bench_diff host-drift normalization.

Round-12 hardening (VERDICT task 2 + ADVICE r11): failed child queries
must be NAMES in failed_queries, never null values in the timing maps
(downstream consumers divide those values), and every artifact must
carry the fixed control-query timings so cross-round per-query ratios
can be normalized by host drift without a manual A/B.

Pure-Python tests — no Spark session.
"""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


bench = _load(os.path.join(REPO, "bench.py"), "bench_contract_mod")
bench_diff = _load(
    os.path.join(REPO, "scripts", "bench_diff.py"), "bench_diff_mod"
)


def test_controls_are_headline_queries():
    assert set(bench.CONTROL_QUERIES) <= set(bench.HEADLINE)
    # and bench_diff's fallback stays in sync with bench.py's list
    assert tuple(bench_diff.CONTROL_FALLBACK) == tuple(bench.CONTROL_QUERIES)


def test_payload_omits_failed_and_extracts_controls():
    timings = {
        "q1_pricing_summary": 1.5,
        "q3_shipping_priority": 2.0,
        "running_total_per_customer": 0.5,
        "dedup_exact": 3.0,
    }
    warm = {"q1_pricing_summary": 1.0}
    out = bench._payload(
        "headline_queries_total", timings, warm, {"crashed_q"}, [], 0.1
    )
    assert out["failed_queries"] == ["crashed_q"]
    assert "crashed_q" not in out["queries"]
    assert None not in out["queries"].values()
    assert out["controls"] == {
        "q1_pricing_summary": 1.5,
        "q3_shipping_priority": 2.0,
        "running_total_per_customer": 0.5,
    }
    assert out["value"] == 7.0
    assert out["queries_warm"] == warm and out["warm_total"] == 1.0
    # fresh-mode shape: no warm keys when the warm map is empty
    fresh = bench._payload("headline_queries_total_fresh", timings, {}, set(), [], 1.0)
    assert "queries_warm" not in fresh and "warm_total" not in fresh


def test_control_drift_normalizes_ratios():
    old = {
        "queries": {"q1_pricing_summary": 1.0, "q3_shipping_priority": 1.0,
                    "running_total_per_customer": 1.0, "x": 2.0},
        "controls": {"q1_pricing_summary": 1.0, "q3_shipping_priority": 1.0,
                     "running_total_per_customer": 1.0},
    }
    # host got uniformly 1.2x slower; query x moved with the host
    new = {
        "queries": {"q1_pricing_summary": 1.2, "q3_shipping_priority": 1.2,
                    "running_total_per_customer": 1.2, "x": 2.4},
        "controls": {"q1_pricing_summary": 1.2, "q3_shipping_priority": 1.2,
                     "running_total_per_customer": 1.2},
    }
    drift = bench_diff.control_drift(old, new)
    assert abs(drift - 1.2) < 1e-9
    # normalized ratio for x is 1.0 — host drift, not a code regression
    assert abs((new["queries"]["x"] / old["queries"]["x"]) / drift - 1.0) < 1e-9


def test_salvage_recovers_key_visible_segments_only():
    # driver wrappers tail-window stdout; a window that still shows the
    # map KEYS is recoverable, one that opens mid-map is ambiguous
    # (could be cold or warm) and must salvage nothing
    full_line = (
        '{"metric": "headline_queries_total", "value": 3.0, "unit": "sec", '
        '"queries": {"a": 1.0, "b": 2.0}, "failed_queries": [], '
        '"controls": {"a": 1.0}, "sf": 0.1, "warm_total": 1.5, '
        '"queries_warm": {"a": 0.7, "b": 0.8}}'
    )
    got = bench_diff._salvage(full_line)
    assert got["queries"] == {"a": 1.0, "b": 2.0}
    assert got["queries_warm"] == {"a": 0.7, "b": 0.8}
    assert got["controls"] == {"a": 1.0}
    ambiguous = '9, "x": 0.5, "y": 0.6}, "fresh_queries": [], "sf": 0.1}'
    assert bench_diff._salvage(ambiguous) is None
    # wrapper-level: tail with visible keys loads; controls fall back to
    # the compact summary line when the big line lost them
    wrapper = {"parsed": {"metric": "m", "controls": {"a": 9.0}},
               "tail": full_line.replace('"controls": {"a": 1.0}, ', "")}
    got = bench_diff._from_obj(wrapper)
    assert got["queries"] == {"a": 1.0, "b": 2.0}
    assert got["controls"] == {"a": 9.0}


def test_control_drift_falls_back_to_queries_and_handles_absence():
    old = {"queries": {"q1_pricing_summary": 2.0,
                       "q3_shipping_priority": 2.0}}
    new = {"queries": {"q1_pricing_summary": 1.0,
                       "q3_shipping_priority": 1.0}}
    assert abs(bench_diff.control_drift(old, new) - 0.5) < 1e-9
    # fewer than two shared controls -> None (no normalization)
    assert bench_diff.control_drift({"queries": {}}, new) is None
    # degenerate control values (0.0, null) are excluded SYMMETRICALLY —
    # a 0.0 on either side must not deflate the drift sum
    old_z = {"controls": {"q1_pricing_summary": 2.0,
                          "q3_shipping_priority": 0.0,
                          "running_total_per_customer": 2.0}}
    new_z = {"controls": {"q1_pricing_summary": 1.0,
                          "q3_shipping_priority": 1.0,
                          "running_total_per_customer": None}}
    # only q1 is usable on both sides -> under the 2-control minimum
    assert bench_diff.control_drift(old_z, new_z) is None


def test_fast_suite_names_resolve():
    # every fast_suite entry must match a real collected test — a stale
    # name after a rename silently shrinks the -m fast gate's coverage
    import ast

    names = set()
    tests_dir = os.path.join(REPO, "tests")
    for fn in os.listdir(tests_dir):
        if fn.startswith("test_") and fn.endswith(".py"):
            tree = ast.parse(open(os.path.join(tests_dir, fn)).read())
            names |= {
                n.name
                for n in ast.walk(tree)
                if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
                and n.name.startswith("test_")
            }
    fast = _load(os.path.join(REPO, "tests", "fast_suite.py"), "fast_suite_mod")
    stale = fast.FAST_TESTS - names
    assert not stale, f"fast_suite entries match no test: {sorted(stale)}"
