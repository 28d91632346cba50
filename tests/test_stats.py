"""Brute-force verification of the round-7 audit statistics
(operators/stats.py, operators/profiling.py additions): chi-squared
independence, empirical-Bayes shrinkage, winsorized group stats,
join-skew audit, Benford first-digit audit.
"""

from __future__ import annotations

from collections import Counter

from megalista_spark.operators.profiling import benford_audit, join_skew_audit
from megalista_spark.operators.stats import (
    chi2_independence,
    shrunk_rates,
    winsorized_stats,
)

ROWS = [
    ("A", "x"), ("A", "x"), ("A", "y"), ("B", "x"), ("B", "y"),
    ("B", "y"), ("B", "y"), ("C", "x"), ("C", "x"), ("C", "y"),
]


def test_chi2_matches_brute_force(spark):
    df = spark.createDataFrame(ROWS, ["a", "b"])
    got = chi2_independence(df, "a", "b").collect()[0]

    n = len(ROWS)
    cells = Counter(ROWS)
    rows = Counter(a for a, _ in ROWS)
    cols = Counter(b for _, b in ROWS)
    expected = sum(
        (1_000_000 * (o * n - rows[a] * cols[b]) ** 2) // (n * rows[a] * cols[b])
        for (a, b), o in cells.items()
    )
    assert got["chi2_ppm"] == expected
    assert got["dof"] == (3 - 1) * (2 - 1)
    assert got["n_rows"] == n


def test_chi2_independent_columns_score_near_zero(spark):
    # perfectly proportional table → every o·N == rs·cs → chi2 exactly 0
    rows = [(a, b) for a in "AB" for b in "xy" for _ in range(5)]
    df = spark.createDataFrame(rows, ["a", "b"])
    assert chi2_independence(df, "a", "b").collect()[0]["chi2_ppm"] == 0


def test_shrunk_rates_pull_small_groups_toward_global(spark):
    # big group: 100 obs at 50%; tiny group: 1 obs at 100%
    rows = [("big", i % 2) for i in range(100)] + [("tiny", 1)]
    df = spark.createDataFrame(rows, ["g", "s"])
    out = {r["g"]: r for r in shrunk_rates(df, ["g"], "s", prior_strength=10).collect()}

    global_ppm = 1_000_000 * 51 // 101
    assert out["big"]["global_ppm"] == global_ppm
    assert out["tiny"]["raw_ppm"] == 1_000_000
    expected_tiny = (1_000_000 * 1 + 10 * global_ppm) // (1 + 10)
    assert out["tiny"]["shrunk_ppm"] == expected_tiny
    # shrinkage moved tiny toward global, big barely moved
    assert abs(out["tiny"]["shrunk_ppm"] - global_ppm) < abs(1_000_000 - global_ppm)
    assert abs(out["big"]["shrunk_ppm"] - out["big"]["raw_ppm"]) < 5_000


def test_winsorized_stats_clip_tails(spark):
    import math

    vals = list(range(1, 101))  # 1..100, one group
    df = spark.createDataFrame([("g", float(v)) for v in vals], ["grp", "v"])
    out = winsorized_stats(df, "grp", "v", lo_pct=5, hi_pct=95).collect()[0]

    cents = sorted(v * 100 for v in vals)
    lo = cents[max(1, math.ceil(5 * 100 / 100)) - 1]
    hi = cents[max(1, math.ceil(95 * 100 / 100)) - 1]
    clipped = [min(max(c, lo), hi) for c in cents]
    assert out["lo_cents"] == lo and out["hi_cents"] == hi
    assert out["n_values"] == 100
    assert out["winsorized_mean_cents"] == sum(clipped) // 100


def test_winsorized_outlier_resistance(spark):
    base = [("g", 10.0)] * 98 + [("g", 1e6), ("g", -1e6)]
    out = winsorized_stats(spark.createDataFrame(base, ["grp", "v"]), "grp", "v").collect()[0]
    assert out["winsorized_mean_cents"] == 1000  # outliers clipped to 10.00

def test_join_skew_audit_brute_force(spark):
    # key 1 appears 8 times, keys 2..9 once each: max=8, keys=9, rows=16
    rows = [(1,)] * 8 + [(k,) for k in range(2, 10)]
    out = join_skew_audit(spark.createDataFrame(rows, ["k"]), "k").collect()[0]
    assert out["n_rows"] == 16 and out["n_keys"] == 9 and out["max_freq"] == 8
    # freq histogram: 1×8, 8×1 → p50 over keys = 1, p99 = 8
    assert out["p50_freq"] == 1 and out["p99_freq"] == 8
    assert out["top_key"] == "1"
    assert out["skew_ratio_ppm"] == 1_000_000 * 8 * 9 // 16
    assert not out["recommend_salting"]  # 4.5× < 10× threshold


def test_join_skew_audit_flags_heavy_key(spark):
    rows = [(1,)] * 1000 + [(k,) for k in range(2, 52)]
    out = join_skew_audit(spark.createDataFrame(rows, ["k"]), "k").collect()[0]
    assert out["recommend_salting"]


def test_benford_audit_brute_force(spark):
    # 30 values starting with digit 1, 10 with digit 2, 10 with digit 9
    vals = [1.23] * 30 + [2.5] * 10 + [9.99] * 10
    out = {r["digit"]: r for r in benford_audit(
        spark.createDataFrame([(v,) for v in vals], ["v"]), "v"
    ).collect()}
    assert set(out) == {1, 2, 9}
    assert out[1]["n"] == 30 and out[1]["obs_ppm"] == 1_000_000 * 30 // 50
    assert out[1]["expected_ppm"] == 301030
    assert out[1]["abs_dev_ppm"] == abs(1_000_000 * 30 // 50 - 301030)
    assert out[9]["expected_ppm"] == 45757
    # zero and NULL are dropped
    vals2 = [(0.0,), (None,), (1.0,)]
    out2 = benford_audit(
        spark.createDataFrame(vals2, "v double"), "v"
    ).collect()
    assert len(out2) == 1 and out2[0]["n"] == 1


def test_stratified_kfold_exact_balance(spark):
    from megalista_spark.operators.sampling import stratified_kfold

    rows = [(f"d{i}", "en" if i < 17 else "de") for i in range(30)]
    df = spark.createDataFrame(rows, ["id", "lang"])
    out = stratified_kfold(df, "lang", "id", k=5).collect()
    assert len(out) == 30 and all(1 <= r["fold"] <= 5 for r in out)
    from collections import Counter

    per = Counter((r["lang"], r["fold"]) for r in out)
    # exact ±1 balance inside each stratum: en 17 → {4,4,3,3,3}, de 13 → {3,3,3,2,2}
    assert sorted((per[("en", f)] for f in range(1, 6)), reverse=True) == [4, 4, 3, 3, 3]
    assert sorted((per[("de", f)] for f in range(1, 6)), reverse=True) == [3, 3, 3, 2, 2]
    # deterministic: same input → identical assignment
    again = stratified_kfold(df, "lang", "id", k=5).collect()
    assert {(r["id"], r["fold"]) for r in again} == {(r["id"], r["fold"]) for r in out}
    # hash mode: balanced in expectation, no window
    loose = stratified_kfold(df, "lang", "id", k=5, exact=False)
    assert "Window" not in loose._jdf.queryExecution().optimizedPlan().toString()


def test_retention_triangle_brute_force(spark):
    from datetime import datetime

    from megalista_spark.operators.survival import retention_triangle

    # cohort A (week of 2025-01-06): u1 active wk0+wk1, u2 wk0 only
    # cohort B (week of 2025-01-13): u3 active wk0+wk2
    rows = [
        (1, datetime(2025, 1, 7)), (1, datetime(2025, 1, 14)),
        (2, datetime(2025, 1, 8)),
        (3, datetime(2025, 1, 15)), (3, datetime(2025, 1, 29)),
        (1, datetime(2025, 1, 7, 12)),  # same week dup → counted once
    ]
    df = spark.createDataFrame(rows, ["u", "ts"])
    out = {(str(r["cohort"]), r["offset"]): r for r in retention_triangle(df, "u", "ts").collect()}
    a, b = "2025-01-06 00:00:00", "2025-01-13 00:00:00"
    assert out[(a, 0)]["cohort_size"] == 2 and out[(a, 0)]["active_users"] == 2
    assert out[(a, 0)]["retention_ppm"] == 1_000_000
    assert out[(a, 1)]["active_users"] == 1 and out[(a, 1)]["retention_ppm"] == 500_000
    assert out[(b, 0)]["active_users"] == 1
    assert out[(b, 2)]["active_users"] == 1 and (b, 1) not in out


def test_quantile_bins_equal_frequency(spark):
    from megalista_spark.operators.sketches import quantile_bins

    df = spark.createDataFrame([(float(v),) for v in range(1, 101)], ["v"])
    out = quantile_bins(df, "v", n_bins=10).collect()
    assert [r["bin"] for r in out] == list(range(1, 11))
    assert all(r["n_values"] == 10 for r in out)
    # boundaries at exact decile order statistics: bin1 = (−∞, 10]
    assert out[0]["lo_cents"] == 100 and out[0]["hi_cents"] == 1000
    assert out[9]["lo_cents"] == 9100 and out[9]["hi_cents"] == 10000


def test_quantile_bins_degenerate_duplicates(spark):
    from megalista_spark.operators.sketches import quantile_bins

    # one value spans all deciles → a single bin holds everything
    df = spark.createDataFrame([(5.0,)] * 50, ["v"])
    out = quantile_bins(df, "v", n_bins=10).collect()
    assert len(out) == 1 and out[0]["n_values"] == 50


def test_chi2_null_categories_participate(spark):
    # NULL is a legitimate level: its cells must contribute terms and its
    # level must count toward dof (review finding: plain equi-joins
    # dropped NULL cells while N/marginals still counted their rows)
    rows = [("A", "x"), ("A", "y"), (None, "x"), (None, "x"), (None, "y"), ("A", "x")]
    df = spark.createDataFrame(rows, "a string, b string")
    got = chi2_independence(df, "a", "b").collect()[0]

    n = len(rows)
    cells = Counter(rows)
    rmarg = Counter(a for a, _ in rows)
    cmarg = Counter(b for _, b in rows)
    expected = sum(
        (1_000_000 * (o * n - rmarg[a] * cmarg[b]) ** 2) // (n * rmarg[a] * cmarg[b])
        for (a, b), o in cells.items()
    )
    assert got["chi2_ppm"] == expected
    assert got["dof"] == (2 - 1) * (2 - 1)  # levels {A, NULL} × {x, y}
    assert got["n_rows"] == n


def test_winsorized_null_group_kept(spark):
    from megalista_spark.operators.stats import winsorized_stats as _w

    rows = [("a", 1.0), ("a", 2.0), (None, 5.0), (None, 7.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = {r["grp"]: r for r in _w(df, "grp", "v").collect()}
    assert None in out and out[None]["n_values"] == 2
    assert out[None]["winsorized_mean_cents"] == (500 + 700) // 2


def test_keyless_guard_zero_threshold_refuses(spark):
    # review finding: `max_global_rows or DEFAULT` swallowed an explicit 0
    import pytest as _pytest

    from megalista_spark.operators.survival import kaplan_meier

    df = spark.createDataFrame([(1, 1), (2, 0)], ["d", "e"])
    with _pytest.raises(ValueError, match="single task"):
        kaplan_meier(df, "d", "e", max_global_rows=0)


def test_simhash_candidate_volume_guard(spark):
    # templated near-identical docs cluster into one hot band bucket;
    # the advisory tier warns by default and refuses only on opt-in
    import pytest as _pytest

    from megalista_spark.operators.dedup import simhash_near_pairs

    docs = spark.createDataFrame(
        [(i, "the same tokens every time " * 3) for i in range(60)],
        ["doc_id", "text"],
    )
    with _pytest.raises(ValueError, match="candidate pairs"):
        simhash_near_pairs(docs, max_candidate_pairs=1000, on_excess="raise").count()
    # default tier: warns, routes hot buckets through the spillable
    # self-join, and COMPLETES past the advisory threshold — all 60
    # identical docs pair up: C(60,2) pairs at hamming 0
    got = simhash_near_pairs(docs, max_candidate_pairs=1000).count()
    assert got == 60 * 59 // 2
    assert simhash_near_pairs(docs, max_candidate_pairs=100_000).count() == got


def test_simhash_hot_bucket_join_path_matches_array_path(spark):
    # the same corpus through array_bucket_max large (pure array path)
    # and tiny (pure join path) must yield identical pair sets
    from megalista_spark.operators.dedup import simhash_near_pairs

    rows = [(i, f"token{i % 7} alpha beta gamma delta common words {i % 3}") for i in range(80)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    arr = simhash_near_pairs(docs, array_bucket_max=10_000)
    jn = simhash_near_pairs(docs, array_bucket_max=1)
    a = sorted(map(tuple, arr.collect()))
    j = sorted(map(tuple, jn.collect()))
    assert a == j and len(a) > 0


def test_simhash_max_bucket_size_caps_with_dedup(spark):
    from megalista_spark.operators.dedup import simhash_near_pairs

    docs = spark.createDataFrame(
        [(i, "the same tokens every time " * 3) for i in range(30)],
        ["doc_id", "text"],
    )
    capped = simhash_near_pairs(docs, max_bucket_size=10)
    rows = capped.collect()
    # only the 10 lowest-id members per bucket may pair, and the capped
    # mode's distinct() must not emit duplicates across agreeing bands
    assert len(rows) == 10 * 9 // 2
    assert len({(r.doc_a, r.doc_b) for r in rows}) == len(rows)
    assert all(r.doc_a < 10 and r.doc_b < 10 for r in rows)


def test_rrf_fuse_brute_force(spark):
    from megalista_spark.operators.similarity import rrf_fuse

    # retriever A ranks x,y; retriever B ranks y,z — y should fuse on top
    a = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 2)], ["query_id", "neighbor_id", "rank"]
    )
    b = spark.createDataFrame(
        [(1, "y", 1), (1, "z", 2)], ["query_id", "neighbor_id", "rank"]
    )
    out = {r["neighbor_id"]: r for r in rrf_fuse([a, b], k=60, topk=10).collect()}
    assert out["y"]["rrf_micro"] == 1_000_000 // 61 + 1_000_000 // 62
    assert out["y"]["n_lists"] == 2 and out["y"]["fused_rank"] == 1
    assert out["x"]["rrf_micro"] == 1_000_000 // 61 and out["x"]["n_lists"] == 1
    # x and z tie on score (rank1-only vs... x:61 z:62) — x ahead of z
    assert out["x"]["fused_rank"] == 2 and out["z"]["fused_rank"] == 3


def test_binary_auc_matches_brute_force(spark):
    from megalista_spark.operators.stats import binary_auc

    # scores with ties across labels
    rows = [
        (1.0, 0), (2.0, 0), (2.0, 1), (3.0, 1), (3.0, 0),
        (4.0, 1), (5.0, 0), (5.0, 1), (5.0, 1), (0.5, 0),
    ]
    df = spark.createDataFrame(rows, ["s", "y"])
    got = binary_auc(df, "s", "y", n_coarse=3).collect()[0]

    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    num2 = sum(
        2 if p > n_ else (1 if p == n_ else 0) for p in pos for n_ in neg
    )
    expected = 1_000_000 * num2 // (2 * len(pos) * len(neg))
    assert got["auc_ppm"] == expected
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)


def test_binary_auc_perfect_and_degenerate(spark):
    from megalista_spark.operators.stats import binary_auc

    perfect = spark.createDataFrame(
        [(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)], ["s", "y"]
    )
    assert binary_auc(perfect, "s", "y").collect()[0]["auc_ppm"] == 1_000_000
    onlypos = spark.createDataFrame([(1.0, 1), (2.0, 1)], ["s", "y"])
    assert binary_auc(onlypos, "s", "y").collect()[0]["auc_ppm"] is None


def test_binary_auc_bucketing_invariant(spark):
    # the two-level prefix sum must give the same answer for any n_coarse
    from megalista_spark.operators.stats import binary_auc

    rows = [(float(i % 17) + (i % 3) * 0.25, (i * 7) % 5 == 0) for i in range(200)]
    df = spark.createDataFrame([(s, int(y)) for s, y in rows], ["s", "y"])
    a = binary_auc(df, "s", "y", n_coarse=1).collect()[0]["auc_ppm"]
    b = binary_auc(df, "s", "y", n_coarse=7).collect()[0]["auc_ppm"]
    c = binary_auc(df, "s", "y", n_coarse=4096).collect()[0]["auc_ppm"]
    assert a == b == c


def test_gains_table_brute_force(spark):
    from megalista_spark.operators.stats import gains_table

    rows = [(float(i), int(i >= 15)) for i in range(20)]  # top quarter positive
    df = spark.createDataFrame(rows, ["s", "y"])
    out = {r["bin"]: r for r in gains_table(df, "s", "y", n_bins=4).collect()}
    # bins of 5; positives are 15..19 → all in the top bin
    assert out[4]["n_pos"] == 5 and out[4]["capture_ppm"] == 1_000_000
    assert out[4]["lift_ppm"] == 4_000_000  # 100% rate vs 25% global
    assert out[1]["n_pos"] == 0 and out[1]["capture_ppm"] == 1_000_000
    assert sum(r["n_pos"] for r in out.values()) == 5


def test_cuped_reduces_to_raw_when_covariate_useless(spark):
    from megalista_spark.operators.stats import cuped_lift

    # covariate constant → var_x = 0 → theta 0 → cuped == raw
    rows = [(i, "control" if i % 2 else "treatment", float(i), 5.0) for i in range(20)]
    df = spark.createDataFrame(rows, ["u", "arm", "y", "x"])
    got = cuped_lift(df, "u", "arm", "y", "x").collect()[0]
    assert got["theta"] == 0.0
    assert got["cuped_diff"] == got["raw_diff"]


def test_cuped_removes_covariate_explained_variance(spark):
    from megalista_spark.operators.stats import cuped_lift

    # y = x + 3·treated, with a small accidental covariate imbalance
    # between arms → the raw diff is contaminated by the imbalance;
    # CUPED must land (a) exactly on the brute-force formula and
    # (b) closer to the true effect 3.0 than the raw diff
    rows = []
    for i in range(50):
        rows.append((i, "control", float(i) + 10.0, float(i)))
        # treatment covariate drifted up by 2 (imbalance), true lift 3
        xt = float(i) + 2.0
        rows.append((i + 1000, "treatment", xt + 10.0 + 3.0, xt))
    df = spark.createDataFrame(rows, ["u", "arm", "y", "x"])
    got = cuped_lift(df, "u", "arm", "y", "x").collect()[0]

    xs = [r[3] for r in rows]
    ys = [r[2] for r in rows]
    n = len(rows)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    yc = [r[2] for r in rows if r[1] == "control"]
    yt = [r[2] for r in rows if r[1] == "treatment"]
    xc = [r[3] for r in rows if r[1] == "control"]
    xt_ = [r[3] for r in rows if r[1] == "treatment"]
    raw = sum(yt) / len(yt) - sum(yc) / len(yc)
    xd = sum(xt_) / len(xt_) - sum(xc) / len(xc)
    assert got["theta"] == round(theta, 6)
    assert got["raw_diff"] == round(raw, 6)
    assert got["cuped_diff"] == round(raw - theta * xd, 6)
    assert abs(got["cuped_diff"] - 3.0) < abs(got["raw_diff"] - 3.0)
    assert got["rho2"] > 0.9


def test_srm_check_bruteforce(spark):
    from megalista_spark.operators.stats import srm_check

    # 60/40 realized vs 50/50 designed
    rows = [("a",)] * 60 + [("b",)] * 40
    df = spark.createDataFrame(rows, ["arm"])
    out = {r["arm"]: r for r in
           srm_check(df, "arm", {"a": 500_000, "b": 500_000}).collect()}
    assert out["a"]["n_obs"] == 60 and out["b"]["n_obs"] == 40
    assert out["a"]["expected_n"] == 50 and out["b"]["expected_n"] == 50
    # chi2 = (10^2/50 + 10^2/50) = 4.0 -> 4_000_000 ppm
    assert out["a"]["chi2_ppm"] == 4_000_000
    assert out["a"]["chi2_ppm"] == out["b"]["chi2_ppm"]


def test_srm_check_missing_arm_is_reported(spark):
    from megalista_spark.operators.stats import srm_check

    df = spark.createDataFrame([("a",)] * 10, ["arm"])
    out = {r["arm"]: r for r in
           srm_check(df, "arm", {"a": 500_000, "b": 500_000}).collect()}
    assert out["b"]["n_obs"] == 0 and out["b"]["expected_n"] == 5
    assert out["b"]["chi2_ppm"] > 0
