"""Property-based tests — beyond the reference's own test strategy
(SURVEY §5 notes it has no property/randomized tests).

Pure-Python layers get hypothesis directly; Spark expressions get batched
property checks (one DataFrame of generated cases per property — driving a
Spark job per hypothesis example would be pathologically slow)."""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from megalista_spark.functions.hashing import normalize_email
from megalista_spark.models.execution import filter_text_only_numbers
from megalista_spark.operators.dedup import MINHASH_P, minhash_params
from megalista_spark.sinks.payloads import format_date, ga_data_import_csv, parse_timestamp


@given(st.integers(min_value=1, max_value=128))
def test_minhash_params_bounds(k):
    for a, b in minhash_params(k):
        assert 0 < a < 2**30 and a % 2 == 1  # odd multiplier, no int64 overflow
        assert 0 <= b < 2**30
    # distinct parameter pairs → distinct hash functions
    assert len(set(minhash_params(k))) == k
    # worst case product fits int64 exactly
    assert (2**32 - 1) * (2**30 - 1) + 2**30 < 2**63


@given(st.text(alphabet=string.printable, max_size=40))
def test_filter_text_only_numbers_only_digits(s):
    out = filter_text_only_numbers(s)
    assert out == "".join(c for c in s if c.isdigit())


@given(
    st.datetimes(
        min_value=__import__("datetime").datetime(1980, 1, 1),
        max_value=__import__("datetime").datetime(2035, 1, 1),
    )
)
@settings(max_examples=50)
def test_format_date_shape_and_parse(dt):
    s = format_date(dt.strftime("%Y-%m-%dT%H:%M:%S.%f"))
    # 'YYYY-MM-DD HH:MM:SS±HH:MM'
    assert len(s) == 25 and s[10] == " " and s[19] in "+-" and s[22] == ":"
    assert s[:19] == dt.strftime("%Y-%m-%d %H:%M:%S")


@given(
    st.lists(
        st.dictionaries(
            st.sampled_from(["cd1", "cd2", "cd3"]),
            st.one_of(st.none(), st.text(alphabet="abc123", max_size=5)),
            min_size=1,
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=50)
def test_ga_data_import_csv_shape(rows):
    # normalize: all rows share the first row's keys (uploader contract)
    keys = list(rows[0].keys())
    rows = [{k: r.get(k) for k in keys} for r in rows]
    out = ga_data_import_csv(rows)
    lines = out.split("\n")
    assert lines[0] == ",".join(f"ga:{k}" for k in keys)
    assert len(lines) == len(rows) + 1
    for line in lines[1:]:
        assert len(line.split(",")) == len(keys)


def test_parse_timestamp_accepts_reference_formats():
    for s in ("2020-04-09T14:13:55.0005", "2020-04-09T14:13:55", "2020-04-09 14:13:55"):
        assert parse_timestamp(s).year == 2020


def _random_emails(n=300, seed=7):
    import random

    rnd = random.Random(seed)
    locals_ = ["john", "a.b", "x..y", "ca.us", "A.B.C", "", "no-at", "ümlaut.ö"]
    domains = ["gmail.com", "GOOGLEMAIL.COM", "doe.com", "sub.gmail.com", ""]
    out = []
    for _ in range(n):
        if rnd.random() < 0.1:
            out.append(rnd.choice(["not-an-email", "", "@", "a@b@c", "  spaced  "]))
        else:
            out.append(f"{rnd.choice(locals_)}@{rnd.choice(domains)}")
    return out


def test_normalize_email_idempotent_batch(spark):
    """normalize(normalize(x)) == normalize(x) over a generated corpus —
    run as ONE Spark job."""
    emails = _random_emails()
    df = spark.createDataFrame([(e,) for e in emails], ["e"])
    once = normalize_email(F.col("e"))
    out = df.select(
        once.alias("n1"), normalize_email(once).alias("n2")
    ).collect()
    for r in out:
        assert r["n1"] == r["n2"]


def test_normalize_email_preserves_domain_batch(spark):
    emails = [e for e in _random_emails() if e.count("@") == 1 and e.split("@")[1]]
    df = spark.createDataFrame([(e,) for e in emails], ["e"])
    out = df.select("e", normalize_email(F.col("e")).alias("n")).collect()
    for r in out:
        assert r["n"].split("@")[1] == r["e"].strip().lower().split("@")[1]


def test_ordered_pairs_property_batch(spark):
    # one Spark job over many generated arrays: _ordered_pairs on a sorted
    # array of n distinct ids must yield exactly C(n,2) pairs, all (a < b)
    from megalista_spark.operators.dedup import _ordered_pairs

    import random

    rnd = random.Random(7)
    rows = []
    for i in range(60):
        n = rnd.randint(2, 12)
        ids = sorted(rnd.sample(range(1000), n))
        rows.append((i, ids))
    df = spark.createDataFrame(rows, "case_id int, ids array<int>")
    out = df.select(
        "case_id",
        F.size("ids").alias("n"),
        F.explode(_ordered_pairs(F.col("ids"))).alias("p"),
    )
    bad = out.where(F.col("p.a") >= F.col("p.b")).count()
    assert bad == 0
    counts = {
        r["case_id"]: r["cnt"]
        for r in out.groupBy("case_id", "n").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    expect = {r["case_id"]: r["n"] * (r["n"] - 1) // 2 for r in df.select("case_id", F.size("ids").alias("n")).collect()}
    assert counts == expect


def test_range_join_matches_naive_random_batch(spark):
    # randomized intervals/points, binned form vs naive BETWEEN join
    from megalista_spark.operators.rangejoin import range_join_binned

    import random

    rnd = random.Random(13)
    base = 1_700_000_000
    pts = [(i, base + rnd.randint(0, 50_000)) for i in range(300)]
    ivs = []
    for j in range(80):
        s = base + rnd.randint(0, 50_000)
        ivs.append((j, s, s + rnd.randint(0, 5_000)))
    pdf = spark.createDataFrame(pts, "pid int, t long").select(
        "pid", F.timestamp_seconds("t").alias("ts")
    )
    idf = spark.createDataFrame(ivs, "iid int, s long, e long").select(
        "iid", F.timestamp_seconds("s").alias("st"), F.timestamp_seconds("e").alias("en")
    )
    binned = {
        (r["pid"], r["iid"])
        for r in range_join_binned(pdf, idf, "ts", "st", "en", bin_seconds=700).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in pdf.join(idf, (F.col("ts") >= F.col("st")) & (F.col("ts") <= F.col("en"))).collect()
    }
    assert binned == naive and len(naive) > 0


def test_hash_sample_rate_convergence_batch(spark):
    # deterministic hash sampling should land near the nominal rate and be
    # EXACTLY stable across runs (no RNG involved)
    from megalista_spark.operators.sampling import hash_sample

    df = spark.range(20_000).withColumnRenamed("id", "k")
    n1 = hash_sample(df, 0.3, "k").count()
    n2 = hash_sample(df, 0.3, "k").count()
    assert n1 == n2
    assert abs(n1 / 20_000 - 0.3) < 0.02


def test_triangle_count_matches_bruteforce_random_batch(spark):
    # random G(n, p) graphs: degree-oriented count == itertools brute force
    import itertools
    import random

    from megalista_spark.operators.graph import triangle_count

    rnd = random.Random(7)
    for trial in range(3):
        n = 14
        edges = [
            (a, b)
            for a, b in itertools.combinations(range(n), 2)
            if rnd.random() < 0.35
        ]
        adj = set(edges)
        expected = sum(
            1
            for a, b, c in itertools.combinations(range(n), 3)
            if (a, b) in adj and (b, c) in adj and (a, c) in adj
        )
        df = spark.createDataFrame(edges or [(0, 1)], ["src", "dst"])
        got = triangle_count(df).first()["triangle_count"]
        assert got == (expected if edges else 0), f"trial {trial}"


def test_edit_distance_pairs_matches_bruteforce_batch(spark):
    # random short strings: blocking+verify == all-pairs levenshtein<=1
    import itertools
    import random

    from megalista_spark.operators.dedup import edit_distance_pairs

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rnd = random.Random(11)
    words = ["".join(rnd.choice("abc") for _ in range(rnd.randint(1, 5))) for _ in range(40)]
    df = spark.createDataFrame(list(enumerate(words)), ["id", "s"])
    got = {
        (r["id_a"], r["id_b"])
        for r in edit_distance_pairs(df, "s", "id").collect()
    }
    expected = {
        (i, j)
        for (i, wa), (j, wb) in itertools.combinations(enumerate(words), 2)
        if lev(wa, wb) <= 1
    }
    assert got == expected


def test_binned_quantiles_error_bound_batch(spark):
    # estimate must sit within one bin width above the true quantile
    from megalista_spark.operators.sketches import binned_quantiles

    vals = [float(v) for v in range(0, 10_000, 3)]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    out = {r["q"]: r["est"] for r in binned_quantiles(df, "x", qs=(0.5, 0.9)).collect()}
    lo, hi = min(vals), max(vals)
    width = (hi - lo) / 1024
    svals = sorted(vals)
    for q, est in out.items():
        import math

        true = svals[math.ceil(q * len(svals)) - 1]
        assert true <= est <= true + 2 * width


def test_bloom_random_multiset_probes_no_false_negatives_batch(spark):
    # regression family for the duplicate-probe false-negative bug: probe
    # with random MULTISETS (heavy duplication) — every member must pass
    import random

    from megalista_spark.operators.sketches import bloom_build, bloom_might_contain

    rng = random.Random(11)
    members = sorted(rng.sample(range(100000), 300))
    probes = [rng.choice(members) for _ in range(900)]  # ~3x duplication
    probes += [rng.randrange(200000, 300000) for _ in range(200)]  # non-members
    words = bloom_build(spark.createDataFrame([(m,) for m in members], ["k"]), "k")
    kept = {
        r.key
        for r in bloom_might_contain(
            spark.createDataFrame([(p,) for p in probes], ["k"]), "k", words
        ).collect()
    }
    assert set(probes) & set(members) <= kept  # no false negatives, ever


def test_table_diff_separator_in_values_batch(spark):
    # regression: a value containing the old join separator (0x1f) used
    # to shift column boundaries and alias two different rows
    from megalista_spark.operators.cdc import table_diff

    left = spark.createDataFrame([(1, "a\x1fvb", "c"), (2, "x", "y")], ["k", "p", "q"])
    right = spark.createDataFrame([(1, "a", "b\x1fvc"), (2, "x", "y")], ["k", "p", "q"])
    got = {r.k: r.verdict for r in table_diff(left, right, ["k"]).collect()}
    assert got == {1: "changed"}  # row 2 identical -> dropped


def test_ivfpq_trained_codebooks_deterministic_batch(spark, sf_dir):
    # exact integer training -> two runs must be bit-identical
    from megalista_spark.operators.similarity import ivfpq_train_codebooks

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = sorted(map(tuple, ivfpq_train_codebooks(emb, iters=2).collect()))
    b = sorted(map(tuple, ivfpq_train_codebooks(emb, iters=2).collect()))
    assert a == b
    assert len(a) == 8 * 16  # M x K codewords, empty ones kept


def test_inverted_index_matches_naive_batch(spark):
    # the bounded-state form must produce exactly the naive semantics:
    # df = all docs containing the term, postings = first max_postings
    # docs in id order as "doc:tf"
    import random
    from collections import defaultdict

    from megalista_spark.operators.text import inverted_index

    rng = random.Random(23)
    vocab = [f"t{i}" for i in range(12)]  # small vocab -> hot terms
    docs = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 30))))
        for d in range(40)
    ]
    got = {
        r.term: (r.df, r.postings)
        for r in inverted_index(
            spark.createDataFrame(docs, ["doc_id", "text"]), max_postings=3
        ).collect()
    }
    naive = defaultdict(dict)
    for d, text in docs:
        for tok in text.split():
            naive[tok][d] = naive[tok].get(d, 0) + 1
    for term, by_doc in naive.items():
        first = sorted(by_doc)[:3]
        want = ",".join(f"{d}:{by_doc[d]}" for d in first)
        assert got[term] == (len(by_doc), want)
    assert set(got) == set(naive)


def test_budget_fill_prefix_properties_batch(spark):
    """budget_fill must keep EXACTLY the rows whose running total (in the
    declared order) stays within budget — verified against a driver-side
    recomputation on random data — and a larger budget must keep a
    superset of a smaller one (monotonicity)."""
    import random

    from megalista_spark.operators.sampling import budget_fill

    rng = random.Random(7)
    rows = [
        (f"g{rng.randrange(6)}", i, rng.randrange(1, 50), rng.randrange(100))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["grp", "doc_id", "w", "q"])

    def naive(budget):
        by_group: dict[str, list] = {}
        for g, i, w, q in rows:
            by_group.setdefault(g, []).append((q, i, w))
        kept = set()
        for g, members in by_group.items():
            members.sort(key=lambda t: (-t[0], t[1]))  # q desc, id asc
            cum = 0
            for q, i, w in members:
                cum += w
                if cum > budget:
                    break
                kept.add(i)
        return kept

    kept_small = {
        r["doc_id"]
        for r in budget_fill(
            df, group_col="grp", weight_col="w", budget=120, order_col="q"
        ).collect()
    }
    kept_big = {
        r["doc_id"]
        for r in budget_fill(
            df, group_col="grp", weight_col="w", budget=400, order_col="q"
        ).collect()
    }
    assert kept_small == naive(120)
    assert kept_big == naive(400)
    assert kept_small <= kept_big  # budget monotonicity


def _bpe_reference(word_counts: dict[str, int], merges: int):
    """Reference BPE trainer (driver-side, Sennrich algorithm) with the
    operator's deterministic (count desc, pair asc) tiebreak."""
    seqs = {w: [*w, "</w>"] for w in word_counts}
    out = []
    for step in range(1, merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in seqs.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + word_counts[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        out.append((step, l, r, l + r, c))
        for w, syms in seqs.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            seqs[w] = merged
    return out, seqs


def test_bpe_matches_reference_on_random_corpora(spark):
    """The relational gaps-and-islands merge application must equal the
    sequential greedy reference for arbitrary corpora — including
    overlap-heavy repeated-letter words."""
    import random

    from megalista_spark.operators.text import bpe_train_merges

    rng = random.Random(11)
    alphabet = "abc"
    for trial in range(4):
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            for _ in range(30)
        ]
        text = " ".join(words)
        wc: dict[str, int] = {}
        for w in words:
            wc[w] = wc.get(w, 0) + 1
        expect, _ = _bpe_reference(wc, merges=4)
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        got = [
            (r["step"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
            for r in bpe_train_merges(df, merges=4).collect()
        ]
        assert got == expect, f"trial {trial}: {got} != {expect}"


def test_bpe_encode_matches_reference_final_state(spark):
    """bpe_encode_token_stats must equal the sequential reference's final
    symbol state aggregated to weighted token frequencies — encoding is
    the training kernel's end state, so any divergence here means the
    relational merge application drifted from greedy BPE."""
    import random

    from megalista_spark.operators.text import bpe_encode_token_stats

    rng = random.Random(23)
    for trial in range(3):
        words = [
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 5)))
            for _ in range(40)
        ]
        text = " ".join(words)
        wc: dict[str, int] = {}
        for w in words:
            wc[w] = wc.get(w, 0) + 1
        _, seqs = _bpe_reference(wc, merges=3)
        tf: dict[str, int] = {}
        for w, syms in seqs.items():
            for s in syms:
                tf[s] = tf.get(s, 0) + wc[w]
        expect = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
        expect = [
            (i + 1, tok, n) for i, (tok, n) in enumerate(expect)
        ]
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        got = [
            (r["rank"], r["token"], r["tf"])
            for r in bpe_encode_token_stats(df, merges=3, top=len(expect)).collect()
        ]
        assert got == expect, f"trial {trial}: {got} != {expect}"


def test_doc_lm_surprisal_matches_bruteforce(spark):
    """Integer-ppm bigram surprisal must equal a per-doc brute-force
    recomputation for random corpora (probabilities from bigram-prefix
    counts, floor division at both stages)."""
    import random
    import re

    from megalista_spark.operators.text import doc_lm_surprisal

    rng = random.Random(7)
    vocab = ["aa", "bb", "cc", "dd"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 9))))
        for i in range(25)
    ]
    c12: dict[tuple[str, str], int] = {}
    per_doc: dict[int, list[tuple[str, str]]] = {}
    for i, text in docs:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        bgs = list(zip(toks, toks[1:]))
        per_doc[i] = bgs
        for p in bgs:
            c12[p] = c12.get(p, 0) + 1
    c1: dict[str, int] = {}
    for (w1, _), n in c12.items():
        c1[w1] = c1.get(w1, 0) + n
    scores = []
    for i, bgs in per_doc.items():
        if not bgs:
            continue
        ppms = [(1_000_000 * c12[p]) // c1[p[0]] for p in bgs]
        scores.append((sum(ppms) // len(ppms), i, len(bgs)))
    scores.sort()
    expect = [(i, n, avg) for avg, i, n in scores[:10]]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = [
        (r["doc_id"], r["n_bigrams"], r["avg_prob_ppm"])
        for r in doc_lm_surprisal(df, k=10).collect()
    ]
    assert got == expect


def test_windowed_funnel_matches_bruteforce(spark):
    """The greedy-earliest chain must find exactly the users a full
    chain-enumeration finds, at every level, for random event streams."""
    import datetime as dt
    import itertools
    import random

    from megalista_spark.operators.sessions import windowed_funnel

    rng = random.Random(23)
    steps = ["s1", "s2", "s3"]
    window = 15

    def brute_levels(events):
        # events: list of (user, sec, type); returns {level: set(users)}
        by_user: dict[int, list[tuple[int, str]]] = {}
        for u, t, et in events:
            by_user.setdefault(u, []).append((t, et))
        reach = {1: set(), 2: set(), 3: set()}
        for u, evs in by_user.items():
            for lvl in (1, 2, 3):
                found = False
                for chain in itertools.combinations(sorted(evs), lvl):
                    if [c[1] for c in chain] != steps[:lvl]:
                        continue
                    ts = [c[0] for c in chain]
                    if all(ts[i] < ts[i + 1] for i in range(lvl - 1)) and (
                        ts[-1] <= ts[0] + window
                    ):
                        found = True
                        break
                if found:
                    reach[lvl].add(u)
        return reach

    for trial in range(3):
        events = [
            (rng.randint(1, 6), rng.randint(0, 60), rng.choice(steps))
            for _ in range(60)
        ]
        expect = brute_levels(events)
        base = dt.datetime(2024, 1, 1)
        rows = [
            (u, base + dt.timedelta(seconds=t), et) for u, t, et in events
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
        got = {r["level"]: r["n_users"] for r in
               windowed_funnel(df, steps, window).collect()}
        assert got == {1: len(expect[1]), 2: len(expect[2]), 3: len(expect[3])}, (
            f"trial {trial}: {got} vs {expect}"
        )
