"""Corpus-curation operators for training-data pipelines: benchmark
decontamination, repetition-based quality filters, PII redaction, and
chunking — the filtering stages that sit between raw ingest and dedup in
a pre-training data flow.

Design rules shared with the rest of the operator library:
- deterministic, engine-portable semantics (portable md5-derived hashes,
  exact arithmetic, regexes restricted to the RE2∩Java subset) so a SQL
  oracle reproduces every output bit-for-bit;
- no Python in the hot path — everything is Column expressions;
- shuffle discipline documented per operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import Column

from megalista_spark.operators.dedup import (
    _tokenized,
    portable_hash64,
    shingles_from_tokens,
)

# ------------------------------------------------------- decontamination


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag every training document that shares
    at least one word ``n``-gram with a benchmark/eval document (the
    standard 13-gram rule from the GPT-3 / Pile decontamination
    methodology — reference point only, the mechanism is public
    knowledge).

    Output: one row per TRAIN document —
    ``(doc_id, n_contaminated_shingles, contaminated)`` where
    ``n_contaminated_shingles`` counts the train doc's DISTINCT shingles
    that appear anywhere in the benchmark. Filter ``NOT contaminated``
    to get the clean corpus; keeping the flag (rather than dropping rows
    inside the operator) makes the audit trail a first-class output.

    Scale shape: both sides shingle once (token arrays materialized
    behind an exchange — see ``dedup._tokenized``); the join carries only
    8-byte shingle hashes. The benchmark side is DISTINCT-collapsed and
    is tiny relative to the corpus (benchmarks are MBs, corpora are TBs)
    — mark it broadcast so the train side never shuffles: at 100 TB this
    runs at scan speed + one map-side hash-join + one partial-agg
    groupBy on ``doc_id``.
    """
    t_sh = _tokenized(train, text_col, id_col).select(
        "id", F.explode(shingles_from_tokens(F.col("_toks"), n)).alias("_sh")
    )
    b_sh = (
        _tokenized(benchmark, text_col, id_col)
        .select(F.explode(shingles_from_tokens(F.col("_toks"), n)).alias("_sh"))
        .select(portable_hash64(F.col("_sh")).alias("_h"))
        .distinct()
    )
    hits = (
        t_sh.select("id", portable_hash64(F.col("_sh")).alias("_h"))
        .join(F.broadcast(b_sh), "_h")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_shingles"))
    )
    ids = train.select(F.col(id_col).alias("id"))
    return (
        ids.join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_contaminated_shingles"), F.lit(0))
            .cast("bigint")
            .alias("n_contaminated_shingles"),
            (F.coalesce(F.col("n_contaminated_shingles"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


def remove_contaminated_spans(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT-SUBSTRING decontamination (Lee et al. 2021 "Deduplicating
    Training Data" span form of the GPT-3/Gopher 13-gram rule): instead of
    flagging/dropping whole documents (``decontaminate``), remove from
    each training document every token that participates in ANY word
    ``n``-gram occurring in the benchmark, keeping the rest of the text.

    GUARANTEE (one-sided, by construction): every occurrence of a
    benchmark ``n``-gram in the ORIGINAL training text is destroyed —
    matching is by 60-bit portable hash, so a hash collision can only
    remove MORE tokens (false positive), never leave a true match behind.
    Caveat, stated because it is inherent to span removal (Lee et al.
    share it): deleting a span makes its neighbors adjacent, and the new
    juncture could in principle form a fresh benchmark n-gram; a
    paranoid pipeline iterates the operator to a fixpoint (one extra pass
    is virtually always empty).

    Output: ``(doc_id, clean_text, n_tokens_removed)`` for every train
    document (0 removed → text round-trips through the whitespace
    tokenizer unchanged).

    Scale shape: identical to ``decontaminate`` — benchmark hashes are
    distinct-collapsed and broadcast, the train side shuffles only the
    per-doc matched-start sets (tiny), and span masking is a per-row
    array expression. One extra (id, starts) groupBy vs the flag form.
    """
    toked = _tokenized(train, text_col, id_col)
    pos_sh = _positional_shingle_hashes(toked, n)
    b_sh = (
        _tokenized(benchmark, text_col, id_col)
        .select(F.explode(shingles_from_tokens(F.col("_toks"), n)).alias("_sh"))
        .select(portable_hash64(F.col("_sh")).alias("_h"))
        .distinct()
    )
    starts = (
        pos_sh.join(F.broadcast(b_sh), "_h")
        .groupBy("id")
        .agg(F.collect_set("pos").alias("_starts"))
    )
    return _mask_spans(toked, starts, n, id_col)


def _positional_shingle_hashes(toked: DataFrame, n: int) -> DataFrame:
    """(id, pos, _h): 60-bit hash of the word n-gram starting at 1-based
    token position ``pos`` (covers tokens [pos, pos+n-1]); docs shorter
    than n yield their full token join at pos=1 — the same short-doc
    contract as shingles_from_tokens."""
    return toked.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size("_toks") - F.lit(n - 1), F.lit(1))
                ),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.concat_ws(" ", F.slice(F.col("_toks"), i, n)).alias("sh"),
                ),
            )
        ).alias("_ps"),
    ).select(
        "id", F.col("_ps.pos").alias("pos"), portable_hash64(F.col("_ps.sh")).alias("_h")
    )


def _mask_spans(
    toked: DataFrame, starts: DataFrame, n: int, id_col: str
) -> DataFrame:
    """Drop from each doc every token covered by a span of length ``n``
    starting at any position in its ``_starts`` set; emit
    (id_col, clean_text, n_tokens_removed). Pure array expressions —
    zero shuffle beyond the ``starts`` join."""
    cov = F.array_distinct(
        F.flatten(
            F.transform(F.col("_starts"), lambda s: F.sequence(s, s + F.lit(n - 1)))
        )
    )
    masked = (
        toked.join(starts, "id", "left")
        .withColumn("_cov", F.coalesce(cov, F.array().cast("array<int>")))
        .withColumn(
            "_kept",
            F.filter(
                F.col("_toks"),
                lambda tok, idx: ~F.array_contains(F.col("_cov"), idx + F.lit(1)),
            ),
        )
    )
    return masked.select(
        F.col("id").alias(id_col),
        F.concat_ws(" ", F.col("_kept")).alias("clean_text"),
        (F.size("_toks") - F.size("_kept")).cast("bigint").alias("n_tokens_removed"),
    )


def dedup_repeated_spans(
    df: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-INTERNAL exact-substring dedup (the within-corpus
    counterpart of ``remove_contaminated_spans``; Lee et al. 2021 run the
    same rule at 50-gram granularity over suffix arrays): every word
    ``n``-gram occurring in MORE THAN ONE document is kept only in the
    lowest-id document containing it — all other documents lose the
    tokens of their occurrences. A gram repeated only WITHIN a single
    document is untouched (that is ``repetition_stats`` territory).

    Output: (doc_id, clean_text, n_tokens_removed) for every document
    (owners included, with their text intact unless some OTHER gram they
    hold is owned elsewhere).

    Scale shape: unlike decontamination there is no tiny benchmark side —
    the owner table (min doc per cross-doc gram) is corpus-sized, so the
    owner join is a plain hash-shuffle on the 8-byte gram hash, not a
    broadcast. Cost: two (hash)-keyed shuffles (owner agg + join back),
    both map-side-combinable; span masking stays per-row expressions.
    """
    toked = _tokenized(df, text_col, id_col)
    pos_sh = _positional_shingle_hashes(toked, n)
    owners = (
        pos_sh.groupBy("_h")
        .agg(F.min("id").alias("_owner"), F.countDistinct("id").alias("_ndocs"))
        .where(F.col("_ndocs") >= 2)
        .select("_h", "_owner")
    )
    starts = (
        pos_sh.join(owners, "_h")
        .where(F.col("id") != F.col("_owner"))
        .groupBy("id")
        .agg(F.collect_set("pos").alias("_starts"))
    )
    return _mask_spans(toked, starts, n, id_col)


# ------------------------------------------------ repetition quality filters


def _grams(toks: Column, n: int) -> Column:
    """NON-distinct word n-grams (repetition stats need multiplicities;
    contrast ``dedup.shingles_from_tokens`` which distinct-collapses).
    Fewer than ``n`` tokens → empty array."""
    if n == 1:
        return toks
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _mode_count(grams: Column) -> Column:
    """Occurrence count of the most frequent element (0 for empty)."""
    return F.coalesce(
        F.array_max(
            F.transform(
                F.array_distinct(grams),
                lambda d: F.size(F.filter(grams, lambda x: x == d)),
            )
        ),
        F.lit(0),
    )


def _dup_count(grams: Column) -> Column:
    """Number of occurrences belonging to any element that occurs more
    than once (the 'duplicate n-gram fraction' numerator)."""
    return F.coalesce(
        F.aggregate(
            F.transform(
                F.array_distinct(grams),
                lambda d: F.size(F.filter(grams, lambda x: x == d)),
            ),
            F.lit(0),
            lambda acc, c: acc + F.when(c > 1, c).otherwise(F.lit(0)),
        ),
        F.lit(0),
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_token_frac: float = 0.12,
    max_top_bigram_frac: float = 0.07,
    max_dup_trigram_frac: float = 0.10,
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1, public
    methodology): documents dominated by a single token, a single 2-gram,
    or duplicated 3-grams are boilerplate/spam and get filtered before
    training. Newline-free corpora (this one) use token n-gram stats; the
    line-based variants are the same shape over ``split(text, '\\n')``.

    Output per doc: ``(doc_id, n_tokens, top_token_frac, top_bigram_frac,
    dup_trigram_frac, passes_repetition)``; fractions rounded to 6dp,
    empty/short docs score 0.0 (and pass).

    Scale: pure per-row array expressions — zero shuffle, scan speed,
    full column pruning. The mode-count is O(distinct·len) per document;
    for adversarially long documents swap in the explode + two-stage
    groupBy form (one (id, gram) shuffle) — at web-corpus document sizes
    the expression form wins because nothing ever leaves the row.
    """
    toked = _tokenized(df, text_col, id_col)
    toks = F.col("_toks")
    bi, tri = _grams(toks, 2), _grams(toks, 3)
    n_tok = F.size(toks)
    frac = lambda num, den: F.round(  # noqa: E731
        F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0)), 6
    )
    out = toked.select(
        F.col("id").alias(id_col),
        n_tok.cast("bigint").alias("n_tokens"),
        frac(_mode_count(toks), n_tok).alias("top_token_frac"),
        frac(_mode_count(bi), F.size(bi)).alias("top_bigram_frac"),
        frac(_dup_count(tri), F.size(tri)).alias("dup_trigram_frac"),
    )
    return out.withColumn(
        "passes_repetition",
        (F.col("top_token_frac") <= max_token_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac)
        & (F.col("dup_trigram_frac") <= max_dup_trigram_frac),
    )


# ------------------------------------------------------------- PII redaction

# Patterns restricted to the RE2 ∩ Java-regex common subset (no lookaround,
# no backreferences) so Spark and any RE2-based SQL engine (DuckDB, BigQuery)
# match the identical spans. Order matters: emails are redacted before IPs
# and phones so address-like substrings inside an email never half-match.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\b[0-9]{2,3}-[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
)


def pii_redact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrubbing for training corpora: sequentially redact emails,
    IPv4 addresses, and dashed phone numbers, emitting the redacted text
    plus a per-type match count (counted against the text as it stood
    when that pattern ran — the sequential contract is part of the
    output semantics and is what an oracle reproduces).

    The same normalization concern as the reference's PII hashing
    (megalista_dataflow/uploaders/utils.py hash_field) but applied to
    free text rather than typed columns.

    Scale: pure per-row regexp expressions — scan speed, zero shuffle,
    full pushdown; regex cost is linear in text length (RE2-safe
    patterns, no catastrophic backtracking in Java either since the
    patterns are backtrack-free).
    """
    cur = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("bigint").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return df.select(
        F.col(id_col),
        cur.alias("redacted_text"),
        *counts,
    )


# --------------------------------------------------------- filter cascade


def filter_cascade(
    df: DataFrame,
    rules: list[tuple[str, Column]],
    verdict_col: str = "verdict",
) -> DataFrame:
    """C4/Gopher-style quality-filter cascade with per-rule attribution:
    each row is stamped with the name of the FIRST rule (in the given
    priority order) whose fail-condition it trips, or 'PASS'. The verdict
    column is what makes a 100 TB filtering run debuggable — "we dropped
    31% of CommonCrawl" is useless without knowing WHICH rule took each
    document.

    ``rules`` is [(name, fail_condition)] — conditions are plain Column
    expressions, so the whole cascade compiles to one CASE chain inside
    whole-stage codegen: scan-speed, zero shuffle, no UDFs.

    NULL semantics are SQL-CASE semantics: a rule whose condition
    evaluates NULL does not fire and the row falls through (identical in
    any engine's CASE chain — the portability contract). For the
    conservative "unevaluable = violation" gate, use
    expectations.quarantine, which coalesces NULL to a violation; or
    make a rule NULL-proof explicitly (e.g. `col.isNull() | cond`).
    """
    verdict = F.lit("PASS")
    for name, fail in reversed(rules):
        verdict = F.when(fail, F.lit(name)).otherwise(verdict)
    return df.withColumn(verdict_col, verdict)


def cascade_keep(
    df: DataFrame, rules: list[tuple[str, Column]], verdict_col: str = "verdict"
) -> DataFrame:
    """Rows surviving every cascade rule (verdict = PASS), verdict column
    dropped — the corpus that flows to the next pipeline stage."""
    return (
        filter_cascade(df, rules, verdict_col)
        .where(F.col(verdict_col) == "PASS")
        .drop(verdict_col)
    )


def cascade_stats(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """Per-rule attrition report for a filter cascade: one row per rule
    with the rows it took FIRST (cascade-ordered attribution — these sum
    to the total dropped) and the rows that trip it regardless of order
    (total_fail — the rule-overlap signal), plus a final PASS row.

    Scale: ONE scan — every first_fail/total_fail is a conditional sum
    in a single global aggregate (map-side partial agg, 32 rows to one
    reducer), then the one-row result explodes into the per-rule report.
    No joins, no second pass over the data.
    """
    ann = filter_cascade(df, rules, "_v")
    aggs = []
    for i, (name, fail) in enumerate(rules):
        aggs.append(
            F.coalesce(
                F.sum((F.col("_v") == name).cast("long")), F.lit(0).cast("long")
            ).alias(f"_ff{i}")
        )
        aggs.append(
            F.coalesce(F.sum(fail.cast("long")), F.lit(0).cast("long")).alias(
                f"_tf{i}"
            )
        )
    aggs.append(
        F.coalesce(
            F.sum((F.col("_v") == "PASS").cast("long")), F.lit(0).cast("long")
        ).alias("_pass")
    )
    one = ann.agg(*aggs)
    entries = [
        F.struct(
            F.lit(i).cast("int").alias("stage"),
            F.lit(name).alias("rule"),
            F.col(f"_ff{i}").alias("first_fail"),
            F.col(f"_tf{i}").alias("total_fail"),
        )
        for i, (name, _) in enumerate(rules)
    ]
    entries.append(
        F.struct(
            F.lit(len(rules)).cast("int").alias("stage"),
            F.lit("PASS").alias("rule"),
            F.col("_pass").alias("first_fail"),
            F.col("_pass").alias("total_fail"),
        )
    )
    return one.select(F.explode(F.array(*entries)).alias("_e")).select("_e.*")


# ------------------------------------------------- source-level curation


def source_quality_stats(
    df: DataFrame,
    pass_cond: Column,
    source_col: str = "source",
    min_pass_permyriad: int = 5000,
) -> DataFrame:
    """Domain/source-level curation (the RefinedWeb/Dolma move): score
    every SOURCE by the fraction of its documents passing a quality
    predicate, and flag sources below the threshold for blocklisting —
    low-quality domains are dropped wholesale, which removes spam sites
    no per-document rule catches.

    The threshold is a permyriad integer (5000 = 50%) so the blocked
    flag is an exact integer comparison (n_pass·10000 < thr·n_docs) —
    no float boundary, identical in any engine. pass_rate is emitted
    rounded for human eyes only.

    Scale: one groupBy(source) — map-side combine reduces each partition
    to its distinct sources before the shuffle; the result is
    domain-cardinality sized (tiny), broadcastable into the anti-join
    that applies the blocklist (``apply_source_blocklist``).
    """
    thr = F.lit(min_pass_permyriad).cast("long")
    return (
        df.groupBy(F.col(source_col).alias("source"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(pass_cond.cast("long")).cast("long").alias("n_pass"),
        )
        .select(
            "source",
            "n_docs",
            "n_pass",
            F.round(F.col("n_pass").cast("double") / F.col("n_docs"), 6).alias(
                "pass_rate"
            ),
            (F.col("n_pass") * 10_000 < thr * F.col("n_docs")).alias("blocked"),
        )
    )


def apply_source_blocklist(
    df: DataFrame, stats: DataFrame, source_col: str = "source"
) -> DataFrame:
    """Drop every document whose source is blocklisted — a broadcast
    left-anti join against the (tiny, domain-cardinality) stats table."""
    blocked = stats.where(F.col("blocked")).select(
        F.col("source").alias(source_col)
    )
    return df.join(F.broadcast(blocked), source_col, "left_anti")

def decontaminate_bloom(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    m: int = 16384,
    k: int = 4,
) -> DataFrame:
    """``decontaminate`` with a BLOOM prefilter — byte-identical OUTPUT
    (the probe has no false negatives, so every truly-shared shingle
    survives; false positives die in the exact verify join), different
    scale regime: the plain operator broadcasts the benchmark's distinct
    shingle-hash TABLE, which works while benchmarks are MBs but not
    when the "benchmark" is another CORPUS (cross-corpus contamination,
    the vs-prior-training-set check) — there the hash table is GBs and
    the broadcast dies. The Bloom filter is ≤ ceil(m/63) bit-words —
    ~2 KB at the default geometry, CONSTANT in the reference-set size —
    so the prefilter stays a map-side broadcast at any scale, and only
    the (rare) surviving shingle hashes reach the exact shuffle join.

    Same output contract as ``decontaminate``:
    ``(doc_id, n_contaminated_shingles, contaminated)`` per train doc —
    and therefore the same oracle.

    Scale shape: benchmark → shingle hashes → Bloom (constant-size,
    bit_or map-combined) broadcast; train shingles probe it at scan
    speed; survivors (true hits + FP at the classic rate) join the
    benchmark hash set EXACTLY — a shuffle join sized by the
    contamination volume, not the corpus. Tune ``m`` upward for big
    reference sets (FP rate (1−e^(−k·n/m))^k).
    """
    from megalista_spark.operators.dedup import (
        _tokenized,
        portable_hash64,
        shingles_from_tokens,
    )
    from megalista_spark.operators.sketches import bloom_build, bloom_might_contain

    t_sh = (
        _tokenized(train, text_col, id_col)
        .select(
            "id", F.explode(shingles_from_tokens(F.col("_toks"), n)).alias("_sh")
        )
        .select("id", portable_hash64(F.col("_sh")).alias("_h"))
    )
    b_sh = (
        _tokenized(benchmark, text_col, id_col)
        .select(F.explode(shingles_from_tokens(F.col("_toks"), n)).alias("_sh"))
        .select(portable_hash64(F.col("_sh")).alias("_h"))
        .distinct()
    )
    words = bloom_build(b_sh, "_h", m=m, k=k)
    # candidate hashes: distinct train-side hashes possibly in the filter
    cand = bloom_might_contain(
        t_sh.select("_h"), "_h", words, m=m, k=k
    ).select(F.col("key").alias("_h"))
    # exact verify: candidates ∩ benchmark hashes (kills Bloom FPs);
    # sized by contamination, not by either corpus
    confirmed = cand.join(b_sh, "_h", "left_semi")
    hits = (
        t_sh.join(confirmed, "_h", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_shingles"))
    )
    ids = train.select(F.col(id_col).alias("id"))
    return (
        ids.join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_contaminated_shingles"), F.lit(0))
            .cast("bigint")
            .alias("n_contaminated_shingles"),
            (F.coalesce(F.col("n_contaminated_shingles"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )
