"""Text-analysis operators for large-scale training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen, no UDFs) with
deterministic semantics that an external SQL oracle can reproduce exactly.

Scale notes: every operator here is embarrassingly parallel per row — no
shuffle, no window. At 100 TB these run at scan speed with full column
pruning (only ``text`` + id columns are read).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_D38 = "decimal(38,0)"

# A "BPE-ish" token: runs of letters, runs of digits, or single
# non-alphanumeric-non-space characters. Deliberately simple enough to be
# reproduced in any regex engine (RE2/Java/PCRE agree on this pattern).
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

PUNCT_PATTERN = r"[^A-Za-z0-9\s]"

# Per-language marker words for the n-gram/stopword language heuristic.
# Ordered dict of language → markers; scoring = count of \b-delimited hits.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "que", "de"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("的", "是", "了", "在", "我"),
}

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def _ws_tokens(text: Column) -> Column:
    """Whitespace tokens; empty string → empty array (split returns [''])."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def _word_tokens(text_col: str) -> Column:
    """Lowercased [a-z0-9]-run word tokens, empties dropped — THE corpus
    tokenizer every frequency-based operator here shares (vocab, tf-idf,
    inverted index, BPE, collocations, corpus scores). One definition so
    the operators and their string_split_regex oracle twins can never
    drift apart site-by-site."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per document."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(_ws_tokens(text)).cast("bigint").alias("n_ws_tokens"),
        F.regexp_count(text, F.lit(BPE_TOKEN_PATTERN)).cast("bigint").alias("n_bpe_tokens"),
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic document quality: length, punctuation ratio, stopword
    ratio, mean word length — the standard pre-training quality signals
    (cf. C4/Gopher filtering rules), all as exact arithmetic so an oracle
    can hash-match. Ratios rounded to 6 decimals.
    """
    text = F.col(text_col)
    toks = _ws_tokens(text)
    n_chars = F.length(text).cast("double")
    n_tokens = F.size(toks).cast("double")
    n_punct = F.regexp_count(text, F.lit(PUNCT_PATTERN)).cast("double")
    stop_rx = r"\b(" + "|".join(STOPWORDS) + r")\b"
    n_stop = F.regexp_count(F.lower(text), F.lit(stop_rx)).cast("double")
    mean_word_len = F.when(n_tokens > 0, F.round((n_chars - (n_tokens - 1)) / n_tokens, 6)).otherwise(
        F.lit(0.0)
    )
    return df.select(
        F.col(id_col),
        n_chars.cast("bigint").alias("n_chars"),
        n_tokens.cast("bigint").alias("n_tokens"),
        F.round(F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)), 6).alias(
            "punct_ratio"
        ),
        F.round(F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0)), 6).alias(
            "stopword_ratio"
        ),
        mean_word_len.alias("mean_word_len"),
        (
            (n_tokens >= 5)
            & (F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)) <= 0.2)
        )
        .cast("boolean")
        .alias("passes_quality"),
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Marker-word language heuristic: per-language \\b-delimited hit
    counts; predicted language = argmax with deterministic tie-break by
    language code order. Unknown when no marker hits at all.
    """
    text = F.lower(F.col(text_col))
    scores = {
        lang: F.regexp_count(text, F.lit(r"\b(" + "|".join(m) + r")\b")).cast("bigint")
        for lang, m in LANG_MARKERS.items()
    }
    # argmax with deterministic tie-break: fold left in alphabetical order
    # keeping strict-greater replacements (earliest code wins ties) — the
    # same fold is expressible as a CASE chain in any SQL dialect.
    langs = sorted(scores)
    best = F.lit("unknown")
    best_score = F.lit(0).cast("bigint")
    for lang in langs:
        s = scores[lang]
        is_better = s > best_score
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_score = F.when(is_better, s).otherwise(best_score)
    cols = [F.col(id_col)]
    for lang in langs:
        cols.append(scores[lang].alias(f"score_{lang}"))
    cols.append(best.alias("predicted_lang"))
    return df.select(*cols)


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf.

    idf is the ratio form (N+1)/(df+1) rather than its log: basic IEEE
    ops (+ - * /) are correctly rounded on every engine while ln is
    libm-dependent, so the score — and therefore the top-k cut — is
    bit-identical in any external system. The ordering is the same as
    with log-idf for any fixed tf (monotone transform applied per term).

    Scale: tokenize at scan speed, ONE wide shuffle on (doc, term) for tf
    (map-side combined), a small term-keyed aggregate for df (reusing the
    already-collapsed tf relation — no countDistinct), broadcast scalar N,
    and a per-doc window for the top-k. No full sort of the corpus.

    Output: (doc_id, term, tf bigint, df bigint, score double, rank bigint).
    """
    from pyspark.sql import Window

    toks = _word_tokens(text_col)
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # tf is already one row per (doc, term): df counts need no distinct
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(dfc, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.col("tf") * ((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select(
            id_col,
            "term",
            "tf",
            "df",
            F.round("score", 6).alias("score"),
            "rank",
        )
    )


def document_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_words: int | None = None,
) -> DataFrame:
    """Content fingerprint: md5 of the casefolded, punctuation-stripped,
    whitespace-collapsed text. Robust to formatting-only edits; the cheap
    first pass of a dedup pipeline (hash-groupBy on the fingerprint).

    ``prefix_words`` fingerprints only the first N normalized words — the
    standard cheap blocking key for near-dup detection (documents that
    open identically are overwhelmingly template/boilerplate kin even
    when their tails diverge). Both forms are one codegen projection.
    """
    text = F.col(text_col)
    if prefix_words is not None:
        words = F.filter(
            F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != F.lit("")
        )
        normalized = F.array_join(F.slice(words, 1, prefix_words), " ")
    else:
        normalized = F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(text), PUNCT_PATTERN, ""), r"\s+", " "
            )
        )
    return df.select(
        F.col(id_col),
        F.md5(normalized).alias("fingerprint"),
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 50,
) -> DataFrame:
    """Search-index construction: (term, df, postings) where postings is
    the first ``max_postings`` "doc:tf" entries in doc order, rendered as
    one string (engine-neutral — array-of-struct renderings differ across
    engines, strings do not).

    Scale: tokenize at scan speed, one (doc, term) shuffle for tf, then a
    term-partitioned ``row_number`` window ranks docs BEFORE the aggregate
    and only rank ≤ max_postings rows reach ``collect_list`` — per-term
    aggregation state is genuinely bounded at max_postings entries, even
    for stopword-class terms (the window sorts its partition with Spark's
    spillable external sort; the earlier form collected the full posting
    list into the agg buffer before slicing). ``df`` still counts every
    document. For a real serving index, partition the output by term
    range and write z-ordered (operators/layout.py).
    """
    from pyspark.sql import Window

    toks = _word_tokens(text_col)
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    ranked = tf.withColumn(
        "_rn", F.row_number().over(Window.partitionBy("term").orderBy(id_col))
    )
    # collect_list drops nulls, so only the first max_postings docs (in doc
    # order, per the window) ever enter the per-term aggregation buffer
    capped = F.when(
        F.col("_rn") <= max_postings,
        F.struct(F.col(id_col).alias("d"), F.col("tf")),
    )
    postings = F.concat_ws(
        ",",
        F.transform(
            F.sort_array(F.collect_list(capped)),
            lambda s: F.concat_ws(":", s["d"].cast("string"), s["tf"].cast("string")),
        ),
    )
    return ranked.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        postings.alias("postings"),
    )


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_terms: int = 1000,
) -> DataFrame:
    """Corpus vocabulary for tokenizer/embedding training: the
    ``max_terms`` most frequent terms with dense integer ids —
    (term_id, term, tf, df), ordered by (tf desc, term asc) so the id
    assignment is total and deterministic.

    Scale: one (doc, term) shuffle collapses token multiplicity into
    per-doc tf (map-side combine), one term-keyed agg sums tf and counts
    docs WITHOUT a countDistinct (the tf relation is already per-doc
    distinct — the tfidf_top_terms trick), then the global top-max_terms
    is ``orderBy().limit()`` — Spark compiles it to TakeOrderedAndProject
    (per-partition heaps, k rows to the driver-side merge, NO global
    sort), and the id-assigning window runs over ≤ max_terms rows.
    """
    from pyspark.sql import Window

    toks = _word_tokens(text_col)
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    totals = tf.groupBy("term").agg(
        F.sum("tf").cast("bigint").alias("tf"),
        F.count(F.lit(1)).cast("bigint").alias("df"),
    )
    top = totals.orderBy(F.desc("tf"), F.asc("term")).limit(max_terms)
    w = Window.orderBy(F.desc("tf"), F.asc("term"))
    return top.select(
        (F.row_number().over(w) - 1).cast("bigint").alias("term_id"),
        "term",
        "tf",
        "df",
    )


def _bpe_state(
    df: DataFrame,
    text_col: str = "text",
    merges: int = 3,
    max_words: int | None = None,
    group_col: str | None = None,
) -> tuple[list[DataFrame], DataFrame]:
    """Shared BPE kernel: runs ``merges`` training rounds and returns
    (per-round merge rows, final symbol state). The final state IS the
    corpus encoded with the learned tokenizer — ``bpe_train_merges``
    consumes the first element, ``bpe_encode_token_stats`` the second.

    Byte-pair-encoding merge training (Sennrich et al. 2016; public
    method) as a driver loop of PURELY RELATIONAL steps — the tokenizer-
    training operator an LLM data pipeline runs over its corpus. Returns
    the learned merge table (step, lhs, rhs, merged, pair_count), step
    1-based in training order.

    The corpus collapses to the word-frequency dict first (the classic
    BPE preprocessing — training cost scales with |vocab|, not corpus
    size), then each word becomes positional symbol rows
    (word, wc, pos, sym) with a ``</w>`` end marker. Per merge round:

      count:  adjacent pairs via ONE ``lead`` window + weighted groupBy
      argmax: (count DESC, pair ASC) LIMIT 1 — total order, so training
              is a pure function of the corpus (real BPE trainers
              tiebreak on dict order and are irreproducible across runs)
      apply:  greedy left-to-right non-overlapping replacement, done
              RELATIONALLY: pair-start rows form gaps-and-islands runs
              (overlaps only occur for self-pairs like ``a a``); within
              a run, odd offsets are the greedy picks — three chained
              windows, no per-row recursion, no UDF. Consumed rows drop,
              merged rows keep the first element's position.

    Scale: state is the positional symbol relation, O(Σ|word|) over the
    DISTINCT vocabulary — millions of rows for a 100 TB corpus, not
    billions; every window partitions BY WORD (bounded, spillable). The
    per-group argmax joins back via a broadcast equi-join on the group
    key — no driver collect. Rounds localCheckpoint (the iterative-
    lineage lesson). ``max_words`` optionally trains on each group's
    top-frequency vocabulary slice ((wc, word) DESC total order), the
    standard truncation.

    ``group_col`` trains ONE TOKENIZER PER GROUP in the same dataflow
    (e.g. per language — the multi-tenant form): every window simply
    gains the group key in its partition, the argmax becomes a |groups|-
    row table, and the output carries the group column first. Ungrouped
    training is the single-group special case of the same kernel.
    """
    from pyspark.sql import Window

    toks = _word_tokens(text_col)
    grp = F.col(group_col) if group_col is not None else F.lit("")
    words = (
        df.select(grp.alias("_g"), F.explode(toks).alias("word"))
        .groupBy("_g", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wc"))
    )
    if max_words is not None:
        words = (
            words.withColumn(
                "_wr",
                F.row_number().over(
                    Window.partitionBy("_g").orderBy(F.desc("wc"), F.asc("word"))
                ),
            )
            .where(F.col("_wr") <= max_words)
            .drop("_wr")
        )

    chars = F.expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))")
    seq = (
        words.select(
            "_g",
            "word",
            "wc",
            F.posexplode(F.concat(chars, F.array(F.lit("</w>")))).alias("pos", "sym"),
        )
        .localCheckpoint(eager=True)
    )

    w_word = Window.partitionBy("_g", "word").orderBy("pos")
    w_grp = Window.partitionBy("_g").orderBy(
        F.desc("cnt"), F.asc("sym"), F.asc("nxt")
    )
    merge_rows: list[DataFrame] = []
    for step in range(1, merges + 1):
        pairs = (
            seq.select("_g", "wc", "sym", F.lead("sym").over(w_word).alias("nxt"))
            .where(F.col("nxt").isNotNull())
            .groupBy("_g", "sym", "nxt")
            .agg(F.sum("wc").cast("bigint").alias("cnt"))
        )
        best = (
            pairs.withColumn("_br", F.row_number().over(w_grp))
            .where(F.col("_br") == 1)
            .select(
                "_g",
                F.col("sym").alias("_l"),
                F.col("nxt").alias("_r"),
                F.col("cnt"),
            )
            .localCheckpoint(eager=True)
        )
        merge_rows.append(
            best.select(
                "_g",
                F.lit(step).alias("step"),
                F.col("_l").alias("lhs"),
                F.col("_r").alias("rhs"),
                F.concat("_l", "_r").alias("merged"),
                F.col("cnt").alias("pair_count"),
            )
        )
        s1 = seq.join(F.broadcast(best), "_g").select(
            "_g",
            "word",
            "wc",
            "pos",
            "sym",
            F.row_number().over(w_word).alias("rn"),
            F.coalesce(
                (F.col("sym") == F.col("_l"))
                & (F.lead("sym").over(w_word) == F.col("_r")),
                F.lit(False),
            ).alias("start"),
            F.concat("_l", "_r").alias("msym"),
        )
        s2 = s1.withColumn(
            "island",
            F.col("rn")
            - F.row_number().over(
                Window.partitionBy("_g", "word", "start").orderBy("pos")
            ),
        )
        s3 = s2.withColumn(
            "active",
            F.col("start")
            & (
                F.row_number().over(
                    Window.partitionBy("_g", "word", "start", "island").orderBy("pos")
                )
                % 2
                == 1
            ),
        )
        s4 = s3.withColumn(
            "prev_active", F.lag("active", 1, False).over(w_word)
        )
        seq = (
            s4.where(~F.col("prev_active"))
            .select(
                "_g",
                "word",
                "wc",
                "pos",
                F.when(F.col("active"), F.col("msym")).otherwise(F.col("sym")).alias(
                    "sym"
                ),
            )
            .localCheckpoint(eager=True)
        )

    return merge_rows, seq


def bpe_train_merges(
    df: DataFrame,
    text_col: str = "text",
    merges: int = 3,
    max_words: int | None = None,
    group_col: str | None = None,
) -> DataFrame:
    """Learned BPE merge table (step, lhs, rhs, merged, pair_count), step
    1-based in training order. See ``_bpe_state`` for the kernel design
    and scale notes."""
    merge_rows, _ = _bpe_state(df, text_col, merges, max_words, group_col)
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    if group_col is not None:
        return out.withColumnRenamed("_g", group_col).orderBy(group_col, "step")
    return out.drop("_g").orderBy("step")


def bpe_encode_token_stats(
    df: DataFrame,
    text_col: str = "text",
    merges: int = 3,
    top: int = 20,
    max_words: int | None = None,
    group_col: str | None = None,
) -> DataFrame:
    """Tokenizer APPLICATION at corpus scale — the other half of BPE.
    Encodes the corpus with the ``merges`` rules learned in-flight and
    returns the top-``top`` resulting tokens by corpus frequency
    (rank, token, tf). This is the token-frequency profile a training
    pipeline audits before committing to a tokenizer.

    Zero extra passes over the corpus: the training kernel's final symbol
    state (``_bpe_state``) already holds every word of the DISTINCT
    vocabulary in encoded form with its corpus count ``wc`` — encoding
    the corpus is one weighted groupBy over that relation, O(Σ|word|)
    state like training itself, never O(corpus). The global top-k is
    TakeOrderedAndProject (per-partition heaps), not a full sort.
    """
    _, seq = _bpe_state(df, text_col, merges, max_words, group_col)
    from pyspark.sql import Window

    stats = seq.groupBy("_g", "sym").agg(F.sum("wc").cast("bigint").alias("tf"))
    w = Window.partitionBy("_g").orderBy(F.desc("tf"), F.asc("sym"))
    out = (
        stats.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= top)
        .select("_g", "rank", F.col("sym").alias("token"), "tf")
    )
    if group_col is not None:
        return out.withColumnRenamed("_g", group_col).orderBy(group_col, "rank")
    return out.drop("_g").orderBy("rank")


def _tfidf_weighted(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_term_df: int | None,
    max_term_df_frac: float,
    idf_scale: int,
) -> tuple[DataFrame, DataFrame]:
    """Shared front half of the tf-idf pair family: the kept-term table
    (term, df) and the pruned integer-weighted inverted index
    (term, id, df, w) with w = tf · round(idf_scale·(N+1)/(df+1)).

    One (doc, term) shuffle for tf; the tf relation is checkpointed so
    every downstream branch (df counts, volume guards, norms, both pair
    paths) reads blocks instead of re-tokenizing. df=1 terms drop
    (cannot form a pair — free, exact); hot stopword-class terms are
    capped at ``max_term_df`` when given, else at
    ``floor(max_term_df_frac · N)`` — a FRACTION, because an absolute
    cap silently degrades as the corpus grows (at 10× the docs the same
    cap=100 pruned every shared term of true duplicate pairs and the
    operator returned nothing).
    """
    toks = _word_tokens(text_col)
    tf = (
        df.select(F.col(id_col).alias("id"), F.explode(toks).alias("term"))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    cap = (
        F.lit(max_term_df).cast("long")
        if max_term_df is not None
        else F.greatest(
            F.lit(2).cast("long"),
            F.floor(F.lit(max_term_df_frac) * F.col("n_docs")).cast("long"),
        )
    )
    kept_terms = (
        dfc.crossJoin(F.broadcast(n))
        .where((F.col("df") > 1) & (F.col("df") <= cap))
        .select("term", "df")
    )
    weighted = (
        tf.join(kept_terms, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "term",
            "id",
            F.col("df"),
            (
                F.col("tf")
                * F.round(
                    F.lit(float(idf_scale)) * (F.col("n_docs") + 1.0) / (F.col("df") + 1.0)
                ).cast("long")
            ).alias("w"),
        )
    )
    return kept_terms, weighted


def tfidf_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_term_df: int | None = None,
    max_term_df_frac: float = 0.2,
    idf_scale: int = 1000,
    max_candidate_pairs: int = 200_000_000,
    array_bucket_max: int = 1_000,
    on_excess: str = "warn",
) -> DataFrame:
    """Sparse TEXT cosine similarity pairs — the term-vector complement
    of the dense embedding near-dup family: all document pairs with
    cosine(tfidf_a, tfidf_b) ≥ threshold, computed on the inverted
    index so only documents sharing ≥1 term ever meet.

    Engine-portable float contract: weights are INTEGERS —
    w = tf · round(idf_scale·(N+1)/(df+1)) — so pair dot products and
    squared norms are exact bigint sums (order-independent, immune to
    shuffle-order float drift); the only float ops are one sqrt and one
    divide per doc/pair, both correctly-rounded IEEE, so the oracle
    hash-matches. idf quantization to 1/idf_scale is part of the
    operator's contract (3 decimals by default). Dot/norm² accumulate as
    decimal(38,0) — rare-term weights grow ∝ N·idf_scale and a bigint
    w² sum would overflow beyond ~10^5 docs; decimal keeps the sums
    exact (and portable — DuckDB DECIMAL matches) at any corpus size,
    converting to double only for the final sqrt/divide.

    Scale shape (the ngram_jaccard discipline): ONE (doc, term) shuffle
    for tf; df from the collapsed tf relation (no countDistinct);
    df=1 terms drop (cannot form a pair — free, exact); hot
    stopword-class terms are capped at ``max_term_df`` when given, else
    at ``floor(max_term_df_frac · N)`` — a FRACTION, because an absolute
    cap silently degrades as the corpus grows (at 10× the docs the same
    cap=100 pruned every shared term of true duplicate pairs and the
    operator returned nothing). The weighted inverted index is computed
    ONCE (localCheckpoint of the tf relation — every downstream branch
    reads blocks); intra-term pairs are routed by posting-list length:
    terms with df ≤ ``array_bucket_max`` take the bucket-grouping form
    (sorted member list, ordered pairs exploded locally — no candidate
    shuffle), hotter terms take a within-term SELF-JOIN on the term key
    whose matched groups live in Spark's spillable join buffers — a
    clustered corpus streams its quadratic candidate volume through
    disk instead of materializing one multi-GB pair-array row per term.

    ``max_candidate_pairs`` (exactly Σ C(df,2) over kept terms, one
    cheap scalar agg) is an ADVISORY tier: above it the operator logs a
    warning pointing at the sub-quadratic family; ``on_excess="raise"``
    restores the strict refusal.

    Output: (id_a, id_b, cos_sim) with id_a < id_b.
    """
    import logging

    from megalista_spark.operators.dedup import _spread

    kept_terms, weighted_rel = _tfidf_weighted(
        df, text_col, id_col, max_term_df, max_term_df_frac, idf_scale
    )
    # Refuse-to-melt guard (same design as the capped driver-GEMM in
    # similarity.py): candidate volume is EXACTLY Σ C(df,2) over kept
    # terms — one cheap scalar agg over the term table predicts it before
    # any pair is generated. On corpora whose mid-df terms make that
    # quadratic (df_frac·N grows with N), the exact inverted-index form
    # is the wrong tool: fail loudly and point at the sub-quadratic
    # family instead of OOM-ing the executors.
    est_pairs = (
        kept_terms.agg(
            F.coalesce(
                F.sum(F.expr("df * (df - 1) div 2")), F.lit(0)
            ).alias("p")
        ).first()["p"]
    )
    if est_pairs > max_candidate_pairs:
        msg = (
            f"tfidf_cosine_pairs will stream {est_pairs} candidate "
            f"pairs (> max_candidate_pairs={max_candidate_pairs}) on this "
            "corpus shape. Hot terms take the spillable self-join path, "
            "but the quadratic volume is inherent: lower "
            "max_term_df_frac / max_term_df, raise threshold, or use the "
            "sub-quadratic near-dup family (dedup.minhash_lsh_pairs / "
            "setsim_prefix_pairs / similarity.srp_lsh_pairs)."
        )
        if on_excess == "raise":
            raise ValueError(msg)
        logging.getLogger(__name__).warning(msg)
    weighted = weighted_rel
    # norms over the SAME pruned weight relation the pairs use, so the
    # cosine is exactly the cosine of the pruned vectors (self-consistent)
    wd = F.col("w").cast("decimal(19,0)")
    norms = weighted.groupBy("id").agg(
        F.sqrt(F.sum(wd * wd).cast("double")).alias("norm")
    )
    # posting lists routed by length: short → local array pairs,
    # long → spillable within-term self-join (kept_terms carries df, so
    # the routing predicate is a free column filter, no extra count)
    small_buckets = (
        weighted.where(F.col("df") <= array_bucket_max)
        .groupBy("term")
        .agg(F.sort_array(F.collect_list(F.struct("id", "w"))).alias("ms"))
        .where(F.size("ms") >= 2)
    )
    # spread before exploding: the bucket table is tiny so AQE coalesces
    # it to 1-2 partitions, serializing the pair emission (measured at
    # sf1: the small-path explode ran minutes on 2 tasks); the explicit
    # round-robin repartition parallelizes it and is AQE-exempt.
    # Pairs are generated by CHAINED explodes (posexplode the sorted
    # posting list → explode the prefix before each element), which
    # STREAMS the C(b,2) pairs row-by-row through whole-stage codegen —
    # the earlier single-explode form first materialized the full pair
    # array as ONE column value (C(1000,2) ≈ 500k structs ≈ tens of MB
    # per mid-df term), and 32 concurrent tasks of those next to the
    # partial-agg hash maps OOMed an 8g heap at sf1's 1.6B-candidate
    # corpus. Sorted input keeps a < b without a comparison.
    small_cand = (
        _spread(small_buckets)
        .select(F.col("ms"), F.posexplode("ms").alias("_i", "_b"))
        .where(F.col("_i") >= 1)
        .select(
            F.col("_b"),
            F.explode(F.slice(F.col("ms"), F.lit(1), F.col("_i"))).alias("_a"),
        )
        .select(
            F.col("_a.id").alias("id_a"),
            F.col("_b.id").alias("id_b"),
            (
                F.col("_a.w").cast("decimal(19,0)")
                * F.col("_b.w").cast("decimal(19,0)")
            ).alias("prod"),
        )
    )
    # Salted hot self-join: a single hot term's quadratic output would
    # otherwise land in ONE task (term-hash skew — measured: a straggler
    # task ran minutes after its 15 siblings finished at sf1, and AQE's
    # skew-join split keys on input bytes, which are tiny here). Side A
    # carries a deterministic salt = id mod S, side B is replicated to
    # every salt (S copies of a ≤ df-row posting list — trivial shuffle
    # volume), so each pair (a,b) meets exactly once, in salt(a.id), and
    # per-term work splits S ways. The explicit partition count keeps the
    # exchange AQE-coalesce-exempt.
    par = df.sparkSession.sparkContext.defaultParallelism
    salt = max(2, min(par, 16))
    hot = weighted.where(F.col("df") > array_bucket_max).select("term", "id", "w")
    # salt from murmur3 (physical routing only — never part of the
    # portable-results contract), so non-numeric id types salt fine
    hot_a = hot.withColumn("_salt", F.pmod(F.hash("id"), F.lit(salt)))
    hot_b = hot.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    hot_cand = (
        hot_a.alias("a").repartition(par, "term", "_salt")
        .join(
            hot_b.alias("b").repartition(par, "term", "_salt"),
            on=[
                F.col("a.term") == F.col("b.term"),
                F.col("a._salt") == F.col("b._salt"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (
                F.col("a.w").cast("decimal(19,0)")
                * F.col("b.w").cast("decimal(19,0)")
            ).alias("prod"),
        )
    )
    # Size the pair aggregation from the KNOWN candidate volume: the
    # session's shuffle-partition default (~cores) gives each reducer
    # est_pairs/32 hash-map entries — at sf1's 1.6B candidates that is
    # 50M entries per reducer and 32 concurrent reducers OOM an 8g heap
    # before the sort-fallback can spill. est_pairs is already computed
    # (the advisory guard), so an explicit hash repartition on the group
    # key caps each reducer at ~2M entries; the groupBy reuses that
    # partitioning (no second exchange), and the explicit count is
    # AQE-coalesce-exempt. Benign corpora keep the untouched plan.
    unioned = small_cand.unionByName(hot_cand)
    if est_pairs > 50_000_000:
        agg_parts = int(min(4096, max(par, est_pairs // 2_000_000)))
        unioned = unioned.repartition(agg_parts, "id_a", "id_b")
    dots = unioned.groupBy("id_a", "id_b").agg(F.sum("prod").alias("dot"))
    na = norms.select(F.col("id").alias("id_a"), F.col("norm").alias("_na"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("norm").alias("_nb"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("dot").cast("double") / (F.col("_na") * F.col("_nb")), 6
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def tfidf_cosine_pairs_prefix(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_term_df: int | None = None,
    max_term_df_frac: float = 0.2,
    idf_scale: int = 1000,
) -> DataFrame:
    """Sparse tf-idf cosine pairs via LOSSLESS prefix filtering — the
    sub-quadratic registered form of ``tfidf_cosine_pairs`` (AllPairs /
    PPJoin weighted-cosine prefix bound, Bayardo et al. 2007; public
    method). Returns EXACTLY the same rows as the exact inverted-index
    form: the prefix step only prunes candidate generation, never the
    result.

    TWO lossless prunes, both from the same per-doc suffix-norm table
    under ONE GLOBAL term order (ascending df, ties by term — every
    doc's term list is this global order restricted to the doc):

    1. PREFIX FILTER (candidate generation). Let suffix_sq(r) =
       Σ_{rank ≥ r} w² within a doc. If every shared term of a pair
       lies past doc A's prefix boundary p (where suffix_sq(p+1) <
       t'²·‖A‖²), then by Cauchy-Schwarz dot ≤ √suffix_sq·‖B‖ <
       t'·‖A‖‖B‖ — the pair cannot reach the threshold. So every
       qualifying pair shares ≥1 term inside the LOWER-id doc's prefix,
       and candidates = prefix(id_a) ⋈ full-index(id_b) on term with
       id_a < id_b is complete (Bayardo's All-Pairs generation).

    2. POSITIONAL FILTER (candidate pruning, PPJoin's idea adapted).
       For a candidate pair, let τ be its globally-FIRST visible shared
       term. Because per-doc order preserves the global order, no
       shared term precedes τ in either doc (a globally-earlier shared
       term in A would sit at a lower rank than τ, hence inside the
       prefix, hence be visible — contradiction). So ALL shared terms
       live in both suffixes at τ and
       dot ≤ √(ssq_A(τ))·√(ssq_B(τ)): a pair whose τ-row bound is
       below t' is provably under threshold and never reaches the
       verify join. This is the filter that matters on clustered
       corpora: incidental single-rare-term collisions carry tiny
       suffix mass and die here (measured at sf1: 37.2M raw candidates
       → the verify join sees only the survivors).

    t' = threshold − 1e-6 absorbs the final 6-dp half-up rounding, so
    both prunes stay conservative even for pairs that round UP onto the
    threshold; the positional comparison runs in double with a 1e-9
    conservative slack (doubles are 1e-16-accurate — the slack keeps
    the prune lossless, and engine agreement is NOT required for an
    internal prune: the verify stage recomputes exact dots for every
    survivor).

    Exactness (the portability contract of the exact form, inherited):
    weights are integers, suffix sums and the prefix comparison are
    decimal(38,0) — suffix_sq·10¹² ≥ tppm'²·‖A‖² with tppm' =
    round(t'·10⁶); the verify stage reuses the exact dot/norm decimal
    math, so the output hash-matches the exact form bit-for-bit.
    Headroom: suffix_sq·10¹² needs Σw² ≲ 10²⁶ per doc (w ∝ N·idf_scale
    ⇒ fine to ~10¹⁰ docs of 10³ terms).

    Output: (id_a, id_b, cos_sim) with id_a < id_b — identical schema
    and values to ``tfidf_cosine_pairs``.
    """
    from pyspark.sql import Window

    kept_terms, weighted = _tfidf_weighted(
        df, text_col, id_col, max_term_df, max_term_df_frac, idf_scale
    )
    wd = F.col("w").cast("decimal(19,0)")
    w2 = (wd * wd).cast("decimal(38,0)")
    # per-doc suffix-of-squares under the GLOBAL (df, term) order: one
    # doc-partitioned window (bounded state — a doc's own term count);
    # ranked ONCE, shared by both prune stages and both verify sides
    dw = Window.partitionBy("id").orderBy(F.asc("df"), F.asc("term"))
    ranked = weighted.select(
        "term",
        "id",
        "df",
        "w",
        F.sum(w2)
        .over(dw.rowsBetween(Window.currentRow, Window.unboundedFollowing))
        .alias("_ssq"),
        F.sum(w2)
        .over(dw.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("_nsq"),
    ).localCheckpoint(eager=True)
    tppm = int(round((float(threshold) - 1e-6) * 1_000_000))
    prefix = ranked.where(
        F.col("_ssq") * F.lit(10**12).cast("decimal(38,0)")
        >= F.lit(tppm * tppm).cast("decimal(38,0)") * F.col("_nsq")
    ).select(
        "term",
        "df",
        F.col("id").alias("id_a"),
        F.col("_ssq").cast("double").alias("_sa"),
        F.col("_nsq").cast("double").alias("_na2"),
    )
    full_b = ranked.select(
        "term",
        F.col("id").alias("id_b"),
        F.col("_ssq").cast("double").alias("_sb"),
        F.col("_nsq").cast("double").alias("_nb2"),
    )
    # positional filter at the globally-first visible shared term τ:
    # lexicographic MIN over (df, term) carries that row's suffix
    # bounds; the double comparison keeps a 1e-9 conservative slack
    t2 = (tppm / 1_000_000.0) ** 2
    cands = (
        prefix.join(full_b, "term")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.min(
                F.struct("df", "term", "_sa", "_sb", "_na2", "_nb2")
            ).alias("_tau")
        )
        .where(
            F.col("_tau._sa") * F.col("_tau._sb")
            >= F.lit(t2 * (1.0 - 1e-9)) * F.col("_tau._na2") * F.col("_tau._nb2")
        )
        .select("id_a", "id_b")
    )
    # verify survivors ONLY, with the exact form's decimal dot/norm math
    # but WITHOUT re-exploding pairs into posting rows (a survivor×terms
    # join shuffles |pairs|·|doc| rows — measured 4× the whole operator
    # at sf1): each doc collapses to ONE (term → w) map row + its norm,
    # the pair table joins the two doc rows by id (broadcast when the
    # doc-map relation is small, plain hash join at corpus scale), and
    # the dot is a JVM-side fold over A's entries with map lookups into
    # B — exact decimal sums, zero extra shuffle, order-independent.
    docvecs = ranked.groupBy("id").agg(
        F.map_from_entries(F.collect_list(F.struct("term", "w"))).alias("_tw"),
        F.sqrt(F.sum(wd * wd).cast("double")).alias("norm"),
    )
    a_side = docvecs.select(
        F.col("id").alias("id_a"), F.col("_tw").alias("_twa"), F.col("norm").alias("_na")
    )
    b_side = docvecs.select(
        F.col("id").alias("id_b"), F.col("_tw").alias("_twb"), F.col("norm").alias("_nb")
    )
    # one key-merge per pair (map_zip_with), not one O(|map|) lookup per
    # term: products land in a merged map, the fold sums its values
    dot = F.aggregate(
        F.map_values(
            F.map_zip_with(
                "_twa",
                "_twb",
                lambda _, a, b: (
                    F.coalesce(a, F.lit(0)).cast("decimal(19,0)")
                    * F.coalesce(b, F.lit(0)).cast("decimal(19,0)")
                ),
            )
        ),
        F.lit(0).cast(_D38),
        lambda acc, v: acc + v.cast(_D38),
    )
    return (
        cands.join(a_side, "id_a")
        .join(b_side, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                dot.cast("double") / (F.col("_na") * F.col("_nb")), 6
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def corpus_frequency_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rare_df_max: int = 2,
) -> DataFrame:
    """Corpus-statistics quality signal — the engine-portable stand-in
    for LM-perplexity filtering: documents dominated by corpus-rare
    tokens are gibberish/OCR noise; documents of only ubiquitous tokens
    are boilerplate. Per document:

      mean_token_df  — mean document-frequency of its token INSTANCES,
                       as a fraction of corpus size (high ⇒ generic)
      rare_frac      — fraction of instances whose token appears in
                       ≤ ``rare_df_max`` documents (high ⇒ noise)

    Both are ratios of exact integer sums (Σ df over instances, counts).
    The 6-dp rounding itself is INTEGER half-up — round(a/b, 6) computed
    as (2·10⁶·a + b) div (2·b), divided by 10⁶ once at the boundary —
    because engine round(double, 6) implementations disagree on
    tie-adjacent values (Spark rounds the double's exact decimal
    expansion; DuckDB rounds x·10⁶ in floating point — at corpus scale
    some ratio always lands on the disagreement). Headroom: 2·10⁶·Σdf
    needs Σdf ≲ 4.6e12 — fine to ~10⁹ docs of 10³ tokens.

    Scale: ONE (doc, term) shuffle for tf, df from the collapsed tf
    relation, a doc-keyed weighted sum — the tf-idf plan shape, reused.
    """
    toks = _word_tokens(text_col)
    tf = (
        df.select(F.col(id_col).alias("id"), F.explode(toks).alias("term"))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    per_doc = (
        tf.join(dfc, "term")
        .groupBy("id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("df")).cast("bigint").alias("_df_sum"),
            F.sum(
                F.when(F.col("df") <= rare_df_max, F.col("tf")).otherwise(F.lit(0))
            ).cast("bigint").alias("_rare"),
        )
    )
    out = per_doc.crossJoin(F.broadcast(n)).select(
        F.col("id").alias(id_col),
        "n_tokens",
        (
            F.expr(
                "(2000000 * _df_sum + n_tokens * n_docs)"
                " div (2 * n_tokens * n_docs)"
            )
            / F.lit(1000000.0)
        ).alias("mean_token_df"),
        (
            F.expr("(2000000 * _rare + n_tokens) div (2 * n_tokens)")
            / F.lit(1000000.0)
        ).alias("rare_frac"),
    )
    # docs that tokenize to nothing still get a row (0, 0.0, 0.0)
    ids = df.select(F.col(id_col))
    return ids.join(out, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
        F.coalesce("mean_token_df", F.lit(0.0)).alias("mean_token_df"),
        F.coalesce("rare_frac", F.lit(0.0)).alias("rare_frac"),
    )


def collocation_lift(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """Collocation mining by LIFT — the log-free twin of pointwise mutual
    information (PMI = log lift; the log is monotone, so the RANKING is
    identical, and the ratio needs no libm): (w1, w2, pair_count, lift)
    for the ``top_k`` adjacent bigrams with lift = c12·N / (c1·c2),
    N = total token occurrences. The products are computed in DOUBLE
    (counts promote before multiplying): int64 products would silently
    wrap once c12·N crosses 2^63 — guaranteed at web-corpus scale —
    while IEEE double multiply/divide is correctly rounded and therefore
    still bit-identical across engines (the same portability class as
    the tf-idf ratio scores).

    Scale: bigrams come from a zero-shuffle per-row array fold (adjacent
    slots of the materialized token array — no window over the corpus),
    then ONE (w1,w2) groupBy and ONE unigram groupBy; unigram counts are
    corpus-vocabulary-sized, so both joins onto the bigram relation
    broadcast. Top-k is orderBy+limit → TakeOrderedAndProject (per-
    partition heaps, no global sort). ``min_count`` suppresses the
    rare-pair lift explosion (a hapax pair of two hapax words has lift N).
    """
    toks = _word_tokens(text_col)
    toked = df.select(toks.alias("_toks")).where(F.size("_toks") >= 2)
    bigrams = (
        toked.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_toks) - 1),"
                    " i -> struct(_toks[i-1] AS w1, _toks[i] AS w2))"
                )
            ).alias("bg")
        )
        .groupBy(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_count"))
        .where(F.col("pair_count") >= min_count)
    )
    uni = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    n = uni.agg(F.sum("c").cast("bigint").alias("n_tokens"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    lift = (F.col("pair_count").cast("double") * F.col("n_tokens")) / (
        F.col("c1").cast("double") * F.col("c2")
    )
    return (
        bigrams.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n))
        .select("w1", "w2", "pair_count", F.round(lift, 6).alias("lift"))
        .orderBy(F.desc("lift"), "w1", "w2")
        .limit(top_k)
    )


def bigram_lm_topk(
    df: DataFrame,
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Add-one-smoothed bigram language model, served as the top-``k``
    next-token table: (w1, w2, pair_count, prob) with

        P(w2 | w1) = (c12 + 1) / (c1 + V)

    (Laplace smoothing over the corpus vocabulary V — the textbook
    n-gram LM; public method). c1 is the BIGRAM-PREFIX count
    (Σ_w2 c12, occurrences of w1 that HAVE a successor), not the raw
    unigram count: with the prefix denominator Σ_{w2∈V} P(w2|w1) = 1
    exactly — a word that frequently ends documents would otherwise get
    a deficient (non-normalized) distribution and bias every perplexity
    downstream. The LM twin of ``collocation_lift``: lift asks
    "surprisingly together?", the LM asks "what follows?". For fixed w1
    the smoothed probability is monotone in c12, so the top-k cut ranks
    on exact integer counts ((c12 DESC, w2 ASC) row_number —
    deterministic); the probability itself is one double division at
    the output boundary, correctly rounded on any engine.

    Scale: bigrams fold per row (zero shuffle), ONE (w1,w2) groupBy,
    unigram/vocab aggregates broadcast back, and the per-w1 window ranks
    at most |vocab| rows per partition key. Output is ≤ k·V rows — the
    model artifact, not the corpus.
    """
    from pyspark.sql import Window

    toks = _word_tokens(text_col)
    toked = df.select(toks.alias("_toks")).where(F.size("_toks") >= 2)
    bigrams = (
        toked.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_toks) - 1),"
                    " i -> struct(_toks[i-1] AS w1, _toks[i] AS w2))"
                )
            ).alias("bg")
        )
        .groupBy(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_count"))
    )
    pre = bigrams.groupBy("w1").agg(
        F.sum("pair_count").cast("bigint").alias("c1")
    )
    vocab = (
        df.select(F.explode(_word_tokens(text_col)).alias("w"))
        .agg(F.count_distinct("w").cast("bigint").alias("_v"))
    )
    w = Window.partitionBy("w1").orderBy(F.desc("pair_count"), F.asc("w2"))
    prob = (F.col("pair_count") + 1).cast("double") / (
        F.col("c1") + F.col("_v")
    )
    return (
        bigrams.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .join(F.broadcast(pre), "w1")
        .crossJoin(F.broadcast(vocab))
        .select("w1", "w2", "pair_count", F.round(prob, 6).alias("prob"))
    )


def doc_lm_surprisal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    ppm_scale: int = 1_000_000,
    lm_df: DataFrame | None = None,
) -> DataFrame:
    """Perplexity-style quality filter without a neural LM: score every
    document by its average bigram transition probability under the
    corpus's OWN bigram model and return the ``k`` most surprising
    (lowest-probability) documents — the classic "LM filter" step of a
    training-data pipeline (documents whose word transitions the corpus
    itself finds improbable are boilerplate, garbled text, or outliers).

    All arithmetic is exact integer parts-per-million:

        prob_ppm(w1→w2) = (ppm_scale · c12) div c1
        avg_ppm(doc)    = Σ prob_ppm div n_bigrams

    c1 is the bigram-prefix count (Σ_w2 c12), so probabilities normalize
    per head word; no logs, no float sums — the ranking is a pure integer
    function of the corpus and therefore engine-portable bit-for-bit
    (the same fixed-point discipline as the iterative graph operators).

    Scale: doc-bigrams fold per row (zero shuffle, one array transform),
    the LM is ONE (w1,w2) groupBy over the same relation, and scoring is
    an equi-join back on (w1,w2) + a per-doc aggregate — two shuffles
    total, both map-side-combinable. Stop-word bigrams are hot join keys;
    AQE skew-split handles them (the LM side is one row per key, so the
    join never amplifies). Bottom-k is TakeOrderedAndProject.

    CROSS-DOMAIN mode (``lm_df`` given): the LM trains on ``lm_df``'s
    text and scores ``df`` — the CCNet-style domain filter (score web
    text under a clean-corpus LM). Bigrams unseen by the foreign LM
    can't be scored; the output then adds ``total_bigrams`` and
    ``coverage_ppm`` (scored/total) so low-coverage scores are visibly
    low-evidence, and ``avg_prob_ppm`` averages over SCORED bigrams.
    """
    doc_bg = _doc_bigrams(df, text_col, id_col)
    lm_bg = doc_bg if lm_df is None else _doc_bigrams(lm_df, text_col, id_col)
    c12 = lm_bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c12")
    )
    lm = c12.join(
        c12.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1")), "w1"
    ).select(
        "w1",
        "w2",
        F.expr(f"({ppm_scale} * c12) div c1").cast("bigint").alias("prob_ppm"),
    )
    scored = (
        doc_bg.join(lm, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("prob_ppm").cast("bigint").alias("_sum_ppm"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.expr("_sum_ppm div n_bigrams").cast("bigint").alias("avg_prob_ppm"),
        )
    )
    if lm_df is not None:
        totals = doc_bg.groupBy(id_col).agg(
            F.count(F.lit(1)).cast("bigint").alias("total_bigrams")
        )
        scored = scored.join(totals, id_col).select(
            id_col,
            "n_bigrams",
            "total_bigrams",
            F.expr(f"({ppm_scale} * n_bigrams) div total_bigrams")
            .cast("bigint")
            .alias("coverage_ppm"),
            "avg_prob_ppm",
        )
    return scored.orderBy(F.asc("avg_prob_ppm"), F.asc(id_col)).limit(k)


def _doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) word-bigram relation: per-row array fold, zero
    shuffle."""
    toks = _word_tokens(text_col)
    return (
        df.select(F.col(id_col), toks.alias("_toks"))
        .where(F.size("_toks") >= 2)
        .select(
            id_col,
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_toks) - 1),"
                    " i -> struct(_toks[i-1] AS w1, _toks[i] AS w2))"
                )
            ).alias("bg"),
        )
        .select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )


def ngram_diversity(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    n: int = 3,
    ppm_scale: int = 1_000_000,
) -> DataFrame:
    """N-gram diversity audit per corpus slice — the repetitiveness /
    memorization-risk profile (a distinct-over-total ratio is the
    corpus-level analog of Self-BLEU; public method): per group,

        total_ngrams, distinct_ngrams, distinct_ppm = distinct/total,
        total_words,  distinct_words,  ttr_ppm      = type-token ratio

    in exact integer ppm. Low distinct_ppm = boilerplate-heavy slice
    (templates, scraped duplicates); the audit that decides which
    sources need aggressive dedup before training.

    Scale: word n-grams fold per row (zero shuffle), then ONE
    (group, gram) groupBy collapses duplicates map-side before the
    per-group count — the same two-phase shape as exact dedup; no
    countDistinct over raw grams.
    """
    toks = _word_tokens(text_col)
    grams = (
        df.select(F.col(group_col).alias("_g"), toks.alias("_toks"))
        .where(F.size("_toks") >= n)
        .select(
            "_g",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(_toks) - {n} + 1),"
                    f" i -> array_join(slice(_toks, i, {n}), ' '))"
                )
            ).alias("_gram"),
        )
    )
    gram_stats = (
        grams.groupBy("_g", "_gram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
        .groupBy("_g")
        .agg(
            F.sum("_c").cast("bigint").alias("total_ngrams"),
            F.count(F.lit(1)).cast("bigint").alias("distinct_ngrams"),
        )
    )
    words = df.select(F.col(group_col).alias("_g"), F.explode(toks).alias("_w"))
    word_stats = (
        words.groupBy("_g", "_w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
        .groupBy("_g")
        .agg(
            F.sum("_c").cast("bigint").alias("total_words"),
            F.count(F.lit(1)).cast("bigint").alias("distinct_words"),
        )
    )
    return (
        gram_stats.join(word_stats, "_g")
        .select(
            F.col("_g").alias(group_col),
            "total_ngrams",
            "distinct_ngrams",
            F.expr(f"({ppm_scale} * distinct_ngrams) div total_ngrams")
            .cast("bigint")
            .alias("distinct_ppm"),
            "total_words",
            "distinct_words",
            F.expr(f"({ppm_scale} * distinct_words) div total_words")
            .cast("bigint")
            .alias("ttr_ppm"),
        )
        .orderBy(group_col)
    )


def oov_rate(
    df: DataFrame,
    vocab_size: int = 1000,
    group_col: str = "source",
    text_col: str = "text",
    ppm_scale: int = 1_000_000,
) -> DataFrame:
    """Out-of-vocabulary audit: per corpus slice, the fraction of word
    occurrences not covered by the corpus-global top-``vocab_size``
    vocabulary (ties broken by term, same rule as ``build_vocab``) —
    the tokenizer-coverage check run before committing to a vocab
    (slices with high OOV get mangled into byte fallbacks at training
    time). Returns (group, total_tokens, oov_tokens, oov_ppm).

    Scale: term counts aggregate once ((group, word) then word), the
    vocab is a TakeOrdered top-k small enough to broadcast, and OOV is
    a broadcast LEFT ANTI of the (group, word) count table — never a
    join against raw token occurrences.
    """
    toks = _word_tokens(text_col)
    gw = (
        df.select(F.col(group_col).alias("_g"), F.explode(toks).alias("_w"))
        .groupBy("_g", "_w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    )
    vocab = (
        gw.groupBy("_w")
        .agg(F.sum("_c").alias("_tf"))
        .orderBy(F.desc("_tf"), F.asc("_w"))
        .limit(int(vocab_size))
        .select("_w")
    )
    totals = gw.groupBy("_g").agg(F.sum("_c").cast("bigint").alias("total_tokens"))
    oov = (
        gw.join(F.broadcast(vocab), "_w", "left_anti")
        .groupBy("_g")
        .agg(F.sum("_c").cast("bigint").alias("oov_tokens"))
    )
    return (
        totals.join(oov, "_g", "left")
        .select(
            F.col("_g").alias(group_col),
            "total_tokens",
            F.coalesce(F.col("oov_tokens"), F.lit(0)).cast("bigint").alias(
                "oov_tokens"
            ),
            F.expr(
                f"({ppm_scale} * coalesce(oov_tokens, 0)) div total_tokens"
            )
            .cast("bigint")
            .alias("oov_ppm"),
        )
        .orderBy(group_col)
    )


def vocab_drift_report(
    df_old: DataFrame,
    df_new: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """Vocabulary drift between two corpus snapshots — the data-drift
    monitor a continuously-ingested training corpus needs: (term,
    c_old, c_new, rate_ratio) for the ``top_k`` terms whose smoothed
    occurrence RATE moved the most, where

        rate_ratio = ((c_new+1)/(N_new+V)) / ((c_old+1)/(N_old+V))

    (add-one smoothing over the UNION vocabulary V, so terms appearing
    in only one snapshot still get a finite, comparable ratio). Ranking
    takes max(ratio, 1/ratio) — drift in either direction — with
    (term ASC) ties; ratios are boundary-rounded doubles over exact
    integer counts, so the report is engine-reproducible.

    Scale: one term-count aggregate per snapshot, a full-outer join on
    the term (vocabulary-sized, not corpus-sized), two scalar frames
    broadcast back, TakeOrdered top-k. ``min_count`` (on either side)
    keeps hapax noise out of the report.
    """
    def counts(d: DataFrame) -> DataFrame:
        return (
            d.select(F.explode(_word_tokens(text_col)).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )

    old_c = counts(df_old)
    new_c = counts(df_new)
    # totals and V come from the UNFILTERED union (the documented
    # denominators): min_count only gates which terms are REPORTED —
    # otherwise raising the noise threshold would silently rescale every
    # surviving term's ratio
    j_all = (
        old_c.withColumnRenamed("c", "c_old")
        .join(new_c.withColumnRenamed("c", "c_new"), "term", "full_outer")
        .select(
            "term",
            F.coalesce("c_old", F.lit(0)).alias("c_old"),
            F.coalesce("c_new", F.lit(0)).alias("c_new"),
        )
    )
    tot = j_all.agg(
        F.sum("c_old").cast("bigint").alias("_no"),
        F.sum("c_new").cast("bigint").alias("_nn"),
        F.count(F.lit(1)).cast("bigint").alias("_v"),
    )
    j = j_all.where(
        (F.col("c_old") >= min_count) | (F.col("c_new") >= min_count)
    )
    ratio = (
        (F.col("c_new") + 1).cast("double") / (F.col("_nn") + F.col("_v"))
    ) / ((F.col("c_old") + 1).cast("double") / (F.col("_no") + F.col("_v")))
    # rank on the UNROUNDED ratio: rounding first would send an extreme
    # shrink (ratio < 5e-7) to 0.0, whose reciprocal is NULL in Spark —
    # the single most-drifted term would sort last and fall out of the
    # top_k (and engines disagree on 1/0). Rounding happens only at the
    # output boundary. The smoothed ratio itself is always finite > 0.
    return (
        j.crossJoin(F.broadcast(tot))
        .withColumn("_ratio_exact", ratio)
        .withColumn(
            "_drift",
            F.greatest(F.col("_ratio_exact"), 1.0 / F.col("_ratio_exact")),
        )
        .orderBy(F.desc("_drift"), F.asc("term"))
        .limit(top_k)
        .select(
            "term", "c_old", "c_new",
            F.round(F.col("_ratio_exact"), 6).alias("rate_ratio"),
        )
    )


def hashed_ngram_importance(
    df: DataFrame,
    target_col: str,
    buckets: int = 1024,
    weight_scale: int = 1_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style hashed n-gram importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling" —
    public method): score every raw document by how target-like its
    hashed word uni+bigram distribution is, so a quality subcorpus can
    be selected from a raw crawl by importance rank.

    Engine-portable integer form of the DSIR estimator: grams hash into
    ``buckets`` via the shared 32-bit md5 hash; each bucket's weight is
    the add-one-smoothed target-share ratio in integer ``weight_scale``
    units,

        w(b) = ((target_c(b)+1) · weight_scale) div (raw_c(b)+1)

    Because target grams are a subset of raw grams, w(b) ≤ weight_scale
    — every product stays far inside int64 at ANY corpus size. The true
    DSIR ratio p_target/p_raw differs from this only by the constant
    factor raw_total/target_total, which is identical for every document
    and so cannot change the importance ORDER the operator exists to
    produce (top-k selection / resampling rank). A document's importance
    is the mean bucket weight over its gram INSTANCES —
    Σ w(bucket(g)) div n_grams — instead of DSIR's Σ log ratios: same
    target-likeness ordering signal, but exact integer arithmetic an
    external SQL oracle reproduces bit-for-bit (log is libm-dependent).

    Returns (id_col, n_grams bigint, importance_u bigint) — importance
    in ``weight_scale`` micro-units; docs with no grams get 0.

    Scale: two scans of the corpus, the fit-then-score shape every
    importance sampler has. Scan 1 aggregates raw AND target bucket
    counts in one conditional aggregate (one shuffle of ≤ ``buckets``
    groups — never materializing the gram stream); the ≤ ``buckets``-row
    weight table then BROADCASTS onto scan 2's gram stream, so per-doc
    scoring is a map-side join + one doc-keyed sum. No step touches the
    driver; the weight table is the only model state.
    """
    from megalista_spark.operators.dedup import portable_hash32

    src = df.select(
        F.col(id_col).alias("id"),
        F.col(target_col).cast("boolean").alias("_is_target"),
        F.col(text_col).alias("_text"),
    )
    # a single-row-group local file scans as ONE task, and both gram
    # passes (tokenize + explode + md5 bucket hash, the operator's
    # dominant compute) would pipeline onto that one core before their
    # first exchange — measured 9 tasks total for this operator. Spread
    # the raw rows only when the input arrives under-split; at cluster
    # scale inputs are multi-split and this costs nothing.
    sc = df.sparkSession.sparkContext
    if src.rdd.getNumPartitions() < sc.defaultParallelism:
        src = src.repartition(sc.defaultParallelism)
    toks = _word_tokens("_text")
    base = src.select("id", "_is_target", toks.alias("_t"))
    bigrams = F.expr(
        "transform(slice(_t, 1, greatest(size(_t) - 1, 0)), "
        "(x, i) -> concat(x, ' ', _t[i + 1]))"
    )
    grams = base.select(
        "id",
        "_is_target",
        F.explode(F.concat(F.col("_t"), bigrams)).alias("gram"),
    ).withColumn("bkt", portable_hash32(F.col("gram")) % buckets)
    counts = grams.groupBy("bkt").agg(
        F.count(F.lit(1)).alias("raw_c"),
        F.sum(F.when(F.col("_is_target"), 1).otherwise(0)).alias("tgt_c"),
    )
    weights = counts.select(
        "bkt",
        F.expr(
            f"((tgt_c + 1) * cast({weight_scale} as bigint)) div (raw_c + 1)"
        ).alias("w"),
    )
    scored = (
        grams.join(F.broadcast(weights), "bkt")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.expr("sum(w) div count(1)").cast("bigint").alias("importance_u"),
        )
    )
    return df.select(F.col(id_col)).join(
        scored.withColumnRenamed("id", id_col), id_col, "left"
    ).select(
        id_col,
        F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
        F.coalesce("importance_u", F.lit(0)).cast("bigint").alias("importance_u"),
    )
