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
