"""Sequence packing and document chunking — the layout stage of an LLM
training-data pipeline: turning a filtered, deduplicated corpus into
fixed-token-budget training sequences (packing) and overlapping
retrieval chunks (chunking).

Both are deterministic pure functions of the input rows (portable hash
order, exact integer arithmetic) so a SQL oracle reproduces them
bit-for-bit, and both follow the library's shuffle discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from megalista_spark.operators.dedup import portable_hash64, tokens_expr

# ---------------------------------------------------------- sequence packing


def pack_sequences(
    df: DataFrame,
    budget: int = 512,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "pack",
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid end-to-end
    (in deterministic hash order) and the token stream is cut into
    fixed-``budget`` packs; a document straddling a cut contributes a
    slice to each side — the standard pre-training sequence construction
    (no padding waste, exact budget per pack).

    A single global concatenation would serialize on one sorted
    partition, so the stream is sharded first: ``shard =
    portable_hash(salt|doc_id) % n_shards`` and each shard packs
    independently (its window sort runs in parallel; at cluster scale
    pick ``n_shards`` ≈ a small multiple of executor count — packs never
    cross shards, so the only coordination is the shard-local prefix
    sum). Empty documents are dropped (they occupy no tokens).

    Output, one row per (document × pack it touches):
    ``(shard, pack_id, doc_id, pack_tok_start, doc_tok_start,
    doc_tok_end)`` — pack ``(shard, pack_id)`` is assembled by
    concatenating its rows ordered by ``pack_tok_start``, taking tokens
    ``[doc_tok_start, doc_tok_end)`` of each document. Every pack except
    each shard's last is exactly ``budget`` tokens.
    """
    n_tok = F.size(tokens_expr(F.col(text_col)))
    base = (
        df.select(
            F.col(id_col).alias("doc_id"),
            n_tok.cast("bigint").alias("_n"),
            (
                portable_hash64(
                    F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string"))
                )
            ).alias("_h"),
        )
        .where(F.col("_n") > 0)
        .withColumn("shard", (F.col("_h") % n_shards).cast("bigint"))
    )
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(), F.col("doc_id").asc())
    laid = base.select(
        "shard",
        "doc_id",
        "_n",
        (F.coalesce(F.sum("_n").over(w), F.lit(0)) - F.col("_n")).alias("_start"),
    )
    b = F.lit(budget).cast("bigint")
    spans = laid.select(
        "shard",
        "doc_id",
        "_n",
        "_start",
        F.floor(F.col("_start") / b).alias("_p0"),
        F.floor((F.col("_start") + F.col("_n") - 1) / b).alias("_p1"),
    )
    exploded = spans.select(
        "shard",
        "doc_id",
        "_n",
        "_start",
        F.explode(F.sequence(F.col("_p0"), F.col("_p1"))).alias("pack_id"),
    )
    tok_lo = F.greatest(F.col("pack_id") * b, F.col("_start"))
    tok_hi = F.least((F.col("pack_id") + 1) * b, F.col("_start") + F.col("_n"))
    return exploded.select(
        "shard",
        F.col("pack_id").cast("bigint").alias("pack_id"),
        "doc_id",
        (tok_lo - F.col("pack_id") * b).cast("bigint").alias("pack_tok_start"),
        (tok_lo - F.col("_start")).cast("bigint").alias("doc_tok_start"),
        (tok_hi - F.col("_start")).cast("bigint").alias("doc_tok_end"),
    )


# --------------------------------------------------------- document chunking


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping fixed-size chunking (RAG / long-context windowing):
    each document yields windows of ``chunk_tokens`` whitespace tokens
    starting every ``stride`` tokens (overlap = chunk_tokens - stride).
    The final window is the (possibly shorter) tail; a document shorter
    than one chunk yields itself. Empty documents yield nothing.

    Output: ``(doc_id, chunk_idx, tok_start, tok_end, chunk_text)`` with
    token offsets [tok_start, tok_end) and the chunk text re-joined with
    single spaces.

    Scale: per-row explode, no shuffle; output size is input size ×
    (1/stride overlap factor). Token arrays materialize once per row
    (array slice per chunk, not re-tokenization).
    """
    if not (0 < stride <= chunk_tokens):
        raise ValueError("require 0 < stride <= chunk_tokens")
    toked = df.select(
        F.col(id_col).alias("doc_id"), tokens_expr(F.col(text_col)).alias("_toks")
    ).where(F.size("_toks") > 0)
    n = F.size("_toks")
    # chunk starts: 0, stride, 2*stride, ... while start < n and the
    # PREVIOUS chunk did not already cover the tail (start=0 always).
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.floor((n - F.lit(chunk_tokens) + F.lit(stride) - 1) / F.lit(stride)) + 1
    )
    exploded = toked.select(
        "doc_id",
        "_toks",
        F.posexplode(F.sequence(F.lit(0), n_chunks.cast("int") - 1)).alias(
            "chunk_idx", "_c"
        ),
    )
    start = F.col("_c") * stride
    end = F.least(start + chunk_tokens, F.size("_toks"))
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        start.cast("bigint").alias("tok_start"),
        end.cast("bigint").alias("tok_end"),
        F.concat_ws(
            " ", F.slice(F.col("_toks"), start + 1, end - start)
        ).alias("chunk_text"),
    )
