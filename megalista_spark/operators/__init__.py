from megalista_spark.operators.batching import assign_batches
from megalista_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from megalista_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_cosine_topk,
)
from megalista_spark.operators.text import (
    document_fingerprint,
    language_id,
    quality_score,
    token_count,
)

__all__ = [
    "assign_batches",
    "exact_dedup",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash",
    "cosine_topk",
    "embedding_near_dup_pairs",
    "ivf_cosine_topk",
    "document_fingerprint",
    "language_id",
    "quality_score",
    "token_count",
]
