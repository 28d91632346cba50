"""Training-data pipeline demo over the synthetic corpus: dedup cascade
(exact → fingerprint → MinHash-LSH) + quality filtering + ANN search.

    PYTHONPATH=. python examples/data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from megalista_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
from megalista_spark.operators.similarity import cosine_topk
from megalista_spark.operators.text import document_fingerprint, quality_score
from megalista_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="example_pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # 1. exact dedup — survivors only
    survivors = exact_dedup(docs)
    print(f"exact dedup: {docs.count()} docs -> {survivors.count()} unique texts")

    # 2. near-dup candidates via MinHash LSH
    near = minhash_lsh_pairs(docs, num_hashes=16, bands=4)
    print(f"minhash-lsh candidate near-dup pairs: {near.count()}")

    # 3. formatting-robust fingerprint dedup
    fp = document_fingerprint(docs).groupBy("fingerprint").count().where("count > 1")
    print(f"fingerprint collisions: {fp.count()}")

    # 4. quality gate
    q = quality_score(docs)
    kept = q.where(F.col("passes_quality"))
    print(f"quality gate: {q.count()} -> {kept.count()} pass")

    # 5. ANN over embeddings
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = cosine_topk(emb, queries, k=5)
    topk.show(15, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
