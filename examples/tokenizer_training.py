"""Tokenizer-training demo over the synthetic corpus — the vocabulary/
merge pipeline that runs AFTER corpus curation (examples/data_pipeline.py)
and BEFORE sequence packing:

  heavy hitters — which languages dominate the corpus (CMS sketch,
                  no distinct-domain enumeration)
  vocabulary    — top terms with dense deterministic ids
  BPE training  — learned merge table (deterministic argmax, relational
                  greedy application), then a sample tokenization that
                  applies the merges back to a word

    PYTHONPATH=. python examples/tokenizer_training.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from megalista_spark.operators.sketches import cms_heavy_hitters
from megalista_spark.operators.text import bpe_train_merges, build_vocab
from megalista_spark.session import get_spark


def main(spark=None, sf_dir=None) -> dict:
    """Run the tokenizer-training demo. ``spark=None`` (script use) owns
    its own session; an injected session (the pytest smoke test) is left
    running. Returns the trained artifacts for assertions."""
    owns_session = spark is None
    if sf_dir is None:
        sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if owns_session:
        spark = get_spark(app_name="tokenizer_training_demo")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    print("== corpus language mix (heavy hitters >= 20% via CMS) ==")
    hh = cms_heavy_hitters(
        docs.select("doc_id", "lang"), "lang", phi_permille=200
    ).orderBy("key")
    res = {"heavy_hitters": [r.asDict() for r in hh.collect()]}
    hh.show()

    print("== top-15 vocabulary (tf desc, deterministic ids) ==")
    vocab = build_vocab(docs, max_terms=15)
    res["n_vocab"] = vocab.count()
    vocab.show()

    print("== first 5 BPE merges (count desc, pair-asc tiebreak) ==")
    merges = bpe_train_merges(docs, merges=5)
    res["merges"] = [r.asDict() for r in merges.collect()]
    merges.show(truncate=False)

    print("== per-language tokenizers (grouped training, one dataflow) ==")
    bpe_train_merges(docs, merges=2, group_col="lang").show(truncate=False)

    # apply the learned merges to one word, driver-side, to show the
    # training output is a working tokenizer artifact
    word = vocab.orderBy(F.desc("tf"), F.asc("term")).first()["term"]
    syms = list(word) + ["</w>"]
    for m in merges.collect():
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == m["lhs"] and syms[i + 1] == m["rhs"]:
                out.append(m["merged"])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    print(f"tokenize({word!r}) after 5 merges -> {syms}")
    res["word"], res["tokenized"] = word, syms

    if owns_session:
        spark.stop()
    return res


if __name__ == "__main__":
    main()
