"""Fixed-density scaling experiment for embedding_lsh_near_dup
(round-12 task 7: close the watch item with evidence).

The driver-data readings (11.5-12.3x wall-clock for 10x data) left two
candidate explanations: (a) the synthetic corpus's near-dup DENSITY
grows with sf (output volume — benign), or (b) the kernel itself is
superlinear. This experiment pins the corpus: a deterministic base of
uniformly-random unit directions plus a FIXED 10% near-duplicate rate
(each dup = a base vector + 1% noise), then measures the 10x step at
the driver geometry (n_planes=16, bands=4 -> 2^4 = 16 buckets per band)
AND at an n-scaled geometry (bands=4, n_planes=24 -> 64 buckets/band at
10x the corpus).

Expected shapes, stated up front so the numbers can falsify them:
- candidate volume under a FIXED bucket count is Theta(n^2/buckets)
  for the random (non-dup) mass — the kernel is linear in CANDIDATES,
  but candidates themselves grow quadratically once n >> buckets;
- scaling the geometry with n restores ~linear candidate growth at the
  same recall family (more planes = finer buckets).

Usage: python scripts/fixed_density_lsh.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 64
DUP_RATE = 0.10
NOISE = 0.01


def corpus(spark, n: int):
    """n rows, DUP_RATE of them near-copies of earlier rows; fully
    deterministic (seeded generator, id-indexed)."""
    import numpy as np

    rng = np.random.default_rng(42)
    n_dup = int(n * DUP_RATE)
    base = rng.standard_normal((n - n_dup, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    src = rng.integers(0, n - n_dup, size=n_dup)
    dups = base[src] + NOISE * rng.standard_normal((n_dup, DIM))
    dups /= np.linalg.norm(dups, axis=1, keepdims=True)
    M = np.concatenate([base, dups])
    rows = [(i, [float(x) for x in M[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def measure(spark, n: int, n_planes: int, bands: int) -> dict:
    from megalista_spark.operators.similarity import (
        embedding_lsh_near_dup_pairs,
    )

    df = corpus(spark, n).localCheckpoint(eager=True)  # exclude gen cost

    def run():
        t0 = time.perf_counter()
        out_rows = embedding_lsh_near_dup_pairs(
            df, threshold=0.45, n_planes=n_planes, bands=bands, dim=DIM
        ).count()
        return time.perf_counter() - t0, out_rows

    run()  # pay plan codegen / arrow worker warmup
    sec, out_rows = run()

    # candidate volume diagnosis: sum C(bucket, 2) over (band, value)
    from pyspark.sql import functions as F

    from megalista_spark.operators.similarity import srp_planes

    import numpy as np

    P = np.array(srp_planes(DIM, n_planes))
    pdf = df.toPandas()
    V = np.array([list(v) for v in pdf["embedding"]])
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    bits = (V @ P.T >= 0).astype(np.int64)
    bpb = n_planes // bands
    cand = 0
    for b in range(bands):
        vals = (bits[:, b * bpb : (b + 1) * bpb] * (1 << np.arange(bpb - 1, -1, -1))).sum(axis=1)
        _, counts = np.unique(vals, return_counts=True)
        cand += int((counts * (counts - 1) // 2).sum())
    return {
        "n": n,
        "n_planes": n_planes,
        "bands": bands,
        "buckets_per_band": 2 ** bpb,
        "sec": round(sec, 3),
        "out_rows": out_rows,
        "candidates": cand,
    }


def main() -> None:
    from megalista_spark.session import get_spark

    spark = get_spark(app_name="fixed_density_lsh")
    base = measure(spark, 2_000, 16, 4)  # shared baseline (deterministic)
    res = {
        "fixed_geometry": [base, measure(spark, 20_000, 16, 4)],
        "scaled_geometry": [base, measure(spark, 20_000, 24, 4)],
    }
    for k, (a, b) in list(res.items()):
        res[f"{k}_ratios"] = {
            "time": round(b["sec"] / a["sec"], 2),
            "candidates": round(b["candidates"] / a["candidates"], 2),
            "out_rows": round(b["out_rows"] / max(a["out_rows"], 1), 2),
        }
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
