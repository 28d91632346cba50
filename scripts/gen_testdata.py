"""Deterministic synthetic testdata generator — the same schema/shape
family as the driver-generated `/root/testdata/sf*` tables (TPC-H-ish
star schema + events/documents/embeddings), for scale factors the driver
did not ship (the scale-evidence runs need sf1).

The correctness gate compares Spark vs DuckDB ON THE SAME PARQUET, so
distributional identity with the driver's generator is not required —
schema parity and realistic shape (key ranges, skew, categorical sets)
are. Seeded numpy; same seed → identical bytes.

Usage: python scripts/gen_testdata.py <sf> <out_dir>
  e.g. python scripts/gen_testdata.py 1 /root/repo/testdata/sf1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

SEGMENTS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "F", "P"]
RETURNFLAGS = ["N", "A", "R"]
LINESTATUSES = ["O", "F"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.4, 0.2, 0.2, 0.1, 0.1]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
COLORS = ["red", "blue", "green", "small", "hot", "cold", "dim", "shiny"]
NOUNS = ["widget", "gizmo", "bolt", "gear", "ring", "spring", "cog", "lever"]
PTYPES = ["ECONOMY", "SMALL", "STANDARD", "LARGE", "PROMO"]
# common head words (driver-style) + a long zipf tail of synthetic rare
# words — at 50k docs a tiny vocab would make EVERY pair a near-duplicate
# (Jaccard over ≤40-element sets), blowing up the pair-verify queries in
# both engines; the tail keeps near-dup density realistic at scale
VOCAB = (
    "the a key value row table part data column line query scan filter join "
    "agg window order group hash sort merge batch stream spark small fast "
    "slow customer order part supplier big wide deep plan stage task shuffle"
).split() + [f"w{i:04d}" for i in range(2000)]


def _ts(base: str, offsets_sec: np.ndarray) -> pa.Array:
    base_ns = np.datetime64(base).astype("datetime64[us]")
    return pa.array(base_ns + offsets_sec.astype("timedelta64[us]"))


def generate(sf: float, out: str) -> None:
    rng = np.random.default_rng(SEED)
    os.makedirs(out, exist_ok=True)

    n_cust = max(150, int(150_000 * sf))
    n_supp = max(10, int(10_000 * sf))
    n_part = max(200, int(200_000 * sf))
    n_ord = max(1_500, int(1_500_000 * sf))
    n_line = int(n_ord * 4)
    n_evt = max(1_000, int(1_000_000 * sf))
    n_doc = max(50, int(50_000 * sf))
    n_emb = n_doc
    n_users = max(150, int(15_000 * sf))

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {table.num_rows} rows")

    write(
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": REGIONS,
            }
        ),
    )
    write(
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
    )
    write(
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": pa.array(
                    rng.integers(0, 25, n_cust).astype(np.int32)
                ),
                "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
                "c_mktsegment": pa.array(
                    np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]
                ),
            }
        ),
    )
    write(
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(
                    rng.integers(0, 25, n_supp).astype(np.int32)
                ),
                "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
            }
        ),
    )
    ci = rng.integers(0, len(COLORS), n_part)
    ni = rng.integers(0, len(NOUNS), n_part)
    write(
        "part",
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
                "p_name": [f"{COLORS[a]} {NOUNS[b]}" for a, b in zip(ci, ni)],
                "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
                "p_type": pa.array(
                    np.array(PTYPES)[rng.integers(0, len(PTYPES), n_part)]
                ),
                "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
                "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
            }
        ),
    )

    o_key = np.arange(n_ord, dtype=np.int64)
    o_cust = rng.integers(0, n_cust, n_ord)
    o_date_off = rng.integers(0, 2400, n_ord) * 86_400  # ~1995-2001 days
    write(
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(o_key),
                "o_custkey": pa.array(o_cust),
                "o_orderstatus": pa.array(
                    np.array(STATUSES)[rng.integers(0, 3, n_ord)]
                ),
                "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
                "o_orderdate": _ts("1995-01-01T00:00:00", o_date_off),
                "o_orderpriority": pa.array(
                    np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
                ),
            }
        ),
    )

    l_order = rng.integers(0, n_ord, n_line)
    l_order.sort()
    # 1-based line number within order
    _, starts = np.unique(l_order, return_index=True)
    linenum = np.arange(n_line, dtype=np.int64)
    linenum -= np.repeat(starts, np.diff(np.append(starts, n_line)))
    qty = rng.integers(1, 51, n_line).astype(np.float64)
    price = np.round(rng.uniform(900, 105_000, n_line), 2)
    write(
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(l_order),
                "l_partkey": pa.array(rng.integers(0, n_part, n_line)),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n_line)),
                "l_linenumber": pa.array((linenum + 1).astype(np.int32)),
                "l_quantity": qty,
                "l_extendedprice": price,
                "l_discount": np.round(rng.integers(0, 11, n_line) / 100.0, 2),
                "l_tax": np.round(rng.integers(0, 9, n_line) / 100.0, 2),
                "l_returnflag": pa.array(
                    np.array(RETURNFLAGS)[rng.integers(0, 3, n_line)]
                ),
                "l_linestatus": pa.array(
                    np.array(LINESTATUSES)[rng.integers(0, 2, n_line)]
                ),
                "l_shipdate": _ts(
                    "1995-01-01T00:00:00",
                    o_date_off[l_order] + rng.integers(1, 95, n_line) * 86_400,
                ),
            }
        ),
    )

    # uniform user assignment, matching the driver's observed shape
    # (sf0.1: 1500 users, max 99 events/user ≈ Poisson tail). zipf(1.5)
    # was tried first and hands ONE user 38% of all events — that is a
    # skew STRESS shape, not the driver's; scale-evidence runs must
    # measure scaling on driver-shaped data (skew stress lives in the
    # dedicated skew tests/queries instead)
    user_pop = rng.integers(0, n_users, n_evt)
    write(
        "events",
        pa.table(
            {
                "event_id": pa.array(np.arange(n_evt, dtype=np.int64)),
                "ts": _ts(
                    "2024-01-01T00:00:00",
                    np.sort(rng.integers(0, 30 * 86_400 * 10**6, n_evt)),
                ),
                "user_id": pa.array(user_pop.astype(np.int64)),
                "event_type": pa.array(
                    np.array(EVENT_TYPES)[
                        rng.choice(5, n_evt, p=[0.45, 0.3, 0.1, 0.05, 0.1])
                    ]
                ),
                "value": np.round(rng.uniform(0.01, 500, n_evt), 2),
                "props": [
                    '{"k": %d}' % k for k in rng.integers(0, 100, n_evt)
                ],
            }
        ),
    )

    vocab = np.array(VOCAB)
    zipf_w = 1.0 / np.arange(1, len(vocab) + 1)
    zipf_w /= zipf_w.sum()
    lens = rng.integers(10, 101, n_doc)
    texts = [
        " ".join(vocab[rng.choice(len(vocab), ln, p=zipf_w)]) for ln in lens
    ]
    write(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_doc, dtype=np.int64)),
                "text": texts,
                "lang": pa.array(
                    np.array(LANGS)[rng.choice(5, n_doc, p=LANG_W)]
                ),
                "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
                "n_chars": pa.array(
                    np.array([len(t) for t in texts], dtype=np.int64)
                ),
            }
        ),
    )

    # near-orthogonal unit vectors (driver semantics: max pairwise cosine
    # ~0.5 at sf0.01) — clustered embeddings would make every
    # intra-cluster pair a near-duplicate and square the pair queries
    labels = rng.integers(0, 10, n_emb)
    vecs = rng.normal(0, 1, (n_emb, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
                "embedding": pa.array(
                    list(vecs), pa.list_(pa.float32())
                ),
                "label": pa.array(labels.astype(np.int32)),
            }
        ),
    )


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/root/repo/testdata/sf{sys.argv[1]}"
    generate(sf, out)
