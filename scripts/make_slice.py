"""Build the deterministic 10% id-hash slice of a testdata dir — the
sliced-corpus exact-hash protocol for pair generators whose FULL outputs
are too large for a pandas-collected hash compare (compare_oracle.py's
documented stronger protocol: run the SAME query + oracle over the
slice; both engines read the same sliced parquet, so the verdict is a
full value-level hash match).

Slice rule: keep documents whose 60-bit md5 hash of the decimal doc_id
is ≡ 0 (mod 10). All other tables are copied unchanged (the sliced
queries only read documents).

Usage: python scripts/make_slice.py SRC_DIR OUT_DIR
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def main() -> None:
    src, out = sys.argv[1], sys.argv[2]
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.sql(
        f"""
        COPY (
          SELECT * FROM '{src}/documents.parquet'
          WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10 = 0
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    n = con.sql(f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
    for t in TABLES:
        if t == "documents":
            continue
        shutil.copyfile(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
    print(f"slice written to {out}: documents={n}")


if __name__ == "__main__":
    main()
