"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB over
the same parquet tables; compare row count, column names, and an
order-insensitive value hash.

Usage: python scripts/compare_oracle.py [sf_dir] [query ...]

Env:
  ORACLE_TIMEOUT_SEC — per-query DuckDB watchdog. Some oracles are
  deliberately naive (all-pairs verification, unrolled graph rounds)
  and go quadratic at large scale factors; past the timeout the oracle
  is interrupted and the query is recorded as ``oracle-timeout``
  (Spark result + rows recorded, no verdict) instead of stalling the
  whole roster. Unset = no timeout.
  DUCKDB_TEMP_DIR — spill directory for the oracle engine (default
  /tmp/duckdb_oracle_spill; sf1 oracles can spill tens of GB).
  ORACLE_USE_SCRIPTS=1 — prefer ``oracle_scripts()`` callables
  (materialized-iteration temp-table oracles) over ``oracle_sql()``
  strings where both exist. The scripts compute identical results with
  bounded memory — the path for sf1+ sweeps whose recursive/unrolled
  CTE oracles time out or exhaust the host. Default off, so the
  driver-gate behavior (single-statement oracles) is unchanged.
  ORACLE_ROWSONLY=a,b — for these names, record the Spark row COUNT
  without collecting to pandas and skip the oracle. For pair generators
  whose sf1 output is 10^8+ rows, a driver-side toPandas of the result
  is the wrong tool; the value-level verdict comes from a sliced-corpus
  run (same query + oracle over a deterministic 10% id-hash slice).
"""

from __future__ import annotations

import hashlib
import importlib.util
import os
import sys
import time

import duckdb
import pandas as pd

REPO = "/root/repo"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_entry():
    spec = importlib.util.spec_from_file_location("spark_entry", f"{REPO}/__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].map(lambda v: f"{v:.6f}" if pd.notna(v) else "NULL")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].map(lambda v: str(bool(v)))
        else:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    return hashlib.md5(
        canon(df).to_csv(index=False).encode("utf-8")
    ).hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    m = load_entry()

    sys.path.insert(0, REPO)
    from megalista_spark.session import get_spark

    spark = get_spark(app_name="compare_oracle")
    con = duckdb.connect()
    tmp = os.environ.get("DUCKDB_TEMP_DIR", "/tmp/duckdb_oracle_spill")
    os.makedirs(tmp, exist_ok=True)
    con.sql(f"SET temp_directory='{tmp}'")
    # cap the oracle engine: DuckDB defaults to ~80% of RAM and runs in
    # THIS process — an unspillable oracle plan (e.g. a list-heavy
    # self-join at sf1) otherwise grows until the kernel OOM-kills the
    # whole comparison instead of erroring the one query
    mem = os.environ.get("DUCKDB_MEMORY_LIMIT", "32GB")
    con.sql(f"SET memory_limit='{mem}'")
    threads = os.environ.get("DUCKDB_THREADS")
    if threads:
        con.sql(f"SET threads={int(threads)}")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    timeout_sec = float(os.environ.get("ORACLE_TIMEOUT_SEC", "0") or 0)

    def run_oracle(sql):
        """Run the oracle (SQL string or callable(con) -> DataFrame) with
        an interrupt watchdog; returns (df, timed_out)."""
        runner = sql if callable(sql) else (lambda c: c.sql(sql).df())
        if not timeout_sec:
            return runner(con), False
        import threading

        fired = threading.Event()
        done = threading.Event()
        lock = threading.Lock()

        def interrupt():
            # The timer can fire after con.sql() returned but before
            # timer.cancel(); interrupting then would kill the NEXT
            # oracle query. The lock + done flag make cancel-vs-fire
            # atomic: once done is set, interrupt() is a no-op.
            with lock:
                if done.is_set():
                    return
                fired.set()
                con.interrupt()

        timer = threading.Timer(timeout_sec, interrupt)
        timer.start()
        try:
            result = runner(con)
            with lock:
                done.set()
            return result, False
        except Exception:
            with lock:
                done.set()
            if fired.is_set():
                return None, True
            raise
        finally:
            timer.cancel()

    qs, oracles = m.queries(), m.oracle_sql()
    if os.environ.get("ORACLE_USE_SCRIPTS") == "1":
        oracles = {**oracles, **getattr(m, "oracle_scripts", dict)()}
    rowsonly = set(
        (os.environ.get("ORACLE_ROWSONLY") or "").split(",")
    ) - {""}
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        if name in rowsonly:
            try:
                n = fn(spark, sf_dir).count()
                print(f"rows-only  {name}: {n} rows ({time.time()-t0:.1f}s)")
            except Exception as exc:
                print(f"FAIL  {name}: spark error: {exc}")
                failures.append(name)
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            odf, timed_out = run_oracle(oracles[name])
        except Exception as exc:
            print(f"FAIL  {name}: oracle error: {str(exc)[:200]}")
            failures.append(name)
            continue
        if timed_out:
            print(
                f"oracle-timeout  {name}: spark {len(sdf)} rows "
                f"({time.time()-t0:.1f}s; oracle > {timeout_sec:.0f}s)"
            )
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        if not problems:
            hs, ho = value_hash(sdf), value_hash(odf)
            if hs != ho:
                problems.append("value-hash mismatch")
                cs, co = canon(sdf), canon(odf)
                diff = cs.compare(co) if cs.shape == co.shape else None
                if diff is not None and len(diff):
                    print(diff.head(5))
        status = "ok   " if not problems else "FAIL "
        if problems:
            failures.append(name)
        print(f"{status} {name}: {len(sdf)} rows ({time.time()-t0:.1f}s) {'; '.join(problems)}")
    print("\nFAILURES:" if failures else "\nALL MATCH", failures if failures else "")
    spark.stop()


if __name__ == "__main__":
    main()
