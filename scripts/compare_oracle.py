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
    checksum = set(
        (os.environ.get("ORACLE_CHECKSUM") or "").split(",")
    ) - {""}

    def spark_checksum(df):
        """Order-insensitive full-output checksum computed IN Spark:
        sum over rows of the 60-bit md5 of a canonical '|'-joined
        rendering (floats → round(x·1e6) bigint; NULL → 'NULL'), plus
        the row count — never collects the result set."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        exprs = []
        for f in sorted(df.schema.fields, key=lambda f: f.name):
            c = F.col(f.name)
            if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
                c = F.round(c * 1_000_000).cast("bigint")
            elif isinstance(f.dataType, T.TimestampType):
                c = F.unix_micros(c)
            exprs.append(F.coalesce(c.cast("string"), F.lit("NULL")))
        sig = F.conv(F.substring(F.md5(F.concat_ws("|", *exprs)), 1, 15), 16, 10)
        row = df.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(sig.cast("decimal(38,0)")).cast("string").alias("cks"),
        ).collect()[0]
        return row["n"], row["cks"]

    def oracle_checksum(sql):
        """Same canonical checksum computed IN DuckDB over the oracle's
        result — the result set never leaves the engine."""
        cols = con.sql(f"DESCRIBE SELECT * FROM ({sql}) _q").df()
        exprs = []
        for _, r in sorted(cols.iterrows(), key=lambda kv: kv[1]["column_name"]):
            name, typ = r["column_name"], str(r["column_type"]).upper()
            e = f'"{name}"'
            if typ in ("DOUBLE", "FLOAT", "REAL"):
                e = f"CAST(round({e} * 1000000) AS BIGINT)"
            elif typ.startswith("TIMESTAMP"):
                e = f"epoch_us({e}::TIMESTAMP)"
            exprs.append(f"coalesce(CAST({e} AS VARCHAR), 'NULL')")
        joined = " || '|' || ".join(exprs) if len(exprs) > 1 else exprs[0]
        q = (
            "SELECT COUNT(*)::BIGINT AS n, "
            f"CAST(SUM((('0x' || substr(md5({joined}), 1, 15))::BIGINT)::HUGEINT) AS VARCHAR) AS cks "
            f"FROM ({sql}) _q"
        )
        out = con.sql(q).fetchone()
        return out[0], out[1]

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        if name in checksum:
            # full-output verification WITHOUT collecting: both engines
            # reduce their own result set to (count, order-insensitive
            # 60-bit-md5 sum) — the path for pair generators whose sf1
            # output is 10^8+ rows
            try:
                sn, scks = spark_checksum(fn(spark, sf_dir))
            except Exception as exc:
                print(f"FAIL  {name}: spark error: {str(exc)[:200]}")
                failures.append(name)
                continue
            try:
                if timeout_sec:
                    res, t_out = run_oracle(
                        lambda c: oracle_checksum(oracles[name])
                    )
                    if t_out:
                        print(
                            f"oracle-timeout  {name}: spark {sn} rows "
                            f"({time.time()-t0:.1f}s)"
                        )
                        continue
                    on_, ocks = res
                else:
                    on_, ocks = oracle_checksum(oracles[name])
            except Exception as exc:
                print(f"FAIL  {name}: oracle error: {str(exc)[:200]}")
                failures.append(name)
                continue
            if (sn, scks) == (on_, ocks):
                print(f"checksum  {name}: {sn} rows cks={scks} ({time.time()-t0:.1f}s)")
            else:
                print(
                    f"FAIL  {name}: checksum mismatch spark ({sn}, {scks}) "
                    f"vs oracle ({on_}, {ocks}) ({time.time()-t0:.1f}s)"
                )
                failures.append(name)
            continue
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
