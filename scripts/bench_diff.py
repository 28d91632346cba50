"""Per-query diff of two bench runs: flags regressions and improvements.

Usage: python scripts/bench_diff.py OLD.json NEW.json [--warm] [--threshold 1.5]

Accepts either a raw bench stdout line (the full JSON with "queries") or a
driver BENCH_r*.json wrapper ({"parsed": {...}}). Prints one line per
common query with old/new/ratio, sorted worst-first, then a summary.
"""

from __future__ import annotations

import argparse
import contextlib
import json
import signal
import sys

# behave under `| head` — die silently on a closed pipe
with contextlib.suppress(Exception):
    signal.signal(signal.SIGPIPE, signal.SIG_DFL)


def _from_obj(obj) -> dict | None:
    if not isinstance(obj, dict):
        return None
    if "queries" in obj:
        return obj
    parsed = obj.get("parsed")
    if isinstance(parsed, dict) and "queries" in parsed:
        return parsed
    tail = obj.get("tail")
    if isinstance(tail, str) and '"queries"' in tail:
        # driver wrappers embed the raw stdout; recover the JSON line
        start = tail.find('{"metric"')
        if start >= 0:
            try:
                return _from_obj(json.loads(tail[start:].splitlines()[0]))
            except json.JSONDecodeError:
                pass
    return None


def load(path: str) -> dict:
    with open(path) as fh:
        text = fh.read().strip()
    try:
        got = _from_obj(json.loads(text))
        if got:
            return got
    except json.JSONDecodeError:
        pass
    for candidate in text.splitlines():
        try:
            got = _from_obj(json.loads(candidate))
        except json.JSONDecodeError:
            continue
        if got:
            return got
    raise SystemExit(f"no bench JSON with 'queries' found in {path}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--warm", action="store_true", help="compare warm timings")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="ratio above which a query is flagged as a regression")
    args = ap.parse_args()

    key = "queries_warm" if args.warm else "queries"
    old, new = load(args.old), load(args.new)
    qo, qn = old.get(key, {}), new.get(key, {})
    common = sorted(set(qo) & set(qn))
    if not common:
        raise SystemExit("no common queries")
    rows = [(name, qo[name], qn[name], qn[name] / qo[name] if qo[name] else float("inf"))
            for name in common]
    rows.sort(key=lambda r: -r[3])
    flagged = 0
    for name, o, n, r in rows:
        mark = " <-- REGRESSION" if r >= args.threshold and n - o > 0.25 else ""
        flagged += bool(mark)
        print(f"{name:40s} {o:7.2f} -> {n:7.2f}  x{r:5.2f}{mark}")
    so, sn = sum(qo[c] for c in common), sum(qn[c] for c in common)
    print(f"\ncommon queries: {len(common)}  total {so:.1f}s -> {sn:.1f}s "
          f"(x{sn/so:.2f})  regressions(>= x{args.threshold} and +0.25s): {flagged}")
    print(f"only-old: {sorted(set(qo)-set(qn))or '-'}")
    print(f"only-new: {sorted(set(qn)-set(qo)) or '-'}")
    sys.exit(0)


if __name__ == "__main__":
    main()
