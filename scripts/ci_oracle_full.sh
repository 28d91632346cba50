#!/usr/bin/env bash
# Standing correctness evidence: run the FULL queries()/oracle_sql()
# roster (not the driver's rotating 50-sample) against DuckDB at sf0.01
# and write ORACLE_FULL_r<round>.json. Run before sealing each round:
#
#   scripts/ci_oracle_full.sh <round-number>
#
# Exits non-zero on any mismatch.
set -euo pipefail
ROUND="${1:?usage: ci_oracle_full.sh <round-number>}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}"
LOG="$(mktemp)"
cd "$(dirname "$0")/.."

# registry/docs/bench freshness gate: every queries() name documented in
# COVERAGE.md and benched (or whitelisted) — fail the seal on drift
python -m pytest tests/test_docs_freshness.py -q --no-header -x

python scripts/compare_oracle.py "$SF_DIR" 2>&1 | tee "$LOG" | grep -E "^(ok|rows-only|FAIL)" || true

python - "$ROUND" "$SF_DIR" "$LOG" <<'EOF'
import json, re, sys
round_n, sf_dir, log = sys.argv[1], sys.argv[2], sys.argv[3]
results = {}
for line in open(log):
    m = re.search(r'(ok|rows-only|FAIL)\s+(\S+): (\d+) rows \(([\d.]+)s\)', line)
    if m:
        results[m.group(2)] = {
            "status": m.group(1), "rows": int(m.group(3)), "sec": float(m.group(4))
        }
failures = [k for k, v in results.items() if v["status"] == "FAIL"]
summary = {
    "round": int(round_n),
    "sf_dir": sf_dir,
    "total_queries": len(results),
    "ok": sum(1 for v in results.values() if v["status"] == "ok"),
    "rows_only": sum(1 for v in results.values() if v["status"] == "rows-only"),
    "failures": failures,
    "verdict": "ALL MATCH" if not failures else "FAILURES",
    "queries": results,
}
out = f"ORACLE_FULL_r{int(round_n):02d}.json"
json.dump(summary, open(out, "w"), indent=1)
print(f"{out}: {summary['ok']}/{summary['total_queries']} ok — {summary['verdict']}")
sys.exit(1 if failures else 0)
EOF
