"""Merge a fresh compare_oracle log into an existing ORACLE_FULL_*.json
(append/update per-query entries and refresh the summary counts) — the
path for adding newly registered queries to an already-recorded sweep
without re-running the whole roster.

Usage: python scripts/merge_into_oracle_full.py ORACLE_FULL_sf1.json NEW.log
"""

from __future__ import annotations

import json
import re
import sys


def main() -> None:
    out_path, log = sys.argv[1], sys.argv[2]
    doc = json.load(open(out_path))
    pat = re.compile(
        r"(ok|rows-only|checksum|FAIL|oracle-timeout)\s+(\S+): (?:spark )?(\d+) rows"
        r"(?: cks=\d+)? \(([\d.]+)s"
    )
    # FAIL lines that carry no row count: spark/oracle errors and
    # checksum mismatches (compare_oracle.py:208,226,233,249,258).
    # Without this second pattern such lines were silently dropped and
    # a previously-'ok' entry stayed stale in the merged artifact.
    fail_pat = re.compile(
        r"FAIL\s+(\S+): (spark error|oracle error|checksum mismatch)"
    )
    text = open(log).read().replace("\r", "\n")
    added = []
    for m in pat.finditer(text):
        doc["queries"][m.group(2)] = {
            "status": m.group(1),
            "rows": int(m.group(3)),
            "sec": float(m.group(4)),
        }
        added.append(m.group(2))
    for m in fail_pat.finditer(text):
        doc["queries"][m.group(1)] = {
            "status": "FAIL",
            "rows": 0,
            "sec": 0.0,
            "error": m.group(2),
        }
        added.append(m.group(1))
    # every FAIL occurrence in the log must have been consumed by one of
    # the two parsers — an unparsed FAIL means a format drift that would
    # reintroduce the silent-drop bug
    n_fail_lines = len(re.findall(r"^FAIL\s", text, re.MULTILINE))
    n_fail_parsed = sum(
        1 for q in added if doc["queries"][q]["status"] == "FAIL"
    )
    if n_fail_parsed < n_fail_lines:
        raise SystemExit(
            f"merge aborted: {n_fail_lines} FAIL lines in log but only "
            f"{n_fail_parsed} parsed - compare_oracle output format drifted"
        )
    qs = doc["queries"]
    doc["total_queries"] = len(qs)
    doc["ok"] = sum(1 for v in qs.values() if v["status"] == "ok")
    doc["checksum"] = sum(1 for v in qs.values() if v["status"] == "checksum")
    doc["rows_only"] = sum(1 for v in qs.values() if v["status"] == "rows-only")
    doc["oracle_timeouts"] = sorted(
        k for k, v in qs.items() if v["status"] == "oracle-timeout"
    )
    doc["failures"] = sorted(k for k, v in qs.items() if v["status"] == "FAIL")
    doc["verdict"] = (
        "ALL MATCH" if not doc["failures"] and not doc["oracle_timeouts"] else "PARTIAL"
    )
    json.dump(doc, open(out_path, "w"), indent=1)
    print(f"merged {len(added)} queries into {out_path}: {sorted(added)}")
    print(
        f"now {doc['ok']} ok / {doc['rows_only']} rows-only / "
        f"{len(doc['failures'])} fail / {len(doc['oracle_timeouts'])} timeout "
        f"of {doc['total_queries']}"
    )


if __name__ == "__main__":
    main()
