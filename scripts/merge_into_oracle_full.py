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
    text = open(log).read().replace("\r", "\n")
    added = []
    for m in pat.finditer(text):
        doc["queries"][m.group(2)] = {
            "status": m.group(1),
            "rows": int(m.group(3)),
            "sec": float(m.group(4)),
        }
        added.append(m.group(2))
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
