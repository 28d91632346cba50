"""Resumable full-roster oracle sweep for long scale factors (sf1+).

Parses the append-only log for queries already recorded (ok / rows-only /
FAIL / oracle-timeout), runs ``compare_oracle.py`` over the remainder,
and repeats until the roster is covered or a run makes no progress
(guards against a query that hard-crashes the JVM). One Spark session
per attempt, so a mid-sweep crash costs only the in-flight query.

Usage: python scripts/sweep_resume.py SF_DIR LOG [max_attempts]

Then merge:  python scripts/merge_oracle_logs.py OUT.json SF_DIR LOG
"""

from __future__ import annotations

import importlib.util
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def roster() -> list[str]:
    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return list(m.queries().keys())


def done_names(log: str) -> set[str]:
    if not os.path.exists(log):
        return set()
    text = open(log).read().replace("\r", "\n")
    return {
        m.group(1)
        for m in re.finditer(
            r"(?:ok|rows-only|FAIL|oracle-timeout)\s+(\S+):", text
        )
    }


def main() -> None:
    sf_dir, log = sys.argv[1], sys.argv[2]
    max_attempts = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    names = roster()
    exclude = set((os.environ.get("SWEEP_EXCLUDE") or "").split(",")) - {""}
    names = [q for q in names if q not in exclude]
    shard = os.environ.get("SWEEP_SHARD")  # "i/n" — run every n-th query
    if shard:
        i, n = (int(x) for x in shard.split("/"))
        names = [q for k, q in enumerate(names) if k % n == i]
    for attempt in range(max_attempts):
        remaining = [n for n in names if n not in done_names(log)]
        if not remaining:
            print(f"sweep complete: {len(names)} queries in {log}")
            return
        print(f"attempt {attempt + 1}: {len(remaining)} remaining")
        with open(log, "a") as out:
            proc = subprocess.Popen(
                [sys.executable, os.path.join(REPO, "scripts/compare_oracle.py"), sf_dir]
                + remaining,
                stdout=out,
                stderr=subprocess.STDOUT,
                cwd=REPO,
            )
            proc.wait()
        after = [n for n in names if n not in done_names(log)]
        if len(after) == len(remaining):
            # no progress: the first remaining query kills the process;
            # record it as FAIL and move on
            with open(log, "a") as out:
                out.write(f"FAIL  {remaining[0]}: spark error (process died)\n")
            print(f"no progress; marking {remaining[0]} FAIL and continuing")
    print("attempt budget exhausted")


if __name__ == "__main__":
    main()
