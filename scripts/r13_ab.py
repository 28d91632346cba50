"""Alternating same-host A/B for the r13 optimization round: runs
bench.py (BENCH_ONLY subset, shared-session NOFRESH mode) at TWO repo
roots in strict alternation for N rounds, flipping which side goes
first each round, so minute-scale host drift (this VM's documented 2-6x
swings) brackets both sides instead of biasing one. Prints per-round
values and per-query median cold/warm with head/base ratios.

Usage: python scripts/r13_ab.py <base_repo> <head_repo> <sf_dir> \
        <rounds> <query> [query ...]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys


def run_side(repo: str, names: list[str], sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_NOFRESH="1",
        SPARK_GRAFT_BENCH_ONLY=",".join(names),
    )
    p = subprocess.run(
        [sys.executable, f"{repo}/bench.py"],
        capture_output=True,
        text=True,
        env=env,
        cwd=repo,
    )
    line = [l for l in p.stdout.splitlines() if l.startswith("{")][0]
    return json.loads(line)


def main() -> None:
    base, head, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    rounds = int(sys.argv[4])
    names = sys.argv[5:]
    cold: dict[str, dict[str, list[float]]] = {
        q: {"base": [], "head": []} for q in names
    }
    warm: dict[str, dict[str, list[float]]] = {
        q: {"base": [], "head": []} for q in names
    }
    for r in range(rounds):
        order = [("base", base), ("head", head)]
        if r % 2:
            order.reverse()
        for side, repo in order:
            res = run_side(repo, names, sf_dir)
            for q in names:
                cold[q][side].append(res["queries"][q])
                warm[q][side].append(res["queries_warm"][q])
            print(
                f"# round {r} {side}: "
                + " ".join(f"{q}={res['queries'][q]:.2f}" for q in names),
                file=sys.stderr,
                flush=True,
            )
    print(f"{'query':38} {'base_c':>7} {'head_c':>7} {'ratio':>6}"
          f" {'base_w':>7} {'head_w':>7} {'ratio':>6}")
    for q in names:
        bc = statistics.median(cold[q]["base"])
        hc = statistics.median(cold[q]["head"])
        bw = statistics.median(warm[q]["base"])
        hw = statistics.median(warm[q]["head"])
        print(
            f"{q:38} {bc:7.2f} {hc:7.2f} {hc / bc:6.2f}"
            f" {bw:7.2f} {hw:7.2f} {hw / bw:6.2f}"
        )
    print(json.dumps({"cold": cold, "warm": warm}))


if __name__ == "__main__":
    main()
