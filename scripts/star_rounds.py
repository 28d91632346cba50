"""Capture star-contraction per-round edge counts for the scaling
watchlist (SCALE.md): runs near_dup_groups_star at the given scale
factor with the graph module's round instrumentation surfaced, and
prints a markdown round table — attributing superlinear wall-clock to
component structure (rounds / edge volume) vs kernel overhead.

Usage: python scripts/star_rounds.py /root/testdata/sf0.1
"""

from __future__ import annotations

import importlib.util
import logging
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class _Capture(logging.Handler):
    def __init__(self) -> None:
        super().__init__(level=logging.INFO)
        self.rows: list[tuple] = []

    def emit(self, record: logging.LogRecord) -> None:
        if record.msg.startswith("star_contraction round"):
            self.rows.append(record.args)


def main() -> None:
    sf_dir = sys.argv[1]
    cap = _Capture()
    glog = logging.getLogger("megalista_spark.operators.graph")
    glog.setLevel(logging.INFO)
    glog.addHandler(cap)

    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    from megalista_spark.session import get_spark

    spark = get_spark(app_name="star_rounds")
    t0 = time.perf_counter()
    n = m.queries()["near_dup_groups_star"](spark, sf_dir).count()
    wall = time.perf_counter() - t0

    print(f"\nnear_dup_groups_star @ {sf_dir}: {n} rows in {wall:.1f}s, "
          f"{len(cap.rows)} rounds\n")
    print("| round | edges in | after large-star | after small-star |")
    print("|---|---|---|---|")
    for args in cap.rows:
        rnd, before, large, small = args[0], args[1], args[2], args[3]
        conv = str(args[4]) if len(args) > 4 else ""
        print(f"| {rnd} | {before} | {large} | {small}{conv} |")
    spark.stop()


if __name__ == "__main__":
    main()
