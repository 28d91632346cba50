"""Per-query diff of two bench runs: flags regressions and improvements.

Usage: python scripts/bench_diff.py OLD.json NEW.json [--warm] [--threshold 1.5]

Accepts either a raw bench stdout line (the full JSON with "queries") or a
driver BENCH_r*.json wrapper ({"parsed": {...}}). Prints one line per
common query with old/new/ratio, sorted worst-first, then a summary.

Host-drift normalization: when both runs carry control-query timings
(bench.py CONTROL_QUERIES, emitted under "controls"; falls back to
looking the control names up in "queries"), the summary reports the
control drift ratio and every per-query ratio is ALSO shown normalized
by it ("xN.NN/ctl"); regressions are flagged on the NORMALIZED ratio,
so a uniformly slower/faster host doesn't read as code change
(BASELINE.md round-7 adjudication, made in-protocol in round 12).
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


def _salvage(tail: str) -> dict | None:
    """Recover per-query timing maps from a driver wrapper whose tail
    window truncated the HEAD of the big one-line JSON (the shape of
    every committed BENCH_r*.json): regex '"name": sec' pairs out of
    the line segments between the known keys, keeping cold / controls /
    warm separated. Lossy (head-truncated queries are gone) but turns
    an un-diffable wrapper into a partial diff."""
    import re

    line = tail.splitlines()[0] if tail else ""
    if '"queries' not in line and '"metric"' not in line:
        # sometimes the big line IS the tail's start (no newline yet)
        line = tail
    pair = re.compile(r'"([A-Za-z0-9_]+)":\s*(-?[0-9]+(?:\.[0-9]+)?)')
    meta_keys = {"value", "sf", "warm_total", "n_queries"}

    def pairs(segment: str) -> dict:
        return {
            k: float(v)
            for k, v in pair.findall(segment)
            if k not in meta_keys
        }

    def segment(after: str, until: "list[str]") -> str:
        i = line.find(after)
        if i < 0:
            return ""
        rest = line[i + len(after):]
        ends = [rest.find(u) for u in until if rest.find(u) >= 0]
        return rest[: min(ends)] if ends else rest

    # ONLY key-visible segments are attributable: a window that opens
    # mid-map yields pairs that could be cold OR warm timings — salvaging
    # those would silently mislabel them (BENCH_r10's tail opens inside
    # the warm map), so they are deliberately dropped.
    cold = pairs(
        segment('"queries":', ['"failed_queries"', '"controls"', '"sf"'])
    )
    if not cold:
        return None
    out = {"queries": cold}
    warm = pairs(segment('"queries_warm":', ["}"]))
    if warm:
        out["queries_warm"] = warm
    controls = pairs(segment('"controls":', ["}"]))
    if controls:
        out["controls"] = controls
    return out


def _from_obj(obj) -> dict | None:
    if not isinstance(obj, dict):
        return None
    if "queries" in obj:
        return obj
    parsed = obj.get("parsed")
    if isinstance(parsed, dict) and "queries" in parsed:
        return parsed
    tail = obj.get("tail")
    if isinstance(tail, str) and tail:
        # driver wrappers embed the raw stdout; recover the JSON line
        got = None
        start = tail.find('{"metric"')
        if start >= 0:
            try:
                got = _from_obj(json.loads(tail[start:].splitlines()[0]))
            except json.JSONDecodeError:
                pass
        got = got or _salvage(tail)
        if got:
            # the compact-summary line (always last, never truncated)
            # carries intact controls even when the big line lost them
            if "controls" not in got and isinstance(parsed, dict):
                ctl = parsed.get("controls")
                if isinstance(ctl, dict):
                    got["controls"] = ctl
            return got
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


CONTROL_FALLBACK = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "running_total_per_customer",
)


def control_drift(old: dict, new: dict) -> "float | None":
    """sum(new controls)/sum(old controls) over the controls present in
    BOTH runs, or None when fewer than two are shared (one control could
    itself regress; two-of-three keeps the baseline meaningful)."""

    def controls(run: dict) -> dict:
        got = run.get("controls")
        if isinstance(got, dict) and got:
            return got
        q = run.get("queries", {})
        return {n: q[n] for n in CONTROL_FALLBACK if n in q}

    def usable(v) -> bool:
        # symmetric filter on BOTH sides: numeric and positive (a 0.0 or
        # null control is an artifact defect, not a drift signal)
        return isinstance(v, (int, float)) and v > 0

    co, cn = controls(old), controls(new)
    shared = [n for n in co if n in cn and usable(co[n]) and usable(cn[n])]
    if len(shared) < 2:
        return None
    so, sn = sum(co[n] for n in shared), sum(cn[n] for n in shared)
    return sn / so


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
    common = sorted(n for n in set(qo) & set(qn)
                    if qo[n] is not None and qn[n] is not None)
    if not common:
        raise SystemExit("no common queries")
    drift = control_drift(old, new)
    norm = drift if drift else 1.0
    rows = [(name, qo[name], qn[name],
             qn[name] / qo[name] if qo[name] else float("inf"))
            for name in common]
    rows.sort(key=lambda r: -r[3])
    flagged = 0
    for name, o, n, r in rows:
        rn = r / norm
        mark = " <-- REGRESSION" if rn >= args.threshold and n - o > 0.25 else ""
        flagged += bool(mark)
        ctl = f" x{rn:5.2f}/ctl" if drift else ""
        print(f"{name:40s} {o:7.2f} -> {n:7.2f}  x{r:5.2f}{ctl}{mark}")
    so, sn = sum(qo[c] for c in common), sum(qn[c] for c in common)
    drift_note = (f"  control drift x{drift:.3f} (ratios normalized by it)"
                  if drift else "  (no shared controls; raw ratios)")
    print(f"\ncommon queries: {len(common)}  total {so:.1f}s -> {sn:.1f}s "
          f"(x{sn/so:.2f})  regressions(>= x{args.threshold}/ctl and +0.25s): "
          f"{flagged}{drift_note}")
    print(f"only-old: {sorted(set(qo)-set(qn))or '-'}")
    print(f"only-new: {sorted(set(qn)-set(qo)) or '-'}")
    sys.exit(0)


if __name__ == "__main__":
    main()
