"""Compare two bench.py JSON outputs and flag per-query regressions.

Usage: python tools/bench_compare.py BENCH_r03.json BENCH_r04.json [pct]

Prints a per-query table (old, new, delta %) and exits 1 if any query
regressed more than ``pct`` percent (default 25 — single-run best-of-2
timings at sf0.1 vary ±10-20% run-to-run, so a tighter bar false-alarms).
Queries present in only one file are listed but never fail the gate
(headline membership legitimately changes across rounds).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    def load(path):
        d = json.load(open(path))
        # driver-recorded BENCH_r{N}.json wraps the bench line in "parsed"
        return d["parsed"] if "parsed" in d else d

    old = load(sys.argv[1])
    new = load(sys.argv[2])
    bar = float(sys.argv[3]) if len(sys.argv) > 3 else 25.0
    oq, nq = old.get("queries", {}), new.get("queries", {})
    failures = []
    print(f"{'query':<28}{'old':>8}{'new':>8}{'delta':>9}")
    for name in sorted(set(oq) | set(nq)):
        if name not in oq:
            print(f"{name:<28}{'—':>8}{nq[name]:>8.3f}{'new':>9}")
            continue
        if name not in nq:
            print(f"{name:<28}{oq[name]:>8.3f}{'—':>8}{'dropped':>9}")
            continue
        delta = (nq[name] - oq[name]) / oq[name] * 100
        flag = " ⚠" if delta > bar else ""
        print(f"{name:<28}{oq[name]:>8.3f}{nq[name]:>8.3f}{delta:>+8.1f}%{flag}")
        if delta > bar:
            failures.append((name, delta))
    tot_o, tot_n = old.get("value"), new.get("value")
    if tot_o and tot_n:
        print(
            f"{'TOTAL':<28}{tot_o:>8.3f}{tot_n:>8.3f}"
            f"{(tot_n - tot_o) / tot_o * 100:>+8.1f}%"
        )
    if failures:
        print(f"\nREGRESSIONS (> {bar}%): {failures}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
