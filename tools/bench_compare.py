"""Compare two bench.py JSON outputs and flag per-query regressions.

Usage: python tools/bench_compare.py BENCH_r03.json BENCH_r04.json [pct]

Prints a per-query table (old, new, delta %) and exits 1 if any query
regressed more than ``pct`` percent (default 25 — single-run best-of-2
timings at sf0.1 vary ±10-20% run-to-run, so a tighter bar false-alarms).
Queries present in only one file are listed but never fail the gate
(headline membership legitimately changes across rounds).

Machine normalization (r8): when both artifacts carry a calibration
block, the new times are divided by the CPU-probe ratio
(new_calib_min / old_calib_min) before the regression gate — the two
artifacts were usually produced on differently-loaded machines
(driver vs builder vs judge), and raw walls cross-compared between
them generated a false 2x alarm nearly every round.  Both raw and
normalized deltas are printed; the gate reads the normalized one.
"""

from __future__ import annotations

import json
import sys


def _calib_min(d: dict) -> float | None:
    """Best (min) CPU-calibration time in an artifact, across the
    before/after draws.  Handles both the legacy single-probe shape
    ({"before": {"min": ...}}) and the r8 two-probe shape
    ({"before": {"cpu": {"min": ...}, "shuffle": {...}}})."""
    c = d.get("calibration") or {}
    vals = []
    for k in ("before", "after"):
        v = c.get(k) or {}
        if isinstance(v.get("min"), (int, float)):
            vals.append(v["min"])
        elif isinstance(v.get("cpu"), dict) and "min" in v["cpu"]:
            vals.append(v["cpu"]["min"])
    return min(vals) if vals else None


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

    oc, nc = _calib_min(old), _calib_min(new)
    ratio = (nc / oc) if (oc and nc) else 1.0
    if oc and nc:
        print(
            f"calibration (cpu min): old {oc:.3f}s  new {nc:.3f}s  "
            f"machine ratio {ratio:.2f}x — gate reads normalized deltas"
        )
    else:
        print("calibration absent in one artifact — raw deltas only")

    failures = []
    print(f"{'query':<28}{'old':>8}{'new':>8}{'raw':>9}{'norm':>9}")
    for name in sorted(set(oq) | set(nq)):
        if name not in oq:
            print(f"{name:<28}{'—':>8}{nq[name]:>8.3f}{'new':>9}")
            continue
        if name not in nq:
            print(f"{name:<28}{oq[name]:>8.3f}{'—':>8}{'dropped':>9}")
            continue
        raw = (nq[name] - oq[name]) / oq[name] * 100
        norm = (nq[name] / ratio - oq[name]) / oq[name] * 100
        flag = " ⚠" if norm > bar else ""
        print(
            f"{name:<28}{oq[name]:>8.3f}{nq[name]:>8.3f}"
            f"{raw:>+8.1f}%{norm:>+8.1f}%{flag}"
        )
        if norm > bar:
            failures.append((name, round(norm, 1)))
    tot_o, tot_n = old.get("value"), new.get("value")
    if tot_o and tot_n:
        print(
            f"{'TOTAL':<28}{tot_o:>8.3f}{tot_n:>8.3f}"
            f"{(tot_n - tot_o) / tot_o * 100:>+8.1f}%"
            f"{(tot_n / ratio - tot_o) / tot_o * 100:>+8.1f}%"
        )
    if failures:
        print(f"\nREGRESSIONS (normalized > {bar}%): {failures}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
