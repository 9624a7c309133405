"""Compare two bench.py JSON outputs and flag per-query regressions.

Usage: python tools/bench_compare.py BENCH_r03.json BENCH_r04.json [pct]

Prints a per-query table (old, new, delta %) and exits 1 if any query
regressed more than ``pct`` percent (default 25 — single-run best-of-2
timings at sf0.1 vary ±10-20% run-to-run, so a tighter bar false-alarms).
Queries present in only one file are listed but never fail the gate
(headline membership legitimately changes across rounds); a pipeline
entry that ERRORED on the new side does fail it — that error means
the build-path regression floor silently vanished.

Machine normalization (r8, widened r9): when both artifacts carry a
calibration block, the new times are divided by a machine ratio
(new_calib_min / old_calib_min) before the regression gate — the two
artifacts were usually produced on differently-loaded machines
(driver vs builder vs judge), and raw walls cross-compared between
them generated a false 2x alarm nearly every round.  Contention is
not one-dimensional (r8 ADVICE: the r7/r8 contaminations were
shuffle-bandwidth-shaped and nearly invisible to the CPU probe), so
the gate computes BOTH the cpu-probe and shuffle-probe ratios and a
query only fails if it regresses under BOTH normalizations — a delta
explained by either contention axis is contention, not a plan
regression.  When the two ratios diverge materially (>25%) the table
says so, because single-ratio readings of that artifact mislead.
"""

from __future__ import annotations

import json
import sys


def _calib_mins(d: dict) -> dict[str, float]:
    """Best (min) calibration time per probe in an artifact, across
    the before/after draws.  Handles the legacy single-probe shape
    ({"before": {"min": ...}} → {"cpu": ...}) and the r8 two-probe
    shape ({"before": {"cpu": {"min": ...}, "shuffle": {...}}})."""
    c = d.get("calibration") or {}
    out: dict[str, list[float]] = {}
    for k in ("before", "after"):
        v = c.get(k) or {}
        if isinstance(v.get("min"), (int, float)):
            out.setdefault("cpu", []).append(v["min"])
        for probe in ("cpu", "shuffle"):
            pv = v.get(probe)
            if isinstance(pv, dict) and isinstance(pv.get("min"), (int, float)):
                out.setdefault(probe, []).append(pv["min"])
    return {probe: min(vals) for probe, vals in out.items() if vals}


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2

    def recover_from_tail(tail: str, path: str) -> dict:
        """Recover a bench payload from a driver artifact whose
        ``parsed`` is null (r10/r11: the bench line crossed the
        driver's 2000-char stdout cap, so the artifact carries only
        the HEAD-TRUNCATED last 2000 chars under ``tail``).  Two
        tiers: a complete JSON line anywhere in the tail wins;
        otherwise rebuild the object from the first recognizable
        top-level key onward (the line always ENDS with the outer
        ``}``, so ``{`` + the surviving suffix is valid JSON — the
        keys lost to truncation, usually metric/value, are absent
        and the table degrades to per-query rows only)."""
        for ln in reversed(tail.splitlines()):
            ln = ln.strip()
            if ln.startswith("{"):
                try:
                    return json.loads(ln)
                except ValueError:
                    pass
        for ln in reversed(tail.splitlines()):
            for key in ('"queries"', '"pipeline"', '"calibration"'):
                i = ln.find(key)
                if i == -1:
                    continue
                try:
                    d = json.loads("{" + ln[i:].strip())
                except ValueError:
                    continue  # cut landed inside this block; try next key
                print(
                    f"NOTE: {path} has parsed=null — recovered from its "
                    f"head-truncated tail starting at {key}; keys before "
                    "the cut (metric/value) are missing"
                )
                return d
        raise SystemExit(
            f"{path}: parsed=null and no bench payload recoverable "
            "from its tail"
        )

    def load(path):
        d = json.load(open(path))
        # driver-recorded BENCH_r{N}.json wraps the bench line in
        # "parsed" — null when the line crossed the driver's stdout
        # cap, with the truncated text under "tail" (see recovery).
        if "parsed" not in d:
            return d
        if d["parsed"] is not None:
            return d["parsed"]
        return recover_from_tail(d.get("tail") or "", path)

    old = load(sys.argv[1])
    new = load(sys.argv[2])
    bar = float(sys.argv[3]) if len(sys.argv) > 3 else 25.0
    oq, nq = old.get("queries", {}), new.get("queries", {})

    # In-region canary (r13): the edge probes below normalize steady
    # contention, but the canary is the only artifact evidence of
    # BURSTY mid-region theft (BENCH_HISTORY r13 forensics) — surface
    # it before the per-query table so a stretched side is read as
    # host noise, not a plan regression.
    for side, d in (("old", old), ("new", new)):
        nz = (d.get("calibration") or {}).get("noise") or {}
        if nz.get("slow3x", 0) > 0:
            # .get throughout: a partial noise dict (hand-edited or
            # ladder-trimmed artifact) must not abort the comparison.
            print(
                f"NOTE: {side} artifact's in-region canary caught "
                f"{nz['slow3x']}/{nz.get('n', '?')} samples stretched "
                f">3x (worst {nz.get('worst', '?')}x) — that side "
                "crossed stolen scheduling windows; treat its "
                "regressions as suspect"
            )

    oc, nc = _calib_mins(old), _calib_mins(new)
    ratios: dict[str, float] = {
        probe: nc[probe] / oc[probe]
        for probe in ("cpu", "shuffle")
        if oc.get(probe) and nc.get(probe)
    }
    if ratios:
        desc = "  ".join(
            f"{p}: old {oc[p]:.3f}s new {nc[p]:.3f}s ratio {r:.2f}x"
            for p, r in ratios.items()
        )
        print(f"calibration — {desc}")
        vals = list(ratios.values())
        if len(vals) == 2 and max(vals) / min(vals) > 1.25:
            print(
                "NOTE: cpu and shuffle ratios diverge >25% — one artifact "
                "is contended on one axis only; gate requires regression "
                "under BOTH normalizations"
            )
    else:
        ratios = {"cpu": 1.0}
        print("calibration absent in one artifact — raw deltas only")

    def norm_delta(name: str) -> float:
        """Worst-case-favorable normalized delta: the query fails only
        if it regresses under every probe's normalization."""
        return min(
            (nq[name] / r - oq[name]) / oq[name] * 100 for r in ratios.values()
        )

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
        norm = norm_delta(name)
        flag = " ⚠" if norm > bar else ""
        print(
            f"{name:<28}{oq[name]:>8.3f}{nq[name]:>8.3f}"
            f"{raw:>+8.1f}%{norm:>+8.1f}%{flag}"
        )
        if norm > bar:
            failures.append((name, round(norm, 1)))
    # Pipeline tier (r10 verdict #4 / r11 #2): the build-path floor
    # lives under the separate "pipeline" key ({"pipeline_build_2000x":
    # {"min": ...}}); normalize its min by the probe ratios exactly
    # like a query row.  Old-side errors and genuinely new tiers are
    # informational; a NEW-side error fails the gate (see below).
    op, np_ = old.get("pipeline") or {}, new.get("pipeline") or {}
    for name in sorted(set(op) | set(np_)):
        ov = (op.get(name) or {}).get("min")
        nv = (np_.get(name) or {}).get("min")
        # Measurement-regime guard (r12 advice): r9-r11 mins came from
        # the inline hot-JVM tier, r12+ from a fresh subprocess JVM
        # (regime marker "fresh_jvm"; absent == legacy inline).  A
        # regime delta is a floor RESET, not a plan regression — a
        # mismatched pair prints both numbers but never gates.
        o_reg = (op.get(name) or {}).get("regime", "inline")
        n_reg = (np_.get(name) or {}).get("regime", "inline")
        if ov is not None and nv is not None and o_reg != n_reg:
            print(
                f"{name:<28}{ov:>8.3f}{nv:>8.3f}  regime {o_reg}->{n_reg}:"
                " floor reset, not gated"
            )
            continue
        if ov is None or nv is None:
            # Distinguish "the tier didn't exist in that round" from
            # "it ran and errored" (bench.py's fail-soft entry) — and
            # report BOTH sides, so an absent-old + errored-new row
            # can't read as a brand-new tier.
            def _status(d, v):
                if v is not None:
                    return "ok"
                return "err" if name in d else "—"
            status = f"old:{_status(op, ov)} new:{_status(np_, nv)}"
            print(
                f"{name:<28}{ov or '—':>8}{nv or '—':>8}  {status}"
            )
            # Fail-open is the r10/r11 lesson: a NEW-side error means
            # the regression floor for this tier silently vanished —
            # gate on it like a regression (an old-side error or a
            # genuinely new tier stays informational).
            if nv is None and name in np_:
                failures.append((name, "new-side error"))
            continue
        raw = (nv - ov) / ov * 100
        norm = min((nv / r - ov) / ov * 100 for r in ratios.values())
        flag = " ⚠" if norm > bar else ""
        print(
            f"{name:<28}{ov:>8.3f}{nv:>8.3f}{raw:>+8.1f}%{norm:>+8.1f}%{flag}"
        )
        if norm > bar:
            failures.append((name, round(norm, 1)))

    tot_o, tot_n = old.get("value"), new.get("value")
    if tot_o and tot_n:
        norm_tot = min(
            (tot_n / r - tot_o) / tot_o * 100 for r in ratios.values()
        )
        print(
            f"{'TOTAL':<28}{tot_o:>8.3f}{tot_n:>8.3f}"
            f"{(tot_n - tot_o) / tot_o * 100:>+8.1f}%{norm_tot:>+8.1f}%"
        )
    if failures:
        print(f"\nREGRESSIONS (normalized > {bar}%): {failures}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
