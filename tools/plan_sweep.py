"""Static-plan scale sweep: build (don't run) every batch query's plan
against a large synthesized dataset and flag scale hazards the bench
can't see.

Why this exists: at bench scale (sf0.1) the static planner's size
estimates make almost any join side broadcast-able, so a plan that
would OOM a 1000-executor cluster at 100 TB looks identical to a safe
one.  Two hazards are detectable statically by re-planning against a
100x corpus (`/root/repo/.scratch/plan_sweep_100x`, synthesized by
tools/scale_probe.py machinery):

1. **Broadcast-hinted joins on data-proportional sides.**  An explicit
   ``F.broadcast(...)`` hint bypasses autoBroadcastJoinThreshold, so
   the optimizer will happily plan a multi-GB BroadcastExchange.  We
   walk the optimized logical plan, find every join hint, and report
   the hinted side's optimizer-estimated size at 100x; anything above
   the threshold (default 64 MB, i.e. ~64 GB at 100 TB) is flagged.

2. **Queries that execute Spark jobs during plan CONSTRUCTION.**
   Under AQE, ``localCheckpoint(eager=False)`` still materializes
   every upstream shuffle stage the moment the DataFrame is built
   (Dataset.checkpoint calls queryExecution.toRdd, and
   AdaptiveSparkPlanExec.execute blocks on getFinalPhysicalPlan).
   That is fine for the iterative algorithms that need lineage
   truncation, but it means "build the plan" is not free for them —
   the sweep cancels any build that exceeds the watchdog timeout
   (via an interrupt-on-cancel job group), so one quadratic
   truth-side (q_lsh_recall's exact-recall oracle, which at
   production scale runs on a stratified sample per its docstring)
   cannot hang the audit.  Build wall-time per query is printed;
   anything beyond a few seconds executed real work.

Usage:  python tools/plan_sweep.py [data_dir] [timeout_s]
Output: one line per query (ok / FLAG / exec-at-build / skip) and a
final JSON summary; exit 1 if any FLAG.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from omim_spark.session import get_spark  # noqa: E402
from omim_spark.workload import QUERIES  # noqa: E402

# Estimated-size ceiling for a broadcast-HINTED side at the sweep's
# 100x scale.  64 MB here extrapolates to ~64 GB at 100 TB — far past
# any sane driver/executor broadcast budget — while staying above the
# noise of the genuinely-tiny hinted sides (scalar aggregates,
# capped-list dims) whose estimates run a few KB..MB.
HINT_SIZE_CEILING = 64 * 1024 * 1024

# Catalyst propagates "no stats" as Long.MaxValue, and size products
# near overflow clamp to huge sentinels.  Those are NOT measurements:
# Python-built LocalRelations (the inline OMIM-shaped fixtures) carry
# no sizeInBytes, so their hinted broadcasts estimate as 2^63-1
# regardless of actual (constant, few-hundred-row) size.  Report them
# as `unknown` for manual adjudication instead of flagging.
UNKNOWN_STATS_FLOOR = 1 << 62

# Queries whose fn() writes real files (layout/maintenance demos) —
# building their "plan" performs the write; skip, they are covered by
# their own pruning tests (test_clustering.py, test_plans.py).
SIDE_EFFECT = {"q_ann_ivf_stored", "q_zorder_locality"}

# Streaming gates run a real StreamingQuery against sink directories;
# there is no batch plan to audit.
STREAMING_PREFIX = "q_stream_"


def _walk(node):
    yield node
    children = node.children()
    for i in range(children.size()):
        yield from _walk(children.apply(i))


def _hinted_join_sizes(jdf) -> list[tuple[str, int]]:
    """(side, estimated sizeInBytes) for every broadcast-hinted join
    side in the optimized logical plan."""
    out = []
    plan = jdf.queryExecution().optimizedPlan()
    for node in _walk(plan):
        if node.nodeName() != "Join":
            continue
        hint = node.hint()
        for side, opt in (("left", hint.leftHint()), ("right", hint.rightHint())):
            if not opt.isDefined():
                continue
            if "broadcast" not in opt.get().toString().lower():
                continue
            child = node.children().apply(0 if side == "left" else 1)
            size = child.stats().sizeInBytes()
            # py4j converts small scala.math.BigInt values to Python
            # int; larger ones arrive as JavaObject with toString().
            if not isinstance(size, int):
                size = int(size.toString())
            out.append((side, size))
    return out


def sweep(spark, data_dir: str, timeout_s: float = 45.0) -> dict:
    """Re-plan every batch registry query against ``data_dir`` and
    return the summary dict (see module docstring).  Callable from
    pytest (test_plans.py runs it per-round on a small synthesized
    corpus) as well as from main()."""
    sc = spark.sparkContext

    flags: list[dict] = []
    unknowns: list[dict] = []
    timeouts: list[str] = []
    results: dict[str, str] = {}
    # Threads whose build timed out and which survived cancel+join(30).
    # A still-alive leaked thread keeps executing against the shared
    # SparkSession concurrently with later builds, skewing their
    # wall-times and hint-size reads — so every result produced while
    # one is alive is marked suspect, and its PER-QUERY job group is
    # re-cancelled before each subsequent build.
    leaked: list[tuple[str, threading.Thread]] = []

    for name, qd in QUERIES.items():
        if name in SIDE_EFFECT or name.startswith(STREAMING_PREFIX):
            results[name] = "skip"
            print(f"skip {name}", flush=True)
            continue

        leaked[:] = [(g, t) for g, t in leaked if t.is_alive()]
        for group, _ in leaked:
            sc.cancelJobGroup(group)
        suspect = bool(leaked)
        if suspect:
            print(
                f"WARN {len(leaked)} leaked build thread(s) still alive "
                f"({', '.join(g for g, _ in leaked)}) — {name}'s timing "
                "and hint sizes are suspect",
                flush=True,
            )

        built: dict = {}
        group = f"plan-sweep:{name}"

        def _build(qd=qd, built=built, group=group):
            sc.setJobGroup(group, qd.name, interruptOnCancel=True)
            try:
                built["df"] = qd.fn(spark, data_dir)
            except Exception as exc:  # noqa: BLE001
                built["err"] = f"{type(exc).__name__}: {exc}"
            finally:
                sc.setJobGroup("", "")

        t0 = time.perf_counter()
        th = threading.Thread(target=_build, daemon=True)
        th.start()
        th.join(timeout_s)
        if th.is_alive():
            sc.cancelJobGroup(group)
            th.join(30)
            if th.is_alive():
                leaked.append((group, th))
            # A timeout measured while another build's leaked thread
            # was still running is itself suspect — the contamination
            # may BE the cause of the timeout.
            results[name] = "exec-at-build-timeout" + (
                " (suspect)" if suspect else ""
            )
            timeouts.append(name)
            print(
                f"EXEC {name} build exceeded {timeout_s:.0f}s — cancelled"
                + (" (suspect)" if suspect else ""),
                flush=True,
            )
            continue
        dt = time.perf_counter() - t0
        if "err" in built:
            results[name] = f"error: {built['err']}"
            print(f"ERR  {name} {built['err']}", flush=True)
            continue

        sizes = _hinted_join_sizes(built["df"]._jdf)
        unknown = [(s, b) for s, b in sizes if b >= UNKNOWN_STATS_FLOOR]
        too_big = [
            (s, b) for s, b in sizes if HINT_SIZE_CEILING < b < UNKNOWN_STATS_FLOOR
        ]
        tag = " (suspect)" if suspect else ""
        if too_big:
            flags.append({"query": name, "hinted": too_big, "suspect": suspect})
            results[name] = "FLAG" + tag
            print(f"FLAG {name} hinted-side sizes {too_big}{tag}", flush=True)
        elif unknown:
            unknowns.append({"query": name, "n_unknown": len(unknown)})
            results[name] = "unknown-stats" + tag
            print(f"UNK  {name} {len(unknown)} hinted side(s) without stats{tag}", flush=True)
        else:
            results[name] = "ok" + tag
            print(
                f"ok   {name} hints={len(sizes)} "
                f"max={max((b for _, b in sizes), default=0)} {dt:.1f}s{tag}",
                flush=True,
            )

    return {
        "data_dir": data_dir,
        "n_queries": len(results),
        "n_flagged": len(flags),
        "flagged": flags,
        "unknown_stats": unknowns,
        "build_timeouts": timeouts,
        "suspect": sorted(
            n for n, r in results.items() if r.endswith("(suspect)")
        ),
    }


def main() -> None:
    data_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/plan_sweep_100x"
    timeout_s = float(sys.argv[2]) if len(sys.argv) > 2 else 45.0
    spark = get_spark("omim-spark-plan-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    summary = sweep(spark, data_dir, timeout_s)
    print(json.dumps(summary))
    sys.exit(1 if summary["n_flagged"] else 0)


if __name__ == "__main__":
    main()
