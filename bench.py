"""Benchmark harness: runs the headline workload queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop write (full computation,
no driver collect overhead).

Machine-state controls (all env-overridable):
  SPARK_GRAFT_BENCH_RUNS   timed executions per query (default 5;
                           headline value = min, spread emitted)
  SPARK_GRAFT_SETTLE_S     max seconds to wait pre-measurement for
                           the 1-min loadavg to drain (default 90)
  SPARK_GRAFT_SETTLE_LOAD  loadavg bar for the settle gate (default
                           2.0 — strict for a 32-core box on purpose:
                           r7's contaminating load was Spark-shaped,
                           so even modest loadavg inflated the
                           shuffle-heavy queries 1.8-2.8x)
  SPARK_GRAFT_SETTLE_ATTEMPTS  probe-verified settle retries (default
                           3): after each settle wait the calibration
                           probes must read within SPARK_GRAFT_CALIB_TOL
                           (default 2.0x) of the idle floors
                           (SPARK_GRAFT_CPU_FLOOR / _SHUFFLE_FLOOR,
                           defaults = r8 idle minima) or the gate
                           sleeps and retries; exhausted retries stamp
                           "gave_up_contended": true in the artifact.
The emitted calibration block carries cpu + shuffle probe times
(per-attempt when the settle gate retried), settle waits, floors, the
gave-up flag, and loadavg before/after, so a contaminated draw is
attributable from the artifact alone — and since r9 the harness
actively avoids starting one.  The line is emitted COMPACT and kept
under 1900 bytes: the external driver records only the last 2000
chars of stdout, and r10/r11's longer lines were truncated into
unparseable artifacts (probe-job definitions live in _calibrate's
comment, not the JSON).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from omim_spark.session import get_spark  # noqa: E402
from omim_spark.workload import BENCH_ONLY, QUERIES  # noqa: E402


def _headline_fns() -> dict[str, object]:
    """name → callable for every benched query: the registry's
    headline entries plus the bench-only plans (engine-specific
    output, no oracle — e.g. the raw-HLL rollup) so bench continuity
    survives a query's retirement from the correctness gate."""
    fns = {n: qd.fn for n, qd in QUERIES.items() if qd.headline}
    # register() only guards duplicates within QUERIES, so a collision
    # with BENCH_ONLY would silently swap the gated headline plan for
    # the bench-only one here — fail loudly instead (r10 ADVICE).
    overlap = set(QUERIES) & set(BENCH_ONLY)
    if overlap:
        raise RuntimeError(
            f"registry/BENCH_ONLY name collision: {sorted(overlap)}"
        )
    fns.update(BENCH_ONLY)
    return dict(sorted(fns.items()))


LINE_CAP = 1900  # the external driver records only ~2000 stdout chars


def emit_line(payload: dict) -> str:
    """Serialize the bench payload, degrading until the line fits the
    driver's stdout cap — never emit an over-cap line (a truncated
    line is the r10/r11 parsed=null failure all over again).

    Ladder, least headline-relevant first: drop the per-query spread
    (mins are the headline), the retry-probe list, long pipeline error
    strings, then the calibration block in two steps (first compressed
    to the ~40 B noise canary, then dropped) and finally the pipeline
    block.  If
    the ladder exhausts with the line still over the cap (r12 advice:
    e.g. a grown queries map), the terminal fallback is a minimal
    envelope — metric/value/queries/sf + an ``over_cap`` flag — and,
    if even the queries map alone overflows, the totals only."""

    def _shrink(d: dict) -> dict:
        if "spread" in d and "dropped" not in d.get("spread", {}):
            d["spread"] = {"dropped": f"line>{LINE_CAP}B"}
            return d
        if d.get("calibration", {}).pop("before_attempts", None) is not None:
            return d
        # ONE rung truncates EVERY long pipeline error: a per-error
        # rung starved the fixed iteration budget when many tiers
        # errored, skipping the deeper rungs even where truncation
        # alone would have fit the line.
        long_errs = [
            v
            for v in d.get("pipeline", {}).values()
            if isinstance(v.get("error"), str) and len(v["error"]) > 80
        ]
        if long_errs:
            for v in long_errs:
                v["error"] = v["error"][:80]
            return d
        # Compress calibration to the canary alone before dropping it:
        # the noise dict (~40 B) is the only artifact evidence of
        # bursty mid-region theft, needed MOST in exactly the degraded
        # draws that reach this rung (r13 review).
        calib = d.get("calibration")
        if isinstance(calib, dict) and set(calib) - {"noise"}:
            d["calibration"] = (
                {"noise": calib["noise"]} if "noise" in calib else {}
            )
            return d
        if "calibration" in d:
            del d["calibration"]
            return d
        if "pipeline" in d:
            del d["pipeline"]
            return d
        return d

    # Degrade a deep copy: the ladder mutates blocks in place, and a
    # caller inspecting its payload afterwards must see what it built,
    # not what the cap forced the LINE to drop.
    payload = json.loads(json.dumps(payload))
    line = json.dumps(payload, separators=(",", ":"))
    for _ in range(6):
        if len(line) <= LINE_CAP:
            break
        payload = _shrink(payload)
        line = json.dumps(payload, separators=(",", ":"))
    if len(line) > LINE_CAP:
        minimal = {
            "metric": payload.get("metric"),
            "value": payload.get("value"),
            "unit": payload.get("unit"),
            "queries": payload.get("queries", {}),
            "sf": payload.get("sf"),
            "over_cap": True,
        }
        line = json.dumps(minimal, separators=(",", ":"))
        if len(line) > LINE_CAP:
            minimal["n_queries"] = len(minimal.pop("queries"))
            line = json.dumps(minimal, separators=(",", ":"))
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("omim-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Released localCheckpoint accumulators log a benign ERROR from
    # DAGScheduler ("Failed to update accumulator ... non-existent");
    # raise that one logger to FATAL so the bench tail stays readable.
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.scheduler.DAGScheduler",
            jvm.org.apache.logging.log4j.Level.FATAL,
        )
    except Exception:
        pass

    # Warmup outside the timed region: run every headline plan once at
    # the smallest scale factor so codegen compilation, parquet reader
    # init, and Python-worker spin-up are excluded from the steady-state
    # measurement (standard steady-state benchmarking; same plans, tiny
    # input).
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    headline = _headline_fns()
    for fn in headline.values():
        fn(spark, warm_dir).write.format("noop").mode("overwrite").save()

    # Fixed calibration jobs, MEASURED: data-independent work whose
    # cost is constant across rounds, so a loaded machine is detectable
    # from the artifact itself (BENCH_r06 shipped a 2x total that was
    # pure machine contention and the JSON carried no way to prove it).
    # TWO probes since r8, because contention is not one-dimensional
    # (r7: the CPU probe read near-floor while the two shuffle-heavy
    # dedup queries inflated 1.8-2.8x — memory-bandwidth/shuffle
    # pressure was invisible to a single-stage codegen loop):
    #   cpu     — single-stage whole-stage-codegen aggregation; moves
    #             no data, detects core contention / frequency drops.
    #   shuffle — hash repartition into 64 partitions then aggregate;
    #             a real Exchange (serialize, spill files, fetch),
    #             detects memory-bandwidth and disk/page-cache
    #             contention the CPU probe can't see.
    # Reported as min/mean of 5 runs next to os.getloadavg() before and
    # after the timed section; compare each probe's min round-over-round
    # before reading anything into the query walls.
    def _calibrate() -> dict[str, dict[str, float]]:
        def probe(fn) -> dict[str, float]:
            runs = []
            for _ in range(5):
                t0 = time.perf_counter()
                fn()
                runs.append(time.perf_counter() - t0)
            return {
                "min": round(min(runs), 3),
                "mean": round(sum(runs) / len(runs), 3),
            }

        return {
            "cpu": probe(
                lambda: spark.range(100_000_000)
                .selectExpr("sum(id * 3 + 1)")
                .collect()
            ),
            "shuffle": probe(
                lambda: spark.range(20_000_000)
                .repartition(64, "id")
                .selectExpr("sum(id * 3 + 1)")
                .collect()
            ),
        }

    # Settle gate: the driver runs bench right after heavy
    # verification work, and BENCH_r07's contamination was visibly
    # DRAINING load (loadavg 4.91 before → 2.16 after) — the timed
    # region started while someone else's work was still finishing.
    # Wait (bounded) for the 1-minute loadavg to fall to a level where
    # the calibration probes can read clean, and record how long we
    # waited so the artifact shows whether the gate engaged.
    #
    # r9 hardening (r8 judge #6): BENCH_r08's draw exhausted the 90 s
    # settle budget and STILL started 5x contended (the loadavg gate
    # can pass while shuffle-bandwidth pressure persists).  So the gate
    # is now probe-verified: after each settle wait, run the
    # calibration probes and only proceed once both read within
    # SPARK_GRAFT_CALIB_TOL (default 2.0x) of their committed idle
    # floors — else sleep-retry, up to SPARK_GRAFT_SETTLE_ATTEMPTS
    # (default 3) waits.  If every attempt reads contended, measure
    # anyway but stamp "gave_up_contended": true so the artifact says
    # so explicitly instead of leaving it to forensic diffing.  Floors
    # are env-overridable for other machines; defaults are the r8 idle
    # probe minima on this 32-core box.
    settle_limit = float(os.environ.get("SPARK_GRAFT_SETTLE_S", "90"))
    settle_bar = float(os.environ.get("SPARK_GRAFT_SETTLE_LOAD", "2.0"))
    cpu_floor = float(os.environ.get("SPARK_GRAFT_CPU_FLOOR", "0.131"))
    shuffle_floor = float(os.environ.get("SPARK_GRAFT_SHUFFLE_FLOOR", "0.94"))
    calib_tol = float(os.environ.get("SPARK_GRAFT_CALIB_TOL", "2.0"))
    max_attempts = max(1, int(os.environ.get("SPARK_GRAFT_SETTLE_ATTEMPTS", "3")))

    settle_waits: list[float] = []
    calib_attempts: list[dict] = []
    gave_up_contended = False
    for attempt in range(max_attempts):
        t_settle = time.perf_counter()
        while (
            os.getloadavg()[0] > settle_bar
            and time.perf_counter() - t_settle < settle_limit
        ):
            time.sleep(2.0)
        settle_waits.append(round(time.perf_counter() - t_settle, 1))
        calib_before = _calibrate()
        calib_attempts.append(calib_before)
        clean = (
            calib_before["cpu"]["min"] <= calib_tol * cpu_floor
            and calib_before["shuffle"]["min"] <= calib_tol * shuffle_floor
        )
        if clean:
            break
        gave_up_contended = attempt == max_attempts - 1
        if not gave_up_contended:
            # Contended probes with LOW loadavg = the r8 failure mode
            # (host-level contention invisible to the guest's loadavg,
            # BENCH_HISTORY r8 notes), where the settle loop above
            # waits 0 s — back-to-back re-probes would all read the
            # same hot host.  Give the host time to drain between
            # attempts.
            time.sleep(float(os.environ.get("SPARK_GRAFT_RETRY_SLEEP_S", "45")))
    load_before = os.getloadavg()

    # n timed executions per query (default 5, override with
    # $SPARK_GRAFT_BENCH_RUNS).  Single executions at this scale vary
    # ±20% run-to-run (GC pauses, JIT/codegen cache state, AQE
    # coalesce decisions near thresholds), which swamps real plan
    # changes; round 4 shipped a +17% total that turned out to be
    # unreproducible noise on byte-identical code.  The headline
    # number per query is the MINIMUM of n full end-to-end executions
    # — the standard steady-state estimator, honest because every run
    # is the complete query with nothing cached between runs beyond
    # the JVM's own state — and the emitted JSON carries per-query
    # mean/stddev so a regression can be told from noise.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))
    # Mid-run canary (r13): the edge probes above can read AT floor
    # while hypervisor-level bursts steal whole windows INSIDE the
    # timed region (BENCH_HISTORY r13 forensics) — sample during it.
    from tools.noise_sentinel import NoiseSentinel

    sentinel = NoiseSentinel().start()
    timings: dict[str, float] = {}
    spread: dict[str, dict[str, float]] = {}
    for name, fn in headline.items():
        runs: list[float] = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)
        mean = sum(runs) / len(runs)
        var = sum((r - mean) ** 2 for r in runs) / max(1, len(runs) - 1)
        # n lives once at top level ("runs_per_query"), not per query:
        # the emitted line must stay under the driver's 2000-char
        # stdout-tail cap (see the dumps call below).
        spread[name] = {
            "mean": round(mean, 3),
            "stddev": round(var**0.5, 3),
        }

    # OMIM pipeline tier (r9 VERDICT #5): build_graph through the TTL
    # write at 2,000 fixture replicas (732k triples — real-OMIM entry
    # counts are this order), so the BUILD path gets a round-over-round
    # regression floor like the workload tier, not just one-off probe
    # numbers in SCALING.md.  Reported under its own "pipeline" key and
    # EXCLUDED from the headline total: "value" stays comparable with
    # BASELINE.json's workload criterion and BENCH_HISTORY's r1-r9
    # floors.  Skip with SPARK_GRAFT_SKIP_PIPELINE=1.
    #
    # Since round 12 (r11 verdict #3) the tier runs in a FRESH
    # subprocess JVM (tools/pipeline_bench.py): inline it inherited
    # the 5×13 workload region's GC/page-cache state, and the r11
    # driver draw read 29.5 s against a settled 19.31 s floor —
    # forensics no artifact should need.  Fail-soft either way: any
    # subprocess failure degrades to an "error" entry, never kills
    # the workload artifact already measured above.
    pipeline: dict[str, dict] = {}
    if os.environ.get("SPARK_GRAFT_SKIP_PIPELINE", "") != "1":
        import subprocess

        # The env parse sits INSIDE the fail-soft region too: a
        # malformed SPARK_GRAFT_PIPELINE_REPLICAS must degrade like
        # any other pipeline-tier failure, not kill the workload
        # artifact already measured above.
        key = "pipeline_build"
        try:
            replicas = int(
                os.environ.get("SPARK_GRAFT_PIPELINE_REPLICAS", "2000")
            )
            key = f"pipeline_build_{replicas}x"
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.join(
                        os.path.dirname(os.path.abspath(__file__)),
                        "tools",
                        "pipeline_bench.py",
                    ),
                ],
                capture_output=True,
                text=True,
                timeout=float(
                    os.environ.get("SPARK_GRAFT_PIPELINE_TIMEOUT_S", "1800")
                ),
            )
            if proc.returncode != 0:
                raise RuntimeError(
                    f"exit {proc.returncode}: {proc.stderr.strip()[-200:]}"
                )
            parsed = json.loads(proc.stdout.strip().splitlines()[-1])
            # Shape-validate INSIDE the fail-soft region: stray
            # JSON-parseable stdout (a list, a scalar, non-dict
            # values) must degrade to an error entry here, not crash
            # the shrink ladder after every workload measurement.
            if not (
                isinstance(parsed, dict)
                and all(isinstance(v, dict) for v in parsed.values())
            ):
                raise RuntimeError(
                    f"unexpected pipeline payload: {str(parsed)[:120]}"
                )
            pipeline = parsed
        except Exception as e:  # noqa: BLE001
            pipeline[key] = {"error": f"{type(e).__name__}: {e}"[:300]}

    noise = sentinel.stop()
    calib_after = _calibrate()
    load_after = os.getloadavg()
    # The external driver records only the LAST 2000 chars of stdout:
    # r10/r11's lines crossed that cap (pipeline key + spread) and the
    # recorded artifacts carried parsed=null — machine comparison
    # (tools/bench_compare.py) fell back to prose.  Keep the line
    # comfortably under the cap: compact separators, the probe-job
    # definitions live in _calibrate's comment instead of the JSON,
    # per-query run count hoisted to one top-level field, and the
    # per-attempt probe list emitted only when the settle gate
    # actually retried (attempt 1 == "before" otherwise).
    calibration = {
        "before": calib_before,
        "after": calib_after,
        "floors": {"cpu": cpu_floor, "shuffle": shuffle_floor},
        "gave_up_contended": gave_up_contended,
        # In-region canary (covers the query loop AND the pipeline
        # subprocess window; see tools/noise_sentinel.py).
        "noise": noise,
        "settle_waits_s": settle_waits,
        "loadavg_before": [round(x, 2) for x in load_before],
        "loadavg_after": [round(x, 2) for x in load_after],
    }
    if len(calib_attempts) > 1:
        calibration["before_attempts"] = calib_attempts
    payload = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "runs_per_query": n_runs,
        "pipeline": pipeline,
        "calibration": calibration,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(emit_line(payload))


if __name__ == "__main__":
    main()
