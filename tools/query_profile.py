"""Per-query measurement harness for the optimization rounds.

For each named headline query (default: all): run it R times through
the noop sink (guide §1.4) with a job description label (§1.5), report
the min/mean wall, and attribute time from the Spark event log —
per-stage executor-run-time, shuffle bytes, and task counts — so the
optimization targets the stage that actually costs, not the one that
looks expensive in the plan.

Usage: python tools/query_profile.py [sf_dir] [query ...]
Env:   SPARK_GRAFT_PROFILE_RUNS (default 3)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark-events-profile"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])
    runs = max(1, int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "3")))

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    from omim_spark.session import get_spark
    from omim_spark.workload import BENCH_ONLY, QUERIES

    spark = get_spark(
        "omim-spark-profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    fns = {n: qd.fn for n, qd in QUERIES.items() if qd.headline}
    fns.update(BENCH_ONLY)
    fns = {n: f for n, f in sorted(fns.items()) if not only or n in only}

    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for fn in fns.values():
        fn(spark, warm_dir).write.format("noop").mode("overwrite").save()

    results: dict[str, dict] = {}
    for name, fn in fns.items():
        walls = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"{name}#run{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        results[name] = {
            "min": round(min(walls), 3),
            "mean": round(sum(walls) / len(walls), 3),
        }

    spark.stop()

    # Attribute from the event log: map job description -> stages ->
    # (executor run time, shuffle read/write bytes, tasks).
    stage_to_label: dict[int, str] = {}
    stage_agg: dict[int, dict] = {}
    stage_name: dict[int, str] = {}
    ev_files = []
    for root, _dirs, files in os.walk(EVDIR):
        ev_files.extend(
            os.path.join(root, f) for f in files if "appstatus" not in f
        )
    for path in ev_files:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                et = ev.get("Event")
                if et == "SparkListenerJobStart":
                    label = ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    )
                    for sid in ev.get("Stage IDs", []):
                        stage_to_label[sid] = label
                    for si in ev.get("Stage Infos", []):
                        stage_name[si["Stage ID"]] = si.get("Stage Name", "")
                elif et == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    m = ev.get("Task Metrics") or {}
                    a = stage_agg.setdefault(
                        sid,
                        {"run_ms": 0, "sh_read": 0, "sh_write": 0, "tasks": 0,
                         "gc_ms": 0, "input": 0},
                    )
                    a["run_ms"] += m.get("Executor Run Time", 0)
                    a["gc_ms"] += m.get("JVM GC Time", 0)
                    a["tasks"] += 1
                    a["sh_read"] += (m.get("Shuffle Read Metrics") or {}).get(
                        "Remote Bytes Read", 0
                    ) + (m.get("Shuffle Read Metrics") or {}).get(
                        "Local Bytes Read", 0
                    )
                    a["sh_write"] += (
                        m.get("Shuffle Write Metrics") or {}
                    ).get("Shuffle Bytes Written", 0)
                    a["input"] += (m.get("Input Metrics") or {}).get(
                        "Bytes Read", 0
                    )

    per_label: dict[str, dict] = {}
    for sid, agg in stage_agg.items():
        label = stage_to_label.get(sid, "?")
        if "#run" not in label:
            continue
        qname, run = label.rsplit("#run", 1)
        if run != "0":  # attribute run 0 only (steady-state post-warmup)
            continue
        d = per_label.setdefault(
            qname,
            {"stages": 0, "tasks": 0, "run_ms": 0, "gc_ms": 0,
             "sh_read_mb": 0.0, "sh_write_mb": 0.0, "input_mb": 0.0,
             "top_stages": []},
        )
        d["stages"] += 1
        d["tasks"] += agg["tasks"]
        d["run_ms"] += agg["run_ms"]
        d["gc_ms"] += agg["gc_ms"]
        d["sh_read_mb"] += agg["sh_read"] / 1e6
        d["sh_write_mb"] += agg["sh_write"] / 1e6
        d["input_mb"] += agg["input"] / 1e6
        d["top_stages"].append(
            (agg["run_ms"], sid, agg["tasks"],
             stage_name.get(sid, "")[:60])
        )

    for name in fns:
        r = results[name]
        a = per_label.get(name, {})
        print(
            f"{name}: min {r['min']} mean {r['mean']}"
            + (
                f" | run0: {a['stages']} stages {a['tasks']} tasks "
                f"exec {a['run_ms'] / 1000:.2f}s gc {a['gc_ms'] / 1000:.2f}s "
                f"shW {a['sh_write_mb']:.1f}MB in {a['input_mb']:.1f}MB"
                if a
                else ""
            )
        )
        for run_ms, sid, tasks, sname in sorted(
            a.get("top_stages", []), reverse=True
        )[:5]:
            print(f"    stage {sid}: {run_ms / 1000:.2f}s exec, {tasks} tasks  {sname}")


if __name__ == "__main__":
    main()
