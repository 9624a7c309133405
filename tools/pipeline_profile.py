"""Event-log census for the pipeline build tier (guide §1.1/§7.1):
synthesize the N-replica fixture, run one warm + one measured
build_graph→TTL pass with event logging, and attribute executor run
time / shuffle bytes / task counts per stage — the noise-resistant
evidence the r13 verdict asked for (wall clocks on this host cross
hypervisor-stolen windows; executor-seconds barely inflate).

Usage: python tools/pipeline_profile.py [replicas] [label]
Prints the measured build's wall/write seconds, total executor
seconds, and the top stages by executor time.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

EVDIR = "/tmp/spark-events-pipeline"


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    label = sys.argv[2] if len(sys.argv) > 2 else "build"

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    from omim_spark.session import get_spark
    from tools.pipeline_scale_probe import run_build, synthesize

    spark = get_spark(
        "omim-pipeline-profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    scratch = Path(__file__).resolve().parent.parent / ".scratch" / "pipeline_profile"
    shutil.rmtree(scratch, ignore_errors=True)
    try:
        synthesize(scratch / "data", replicas)
        run_build(spark, str(scratch / "data"), str(scratch / "warm.ttl"))
        spark.sparkContext.setJobDescription(f"{label}#run0")
        t0 = time.perf_counter()
        wall, n, write_s = run_build(
            spark, str(scratch / "data"), str(scratch / "out.ttl")
        )
        spark.sparkContext.setJobDescription(None)
        spark.stop()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    stage_in_run: set[int] = set()
    stage_agg: dict[int, dict] = {}
    stage_name: dict[int, str] = {}
    stage_wall: dict[int, float] = {}
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
                    desc = ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    )
                    if desc == f"{label}#run0":
                        stage_in_run.update(ev.get("Stage IDs", []))
                        for si in ev.get("Stage Infos", []):
                            stage_name[si["Stage ID"]] = si.get("Stage Name", "")
                elif et == "SparkListenerStageCompleted":
                    si = ev.get("Stage Info", {})
                    sub = si.get("Submission Time")
                    comp = si.get("Completion Time")
                    if sub and comp:
                        stage_wall[si["Stage ID"]] = (comp - sub) / 1000.0
                elif et == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    m = ev.get("Task Metrics") or {}
                    a = stage_agg.setdefault(
                        sid, {"run_ms": 0, "sh_write": 0, "input": 0, "tasks": 0}
                    )
                    a["run_ms"] += m.get("Executor Run Time", 0)
                    a["tasks"] += 1
                    a["sh_write"] += (
                        m.get("Shuffle Write Metrics") or {}
                    ).get("Shuffle Bytes Written", 0)
                    a["input"] += (m.get("Input Metrics") or {}).get(
                        "Bytes Read", 0
                    )

    rows = [
        (agg["run_ms"], sid, agg["tasks"], agg["sh_write"], agg["input"])
        for sid, agg in stage_agg.items()
        if sid in stage_in_run
    ]
    total_ms = sum(r[0] for r in rows)
    total_tasks = sum(r[2] for r in rows)
    print(
        json.dumps(
            {
                "label": label,
                "replicas": replicas,
                "wall_s": round(wall, 2),
                "write_s": round(write_s, 2),
                "triples": n,
                "exec_s": round(total_ms / 1000, 1),
                "stages": len(rows),
                "tasks": total_tasks,
                # Sum of per-stage walls vs the build wall: the gap is
                # driver-side time (planning, scheduling, checkpoint
                # barriers) that no stage accounts for (guide §7.3).
                "stage_wall_s": round(
                    sum(stage_wall.get(r[1], 0.0) for r in rows), 1
                ),
            }
        )
    )
    for run_ms, sid, tasks, shw, inp in sorted(rows, reverse=True)[:10]:
        print(
            f"    stage {sid}: {run_ms / 1000:.1f}s exec, "
            f"{stage_wall.get(sid, 0.0):.1f}s wall, {tasks} tasks, "
            f"shW {shw / 1e6:.1f}MB, in {inp / 1e6:.1f}MB  "
            f"{stage_name.get(sid, '')[:70]}"
        )


if __name__ == "__main__":
    main()
