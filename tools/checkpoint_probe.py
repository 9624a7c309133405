"""Measure the `reliable` checkpoint tier's overhead vs `local`
(r12 verdict #6): the one number a 100 TB deployment needs to budget
the executor-loss insurance that `spark.omim.checkpoint.mode=reliable`
buys (see SCALING.md "Checkpointing and executor loss").

Runs the heaviest cut_lineage consumers — the substring span funnel,
the CC cluster funnel, and the per-iteration graph loops — at sf0.1
under both modes, interleaved (local, reliable, local, reliable) so
machine drift cancels, reporting min-of-N walls and the
reliable/local ratio.  `reliable` uses a LOCAL-DISK checkpoint dir:
on a cluster the store would be HDFS/S3 (add network round-trips),
so the measured ratio is a lower bound on the insurance premium —
but it isolates the mechanism cost (write+read+serialize of every
cut table) from store latency.

Usage: python tools/checkpoint_probe.py [sf_dir] [runs_per_mode] [probe ...]
  (trailing args select a subset of PROBES; default = all)
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

PROBES = [
    "q_substring_dup_stats",     # span funnel: narrow (id,pos,h) cut
    "q_dedup_cluster_survivors", # LSH funnel + CC loop cuts
    "q_label_propagation",       # cut per iteration
    "q_pagerank_steps",          # cut per iteration
    "q_decontaminate_fuzzy",     # band-table + candidate-union cuts (r13)
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    selected = sys.argv[3:] or PROBES
    unknown = set(selected) - set(PROBES)
    if unknown:
        raise SystemExit(f"unknown probes: {sorted(unknown)}")

    from pyspark.sql import SparkSession

    from omim_spark.operators.checkpoint import CHECKPOINT_MODE_CONF
    from omim_spark.workload import QUERIES

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    ckpt_dir = tempfile.mkdtemp(prefix="omim_reliable_ckpt_")
    spark.sparkContext.setCheckpointDir(ckpt_dir)
    try:
        print(f"sf_dir={sf_dir} runs_per_mode={runs} ckpt_dir={ckpt_dir}")
        results: dict[str, dict[str, float]] = {}
        for name in selected:
            fn = QUERIES[name].fn
            walls: dict[str, list[float]] = {"local": [], "reliable": []}
            # untimed warmup (local mode) to page in the parquet
            spark.conf.set(CHECKPOINT_MODE_CONF, "local")
            fn(spark, sf_dir).count()
            for _ in range(runs):
                for mode in ("local", "reliable"):
                    spark.conf.set(CHECKPOINT_MODE_CONF, mode)
                    t0 = time.monotonic()
                    fn(spark, sf_dir).count()
                    walls[mode].append(time.monotonic() - t0)
            lo, re_ = min(walls["local"]), min(walls["reliable"])
            results[name] = {
                "local_min": round(lo, 2),
                "reliable_min": round(re_, 2),
                "ratio": round(re_ / lo, 2),
            }
            print(
                f"{name:<28} local {lo:6.2f}s  reliable {re_:6.2f}s  "
                f"ratio {re_ / lo:4.2f}x"
            )
        import json

        print(json.dumps(results))
        return 0
    finally:
        spark.conf.set(CHECKPOINT_MODE_CONF, "local")
        shutil.rmtree(ckpt_dir, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
