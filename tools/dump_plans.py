"""Dump .explain("formatted") for headline queries to plans/<round>/.

Usage: python tools/dump_plans.py <tag: before|after> [query ...]
Writes plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<tag>.txt (round dir
defaults to r14; r13 ADVICE — the former hardcoded plans/r13 would
have silently overwritten the committed r13 artifacts) for each
headline + bench-only query (or just the named ones).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from omim_spark.session import get_spark
    from omim_spark.workload import BENCH_ONLY, QUERIES

    spark = get_spark("omim-spark-plans")
    spark.sparkContext.setLogLevel("ERROR")

    fns = {n: qd.fn for n, qd in QUERIES.items() if qd.headline}
    fns.update(BENCH_ONLY)
    fns = {n: f for n, f in sorted(fns.items()) if not only or n in only}

    rnd = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r14")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd
    )
    os.makedirs(outdir, exist_ok=True)
    for name, fn in fns.items():
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {len(plan)} B, {n_ex} Exchange mentions -> {path}")


if __name__ == "__main__":
    main()
