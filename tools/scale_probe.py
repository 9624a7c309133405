"""Scale probe: measure how the engine behaves when the input grows
10× — the check that the plans are (sub-)linear in practice, not just
by argument.

Synthesizes a FULL sf1-equivalent dataset from sf0.1 (every driver
table, 10 replicas with key-consistent remapping so every join the
workload performs stays valid: customer/orders/lineitem foreign keys
stride together, events get fresh users per replica, documents get a
replica-tag token so near-dup structure grows linearly instead of
collapsing into one giant dup cluster), then times the 11 headline
queries plus the most expensive round-3 additions at 1× and 10× and
prints per-query wall-clock ratio and the scaling exponent
log(t10/t1)/log(10).  Exponent ≈ 1 is linear; exponents well below 1
are scan-underutilization at 1× (fixed overheads dominate); anything
meaningfully above 1 is a scale bug to fix.

Usage: python tools/scale_probe.py [replicas] [--keep] [--only=q1,q2]
"""

from __future__ import annotations

import math
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

BASE = "/root/testdata/sf0.1"

# 11 headline queries (pulled from the registry) plus the 5 most
# expensive round-3 additions (per the round-3 review) and the
# round-4 additions.
EXTRA_PROBES = [
    "q_tfidf_cosine_pairs",
    "q_countmin_heavy_hitters",
    "q_dedup_lsh_capped",
    "q_bigram_lm",
    "q_rolling_7day",
    # round 4
    "q_ann_ivf_probe",
    "q_zorder_locality",
    "q_bloom_prune_join",
    "q_semantic_dedup",
    "q_dedup_incremental",
]


def replicate(spark, df, replicas: int, offsets: dict[str, int]):
    """Stack ``replicas`` copies of ``df``, striding each key column in
    ``offsets`` by its per-replica stride so foreign keys remapped with
    the same stride keep joining."""
    from pyspark.sql import functions as F

    rep = spark.range(replicas).select(F.col("id").alias("_rep"))
    out = df.crossJoin(rep)
    for c, stride in offsets.items():
        out = out.withColumn(c, F.col(c) + F.col("_rep") * F.lit(int(stride)))
    return out.drop("_rep")


def synthesize(spark, out_dir: str, replicas: int, base: str = BASE) -> None:
    from pyspark.sql import functions as F

    def rd(name):
        return spark.read.parquet(f"{base}/{name}.parquet")

    n = {t: rd(t).count() for t in ("customer", "supplier", "part", "orders")}

    # Fixed dims stay fixed (TPC-H keeps nation/region constant across
    # scale factors); fact/dim tables stride their keys together.
    for name in ("region", "nation"):
        rd(name).write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")

    plans = {
        "customer": {"c_custkey": n["customer"]},
        "supplier": {"s_suppkey": n["supplier"]},
        "part": {"p_partkey": n["part"]},
        "orders": {"o_orderkey": n["orders"], "o_custkey": n["customer"]},
        "lineitem": {
            "l_orderkey": n["orders"],
            "l_partkey": n["part"],
            "l_suppkey": n["supplier"],
        },
    }
    for name, offsets in plans.items():
        replicate(spark, rd(name), replicas, offsets).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{name}.parquet")

    # Events: fresh event ids AND fresh users per replica (densifying
    # the same time window — the realistic growth shape for a metrics
    # stream); ts is normalized through the same reader the workload
    # uses, so whatever physical type the generator shipped round-trips
    # to TIMESTAMP(MICROS).
    from omim_spark.workload.registry import events_table

    ev = events_table(spark, base)
    n_ev = ev.count()
    user_stride = ev.agg(F.max("user_id")).first()[0] + 1
    replicate(
        spark, ev, replicas, {"event_id": n_ev, "user_id": user_stride}
    ).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    # Documents: replicas get fresh ids plus a tag token, so near-dup
    # clusters grow 10× instead of collapsing into exact dups.
    docs = rd("documents")
    n_docs = docs.count()
    rep = spark.range(replicas).select(F.col("id").alias("_rep"))
    (
        docs.crossJoin(rep)
        .select(
            (F.col("doc_id") + F.col("_rep") * n_docs).alias("doc_id"),
            F.concat_ws(
                " ", F.col("text"), F.concat(F.lit("rep"), F.col("_rep"))
            ).alias("text"),
            "lang",
            "source",
            (F.col("n_chars") + 5).alias("n_chars"),
        )
        .write.mode("overwrite")
        .parquet(f"{out_dir}/documents.parquet")
    )

    emb = rd("embeddings")
    replicate(spark, emb, replicas, {"vec_id": emb.count()}).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/embeddings.parquet")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    keep = "--keep" in sys.argv
    only = [
        q
        for a in sys.argv[1:]
        if a.startswith("--only=")
        for q in a.split("=", 1)[1].split(",")
        if q
    ]
    replicas = int(args[0]) if args else 10
    from omim_spark.session import get_spark
    from omim_spark.workload import QUERIES

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    scratch = Path(__file__).resolve().parent.parent / ".scratch" / "scale_probe"
    shutil.rmtree(scratch, ignore_errors=True)
    scratch.mkdir(parents=True)
    print(f"synthesizing {replicas}x dataset (all tables) …", flush=True)
    t0 = time.perf_counter()
    synthesize(spark, str(scratch), replicas)
    print(f"synthesized in {time.perf_counter() - t0:.1f}s", flush=True)

    def best_of_two(fn, sf_dir):
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def _clean_corpus_bucketed_probe(spark, sf_dir):
        """Operator probe (not a registry query): the shuffle-free
        corpus rewrite over a doc_id-bucketed layout.  The bucket
        write happens OUTSIDE the timed region — the layout is paid
        once at ingest, which is the point of the scale path."""
        from omim_spark.operators.bucketing import write_bucketed
        from omim_spark.operators.dedup import clean_corpus_bucketed

        tbl = "probe_docs_bucketed"
        write_bucketed(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), tbl, "doc_id", 32
        )
        return lambda s, d: clean_corpus_bucketed(s, tbl)

    CUSTOM_PROBES = {
        "op_clean_corpus_bucketed": _clean_corpus_bucketed_probe,
    }

    probes = only or (
        [n for n, q in QUERIES.items() if q.headline] + EXTRA_PROBES
    )
    print(
        f"{'query':<28}{'1x':>8}{'%dx' % replicas:>9}{'ratio':>8}{'exp':>7}",
        flush=True,
    )
    rows = []
    for name in probes:
        if name in CUSTOM_PROBES:
            setup = CUSTOM_PROBES[name]
            fn = setup(spark, BASE)
            t1 = best_of_two(fn, BASE)
            fn = setup(spark, str(scratch))
            t10 = best_of_two(fn, str(scratch))
            spark.sql("DROP TABLE IF EXISTS probe_docs_bucketed")
            exp = math.log(t10 / t1) / math.log(replicas)
            rows.append((name, t1, t10, t10 / t1, exp))
            print(
                f"{name:<28}{t1:>8.2f}{t10:>9.2f}{t10 / t1:>8.1f}{exp:>7.2f}",
                flush=True,
            )
            continue
        fn = QUERIES[name].fn
        t1 = best_of_two(fn, BASE)
        t10 = best_of_two(fn, str(scratch))
        exp = math.log(t10 / t1) / math.log(replicas)
        rows.append((name, t1, t10, t10 / t1, exp))
        print(
            f"{name:<28}{t1:>8.2f}{t10:>9.2f}{t10 / t1:>8.1f}{exp:>7.2f}",
            flush=True,
        )
    if not keep:
        shutil.rmtree(scratch, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
