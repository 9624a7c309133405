"""Scale probe: measure how the corpus-scale operators behave when the
input grows 10× — the check that the funnels are sub-quadratic in
practice, not just by argument.

Synthesizes a 10× documents/embeddings corpus from sf0.1 (replicas get
fresh ids and a replica-tag token so near-dup structure grows linearly
instead of collapsing into one giant dup cluster), then times the
headline document/embedding operators at 1× and 10× and prints the
wall-clock ratio.  A ratio ≈ 10 means linear; the LSH funnel's
candidate stage may exceed that slightly (bucket sizes grow), which is
exactly what to watch.

Usage: python tools/scale_probe.py [replicas]
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

BASE = "/root/testdata/sf0.1"
QUERIES_TO_PROBE = [
    "q_dedup_exact",
    "q_dedup_ngram_jaccard",
    "q_dedup_minhash_lsh",
    "q_knn_bruteforce",
    "q_token_count_bpe",
    "q_train_test_split",
    "q_substring_spans",
    "q_decontaminate",
    "q_tfidf_cosine_pairs",
    "q_countmin_heavy_hitters",
    "q_weighted_sample_es",
]


def synthesize(spark, out_dir: str, replicas: int) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    n_docs = docs.count()
    rep = spark.range(replicas).select(F.col("id").alias("rep"))
    big_docs = (
        docs.crossJoin(rep)
        .select(
            (F.col("doc_id") + F.col("rep") * n_docs).alias("doc_id"),
            # tag each replica so replicas are near-dups of each other,
            # not byte-exact dups: dup structure scales linearly
            F.concat_ws(" ", F.col("text"), F.concat(F.lit("rep"), F.col("rep")))
            .alias("text"),
            "lang",
            "source",
            (F.col("n_chars") + 5).alias("n_chars"),
        )
    )
    big_docs.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n_emb = emb.count()
    big_emb = emb.crossJoin(rep).select(
        (F.col("vec_id") + F.col("rep") * n_emb).alias("vec_id"),
        "embedding",
        "label",
    )
    big_emb.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from omim_spark.session import get_spark
    from omim_spark.workload import QUERIES

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    scratch = Path(__file__).resolve().parent.parent / ".scratch" / "scale_probe"
    shutil.rmtree(scratch, ignore_errors=True)
    scratch.mkdir(parents=True)
    print(f"synthesizing {replicas}x corpus …", flush=True)
    synthesize(spark, str(scratch), replicas)

    def best_of_two(fn, sf_dir):
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    print(f"{'query':<28}{'1x':>8}{'%dx' % replicas:>9}{'ratio':>8}")
    for name in QUERIES_TO_PROBE:
        fn = QUERIES[name].fn
        t1 = best_of_two(fn, BASE)
        t10 = best_of_two(fn, str(scratch))
        print(f"{name:<28}{t1:>8.2f}{t10:>9.2f}{t10 / t1:>8.1f}")

    # The mitigation the workload query deliberately omits (oracle
    # exactness): hot-shingle document-frequency cap before the
    # inverted-index join.  This is operators/dedup.py's scale path.
    def capped_jaccard(spark, sf_dir):
        from pyspark.sql import functions as F

        from omim_spark.operators.dedup import jaccard_verify, shingles

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        sh = shingles(docs, n=3, max_df=50).localCheckpoint(eager=False)
        a, b = sh.alias("a"), sh.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.s") == F.col("b.s"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
        return jaccard_verify(cand, sh, threshold=0.8)

    t1 = best_of_two(capped_jaccard, BASE)
    t10 = best_of_two(capped_jaccard, str(scratch))
    print(f"{'jaccard_capped(max_df=50)':<28}{t1:>8.2f}{t10:>9.2f}{t10 / t1:>8.1f}")
    shutil.rmtree(scratch, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
