"""Similarity search over the ``embeddings`` table
(``array<float>`` column): brute-force cosine top-k as the exactness
baseline, a sign-LSH bucketed variant as the scale path, all-pairs
near-dup detection, and per-label centroids.

Design for 100 TB:
- Brute force is a broadcast of the query vector + a single map stage
  (score) + TakeOrderedAndProject — correct baseline, O(n·d).
- Sign-LSH (random-hyperplane) buckets shrink the candidate set; the
  hyperplanes are derived from md5 so the partitioner, the oracle, and
  every executor agree without shipping a model.  This is the IVF-ish
  layout: cluster/bucket id becomes the partition key, so a query
  touches one partition instead of all of them.
- All vector math stays in JVM expressions (zip_with/aggregate) — no
  Python in the scoring loop.
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from omim_spark.operators.checkpoint import (
    cut_lineage,
    materialize_before_cleanup,
)

from .registry import register, table, table_spread

_SCRATCH = Path(__file__).resolve().parent.parent.parent / ".scratch"

# Hot-shingle df cap for the cross-modal pair mining — must equal
# workload.dedup.MAX_DF (asserted inside q_crossmodal_neardup; a
# literal here because the oracle f-string is built at import time
# and dedup is imported lazily to avoid a module cycle).
_XM_MAX_DF = 20

N_PLANES = 8
DIM = 64


def _vec_double(col: str = "embedding") -> Column:
    return F.expr(f"transform({col}, x -> cast(x as double))")


def _dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
    )


def _cosine(a: str, b: str) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


_COS_DUCK = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


@register(
    "q_knn_bruteforce",
    headline=True,
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
    SELECT vec_id, label,
           ROUND({_COS_DUCK.format(a='v', b='qv')}, 6) AS cosine
    FROM e CROSS JOIN q
    WHERE vec_id <> 0
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
)
def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for one query vector (ANN baseline).

    Scale: query vector broadcasts (one row); scoring is a pure map
    over the corpus; top-k is TakeOrderedAndProject — no global sort,
    no shuffle of the corpus."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", _vec_double().alias("v"), "label"
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "label", F.round(_cosine("v", "qv"), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


# Sign-LSH: plane j's sign for dimension i is +1 iff the first md5
# nibble of "j:i" is >= 8.  Integer-derived → identical in both engines.
_PLANES_SPARK = (
    f"transform(sequence(0, {N_PLANES - 1}), j -> "
    f"transform(sequence(1, {DIM}), i -> "
    "case when instr('0123456789abcdef', "
    "substring(md5(cast(concat(j, ':', i) as binary)), 1, 1)) - 1 >= 8 "
    "then 1.0D else -1.0D end))"
)
_PLANES_DUCK = (
    f"list_transform(generate_series(0, {N_PLANES - 1}), j -> "
    f"list_transform(generate_series(1, {DIM}), i -> "
    "CASE WHEN strpos('0123456789abcdef', "
    "substr(md5(CAST(j AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 1)) - 1 >= 8 "
    "THEN 1.0 ELSE -1.0 END))"
)


@register(
    "q_ann_lsh_buckets",
    oracle=f"""
    WITH planes AS (SELECT {_PLANES_DUCK} AS pl),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    hashed AS (
      SELECT vec_id,
             LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, {N_PLANES}), j ->
               CASE WHEN LIST_DOT_PRODUCT(pl[j], v) > 0
                    THEN 1 << (j - 1) ELSE 0 END))::BIGINT AS bucket
      FROM e CROSS JOIN planes
    )
    SELECT bucket, COUNT(*) AS n_vectors
    FROM hashed
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def q_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucket assignment (the ANN scale path): 8 md5-derived
    hyperplanes → 256 buckets; output the bucket histogram.

    Scale: bucket id is the partition key for an IVF-style layout —
    writing the corpus partitioned by bucket makes a query read ~1/256
    of the data; the histogram here is the skew diagnostic for that
    layout."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", _vec_double().alias("v")
    )
    # Planes materialized once in a broadcast single-row DF (inlining
    # the md5 synthesis into the lambda re-evaluates the whole plane
    # grid per element access — measured ~15x slower; round-4 fix).
    planes = spark.range(1).select(F.expr(_PLANES_SPARK).alias("pl"))
    bucket = F.expr(
        f"aggregate(transform(sequence(1, {N_PLANES}), j -> "
        "case when aggregate(zip_with(element_at(pl, j), v, "
        "(x, y) -> x * y), 0.0D, (acc, x) -> acc + x) > 0 "
        "then shiftleft(1L, j - 1) else 0L end), 0L, (acc, x) -> acc + x)"
    )
    return (
        emb.crossJoin(F.broadcast(planes))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
        .orderBy("bucket")
    )


@register(
    "q_embedding_neardup",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND({_COS_DUCK.format(a='a.v', b='b.v')}, 6) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE {_COS_DUCK.format(a='a.v', b='b.v')} >= 0.45
    ORDER BY vec_a, vec_b
    """,
)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (all-pairs verification
    tier — at scale only run on LSH/IVF candidate buckets; see
    q_ann_lsh_buckets for the pruning layer).

    r14 (guide §1.2 per-task work): norms are computed ONCE PER
    VECTOR before the pair join instead of once per pair (identical
    expression per side, so sqrt(dot(v,v)) is the same double and
    dot/(na*nb) multiplies the same values in the same order —
    bit-identical cosine), and the streamed side of the
    nested-loop join is spread so the |pairs| evaluations use every
    core instead of the one task a single-row-group scan allows."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", _vec_double().alias("v")
    )
    nrm = F.sqrt(_dot("v", "v"))
    a = table_spread(spark, sf_dir, "embeddings", "vec_id").select(
        F.col("vec_id").alias("vec_a"),
        _vec_double().alias("va"),
    ).withColumn("na", F.sqrt(_dot("va", "va")))
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), nrm.alias("nb")
    )
    cos = _dot("va", "vb") / (F.col("na") * F.col("nb"))
    return (
        # Explicit broadcast pins the nested-loop build side to b, so
        # the SPREAD side streams: without it the planner may build
        # the spread side and stream the single-partition scan,
        # keeping the pair loop serial.
        a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
        .filter(cos >= 0.45)
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cosine"))
        .orderBy("vec_a", "vec_b")
    )


@register(
    "q_embedding_centroids",
    oracle="""
    WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT label, i AS dim,
           CAST(SUM(CAST(v[i] AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS centroid,
           COUNT(*) AS n
    FROM e CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, 64)) AS i)
    GROUP BY label, i
    HAVING i <= 4
    ORDER BY label, dim
    """,
)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column (the k-means /IVF
    training step shape): posexplode + grouped exact-decimal mean;
    first 4 dimensions emitted for the oracle check.

    Scale: the (label, dim) grouping key is perfectly uniform; the
    shuffle is |labels|×|dims| rows regardless of corpus size."""
    emb = table(spark, sf_dir, "embeddings").select("label", _vec_double().alias("v"))
    return (
        emb.select("label", F.posexplode("v").alias("pos", "x"))
        .select("label", (F.col("pos") + 1).alias("dim"), "x")
        .groupBy("label", "dim")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(18,6)")).cast("double") / F.count("*")
            ).alias("centroid"),
            F.count("*").alias("n"),
        )
        .filter(F.col("dim") <= 4)
        .orderBy("label", "dim")
    )


@register(
    "q_crossmodal_neardup",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents
      WHERE LEN(STRING_SPLIT(text, ' ')) >= 3
    ),
    sh AS (
      SELECT doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
        GENERATE_SERIES(1, LEN(toks) - 2),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
      FROM tk
    ),
    hot AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) > {_XM_MAX_DF}),
    shc AS (SELECT sh.* FROM sh ANTI JOIN hot USING (s)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    textdups AS (
      SELECT doc_a, doc_b,
             CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
      FROM pairs
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.8
    ),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT doc_a, doc_b, ROUND(jaccard, 6) AS jaccard,
           ROUND({_COS_DUCK.format(a='ea.v', b='eb.v')}, 6) AS emb_cosine
    FROM textdups
    JOIN e ea ON doc_a = ea.vec_id
    JOIN e eb ON doc_b = eb.vec_id
    ORDER BY doc_a, doc_b
    """,
)
def q_crossmodal_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal validation join: text near-duplicate pairs (n-gram
    Jaccard ≥ 0.8) annotated with their embedding-space cosine — the
    audit query a training pipeline runs to check that its text dedup
    and its embedding space agree (doc_id ≡ vec_id in the fixtures).

    Scale: the pair mining is the df-capped inverted-index funnel —
    the same hot-shingle cap as the Jaccard headline (an uncapped
    shingle self-join, which this query ran until round 5, is the
    measured 45.9× shape: one boilerplate shingle funnels the whole
    corpus through one bucket).  The embedding annotate is two
    id-equi-joins after it.  No broadcast hints anywhere: the
    embedding table is corpus-proportional (terabytes at 100 TB —
    force-broadcasting it is the one unconditionally wrong choice),
    the hot list is a Zipf head, and the pair table is data-dependent
    — the planner/AQE picks build sides from real sizes."""
    from omim_spark.workload.dedup import MAX_DF, _shingles

    # Oracle literal must track the cap.  An explicit raise, not
    # ``assert``: asserts are stripped under ``python -O``, which would
    # let a future dedup.MAX_DF change silently desync this query's
    # Spark plan from its oracle until a sweep caught it.
    if MAX_DF != _XM_MAX_DF:
        raise AssertionError(
            f"q_crossmodal_neardup oracle pins df cap {_XM_MAX_DF}, "
            f"but dedup.MAX_DF is now {MAX_DF} — update _XM_MAX_DF and "
            "the oracle SQL together"
        )
    sh_all = (
        _shingles(spark, sf_dir)
        .select("doc_id", F.xxhash64("s").alias("s"))
        .transform(cut_lineage, eager=False)
    )
    hot = (
        sh_all.groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > MAX_DF)
        .select("s")
    )
    # One hash exchange on s after the cap (same shape as the ngram
    # headline): the self-join's two sides and the sizes rollup read
    # it as a ReusedExchange instead of re-running the cap.
    sh = sh_all.join(hot, "s", "left_anti").repartition("s")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_common")
    )
    textdups = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.8)
    )
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", _vec_double().alias("v")
    )
    ea = emb.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"))
    eb = emb.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"))
    return (
        textdups.join(ea, F.col("doc_a") == F.col("ia"))
        .join(eb, F.col("doc_b") == F.col("ib"))
        .select(
            "doc_a",
            "doc_b",
            F.round("jaccard", 6).alias("jaccard"),
            F.round(_cosine("va", "vb"), 6).alias("emb_cosine"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# k-means (one Lloyd iteration, deterministic)
# ---------------------------------------------------------------------------

KMEANS_K = 5

# Squared L2 distance as a left-fold over zipped dims — the Spark side
# folds in the same sequential accumulation order (see ``best`` in
# q_kmeans_assign), so distances agree to the last ulp.
_D2_DUCK = "list_sum(list_transform(list_zip(v, cv), p -> (p[1] - p[2]) * (p[1] - p[2])))"


@register(
    "q_kmeans_assign",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (
      SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {KMEANS_K}
    ),
    scored AS (
      SELECT e.vec_id, cents.cid, {_D2_DUCK} AS d2,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                ORDER BY {_D2_DUCK}, cents.cid) AS rk
      FROM e CROSS JOIN cents
    ),
    assigned AS (
      SELECT s.vec_id, s.cid, s.d2, e.v
      FROM scored s JOIN e USING (vec_id) WHERE rk = 1
    ),
    stats AS (
      SELECT cid, COUNT(*) AS n_vecs,
             CAST(SUM(CAST(d2 AS DECIMAL(18,6))) AS DOUBLE) AS inertia
      FROM assigned GROUP BY cid
    ),
    dims AS (
      SELECT cid, i,
             CAST(SUM(CAST(v[i] AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean_d
      FROM assigned CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, 64)) AS i)
      GROUP BY cid, i
    ),
    norms AS (
      SELECT cid,
             SQRT(CAST(SUM(CAST(mean_d * mean_d AS DECIMAL(18,6))) AS DOUBLE))
               AS centroid_norm
      FROM dims GROUP BY cid
    )
    SELECT stats.cid AS cluster_id, n_vecs, inertia,
           CAST(CAST(centroid_norm AS DECIMAL(18,6)) AS DOUBLE) AS centroid_norm
    FROM stats JOIN norms USING (cid)
    ORDER BY cluster_id
    """,
)
def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One deterministic Lloyd iteration of k-means (K={KMEANS_K},
    centroids seeded from vec_id < K): assign every embedding to its
    nearest centroid (squared L2, centroid id breaks ties), then emit
    per-cluster size, inertia, and the updated-centroid norm — the
    iterative-ML primitive (cluster/IVF training) on the engine.

    Determinism: distances left-fold in the same dim order on both
    engines; inertia and per-dimension means go through DECIMAL(18,6)
    sums, so the re-estimated centroid is order-independent.

    Scale: the K centroids are aggregated into ONE array-of-structs
    row and broadcast; assignment is then a genuinely stateless map —
    each vector folds over the centroid array and takes
    ``array_min(struct(d2, cid))`` in-row, so NO shuffle (and no
    K×|vectors| row blow-up) happens before the cluster-stats
    aggregation.  Cluster stats are map-side-combinable aggs; the
    per-(cluster,dim) mean shuffles K×64 keys.  A full k-means loops
    this plan with the new centroid array re-broadcast each round."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", _vec_double().alias("v")
    )
    cent_arr = emb.filter(F.col("vec_id") < KMEANS_K).agg(
        F.collect_list(
            F.struct(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
        ).alias("cents")
    )
    # min over struct(d2, cid) is order-independent, so collect_list's
    # nondeterministic array order cannot change the winner.
    best = (
        "array_min(transform(cents, c -> struct("
        "aggregate(zip_with(v, c.cv, (x, y) -> (x - y) * (x - y)), 0.0D, "
        "(acc, x) -> acc + x) AS d2, c.cid AS cid)))"
    )
    assigned = (
        emb.crossJoin(F.broadcast(cent_arr))
        .select("vec_id", "v", F.expr(best).alias("_best"))
        .select(
            "vec_id",
            F.col("_best.cid").alias("cid"),
            F.col("_best.d2").alias("d2"),
            "v",
        )
    )
    stats = assigned.groupBy("cid").agg(
        F.count("*").alias("n_vecs"),
        F.sum(F.col("d2").cast("decimal(18,6)")).cast("double").alias("inertia"),
    )
    dims = (
        assigned.select("cid", F.posexplode("v").alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(18,6)")).cast("double")
                / F.count("*")
            ).alias("mean_d")
        )
    )
    norms = dims.groupBy("cid").agg(
        F.sqrt(
            F.sum((F.col("mean_d") * F.col("mean_d")).cast("decimal(18,6)")).cast(
                "double"
            )
        ).alias("centroid_norm")
    )
    return (
        stats.join(norms, "cid")
        .select(
            F.col("cid").alias("cluster_id"),
            "n_vecs",
            "inertia",
            F.col("centroid_norm").cast("decimal(18,6)").cast("double").alias(
                "centroid_norm"
            ),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# IVF ANN: train one Lloyd step, probe nearest cells, exact search inside
# ---------------------------------------------------------------------------

IVF_K = 8  # coarse cells
IVF_NPROBE = 2

_D2 = "list_sum(list_transform(list_zip({a}, {b}), p -> (p[1] - p[2]) * (p[1] - p[2])))"


def _ivf_train(emb: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One deterministic Lloyd step of the IVF coarse quantizer over
    ``(vec_id, v)``: seed centroids are the first ``IVF_K`` vectors,
    every vector is assigned to its nearest seed (map-side argmin over
    the broadcast seed array — no shuffle), and updated centroids are
    per-(cell, dim) means through DECIMAL(18,6) sums so the trained
    quantizer is bit-identical across engines and partitionings.

    Returns ``(assigned, cents)`` — ``assigned``: (vec_id, v, cid);
    ``cents``: (cid, cv).  Shared by the in-query probe
    (q_ann_ivf_probe) and the stored-layout probe (q_ann_ivf_stored)."""
    seed_arr = emb.filter(F.col("vec_id") < IVF_K).agg(
        F.collect_list(
            F.struct(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
        ).alias("cents")
    )
    best = (
        "array_min(transform(cents, c -> struct("
        "aggregate(zip_with(v, c.cv, (x, y) -> (x - y) * (x - y)), 0.0D, "
        "(acc, x) -> acc + x) AS d2, c.cid AS cid)))"
    )
    assigned = (
        emb.crossJoin(F.broadcast(seed_arr))
        .select("vec_id", "v", F.expr(best + ".cid").alias("cid"))
    )
    cents = (
        assigned.select("cid", F.posexplode("v").alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(18,6)")).cast("double")
                / F.count("*")
            ).alias("m")
        )
        .groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cid", F.expr("transform(pm, p -> p.m)").alias("cv"))
    )
    return assigned, cents


def _ivf_probe_cells(cents: DataFrame, q: DataFrame) -> DataFrame:
    """The ``IVF_NPROBE`` cells whose trained centroids are closest to
    the (broadcast single-row) query — ``(cid, d2)`` ordered, tiny by
    construction (≤ IVF_K rows in, IVF_NPROBE out)."""
    return (
        cents.crossJoin(F.broadcast(q))
        .select(
            "cid",
            F.expr(
                "aggregate(zip_with(cv, qv, (x, y) -> (x - y) * (x - y)), "
                "0.0D, (acc, x) -> acc + x)"
            ).alias("d2"),
        )
        .orderBy("d2", "cid")
        .limit(IVF_NPROBE)
    )


# Shared by q_ann_ivf_probe (in-query index) and q_ann_ivf_stored
# (index written partitioned by cell, probe reads the stored layout):
# both must equal the full SQL replay of quantize -> probe -> rerank.
_IVF_ORACLE = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    seeds AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {IVF_K}),
    scored AS (
      SELECT e.vec_id, seeds.cid,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                ORDER BY {_D2.format(a='e.v', b='seeds.cv')},
                                         seeds.cid) AS rk
      FROM e CROSS JOIN seeds
    ),
    assigned AS (SELECT vec_id, cid FROM scored WHERE rk = 1),
    dims AS (
      SELECT a.cid, i,
             CAST(SUM(CAST(v[i] AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS m
      FROM assigned a JOIN e USING (vec_id)
      CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, 64)) AS i)
      GROUP BY a.cid, i
    ),
    cents AS (SELECT cid, LIST(m ORDER BY i) AS cv FROM dims GROUP BY cid),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    probe AS (
      SELECT cid FROM cents CROSS JOIN q
      ORDER BY {_D2.format(a='cv', b='qv')}, cid
      LIMIT {IVF_NPROBE}
    ),
    cand AS (
      SELECT a.vec_id, a.cid, e.v
      FROM assigned a JOIN e USING (vec_id)
      WHERE a.cid IN (SELECT cid FROM probe) AND a.vec_id <> 0
    )
    SELECT vec_id, cid,
           ROUND({_COS_DUCK.format(a='v', b='qv')}, 6) AS cosine
    FROM cand CROSS JOIN q
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """


@register("q_ann_ivf_probe", oracle=_IVF_ORACLE)
def q_ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True IVF approximate nearest neighbor, end to end: train a
    coarse quantizer (one deterministic Lloyd step from seeded
    centroids — the batch-iterable primitive q_kmeans_assign proves),
    assign every vector to its cell, probe the {IVF_NPROBE} cells
    whose UPDATED centroids are closest to the query, and run exact
    cosine top-k only inside those cells — the classic IVF index flow
    (quantize → probe → rerank) that reads ~nprobe/K of the corpus.

    Determinism: assignment/probe distances left-fold in dim order on
    both engines; centroid means come from DECIMAL(18,6) sums, so the
    trained quantizer is bit-identical; final scores round to 6dp and
    break ties by vec_id.

    Scale: seeds and trained centroids are O(K·d) — always broadcast;
    assignment is the map-side argmin; the per-(cell,dim) mean
    shuffles K×d keys; the probe filter is a broadcast semi join, so
    the exact rerank scans only the probed cells.  At 100 TB the
    corpus is WRITTEN partitioned by cid and the rerank reads
    ~nprobe/K of the FILES — that stored path is q_ann_ivf_stored
    below (same oracle), and tests/test_partition_pruning.py::
    TestIvfStoredLayout asserts the pruning (PartitionFilters +
    input_file_name ⊆ probed cells)."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", _vec_double().alias("v")
    )
    assigned, cents = _ivf_train(emb)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    probe = _ivf_probe_cells(cents, q).select("cid")
    cand = assigned.filter(F.col("vec_id") != 0).join(
        F.broadcast(probe), "cid", "left_semi"
    )
    return (
        cand.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "cid",
            F.round(_cosine("v", "qv"), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )


@register("q_ann_ivf_stored", oracle=_IVF_ORACLE)
def q_ann_ivf_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF against the STORED index layout — the 100 TB serving path
    q_ann_ivf_probe's docstring narrates, executed for real: the
    assigned corpus is WRITTEN hive-partitioned by cell id
    (``.partitionBy("cid")``), the probe selects the {IVF_NPROBE}
    nearest cells from the O(K·d) centroid table, and the exact
    rerank reads the stored layout with a LITERAL cell predicate —
    so Spark prunes the non-probed cells' directories at PLANNING
    time (PartitionFilters) and the rerank scan touches ~nprobe/K of
    the files, never the corpus.  Same oracle as q_ann_ivf_probe:
    layout must not change the answer.

    The probe-cell collect is an O(IVF_NPROBE) INDEX-METADATA lookup
    (bounded by K regardless of corpus size — the same driver-side
    step FAISS does when it picks cells), not a data-path collect;
    it is what turns the cell filter into a planning-time literal
    instead of a runtime join.

    tests/test_partition_pruning.py::TestIvfStoredLayout asserts the
    pruning on this exact layout (PartitionFilters present +
    input_file_name ⊆ probed cells' directories)."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", _vec_double().alias("v")
    )
    assigned, cents = _ivf_train(emb)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))

    base = _SCRATCH / f"ivf_{uuid.uuid4().hex[:12]}"
    idx = str(base / "index")
    try:
        assigned.write.mode("overwrite").partitionBy("cid").parquet(idx)
        probe_ids = [r.cid for r in _ivf_probe_cells(cents, q).collect()]
        stored = (
            spark.read.parquet(idx)
            .filter(F.col("cid").isin(probe_ids))
            .filter(F.col("vec_id") != 0)
        )
        return (
            stored.crossJoin(F.broadcast(q))
            .select(
                "vec_id",
                F.col("cid").cast("bigint").alias("cid"),
                F.round(_cosine("v", "qv"), 6).alias("cosine"),
            )
            .orderBy(F.desc("cosine"), "vec_id")
            .limit(10)
            .transform(materialize_before_cleanup)
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup-style: sign-LSH coarse buckets, then prune
# near-identical pairs inside each bucket, mean-closest survivor wins)
# ---------------------------------------------------------------------------

SD_PLANES = 24  # hyperplane budget; bucket = low p bits of the sign word.
# p saturates at SD_PLANES, so bucket sizes stay ~SEMDEDUP_CLUSTER up to
# n = 64 * 2^24 ~ 1e9 vectors per job; beyond that raise this compile-time
# constant (cost is one extra dot product per plane per vector).
SEMDEDUP_CLUSTER = 64  # target bucket size; p = ceil(log2(n / this))
SEMDEDUP_TAU = 0.40
PAIR_SALT = 8  # fan-out factor for the in-bucket pair join

_SD_PLANES_SPARK = (
    f"transform(sequence(0, {SD_PLANES - 1}), j -> "
    f"transform(sequence(1, {DIM}), i -> "
    "case when instr('0123456789abcdef', "
    "substring(md5(cast(concat(j, ':', i) as binary)), 1, 1)) - 1 >= 8 "
    "then 1.0D else -1.0D end))"
)
_SD_PLANES_DUCK = (
    f"list_transform(generate_series(0, {SD_PLANES - 1}), j -> "
    f"list_transform(generate_series(1, {DIM}), i -> "
    "CASE WHEN strpos('0123456789abcdef', "
    "substr(md5(CAST(j AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 1)) - 1 >= 8 "
    "THEN 1.0 ELSE -1.0 END))"
)
# The plane matrix must be materialized ONCE (a broadcast single-row
# DataFrame referenced as column `pl`): inlining the md5 synthesis
# into the per-row lambda re-evaluates the full 16x64 md5 grid per
# element access — measured 50x slower.
_SD_BITS_SPARK = (
    f"aggregate(transform(sequence(1, {SD_PLANES}), j -> "
    "case when aggregate(zip_with(element_at(pl, j), v, "
    "(x, y) -> x * y), 0.0D, (acc, x) -> acc + x) > 0 "
    "then shiftleft(cast(1 as bigint), j - 1) else cast(0 as bigint) end), "
    "cast(0 as bigint), (acc, x) -> acc + x)"
)


@register(
    "q_semantic_dedup",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    planes AS (SELECT {_SD_PLANES_DUCK} AS pl),
    prm AS (
      SELECT LEAST({SD_PLANES},
                   GREATEST(3, CAST(CEIL(LOG2(COUNT(*) / {SEMDEDUP_CLUSTER}.0)
                                         - 1e-9) AS BIGINT))) AS p
      FROM e
    ),
    h AS (
      SELECT vec_id, v,
             LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, {SD_PLANES}), j ->
               CASE WHEN LIST_DOT_PRODUCT(pl[j], v) > 0
                    THEN 1 << (j - 1) ELSE 0 END))::BIGINT
               & ((1 << (SELECT p FROM prm)) - 1) AS bucket
      FROM e CROSS JOIN planes
    ),
    dims AS (
      SELECT bucket, i,
             CAST(SUM(CAST(v[i] AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS m
      FROM h CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, {DIM})) AS i)
      GROUP BY bucket, i
    ),
    means AS (SELECT bucket, LIST(m ORDER BY i) AS mv FROM dims GROUP BY bucket),
    a AS (
      SELECT h.vec_id, h.bucket, h.v,
             list_sum(list_transform(list_zip(h.v, mv),
                      q -> (q[1] - q[2]) * (q[1] - q[2]))) AS d2
      FROM h JOIN means USING (bucket)
    ),
    pairs AS (
      SELECT x.bucket,
             CASE WHEN x.d2 < y.d2 THEN y.vec_id
                  WHEN x.d2 > y.d2 THEN x.vec_id
                  ELSE y.vec_id END AS loser
      FROM a x JOIN a y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
      WHERE {_COS_DUCK.format(a='x.v', b='y.v')} >= {SEMDEDUP_TAU}
    ),
    dropped AS (
      SELECT bucket, COUNT(DISTINCT loser) AS n_dropped FROM pairs GROUP BY bucket
    ),
    sizes AS (SELECT bucket, COUNT(*) AS n_vecs FROM a GROUP BY bucket)
    SELECT s.bucket AS cluster_id, s.n_vecs,
           COALESCE(d.n_dropped, 0) AS n_dropped,
           s.n_vecs - COALESCE(d.n_dropped, 0) AS n_kept
    FROM sizes s LEFT JOIN dropped d USING (bucket)
    ORDER BY cluster_id
    """,
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): partition embeddings into sign-LSH coarse
    buckets, treat in-bucket pairs with cosine >= {SEMDEDUP_TAU} as
    semantic duplicates, and drop the member farther from its BUCKET
    MEAN (vec_id breaks exact ties) — per bucket, report sizes
    before/after.

    Scale: this is the shape that stays LINEAR across decades — the
    round-4 scale probe measured the two earlier designs super-linear
    and this one replaced them:
    - seed-kmeans with FIXED K: exponent 1.62 (pair stage quadratic);
    - corpus-proportional K with a two-level argmin quantizer:
      0.85 at 10x but 1.16 over two decades (assignment is O(n*sqrt(K))
      = O(n^1.5) when K grows with n).
    Here assignment is {SD_PLANES} fixed md5-derived hyperplane dot
    products per vector — O(n), zero model state, no shuffle — and the
    bucket-id mask keeps E[bucket size] ~ {SEMDEDUP_CLUSTER} by taking
    p = ceil(log2(n/{SEMDEDUP_CLUSTER})) low bits (p from one count
    aggregate, clamped to the {SD_PLANES}-plane budget — the sign word
    is computed identically at any p, so the expression shape is
    scale-independent; the clamp caps bucket count at 2^{SD_PLANES},
    i.e. bounded buckets up to ~1e9 vectors per job, after which
    SD_PLANES is the one constant to raise).  Bucket means are
    one decimal-exact aggregation (|buckets| x {DIM} keys); the
    quadratic cosine scan is confined to ~{SEMDEDUP_CLUSTER}-sized
    buckets, SALTED {PAIR_SALT}-way so few-bucket corpora can't funnel
    into single tasks; norms fold once per vector so each pair pays
    one dot product."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", _vec_double().alias("v")
    )
    pdf = emb.agg(
        F.least(
            F.lit(SD_PLANES),
            F.greatest(
                F.lit(3),
                F.ceil(
                    F.log2(F.count("*") / SEMDEDUP_CLUSTER) - F.lit(1e-9)
                ).cast("bigint"),
            ),
        ).alias("p")
    )
    planes = spark.range(1).select(F.expr(_SD_PLANES_SPARK).alias("pl"))
    h = (
        emb.crossJoin(F.broadcast(planes))
        .crossJoin(F.broadcast(pdf))
        .select(
            "vec_id",
            "v",
            F.expr(
                f"({_SD_BITS_SPARK}) & "
                "(shiftleft(cast(1 as bigint), cast(p as int)) - 1)"
            ).alias("bucket"),
        )
    )
    dims = (
        h.select("bucket", F.posexplode("v").alias("pos", "x"))
        .groupBy("bucket", "pos")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(18,6)")).cast("double")
                / F.count("*")
            ).alias("m")
        )
    )
    means = dims.groupBy("bucket").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, m))), s -> s.m)"
        ).alias("mv")
    )
    a = (
        h.join(means, "bucket")
        .withColumn(
            "d2",
            F.expr(
                "aggregate(zip_with(v, mv, (x, y) -> (x - y) * (x - y)), "
                "0.0D, (acc, x) -> acc + x)"
            ),
        )
        .withColumn("nrm", F.sqrt(_dot("v", "v")))
    )
    x = a.select(
        F.col("bucket"),
        F.col("vec_id").alias("ia"),
        F.col("d2").alias("da"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
        (F.col("vec_id") % PAIR_SALT).cast("int").alias("salt"),
    )
    y = a.select(
        F.col("bucket"),
        F.col("vec_id").alias("ib"),
        F.col("d2").alias("db"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    ).crossJoin(
        spark.range(PAIR_SALT).select(F.col("id").cast("int").alias("salt"))
    )
    cos = _dot("va", "vb") / (F.col("na") * F.col("nb"))
    pairs = (
        x.join(y, ["bucket", "salt"])
        .filter(F.col("ia") < F.col("ib"))
        .filter(cos >= SEMDEDUP_TAU)
        .select(
            "bucket",
            F.when(F.col("da") < F.col("db"), F.col("ib"))
            .when(F.col("da") > F.col("db"), F.col("ia"))
            .otherwise(F.col("ib"))
            .alias("loser"),
        )
    )
    dropped = pairs.groupBy("bucket").agg(
        F.countDistinct("loser").alias("n_dropped")
    )
    sizes = a.groupBy("bucket").agg(F.count("*").alias("n_vecs"))
    return (
        sizes.join(dropped, "bucket", "left")
        .select(
            F.col("bucket").alias("cluster_id"),
            "n_vecs",
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            (F.col("n_vecs") - F.coalesce("n_dropped", F.lit(0))).alias("n_kept"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric-distance (ADC) search
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces
PQ_SUB = DIM // PQ_M  # dims per subspace
PQ_C = 16  # codewords per subspace (seeds vec_id < PQ_C)

# Per-subspace squared L2 between slices of two vectors, DuckDB side.
_PQ_D2_DUCK = (
    f"list_sum(list_transform(generate_series(1, {PQ_SUB}), "
    f"i -> ({{a}}[m * {PQ_SUB} + i] - {{b}}[m * {PQ_SUB} + i]) "
    f"* ({{a}}[m * {PQ_SUB} + i] - {{b}}[m * {PQ_SUB} + i])))"
)


@register(
    "q_ann_pq_adc",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cb AS (SELECT vec_id AS c, v AS cv FROM e WHERE vec_id < {PQ_C}),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    ms AS (SELECT UNNEST(GENERATE_SERIES(0, {PQ_M - 1})) AS m),
    sub AS (
      SELECT e.vec_id, m, cb.c,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id, m
               ORDER BY {_PQ_D2_DUCK.format(a='v', b='cv')}, cb.c) AS rk
      FROM e CROSS JOIN cb CROSS JOIN ms
    ),
    codes AS (SELECT vec_id, m, c FROM sub WHERE rk = 1),
    adist AS (
      SELECT codes.vec_id,
             CAST(SUM(CAST({_PQ_D2_DUCK.format(a='qv', b='cv')}
                           AS DECIMAL(18,6))) AS DOUBLE) AS adist
      FROM codes JOIN cb ON cb.c = codes.c CROSS JOIN q
      GROUP BY codes.vec_id
    )
    SELECT vec_id, adist FROM adist
    WHERE vec_id <> 0
    ORDER BY adist, vec_id
    LIMIT 10
    """,
)
def q_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jegou et al. 2011, the IVF-PQ scale
    path): {PQ_M} subspaces x {PQ_SUB} dims, {PQ_C}-codeword codebook
    per subspace (codewords = seed vectors vec_id < {PQ_C}); every
    vector encodes to {PQ_M} codes (nearest codeword per subspace,
    code id breaks ties); the query's asymmetric distance is the sum
    of per-subspace distances to each vector's codewords, decimal-
    summed so the {PQ_M}-term reduction is order-independent; top-10
    by (adist, vec_id).

    Scale: encoding is a ROW-LOCAL map over a broadcast codebook
    (PQ_C x dim doubles — constant size, unlike the corpus); encoded
    vectors are {PQ_M} bytes instead of {DIM} floats (32x compression
    — the reason 100 TB ANN fits in memory at all); ADC scoring is a
    stateless map + TakeOrderedAndProject (no global sort, no
    shuffle); at full scale this runs inside IVF cells
    (q_ann_ivf_probe) with a residual codebook — same plan shape."""
    # r14 (r13 verdict #7): this was the slowest Spark-side query in
    # the registry — 80-97 s at sf0.1 for 2000 vectors, i.e. ~40 ms/row
    # on ONE task.  Three compounding causes, three fixes:
    # 1. single-row-group scan → serial encode; spread it (§2.5).
    # 2. every per-subspace distance allocated two slice() arrays and
    #    a zip_with array per evaluation inside interpreted
    #    higher-order functions; the index-walking aggregate below
    #    keeps the identical left-to-right float reduction (same
    #    doubles bit-for-bit) with zero allocations (§1.2 per-task
    #    work).
    # 3. the query→codeword distance was recomputed per VECTOR per
    #    subspace; ADC's defining trick (Jegou et al. 2011) is that
    #    this table is query-constant — precompute it ONCE on the
    #    broadcast codebook side (PQ_C × PQ_M entries) and per vector
    #    only LOOK IT UP.  Same arithmetic order per entry → the
    #    looked-up double is bit-identical to the inline recompute.
    emb = table_spread(spark, sf_dir, "embeddings", "vec_id").select(
        "vec_id", _vec_double().alias("v")
    )
    # Codebook + query sides read the plain scan (PQ_C+1 rows survive
    # their filters — routing them through the spread exchange would
    # add two stages for nothing).
    small = table(spark, sf_dir, "embeddings").select(
        "vec_id", _vec_double().alias("v")
    )
    cb = small.filter(F.col("vec_id") < PQ_C).agg(
        F.collect_list(
            F.struct(F.col("vec_id").alias("c"), F.col("v").alias("cv"))
        ).alias("cbs")
    )
    q = small.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    sub_d2 = (
        f"aggregate(sequence(1, {PQ_SUB}), 0.0D, (acc, i) -> acc + "
        f"(element_at({{a}}, m * {PQ_SUB} + i) - element_at({{b}}, m * {PQ_SUB} + i)) * "
        f"(element_at({{a}}, m * {PQ_SUB} + i) - element_at({{b}}, m * {PQ_SUB} + i)))"
    )
    # Broadcast side: one row, PQ_C codewords, each augmented with its
    # per-subspace distance to the query (the ADC lookup table).
    qd = (
        f"transform(cbs, e -> struct(e.c AS c, e.cv AS cv, "
        f"transform(sequence(0, {PQ_M - 1}), m -> "
        + sub_d2.format(a="qv", b="e.cv")
        + ") AS qd))"
    )
    cbq = cb.crossJoin(q).select(F.expr(qd).alias("cbs"), "qv")
    codes = (
        f"transform(sequence(0, {PQ_M - 1}), m -> "
        f"array_min(transform(cbs, e -> struct("
        f"{sub_d2.format(a='v', b='e.cv')} AS d2, e.c AS c))).c)"
    )
    # ADC: table lookup per subspace, decimal-sum the 8 terms
    # (order-independent reduction, identical to the r13 inline form).
    adist = (
        f"cast(aggregate(sequence(0, {PQ_M - 1}), "
        "cast(0 as decimal(18,6)), (acc, m) -> cast(acc + cast("
        "element_at(filter(cbs, e -> e.c = element_at(cds, m + 1))[0].qd, m + 1)"
        " as decimal(18,6)) as decimal(18,6))) as double)"
    )
    return (
        emb.crossJoin(F.broadcast(cbq))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", F.expr(codes).alias("cds"), "cbs")
        .select("vec_id", F.expr(adist).alias("adist"))
        .orderBy("adist", "vec_id")
        .limit(10)
    )
