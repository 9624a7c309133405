"""Corpus-statistics tier: quantile sketches, distribution diagnostics
(entropy/KL), deterministic anomaly scoring, weighted-cosine similarity
join, and n-gram language-model counts.

These are the measurement queries a training-data pipeline runs beside
its dedup/filter stages: "what does this corpus look like, which
sources drift from the mix, which documents are near-copies by weighted
term overlap, what are the dominant token transitions".

Cross-engine float discipline (same rules as the BM25 query,
textops.py:401-412): every libm-dependent term (LN) rounds through
DECIMAL(18,6) before any sum, division/sqrt are correctly-rounded IEEE
ops (identical on identical inputs), and all expressions are textually
identical between the Spark plan and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omim_spark.operators.checkpoint import cut_lineage
from pyspark.sql.window import Window

from .registry import events_table, register, table
from .relational import _dsum_sql, dsum

# ---------------------------------------------------------------------------
# Quantile sketch under the hash gate
# ---------------------------------------------------------------------------

# Rank-space contract: a value-space bound on a quantile sketch is
# distribution-dependent, but the Greenwald-Khanna sketch guarantees a
# RANK error <= 1/accuracy.  So the boolean re-ranks the sketch output
# against the data: frac = P(value <= approx_p) must sit within
# RANK_TOL of p.  RANK_TOL = sketch bound (1e-4) + empirical-CDF
# granularity at the smallest gate sf (~1/1000) with margin.
QUANTILE_ACCURACY = 10000
RANK_TOL = 0.01


@register(
    "q_quantile_sketch",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(CAST(QUANTILE_CONT(value, 0.5) AS DECIMAL(18,6)) AS DOUBLE) AS p50,
           CAST(CAST(QUANTILE_CONT(value, 0.9) AS DECIMAL(18,6)) AS DOUBLE) AS p90,
           TRUE AS rank50_ok,
           TRUE AS rank90_ok
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation both ways: exact interpolated percentiles
    (hash-matched against DuckDB's QUANTILE_CONT — same R-7
    interpolation, rounded through DECIMAL(18,6)) plus the
    Greenwald-Khanna sketch (percentile_approx), whose output is
    engine-specific and therefore verified in RANK space: the sketch's
    p-quantile must cover a fraction of rows within RANK_TOL of p.
    The oracle emits the exact percentiles and literal TRUE.

    Scale: the sketch is the 100 TB shape — one pass, bounded memory,
    mergeable partials; exact percentiles need a per-group sort and
    exist here as the verification anchor.  The re-rank pass joins a
    ~|event_type|-row broadcast back onto events."""
    ev = events_table(spark, sf_dir).select("event_type", "value")
    per_type = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.expr(
            "CAST(CAST(percentile(value, 0.5D) AS DECIMAL(18,6)) AS DOUBLE)"
        ).alias("p50"),
        F.expr(
            "CAST(CAST(percentile(value, 0.9D) AS DECIMAL(18,6)) AS DOUBLE)"
        ).alias("p90"),
        F.expr(
            f"percentile_approx(value, 0.5D, {QUANTILE_ACCURACY})"
        ).alias("_a50"),
        F.expr(
            f"percentile_approx(value, 0.9D, {QUANTILE_ACCURACY})"
        ).alias("_a90"),
    )
    ranked = (
        ev.join(F.broadcast(per_type.select("event_type", "_a50", "_a90")), "event_type")
        .groupBy("event_type")
        .agg(
            F.avg((F.col("value") <= F.col("_a50")).cast("double")).alias("_f50"),
            F.avg((F.col("value") <= F.col("_a90")).cast("double")).alias("_f90"),
        )
    )
    return (
        per_type.join(ranked, "event_type")
        .select(
            "event_type",
            "n_events",
            "p50",
            "p90",
            (F.abs(F.col("_f50") - 0.5) <= RANK_TOL).alias("rank50_ok"),
            (F.abs(F.col("_f90") - 0.9) <= RANK_TOL).alias("rank90_ok"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Source-mix diagnostics: entropy + KL divergence
# ---------------------------------------------------------------------------

# Shared term expressions (p, q are double fractions; LN rounds through
# DECIMAL(18,6) before the sum so libm last-ulp differences vanish).
_ENT_TERM = "CAST(-p * LN(p) AS DECIMAL(18,6))"
_KL_TERM = "CAST(p * LN(p / q) AS DECIMAL(18,6))"


@register(
    "q_corpus_entropy_kl",
    oracle=f"""
    WITH sl AS (
      SELECT source, lang, COUNT(*) AS n_sl FROM documents GROUP BY source, lang
    ),
    s AS (SELECT source, SUM(n_sl) AS n_s FROM sl GROUP BY source),
    g AS (SELECT lang, SUM(n_sl) AS n_l FROM sl GROUP BY lang),
    tot AS (SELECT SUM(n_l) AS n FROM g),
    terms AS (
      SELECT sl.source,
             CAST(sl.n_sl AS DOUBLE) / s.n_s AS p,
             CAST(g.n_l AS DOUBLE) / tot.n AS q,
             s.n_s
      FROM sl JOIN s USING (source) JOIN g USING (lang) CROSS JOIN tot
    )
    SELECT source,
           CAST(MAX(n_s) AS BIGINT) AS n_docs,
           CAST(CAST(SUM({_ENT_TERM}) AS DECIMAL(18,6)) AS DOUBLE) AS lang_entropy,
           CAST(CAST(SUM({_KL_TERM}) AS DECIMAL(18,6)) AS DOUBLE) AS kl_vs_corpus
    FROM terms
    GROUP BY source
    ORDER BY source
    """,
)
def q_corpus_entropy_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mix diagnostics: per-source Shannon entropy of the
    language distribution, and KL(source ‖ corpus) — the drift measure
    a data-mixing stage watches when rebalancing training sources.

    Scale: the only full-data pass is the (source,lang) count —
    map-side combinable, one shuffle; everything after operates on
    |sources|×|langs| rows with the global distribution and total as
    broadcast joins.  Entropy/KL terms are exact p·ln(p) per cell,
    rounded through DECIMAL(18,6) per term (libm-proof), summed
    exactly as decimals."""
    sl = (
        table(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count("*").alias("n_sl"))
    )
    s = sl.groupBy("source").agg(F.sum("n_sl").alias("n_s"))
    g = sl.groupBy("lang").agg(F.sum("n_sl").alias("n_l"))
    tot = g.agg(F.sum("n_l").alias("n"))
    terms = (
        sl.join(F.broadcast(s), "source")
        .join(F.broadcast(g), "lang")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_s",
            (F.col("n_sl").cast("double") / F.col("n_s")).alias("p"),
            (F.col("n_l").cast("double") / F.col("n")).alias("q"),
        )
    )
    return (
        terms.groupBy("source")
        .agg(
            F.max("n_s").alias("n_docs"),
            F.expr(f"CAST(CAST(SUM({_ENT_TERM}) AS DECIMAL(18,6)) AS DOUBLE)").alias(
                "lang_entropy"
            ),
            F.expr(f"CAST(CAST(SUM({_KL_TERM}) AS DECIMAL(18,6)) AS DOUBLE)").alias(
                "kl_vs_corpus"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Deterministic z-score anomaly detection
# ---------------------------------------------------------------------------

Z_THRESHOLD = 3.0


@register(
    "q_zscore_anomaly",
    oracle=f"""
    WITH stats AS (
      SELECT event_type,
             COUNT(*) AS n,
             {_dsum_sql('value')} / COUNT(*) AS mean,
             {_dsum_sql('value * value')} / COUNT(*) AS m2
      FROM events GROUP BY event_type
    ),
    z AS (
      SELECT e.event_type,
             (e.value - s.mean) / SQRT(s.m2 - s.mean * s.mean) AS z,
             s.n
      FROM events e JOIN stats s USING (event_type)
    )
    SELECT event_type,
           MAX(n) AS n_events,
           COUNT(*) FILTER (WHERE ABS(z) > {Z_THRESHOLD}) AS n_anomalies,
           CAST(CAST(MAX(ABS(z)) AS DECIMAL(18,6)) AS DOUBLE) AS max_abs_z
    FROM z
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score anomaly flagging with fully deterministic
    moments: mean and E[x²] come from DECIMAL(18,6) sums (bit-identical
    across engines), so std = sqrt(m2 − mean²) and every z-score are
    exact IEEE results of identical inputs — the |z| > 3 threshold
    cannot flip between engines, unlike stddev_samp whose streaming
    (Welford) accumulation is engine- and order-dependent.

    Scale: stats is a map-side-combinable agg to |event_type| rows,
    broadcast back; the flagging pass is stateless map-side arithmetic
    + a tiny re-aggregation.  Two scans of events, no wide shuffle of
    raw rows."""
    ev = events_table(spark, sf_dir).select("event_type", "value")
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        (dsum(F.col("value")) / F.count("*")).alias("mean"),
        (dsum(F.col("value") * F.col("value")) / F.count("*")).alias("m2"),
    )
    z = ev.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "n",
        (
            (F.col("value") - F.col("mean"))
            / F.sqrt(F.col("m2") - F.col("mean") * F.col("mean"))
        ).alias("z"),
    )
    return (
        z.groupBy("event_type")
        .agg(
            F.max("n").alias("n_events"),
            F.count_if(F.abs("z") > Z_THRESHOLD).alias("n_anomalies"),
            F.expr(
                "CAST(CAST(MAX(ABS(z)) AS DECIMAL(18,6)) AS DOUBLE)"
            ).alias("max_abs_z"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# TF-IDF weighted cosine similarity join
# ---------------------------------------------------------------------------

# Document-frequency band for the inverted-index join: df=1 terms
# cannot form pairs; df above the cap are boilerplate whose fan-out
# would dominate the join (same role as MAX_DF in dedup.py — at 100 TB
# an uncapped hot term expands quadratically inside its posting list).
TFIDF_MAX_DF = 50
COSINE_MIN = 0.35

# Per-(doc,term) tf-idf weight, rounded through DECIMAL(18,6): the only
# libm call (LN) is absorbed; norms and dot products are then EXACT
# decimal arithmetic, and the final cosine is IEEE-identical.
_W_EXPR = "CAST(tf * LN(CAST(n_docs AS DOUBLE) / df) AS DECIMAL(18,6))"


@register(
    "q_tfidf_cosine_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents
    ),
    tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM toks GROUP BY doc_id, t),
    dft AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
    nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
    w AS (
      SELECT tf.doc_id, tf.t, {_W_EXPR} AS w
      FROM tf JOIN dft USING (t) CROSS JOIN nd
      WHERE dft.df <= {TFIDF_MAX_DF}
    ),
    norms AS (
      SELECT doc_id, SQRT(CAST(SUM(w * w) AS DOUBLE)) AS nrm FROM w GROUP BY doc_id
    ),
    dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(SUM(a.w * b.w) AS DOUBLE) AS dot
      FROM w a JOIN w b ON a.t = b.t AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(CAST(dot / (na.nrm * nb.nrm) AS DECIMAL(18,6)) AS DOUBLE) AS cosine
    FROM dots
    JOIN norms na ON doc_a = na.doc_id
    JOIN norms nb ON doc_b = nb.doc_id
    WHERE dot / (na.nrm * nb.nrm) >= {COSINE_MIN}
    ORDER BY doc_a, doc_b
    """,
)
def q_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted near-duplicate detection: TF-IDF cosine similarity over
    an inverted-index join — the term-weighted complement of the
    set-based MinHash/Jaccard family (dedup.py).  Vector space = terms
    with df ≤ {TFIDF_MAX_DF} (boilerplate pruned, mirroring the
    hot-shingle cap); pairs form only through shared posting lists,
    never a cross product.

    Scale: tf and df are map-side-combinable aggs; df and n_docs
    broadcast back onto tf; the pair join's fan-out is bounded by
    MAX_DF per term; norms are a per-doc agg of the same weighted
    table.  Weights round through DECIMAL(18,6) (libm-proof), so dot,
    norm, and cosine are deterministic across engines."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    tf = toks.groupBy("doc_id", "t").agg(F.count("*").alias("tf"))
    dft = tf.groupBy("t").agg(F.count("*").alias("df"))
    nd = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
    w = (
        tf.join(dft.filter(F.col("df") <= TFIDF_MAX_DF), "t")
        .crossJoin(F.broadcast(nd))
        .select("doc_id", "t", F.expr(_W_EXPR).alias("w"))
        .repartition("t")
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w")).cast("double")).alias("nrm")
    )
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(b, (F.col("a.t") == F.col("b.t")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.sum(F.col("a.w") * F.col("b.w")).cast("double").alias("dot"))
    )
    na, nb = norms.alias("na"), norms.alias("nb")
    cos = F.col("dot") / (F.col("na.nrm") * F.col("nb.nrm"))
    return (
        dots.join(na, F.col("doc_a") == F.col("na.doc_id"))
        .join(nb, F.col("doc_b") == F.col("nb.doc_id"))
        .filter(cos >= COSINE_MIN)
        .select(
            "doc_a",
            "doc_b",
            cos.cast("decimal(18,6)").cast("double").alias("cosine"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Bigram language-model counts
# ---------------------------------------------------------------------------

BIGRAM_TOP_K = 50


@register(
    "q_bigram_lm",
    oracle=f"""
    WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS tk FROM documents),
    bi AS (
      SELECT UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(tk) - 1),
                                   i -> {{'w1': tk[i], 'w2': tk[i + 1]}})) AS b
      FROM d WHERE LEN(tk) >= 2
    ),
    cnt2 AS (SELECT b.w1 AS w1, b.w2 AS w2, COUNT(*) AS n2 FROM bi GROUP BY 1, 2),
    cnt1 AS (SELECT w1, CAST(SUM(n2) AS BIGINT) AS n1 FROM cnt2 GROUP BY w1)
    SELECT w1, w2, n2, n1,
           CAST(n2 AS DOUBLE) / n1 AS cond_p
    FROM cnt2 JOIN cnt1 USING (w1)
    ORDER BY n2 DESC, w1, w2
    LIMIT {BIGRAM_TOP_K}
    """,
)
def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model counts with conditional probabilities
    P(w2|w1) = count(w1,w2)/count(w1·) — the n-gram statistics pass of
    a corpus-analysis pipeline, top-{BIGRAM_TOP_K} transitions.

    Scale: bigrams generate map-side from the token array (one
    Generate, no self-join of token positions); the (w1,w2) count is
    map-side combinable; the unigram margin derives from the ALREADY
    aggregated bigram counts (no second corpus pass); final top-k is
    TakeOrdered.  cond_p is an int/int IEEE division — deterministic."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("tk")
    )
    bi = (
        docs.filter(F.size("tk") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 1), "
                    "i -> struct(element_at(tk, i) AS w1, "
                    "element_at(tk, i + 1) AS w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
    )
    cnt2 = bi.groupBy("w1", "w2").agg(F.count("*").alias("n2"))
    cnt1 = cnt2.groupBy("w1").agg(F.sum("n2").alias("n1"))
    return (
        cnt2.join(cnt1, "w1")
        .select(
            "w1",
            "w2",
            "n2",
            "n1",
            (F.col("n2").cast("double") / F.col("n1")).alias("cond_p"),
        )
        .orderBy(F.desc("n2"), "w1", "w2")
        .limit(BIGRAM_TOP_K)
    )


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters (bit-identical sketch on both engines)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4  # independent hash rows (md5 seeds '1:'..'4:')
CMS_WIDTH = 256  # buckets per row (two md5 hex chars, sampling.py trick)
CMS_PROBES = ("join", "filter", "stream", "merge", "scan", "zzz_absent")

# Portable md5 → 0..255 bucket, identical to operators/sampling.py's
# md5_bucket and the pipelineops oracle mirror: the first two hex chars
# of md5(seed || term).  Same arithmetic on both engines; only the
# position-function name differs (Spark INSTR vs DuckDB STRPOS).
def _cms_bucket_sql(seed: int, term: str, pos: str = "STRPOS") -> str:
    h = f"MD5(CONCAT('{seed}:', {term}))"
    return (
        f"({pos}('0123456789abcdef', SUBSTR({h}, 1, 1)) - 1) * 16"
        f" + {pos}('0123456789abcdef', SUBSTR({h}, 2, 1)) - 1"
    )


_CMS_PROBES_SQL = ", ".join(f"('{t}')" for t in CMS_PROBES)
_CMS_BUCKETS_SQL = " UNION ALL ".join(
    f"SELECT {d} AS d, term, {_cms_bucket_sql(d, 'term')} AS bucket FROM probes"
    for d in range(1, CMS_DEPTH + 1)
)
_CMS_CELLS_SQL = " UNION ALL ".join(
    f"SELECT {d} AS d, {_cms_bucket_sql(d, 't')} AS bucket, cnt FROM tcnt"
    for d in range(1, CMS_DEPTH + 1)
)


@register(
    "q_countmin_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents
    ),
    tcnt AS (SELECT t, COUNT(*) AS cnt FROM toks GROUP BY t),
    cells AS ({_CMS_CELLS_SQL}),
    cms AS (
      SELECT d, bucket, CAST(SUM(cnt) AS BIGINT) AS cell
      FROM cells GROUP BY d, bucket
    ),
    probes(term) AS (VALUES {_CMS_PROBES_SQL}),
    pb AS ({_CMS_BUCKETS_SQL}),
    est AS (
      SELECT pb.term, MIN(COALESCE(cms.cell, 0)) AS cms_est
      FROM pb LEFT JOIN cms ON pb.d = cms.d AND pb.bucket = cms.bucket
      GROUP BY pb.term
    )
    SELECT est.term,
           COALESCE(tcnt.cnt, 0) AS exact_cnt,
           est.cms_est,
           est.cms_est >= COALESCE(tcnt.cnt, 0) AS never_underestimates
    FROM est LEFT JOIN tcnt ON est.term = tcnt.t
    ORDER BY est.term
    """,
)
def q_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point queries: a {CMS_DEPTH}×{CMS_WIDTH} CMS
    over the token stream, probed for a fixed term set and compared
    against exact counts.  Unlike the HLL/quantile sketches, the CMS
    here is built from pure md5 arithmetic, so BOTH engines construct
    the bit-identical sketch and every output cell hash-matches exactly
    — including the `never_underestimates` invariant (CMS error is
    one-sided by construction).

    Scale: the sketch is the point — a fixed {CMS_DEPTH}×{CMS_WIDTH}
    grid of counters, built map-side-combinably from per-term counts
    (themselves a map-side combine), mergeable across 100 TB of
    partitions with zero growth; probes join a broadcast ≤1024-cell
    table.  The exact counts exist as the verification anchor; their
    (vocabulary-proportional) table carries NO broadcast hint — the
    planner broadcasts it while it fits and falls back to a shuffle
    join on a 100 TB vocabulary."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("t"))
    tcnt = toks.groupBy("t").agg(F.count("*").alias("cnt"))
    cells = None
    for d in range(1, CMS_DEPTH + 1):
        part = tcnt.select(
            F.lit(d).alias("d"),
            F.expr(_cms_bucket_sql(d, "t", pos="INSTR")).alias("bucket"),
            "cnt",
        )
        cells = part if cells is None else cells.unionAll(part)
    cms = cells.groupBy("d", "bucket").agg(F.sum("cnt").cast("long").alias("cell"))
    probes = spark.createDataFrame([(t,) for t in CMS_PROBES], ["term"])
    pb = None
    for d in range(1, CMS_DEPTH + 1):
        part = probes.select(
            F.lit(d).alias("d"),
            "term",
            F.expr(_cms_bucket_sql(d, "term", pos="INSTR")).alias("bucket"),
        )
        pb = part if pb is None else pb.unionAll(part)
    est = (
        pb.join(F.broadcast(cms), ["d", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce("cell", F.lit(0))).alias("cms_est"))
    )
    return (
        est.join(tcnt, est["term"] == tcnt["t"], "left")
        .select(
            "term",
            F.coalesce("cnt", F.lit(0)).alias("exact_cnt"),
            "cms_est",
            (F.col("cms_est") >= F.coalesce("cnt", F.lit(0))).alias(
                "never_underestimates"
            ),
        )
        .orderBy("term")
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis-Spirakis, deterministic)
# ---------------------------------------------------------------------------

ES_SAMPLE_K = 20

# Deterministic uniform u in (0,1): four md5 hex chars of the doc key
# -> 0..65535, shifted by 0.5 (never 0, so LN is safe).  The ES key
# -ln(u)/w is exponential with rate w; the smallest K keys are a
# weight-proportional sample without replacement.  Rounded through
# DECIMAL(18,6) so the libm LN agrees across engines; doc_id breaks
# rounded-score ties deterministically.
def _es_u_sql(pos: str, str_t: str) -> str:
    cell = (
        f"({pos}('0123456789abcdef', SUBSTR(MD5(CAST(doc_id AS {str_t})), {{i}}, 1)) - 1)"
    )
    return (
        f"(CAST({cell.format(i=1)} * 4096 + {cell.format(i=2)} * 256"
        f" + {cell.format(i=3)} * 16 + {cell.format(i=4)}"
        " AS DOUBLE) + 0.5) / 65536.0"
    )


def _es_key_sql(pos: str, str_t: str) -> str:
    return (
        f"CAST(-LN({_es_u_sql(pos, str_t)}) / CAST(n_chars AS DOUBLE)"
        " AS DECIMAL(18,6))"
    )


_ES_KEY_DUCK = _es_key_sql("STRPOS", "VARCHAR")
_ES_KEY_SPARK = _es_key_sql("INSTR", "STRING")


@register(
    "q_weighted_sample_es",
    oracle=f"""
    SELECT doc_id, source, n_chars,
           CAST({_ES_KEY_DUCK} AS DOUBLE) AS es_key
    FROM documents
    ORDER BY {_ES_KEY_DUCK}, doc_id
    LIMIT {ES_SAMPLE_K}
    """,
)
def q_weighted_sample_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    A-ES): each doc gets key -ln(u)/w with a deterministic md5-derived
    uniform u and weight w = n_chars; the K smallest keys are an exact
    weight-proportional sample.  Deterministic end-to-end — reruns,
    repartitions, and both engines agree on the selected set.

    Scale: keys are stateless map-side arithmetic on a 3-column scan;
    selection is TakeOrdered (per-partition top-K, merged on the
    driver), never a global sort — the canonical "sample K best by
    score" shape at any corpus size."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            "source",
            "n_chars",
            F.expr(_ES_KEY_SPARK).alias("_k"),
        )
        .orderBy("_k", "doc_id")
        .limit(ES_SAMPLE_K)
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.col("_k").cast("double").alias("es_key"),
        )
    )


# ---------------------------------------------------------------------------
# CUSUM change-point detection (deterministic)
# ---------------------------------------------------------------------------


@register(
    "q_cusum_changepoint",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, DATE_TRUNC('day', ts) AS d,
             {_dsum_sql('value')} / COUNT(*) AS day_mean
      FROM events GROUP BY 1, 2
    ),
    base AS (
      SELECT event_type,
             CAST(SUM(CAST(day_mean AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
               AS grand_mean
      FROM daily GROUP BY event_type
    ),
    cus AS (
      SELECT daily.event_type, d,
             CAST(SUM(CAST(day_mean - grand_mean AS DECIMAL(18,6)))
                  OVER (PARTITION BY daily.event_type ORDER BY d
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cusum
      FROM daily JOIN base USING (event_type)
    ),
    ranked AS (
      SELECT event_type, d, cusum,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY ABS(cusum) DESC, d) AS rk
      FROM cus
    )
    SELECT event_type, STRFTIME(d, '%Y-%m-%d') AS change_day,
           CAST(CAST(cusum AS DECIMAL(18,6)) AS DOUBLE) AS peak_cusum
    FROM ranked WHERE rk = 1
    ORDER BY event_type
    """,
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per event type: cumulative sum of
    daily-mean deviations from the series mean; the |CUSUM| peak marks
    the most likely level-shift day — the drift detector a data-quality
    monitor runs over ingestion metrics.

    Determinism: day means come from decimal sums; the running CUSUM
    accumulates DECIMAL(18,6)-rounded deviations in day order (a
    sequential window, same order both engines); the argmax day breaks
    ties on the earlier date.

    Scale: the full-data pass is the daily rollup (map-side
    combinable); CUSUM windows run over |days| rows per type and the
    per-type series mean is a broadcast join."""
    ev = events_table(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg((dsum(F.col("value")) / F.count("*")).alias("day_mean"))
    base = daily.groupBy("event_type").agg(
        (
            F.sum(F.col("day_mean").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("grand_mean")
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cus = (
        daily.join(F.broadcast(base), "event_type")
        .withColumn(
            "cusum",
            F.sum(
                (F.col("day_mean") - F.col("grand_mean")).cast("decimal(18,6)")
            )
            .over(w_run)
            .cast("double"),
        )
    )
    w_rk = Window.partitionBy("event_type").orderBy(
        F.abs("cusum").desc(), "d"
    )
    return (
        cus.withColumn("rk", F.row_number().over(w_rk))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("change_day"),
            F.col("cusum").cast("decimal(18,6)").cast("double").alias("peak_cusum"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Stratified exact-k sampling (deterministic per-group k)
# ---------------------------------------------------------------------------

STRAT_K = 3

# Deterministic shuffle order within each stratum: md5 of the doc key.
# row_number over (hash, doc_id) picks exactly k per group, stable
# under reruns and repartitions — the per-source curation sample.
_STRAT_ORD = "MD5(CAST(doc_id AS {str_t}))"


@register(
    "q_stratified_k_sample",
    oracle=f"""
    SELECT source, doc_id, lang
    FROM (
      SELECT source, doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY {_STRAT_ORD.format(str_t='VARCHAR')},
                                         doc_id) AS rk
      FROM documents
    )
    WHERE rk <= {STRAT_K}
    ORDER BY source, doc_id
    """,
)
def q_stratified_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified EXACT-k sampling: precisely {STRAT_K} docs per source
    in a deterministic md5-shuffled order — the per-stratum quota
    complement of the Bernoulli domain-mix sampler (which yields
    binomial counts) and the global weighted ES sampler.

    Scale: one shuffle on the stratum key; rank ≤ k pushes into a
    WindowGroupLimit, so each task keeps only k rows per group instead
    of sorting whole strata."""
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.expr(_STRAT_ORD.format(str_t="STRING")), "doc_id"
    )
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= STRAT_K)
        .select("source", "doc_id", "lang")
        .orderBy("source", "doc_id")
    )


# ---------------------------------------------------------------------------
# Percentile bands time series
# ---------------------------------------------------------------------------


@register(
    "q_percentile_bands",
    oracle="""
    SELECT event_type,
           STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day,
           COUNT(*) AS n,
           CAST(CAST(QUANTILE_CONT(value, 0.5) AS DECIMAL(18,6)) AS DOUBLE) AS p50,
           CAST(CAST(QUANTILE_CONT(value, 0.9) AS DECIMAL(18,6)) AS DOUBLE) AS p90
    FROM events
    GROUP BY 1, 2
    ORDER BY event_type, day
    """,
)
def q_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily p50/p90 bands per event type — the latency-percentile
    time series every SLO dashboard draws, as exact interpolated
    percentiles (hash-matched to QUANTILE_CONT through
    DECIMAL(18,6)).

    Scale: exact per-group percentiles buffer each (day,type) group's
    values (ObjectHashAggregate) — fine while per-group cardinality is
    bounded (a day×type at 100 TB is not: swap percentile() for
    percentile_approx() and verify in rank space exactly as
    q_quantile_sketch does; the plan shape is unchanged)."""
    ev = events_table(spark, sf_dir)
    return (
        ev.groupBy(
            "event_type",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        )
        .agg(
            F.count("*").alias("n"),
            F.expr(
                "CAST(CAST(percentile(value, 0.5D) AS DECIMAL(18,6)) AS DOUBLE)"
            ).alias("p50"),
            F.expr(
                "CAST(CAST(percentile(value, 0.9D) AS DECIMAL(18,6)) AS DOUBLE)"
            ).alias("p90"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# Re-aggregatable HLL sketches (DataSketches) — merge across rollups
# ---------------------------------------------------------------------------


@register(
    "q_hll_merge_rollup",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS merged_ok,
           TRUE AS direct_ok
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_hll_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RE-AGGREGATABLE distinct counting (Spark 3.5+ DataSketches HLL):
    per-day sketches built once, then UNION-MERGED into the per-type
    total — the property that lets a 100 TB pipeline materialize daily
    sketch rollups and answer any coarser distinct query WITHOUT
    re-reading raw data (plain approx_count_distinct values cannot be
    re-aggregated).  Both the merged and the directly-built estimate
    must land within greatest(5%·exact, 5) of the exact count; the
    oracle emits the exact count and literal TRUEs (sketch binaries
    are engine-specific, so only the contract is hash-matched).

    Scale: the daily sketch table is |days|×|types| fixed-size
    binaries; the merge shuffles sketches, not users — incremental
    rollup cost is independent of raw volume."""
    ev = events_table(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_merged")
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("_direct"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    tol = F.greatest(0.05 * F.col("exact_users"), F.lit(5.0))
    return (
        merged.join(direct, "event_type")
        .select(
            "event_type",
            "exact_users",
            (F.abs(F.col("_merged") - F.col("exact_users")) <= tol).alias(
                "merged_ok"
            ),
            (F.abs(F.col("_direct") - F.col("exact_users")) <= tol).alias(
                "direct_ok"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity filter (head/middle/tail partition)
# ---------------------------------------------------------------------------

# Tercile assignment runs over a QUANTIZED histogram of per-doc NLL
# (0.01-nat grid), not a global doc sort: the histogram's row count is
# bounded by the NLL value range / grid step (a few thousand cells at
# any corpus size), so the single-partition cumulative window is
# scale-free.  Docs in a boundary cell all take that cell's bucket —
# the documented (deterministic) tie rule.
PPL_GRID = "decimal(9,2)"


@register(
    "q_perplexity_filter",
    oracle="""
    WITH d AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS tk FROM documents
    ),
    bi AS (
      SELECT doc_id,
             UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(tk) - 1),
                                   i -> {'w1': tk[i], 'w2': tk[i + 1]})) AS b
      FROM d WHERE LEN(tk) >= 2
    ),
    db AS (
      SELECT doc_id, b.w1 AS w1, b.w2 AS w2, COUNT(*) AS c
      FROM bi GROUP BY 1, 2, 3
    ),
    cnt2 AS (SELECT w1, w2, CAST(SUM(c) AS BIGINT) AS n2 FROM db GROUP BY 1, 2),
    cnt1 AS (SELECT w1, CAST(SUM(n2) AS BIGINT) AS n1 FROM cnt2 GROUP BY 1),
    lm AS (
      SELECT w1, w2, CAST(-LN(CAST(n2 AS DOUBLE) / n1) AS DECIMAL(18,6)) AS nll
      FROM cnt2 JOIN cnt1 USING (w1)
    ),
    sc AS (
      SELECT doc_id, CAST(SUM(c * nll) AS DOUBLE) / SUM(c) AS avg_nll
      FROM db JOIN lm USING (w1, w2) GROUP BY doc_id
    ),
    g AS (
      SELECT CAST(avg_nll AS DECIMAL(9,2)) AS grid, COUNT(*) AS n
      FROM sc GROUP BY 1
    ),
    cum AS (
      SELECT grid, n,
             SUM(n) OVER (ORDER BY grid) AS cum,
             SUM(SUM(n)) OVER () AS total
      FROM g GROUP BY grid, n
    ),
    lab AS (
      SELECT CASE WHEN 3 * cum <= total THEN 'head'
                  WHEN 3 * cum <= 2 * total THEN 'middle'
                  ELSE 'tail' END AS bucket,
             grid, n
      FROM cum
    )
    SELECT bucket,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(MIN(grid) AS DOUBLE) AS min_nll,
           CAST(MAX(grid) AS DOUBLE) AS max_nll
    FROM lab GROUP BY bucket ORDER BY bucket
    """,
)
def q_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity partition: score every document under
    the corpus's own bigram LM (avg negative log-likelihood per
    bigram), then split the corpus into head/middle/tail terciles —
    the standard quality-filter stage that keeps head+middle for
    pretraining.  Output: per-bucket doc count and NLL range.

    Scale path: (1) per-doc bigram counts generate map-side from the
    token array (one Generate, map-side-combinable groupBy); (2) the
    LM derives from those same counts — no second corpus pass; (3) the
    doc-bigram ⋈ LM join shuffles on the (w1,w2) key, both sides
    data-proportional, no forced broadcast (static/AQE planner
    decides); (4) tercile boundaries come from a bounded 0.01-nat
    NLL histogram (see PPL_GRID note), so no global doc sort exists
    anywhere in the plan.

    Float discipline (module header): -LN(p) rounds through
    DECIMAL(18,6) per bigram TYPE before the per-doc weighted sum
    (exact decimal arithmetic), and the avg divides once in IEEE
    double; the tercile rule `3*cum <= k*total` is pure int64.
    One documented residual assumption: the double→DECIMAL(9,2) grid
    cast relies on Spark and DuckDB agreeing on HALF_UP rounding of
    the binary double — an avg_nll landing EXACTLY on a 0.005
    boundary could in principle bucket differently cross-engine.
    Such a tie requires the IEEE double to be exactly representable
    at 3 decimal digits, which the /SUM(c) division makes measure-
    zero in practice (empirically green at sf0.001 and sf0.01); the
    grid is a tercile boundary, so a hypothetical tie moves one doc
    between adjacent buckets, never corrupts a count."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("tk")
    )
    db = (
        docs.filter(F.size("tk") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 1), "
                    "i -> struct(element_at(tk, i) AS w1, "
                    "element_at(tk, i + 1) AS w2))"
                )
            ).alias("b"),
        )
        .groupBy("doc_id", "b.w1", "b.w2")
        .agg(F.count("*").alias("c"))
        # db feeds BOTH the LM build and the scoring join: checkpoint
        # so the tokenize+Generate corpus pass materializes once
        # (lazy — same pattern as the dedup funnels, dedup.py:391).
        .transform(cut_lineage, eager=False)
    )
    cnt2 = db.groupBy("w1", "w2").agg(F.sum("c").alias("n2"))
    cnt1 = cnt2.groupBy("w1").agg(F.sum("n2").alias("n1"))
    lm = cnt2.join(cnt1, "w1").select(
        "w1",
        "w2",
        (-F.log(F.col("n2").cast("double") / F.col("n1")))
        .cast("decimal(18,6)")
        .alias("nll"),
    )
    sc = (
        db.join(lm, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.col("c") * F.col("nll")).cast("double")
                / F.sum("c")
            ).alias("avg_nll")
        )
    )
    g = (
        sc.select(F.col("avg_nll").cast(PPL_GRID).alias("grid"))
        .groupBy("grid")
        .agg(F.count("*").alias("n"))
    )
    w_cum = Window.orderBy("grid").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = g.select(
        "grid",
        "n",
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_all).alias("total"),
    )
    lab = cum.select(
        F.when(3 * F.col("cum") <= F.col("total"), "head")
        .when(3 * F.col("cum") <= 2 * F.col("total"), "middle")
        .otherwise("tail")
        .alias("bucket"),
        "grid",
        "n",
    )
    return (
        lab.groupBy("bucket")
        .agg(
            F.sum("n").alias("n_docs"),
            F.min("grid").cast("double").alias("min_nll"),
            F.max("grid").cast("double").alias("max_nll"),
        )
        .orderBy("bucket")
    )
