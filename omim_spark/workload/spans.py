"""Span-level corpus hygiene: exact substring dedup and benchmark
decontamination — the two n-gram-overlap operations a training-data
pipeline runs that document-level dedup cannot express.

Both are (Spark plan, DuckDB oracle) pairs over ``documents``:

- ``q_substring_spans`` — every 8-token window that appears verbatim
  in ≥2 distinct documents (Lee et al. 2022 substring dedup,
  detection tier).  At 100 TB the plan is explode → project
  md5(span) → one skew-free shuffle on the uniform hash.
- ``q_decontaminate`` — training docs sharing any exact 8-gram with a
  held-out benchmark corpus (here: ``source = 'src0'`` stands in for
  the evaluation suite).  The benchmark n-gram set is
  small-by-construction → broadcast semi join; the corpus side never
  shuffles until the per-doc hit count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with sibling modules)

from omim_spark.operators.dedup import decontaminate, duplicate_spans

from .registry import register, table

SPAN_N = 8
BENCH_SOURCE = "src0"

# Shared oracle fragment: (doc_id, source, pos, s) = every 8-token
# window.  LIST_SLICE(tk, i, i+7) is 1-based inclusive == Spark
# slice(tk, i, 8); i ranges over generate_series(1, len-7) so no
# clipping on either engine.
_SPAN_CTE = f"""
    d AS (SELECT doc_id, source, STRING_SPLIT(text, ' ') AS tk FROM documents),
    sp AS (
      SELECT doc_id, source, i AS pos,
             ARRAY_TO_STRING(LIST_SLICE(tk, i, i + {SPAN_N - 1}), ' ') AS s
      FROM d, UNNEST(GENERATE_SERIES(1, LEN(tk) - {SPAN_N - 1})) AS t(i)
      WHERE LEN(tk) >= {SPAN_N}
    )
"""


@register(
    "q_substring_spans",
    oracle=f"""
    WITH {_SPAN_CTE}
    SELECT MD5(s) AS span_hash,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_occ,
           MIN(doc_id) AS first_doc,
           MIN(pos) AS min_pos
    FROM sp
    GROUP BY MD5(s)
    HAVING COUNT(DISTINCT doc_id) >= 2
    ORDER BY span_hash
    """,
)
def q_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup (detection tier): 8-token spans occurring
    verbatim in ≥2 distinct documents, with occurrence stats and the
    earliest (doc, pos) anchor for excision.

    Scale: the only shuffle keys on md5(span) — uniform 128-bit, so a
    boilerplate span cannot skew a partition the way a hot join key
    would; the span text is dropped before the exchange."""
    docs = table(spark, sf_dir, "documents")
    return duplicate_spans(docs, n=SPAN_N, min_docs=2).orderBy("span_hash")


@register(
    "q_decontaminate",
    oracle=f"""
    WITH {_SPAN_CTE},
    spd AS (SELECT DISTINCT doc_id, source, s FROM sp),
    bench AS (SELECT DISTINCT s FROM spd WHERE source = '{BENCH_SOURCE}'),
    train AS (SELECT doc_id, s FROM spd WHERE source <> '{BENCH_SOURCE}'),
    hits AS (
      SELECT doc_id, COUNT(*) AS n_hit
      FROM train SEMI JOIN bench USING (s)
      GROUP BY doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_spans FROM train GROUP BY doc_id)
    SELECT hits.doc_id, n_hit, n_spans,
           CAST(n_hit AS DOUBLE) / CAST(n_spans AS DOUBLE) AS contamination_ratio
    FROM hits JOIN sizes USING (doc_id)
    ORDER BY hits.doc_id
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training documents (source ≠
    BENCH_SOURCE) sharing any exact 8-gram with the benchmark corpus
    (source = BENCH_SOURCE, standing in for an evaluation suite), with
    hit counts and the contaminated fraction of each doc's distinct
    8-grams.

    Scale: the benchmark side of a decontamination run is MBs against
    a 100 TB corpus — broadcast semi join on 64-bit span hashes; the
    corpus side stays map-side until one exchange on doc_id."""
    docs = table(spark, sf_dir, "documents")
    train = docs.filter(F.col("source") != BENCH_SOURCE)
    bench = docs.filter(F.col("source") == BENCH_SOURCE)
    return (
        decontaminate(train, bench, n=SPAN_N)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    )
