"""String/date/scalar-function workload (SURVEY.md §2.7 T1-T19) plus
the text-analysis operators a training-data pipeline needs (language
ID, quality scoring, token counting, document fingerprinting) over the
``documents`` table.

Everything here is built-in JVM expressions — regexp, split, array
ops, md5 — no Python UDFs, so the whole plan stays in whole-stage
codegen and scales linearly with input splits (embarrassingly
parallel per-row work; zero shuffles except the final aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, table
from .relational import dsum, _dsum_sql

# Tiny stopword lists for the heuristic language scorer.  Deterministic
# and shared with the oracle SQL below.
EN_STOPWORDS = ("the", "a", "and", "of", "to")


@register(
    "q_regexp_morbid_extract",
    oracle="""
    WITH built AS (
      SELECT p_partkey,
             p_name || ', ' || CAST(100000 + p_partkey AS VARCHAR)
                    || ' (' || CAST(1 + p_partkey % 4 AS VARCHAR) || ')' AS phenotype
      FROM part
    )
    SELECT p_partkey,
           TRIM(REGEXP_EXTRACT(phenotype, '^(.*), (\\d{6}) \\((\\d)\\)$', 1)) AS label,
           REGEXP_EXTRACT(phenotype, '^(.*), (\\d{6}) \\((\\d)\\)$', 2) AS mim,
           REGEXP_EXTRACT(phenotype, '^(.*), (\\d{6}) \\((\\d)\\)$', 3) AS map_key
    FROM built
    ORDER BY p_partkey
    """,
)
def q_regexp_morbid_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morbidmap phenotype-field regex (T2 — reference
    omim_txt_parser.py:449-476 extracts `(label)(mim)(key)`), run over
    a synthesized `label, 123456 (3)` column so the oracle sees the
    same strings."""
    pat = r"^(.*), (\d{6}) \((\d)\)$"
    p = table(spark, sf_dir, "part")
    built = p.select(
        "p_partkey",
        F.concat(
            F.col("p_name"),
            F.lit(", "),
            (F.lit(100000) + F.col("p_partkey")).cast("string"),
            F.lit(" ("),
            (1 + F.col("p_partkey") % 4).cast("string"),
            F.lit(")"),
        ).alias("phenotype"),
    )
    return built.select(
        "p_partkey",
        F.trim(F.regexp_extract("phenotype", pat, 1)).alias("label"),
        F.regexp_extract("phenotype", pat, 2).alias("mim"),
        F.regexp_extract("phenotype", pat, 3).alias("map_key"),
    ).orderBy("p_partkey")


@register(
    "q_token_explode_counts",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 25
    """,
)
def q_token_explode_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split + explode + count (T3/T11 pack-unpack — reference
    `'|'.join`/`split('|')` at omim_txt_parser.py:569-573).

    Scale: explode fans out ~100× but stays pipelined (no shuffle
    until the partial-agg exchange on token)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(25)
    )


@register(
    "q_string_scalar_suite",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS upper_name,
           LOWER(c_name) AS lower_name,
           REPLACE(c_name, '#', '_') AS underscored,
           SPLIT_PART(c_name, '#', 2) AS name_id,
           REGEXP_REPLACE(SPLIT_PART(c_name, '#', 2), '^0+', '') AS name_id_stripped,
           LENGTH(c_name) AS name_len,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           MD5(CONCAT_WS('|', c_name, CAST(c_nationkey AS VARCHAR))) AS bnode_id,
           STARTS_WITH(c_name, 'Customer') AS is_customer
    FROM customer
    ORDER BY c_custkey
    LIMIT 500
    """,
)
def q_string_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string-function suite (T5 regexp_replace, T9 CURIE
    splitter `split(':')[1]`, T10 bracket strip, T12 prefix tests,
    T14 casing, T15 md5 deterministic bnode — reference
    utils/utils.py:12-78, main.py:178-186)."""
    c = table(spark, sf_dir, "customer")
    name_id = F.substring_index(F.col("c_name"), "#", -1)
    return (
        c.select(
            "c_custkey",
            F.upper("c_name").alias("upper_name"),
            F.lower("c_name").alias("lower_name"),
            F.replace(F.col("c_name"), F.lit("#"), F.lit("_")).alias("underscored"),
            name_id.alias("name_id"),
            F.regexp_replace(name_id, "^0+", "").alias("name_id_stripped"),
            F.length("c_name").alias("name_len"),
            F.substring("c_name", 1, 8).alias("name_prefix"),
            F.md5(
                F.concat_ws("|", F.col("c_name"), F.col("c_nationkey").cast("string"))
            ).alias("bnode_id"),
            F.col("c_name").startswith("Customer").alias("is_customer"),
        )
        .orderBy("c_custkey")
        .limit(500)
    )


@register(
    "q_dates_monthly",
    oracle=f"""
    SELECT STRFTIME(o_orderdate, '%Y-%m') AS month,
           COUNT(*) AS n_orders,
           {_dsum_sql('o_totalprice')} AS total,
           STRFTIME(MIN(o_orderdate), '%Y-%m-%d') AS first_day,
           STRFTIME(MAX(o_orderdate) + INTERVAL 1 DAY, '%Y-%m-%d') AS last_day_plus1
    FROM orders
    GROUP BY STRFTIME(o_orderdate, '%Y-%m')
    ORDER BY month
    """,
)
def q_dates_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date functions (T16 — reference strftime version IRIs
    main.py:254-257, date arithmetic omim_txt_parser.py:548-552):
    monthly rollup with date_format / date_add."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_day"),
            F.date_format(F.date_add(F.max("o_orderdate").cast("date"), 1), "yyyy-MM-dd").alias("last_day_plus1"),
        )
        .orderBy("month")
    )


@register(
    "q_case_evidence_branch",
    oracle="""
    SELECT o_orderpriority,
           CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'expedite'
                WHEN o_orderpriority = '3-MEDIUM' THEN 'standard'
                ELSE 'bulk' END AS svc_class,
           PRINTF('Evidence: (%s) %s', SPLIT_PART(o_orderpriority, '-', 1),
                  o_orderstatus) AS evidence,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1, 2, 3
    ORDER BY o_orderpriority, evidence
    """,
)
def q_case_evidence_branch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional branch + formatted evidence string (T18/T19 —
    reference main.py:440 `f'Evidence: ({key}) {label}'` and the
    SPARQL BIND(IF(...)) at disease-gene-relationships.sparql:33-39)."""
    o = table(spark, sf_dir, "orders")
    svc = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "expedite")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "standard")
        .otherwise("bulk")
    )
    evidence = F.format_string(
        "Evidence: (%s) %s",
        F.substring_index(F.col("o_orderpriority"), "-", 1),
        F.col("o_orderstatus"),
    )
    return (
        o.select(
            "o_orderpriority", svc.alias("svc_class"), evidence.alias("evidence")
        )
        .groupBy("o_orderpriority", "svc_class", "evidence")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority", "evidence")
    )


# ---------------------------------------------------------------------------
# Text analysis for training-data pipelines
# ---------------------------------------------------------------------------


def _stopword_hits_sql(col: str) -> str:
    toks = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return (
        f"LEN(LIST_FILTER(STRING_SPLIT({col}, ' '), t -> t IN ({toks})))"
    )


@register(
    "q_text_quality",
    oracle=f"""
    SELECT doc_id,
           LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
           LENGTH(text) AS n_chars_measured,
           CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                / LEN(STRING_SPLIT(text, ' ')) AS avg_token_len,
           {_stopword_hits_sql('text')} AS stopword_hits,
           CAST({_stopword_hits_sql('text')} AS DOUBLE)
                / LEN(STRING_SPLIT(text, ' ')) AS stopword_ratio,
           LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS n_unique_tokens
    FROM documents
    ORDER BY doc_id
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring (training-data pipeline op): token
    count, average token length, stopword ratio, vocabulary size —
    all JVM array expressions, no UDF.

    Scale: per-row only; at 100 TB this is a pure map stage that
    rides whatever partitioning the scan produces."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))
    )
    n_tokens = F.size(toks)
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / n_tokens
        ).alias("avg_token_len"),
        stop_hits.alias("stopword_hits"),
        (stop_hits.cast("double") / n_tokens).alias("stopword_ratio"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    ).orderBy("doc_id")


@register(
    "q_lang_id_heuristic",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             CASE WHEN {_stopword_hits_sql('text')} * 10
                       >= LEN(STRING_SPLIT(text, ' ')) THEN 'en'
                  ELSE 'unk' END AS predicted
      FROM documents
    )
    SELECT lang, predicted, COUNT(*) AS n
    FROM scored
    GROUP BY lang, predicted
    ORDER BY lang, predicted
    """,
)
def q_lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (training-data pipeline op): stopword-hit
    ratio ≥ 10% → 'en'.  (A real n-gram profile model slots into the
    same per-row expression shape; see omim_spark.operators.text.)"""
    docs = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    hits = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    predicted = F.when(hits * 10 >= F.size(toks), "en").otherwise("unk")
    return (
        docs.select("doc_id", "lang", predicted.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "predicted")
    )


@register(
    "q_token_count_bpe",
    oracle="""
    SELECT source,
           CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS ws_tokens,
           CAST(SUM(LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')))
                AS BIGINT) AS bpe_ish_tokens,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (training-data pipeline op): whitespace tokens
    and a BPE-ish regex tokenizer (letters / digits / other), per
    source corpus."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            F.size(F.split("text", " ")).alias("ws"),
            F.size(
                F.expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")
            ).alias("bpe"),
        )
        .groupBy("source")
        .agg(
            F.sum("ws").alias("ws_tokens"),
            F.sum("bpe").alias("bpe_ish_tokens"),
            F.count("*").alias("n_docs"),
        )
        .orderBy("source")
    )


@register(
    "q_doc_fingerprint",
    oracle="""
    SELECT doc_id,
           MD5(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(STRING_SPLIT(text, ' '))), ' '))
             AS fingerprint
    FROM documents
    ORDER BY doc_id
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint (training-data pipeline op): md5 over the
    sorted distinct-token set — an order-insensitive content hash used
    as a cheap pre-filter before pairwise near-dup checks."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(
            F.array_join(F.sort_array(F.array_distinct(F.split("text", " "))), " ")
        ).alias("fingerprint"),
    ).orderBy("doc_id")


@register(
    "q_tf_df_stats",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT term, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
      FROM toks WHERE term <> '' GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT term, tf, df, n_docs,
           tf * (n_docs - df) AS tfidf_num
    FROM tf, n
    ORDER BY tf DESC, term
    LIMIT 100
    """,
)
def q_tf_df_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term/document frequency table — the integer core of
    TF-IDF (the log is left to the consumer so the cross-engine check
    stays exact).  Top-100 terms by collection frequency.

    Scale: explode + two partial-agged exchanges (term, then the tiny
    distinct); the doc-count side is a 1-row broadcast."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("term").agg(
        F.count("*").alias("tf"), F.countDistinct("doc_id").alias("df")
    )
    n = docs.agg(F.count("*").alias("n_docs"))
    return (
        tf.crossJoin(F.broadcast(n))
        .select(
            "term", "tf", "df", "n_docs",
            (F.col("tf") * (F.col("n_docs") - F.col("df"))).alias("tfidf_num"),
        )
        .orderBy(F.desc("tf"), F.asc("term"))
        .limit(100)
    )
