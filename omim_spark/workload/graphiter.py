"""Round-2 additions: equivalency cliques, Delta-style MERGE, bounded
iterative label propagation, and skew-safe two-phase aggregation —
each as an oracle-checked (Spark, DuckDB) pair.

- q_equiv_cliques: the reference's equivalency-cliques analysis
  (analyses/equivalency_cliques.py:68-94) on its OMIM-shaped fixture:
  MIM terms grouped by shared HGNC symbol, each row listing the other
  members of its clique.  Production operator:
  ``omim_spark.analyses.equivalency_cliques``.
- q_merge_upsert_delta: three-clause MERGE (conditional delete /
  update / insert) via ``operators/merge.py`` — the generalization of
  the reference's incremental cache upsert
  (omim2obo/utils/api_entries_to_cache.py).
- q_label_propagation: K synchronous BSP rounds of min-label
  propagation over a customer-supplier bipartite graph
  (``operators/graph.py``), oracle-checked by unrolling the same K
  rounds as chained SQL CTEs.
- q_salted_skew_agg: ``operators/skew.py:two_phase_agg`` — the salted
  partial/final aggregation for hot keys — proven equal to a plain
  GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omim_spark.analyses import equivalency_cliques
from omim_spark.operators.graph import propagate_min_labels
from omim_spark.operators.merge import merge_into
from omim_spark.operators.skew import two_phase_agg

from .registry import events_table, register, table
from .relational import _dsum_sql, dsum

# ---------------------------------------------------------------------------
# Equivalency cliques (reference analyses/equivalency_cliques.py:68-94)
# ---------------------------------------------------------------------------

_TITLE_ROWS = [
    ("100001", "Asterisk"),
    ("100002", "Plus"),
    ("100003", "Number Sign"),
    ("100004", "Percent"),
    ("100005", "Asterisk"),
    ("100006", "Asterisk"),
    ("100007", "Plus"),
    ("100008", "Asterisk"),
]
# mim -> HGNC symbol map: G1 clique of 3, G2 clique of 2, G3 singleton
# (dropped), one NULL symbol (dropped), 100004 unmapped (dropped).
_HGNC_ROWS = [
    ("100001", "G1"),
    ("100005", "G1"),
    ("100006", "G1"),
    ("100002", "G2"),
    ("100007", "G2"),
    ("100003", "G3"),
    ("100008", None),
]


def _values(rows, cols):
    def lit(v):
        return "NULL" if v is None else "'" + str(v).replace("'", "''") + "'"

    body = ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    return f"(VALUES {body}) AS t({', '.join(cols)})"


@register(
    "q_equiv_cliques",
    oracle=f"""
    WITH titles AS (SELECT * FROM {_values(_TITLE_ROWS, ["mim_number", "omim_type"])}),
    hgnc AS (SELECT * FROM {_values(_HGNC_ROWS, ["mim", "hgnc_symbol"])}),
    j AS (
      SELECT t.mim_number, t.omim_type, h.hgnc_symbol
      FROM titles t JOIN hgnc h ON t.mim_number = h.mim
      WHERE h.hgnc_symbol IS NOT NULL
    ),
    c AS (
      SELECT *, LIST(mim_number) OVER (PARTITION BY hgnc_symbol) AS all_mims
      FROM j
    )
    SELECT mim_number, omim_type, hgnc_symbol,
           CAST(LEN(all_mims) AS BIGINT) AS clique_size,
           ARRAY_TO_STRING(
             LIST_SORT(LIST_FILTER(all_mims, x -> x <> mim_number)), ';'
           ) AS other_mims
    FROM c WHERE LEN(all_mims) > 1
    ORDER BY hgnc_symbol, mim_number
    """,
)
def q_equiv_cliques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equivalency cliques on the OMIM-shaped fixture: MIM terms that
    share an HGNC symbol, each listing its clique co-members (A6/J1).
    The pandas groupby-loop of the reference becomes one broadcast
    join + one window — no driver iteration at any scale."""
    titles = spark.createDataFrame(
        _TITLE_ROWS, "mim_number string, omim_type string"
    )
    hgnc = spark.createDataFrame(_HGNC_ROWS, "mim string, hgnc_symbol string")
    out = equivalency_cliques(titles, hgnc)
    return out.withColumn("clique_size", F.col("clique_size").cast("long"))


# ---------------------------------------------------------------------------
# Delta-style MERGE (operators/merge.py)
# ---------------------------------------------------------------------------


@register(
    "q_merge_upsert_delta",
    oracle=f"""
    WITH t AS (
      SELECT c_custkey, c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 3 <> 0
    ),
    s AS (
      SELECT o_custkey AS c_custkey, {_dsum_sql('o_totalprice')} AS total
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY o_custkey
    )
    SELECT COALESCE(t.c_custkey, s.c_custkey) AS c_custkey,
           CASE WHEN t.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL
                THEN t.c_acctbal + s.total
                WHEN t.c_custkey IS NOT NULL THEN t.c_acctbal
                ELSE s.total END AS c_acctbal,
           CASE WHEN t.c_custkey IS NOT NULL THEN t.c_mktsegment
                ELSE 'NEW' END AS c_mktsegment
    FROM t FULL OUTER JOIN s ON t.c_custkey = s.c_custkey
    WHERE NOT (t.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL
               AND s.total > 400000.0)
    ORDER BY c_custkey
    """,
)
def q_merge_upsert_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-clause MERGE: a partial customer snapshot merged with 1997
    order totals — big spenders deleted, the rest credited, unseen
    customers inserted as segment 'NEW'.  One full-outer shuffle join;
    the Delta/Iceberg MERGE shape without a transaction log."""
    target = (
        table(spark, sf_dir, "customer")
        .filter((F.col("c_custkey") % 3) != 0)
        .select("c_custkey", "c_acctbal", "c_mktsegment")
    )
    source = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(dsum(F.col("o_totalprice")).alias("total"))
    )
    merged = merge_into(
        target,
        source,
        on="c_custkey",
        update_set={"c_acctbal": F.col("t.c_acctbal") + F.col("s.total")},
        insert_values={
            "c_custkey": F.col("s.c_custkey"),
            "c_acctbal": F.col("s.total"),
            "c_mktsegment": F.lit("NEW"),
        },
        delete_condition=F.col("s.total") > 400000.0,
    )
    return merged.orderBy("c_custkey")


# ---------------------------------------------------------------------------
# Bounded label propagation (operators/graph.py)
# ---------------------------------------------------------------------------

_LP_ROUNDS = 4
_EDGE_SQL = """
      SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS u,
                      CAST(l_suppkey * 2 + 1 AS BIGINT) AS v
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
"""


def _lp_oracle(rounds: int) -> str:
    """Unroll K BSP rounds as chained CTEs — same schedule as the
    DataFrame loop, so results agree bit-for-bit."""
    parts = [
        f"WITH e AS ({_EDGE_SQL}),",
        "g AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v AS a, u AS b FROM e),",
        "l0 AS (SELECT DISTINCT a AS node, a AS label FROM g)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f", m{i} AS (SELECT g.b AS node, MIN(l{i-1}.label) AS nb"
            f" FROM g JOIN l{i-1} ON g.a = l{i-1}.node GROUP BY g.b)"
        )
        parts.append(
            f", l{i} AS (SELECT l{i-1}.node,"
            f" LEAST(l{i-1}.label, COALESCE(m{i}.nb, l{i-1}.label)) AS label"
            f" FROM l{i-1} LEFT JOIN m{i} ON l{i-1}.node = m{i}.node)"
        )
    parts.append(
        f"SELECT label AS component, COUNT(*) AS n_nodes,"
        f" MIN(node) AS min_node, MAX(node) AS max_node"
        f" FROM l{rounds} GROUP BY label ORDER BY component"
    )
    return "\n".join(parts)


@register("q_label_propagation", oracle=_lp_oracle(_LP_ROUNDS))
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K={_LP_ROUNDS} rounds of min-label propagation over the Q1-1997
    customer-supplier bipartite graph, summarized per resulting
    component.  Bounded-iteration BSP: one join + one agg shuffle per
    round, lineage truncated per round."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).cast("long").alias("src"),
            (F.col("l_suppkey") * 2 + 1).cast("long").alias("dst"),
        )
        .distinct()
    )
    labels = propagate_min_labels(edges, _LP_ROUNDS)
    return (
        labels.groupBy(F.col("label").alias("component"))
        .agg(
            F.count("*").alias("n_nodes"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        )
        .orderBy("component")
    )


# ---------------------------------------------------------------------------
# Skew-safe two-phase aggregation (operators/skew.py)
# ---------------------------------------------------------------------------


@register(
    "q_salted_skew_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(user_id) AS BIGINT) AS id_sum,
           MIN(event_id) AS min_event,
           MAX(event_id) AS max_event
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation on the (skew-prone) event_type key,
    proven equal to a plain GROUP BY.  The partial agg spreads each hot
    key over 16 deterministic salts, so one dominant event type cannot
    pin a single reducer at 100 TB; only algebraic aggregates
    (count/sum/min/max) are allowed, keeping both phases map-side
    combinable."""
    ev = events_table(spark, sf_dir).select("event_type", "user_id", "event_id")
    out = two_phase_agg(
        ev,
        "event_type",
        {
            "n": "count(*)",
            "id_sum": "sum(user_id)",
            "min_event": "min(event_id)",
            "max_event": "max(event_id)",
        },
        n_salts=16,
    )
    return out.orderBy("event_type")


# ---------------------------------------------------------------------------
# Integer-exact PageRank steps (operators/graph.py:pagerank_steps)
# ---------------------------------------------------------------------------

_PR_ROUNDS = 3


def _pr_oracle(rounds: int) -> str:
    """Unroll K PageRank power-iteration rounds as chained CTEs with
    the SAME integer floor-division arithmetic as the DataFrame loop —
    agreement is bit-exact, not approximate."""
    parts = [
        f"WITH e AS ({_EDGE_SQL}),",
        "od AS (SELECT u, COUNT(*) AS d FROM e GROUP BY u),",
        "nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e),",
        "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM nodes)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f", c{i} AS (SELECT e.v AS node,"
            f" CAST(SUM(r{i-1}.pr // od.d) AS BIGINT) AS contrib"
            f" FROM e JOIN od ON e.u = od.u"
            f" JOIN r{i-1} ON r{i-1}.node = e.u GROUP BY e.v)"
        )
        parts.append(
            f", r{i} AS (SELECT n.node,"
            f" CAST(150000 + (85 * COALESCE(c{i}.contrib, 0)) // 100 AS BIGINT) AS pr"
            f" FROM nodes n LEFT JOIN c{i} ON n.node = c{i}.node)"
        )
    parts.append(
        f"SELECT node, pr FROM r{rounds} ORDER BY pr DESC, node LIMIT 25"
    )
    return "\n".join(parts)


@register("q_pagerank_steps", oracle=_pr_oracle(_PR_ROUNDS))
def q_pagerank_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 nodes after K=3 integer-exact PageRank steps over the
    Q1-1997 customer-supplier graph (same edge list as
    q_label_propagation).  Integer micro-unit arithmetic makes the
    iterative computation deterministic across engines and cluster
    topologies — the property that lets an iterative op live under the
    exact-hash oracle gate at all."""
    from omim_spark.operators.graph import pagerank_steps

    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).cast("long").alias("src"),
            (F.col("l_suppkey") * 2 + 1).cast("long").alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank_steps(edges, _PR_ROUNDS)
    return ranks.orderBy(F.col("pr").desc(), "node").limit(25)
