"""Relational operator spine — scans, filters, joins, aggregations,
windows, sorts, set ops (SURVEY.md §2.1-§2.6) demonstrated on the
driver's TPC-H-ish tables with DuckDB-oracle parity.

Numeric convention: every large SUM over doubles goes through
DECIMAL(18,6) so the aggregate is exact and therefore identical across
engines and across partition orderings (a double sum is
order-dependent; at 100 TB the partition order is nondeterministic, so
exact decimal aggregation is also the *correct* engineering choice,
not just an oracle trick).  Final values are cast back to DOUBLE.

Scale notes per query are in the docstrings: what shuffles, what
broadcasts, what pushes down.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import events_table, register, table, table_spread


def dsum(col: Column) -> Column:
    """Exact, order-independent sum of a double column (via decimal)."""
    return F.sum(col.cast("decimal(18,6)")).cast("double")


def _dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


# ---------------------------------------------------------------------------
# Scans + filters + aggregation (F1-F4, A-family)
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    headline=True,
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum_sql('l_quantity')} AS sum_qty,
           {_dsum_sql('l_extendedprice')} AS sum_base_price,
           {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {_dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {_dsum_sql('l_quantity')} / COUNT(*) AS avg_qty,
           {_dsum_sql('l_extendedprice')} / COUNT(*) AS avg_price,
           {_dsum_sql('l_discount')} / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (flagship).

    Scale: single scan with the shipdate predicate pushed to parquet,
    map-side partial aggregation on a 6-value grouping key → the
    shuffle moves only |groups|×|aggs| rows.  Whole-stage codegen end
    to end; no Python in the plan.  The scan is spread (r13, guide
    §2.5): the per-row double→decimal casts dominate this query, and
    a single-row-group input otherwise serializes them on one task —
    no-op on any input layout that already parallelizes.
    """
    # Spread keys are columns the query reads anyway (price+quantity:
    # high-cardinality, deterministic) so the repartition does not
    # widen the 7-column scan.
    li = table_spread(
        spark, sf_dir, "lineitem", "l_extendedprice", "l_quantity"
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            (dsum(F.col("l_quantity")) / F.count("*")).alias("avg_qty"),
            (dsum(F.col("l_extendedprice")) / F.count("*")).alias("avg_price"),
            (dsum(F.col("l_discount")) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q06_revenue_delta",
    headline=True,
    oracle=f"""
    SELECT {_dsum_sql('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 25
    """,
)
def q06_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style selective filter + global agg (F2/F4 + A7).

    Scale: all four predicates push to the parquet scan
    (PushedFilters), only 3 columns read (ReadSchema pruning); the
    'shuffle' is a single-row partial-agg exchange.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 25)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Joins (J1, J2)
# ---------------------------------------------------------------------------


@register(
    "q03_top_orders",
    headline=True,
    oracle=f"""
    SELECT l_orderkey,
           {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, STRFTIME(o_orderdate, '%Y-%m-%d'), o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q03_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style shipping-priority query (J1 left-side chain).

    Scale: customer (filtered to one segment) joins without a forced
    hint — its parquet-scan size estimate is trustworthy, so Catalyst
    broadcasts it while it fits autoBroadcastJoinThreshold and
    degrades to a shuffle join at the SF where a segment of customer
    is itself fact-sized (a hard-coded broadcast hint would bypass
    the threshold and OOM there).  The orders⋈lineitem equi join
    shuffles on orderkey — the natural key both sides are produced
    on, so a co-partitioned/bucketed layout makes it shuffle-free in
    a real deployment.  Top-k via TakeOrderedAndProject (no global
    sort).
    """
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = table_spread(spark, sf_dir, "lineitem", "l_orderkey").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q05_region_revenue",
    headline=True,
    oracle=f"""
    SELECT n_name,
           {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style local-supplier revenue (J2 broadcast dim chain).

    Scale: region/nation are fixed-cardinality dims (5/25 rows) →
    explicit broadcast hints; supplier/customer grow with SF, so they
    carry NO hint — Catalyst/AQE broadcast them from their (reliable)
    parquet-scan estimates while they fit and fall back to shuffle
    joins at the SF where they don't.  The only unavoidable big
    shuffle is lineitem⋈orders on orderkey.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "q10_returned_items",
    headline=True,
    oracle=f"""
    SELECT c_custkey, c_name,
           {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE), n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item report (J1/J2 + top-k)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "c_custkey",
            "c_name",
            F.col("c_acctbal").cast("decimal(18,2)").cast("double").alias("acctbal"),
            "n_name",
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Anti / semi / outer-conflict / self joins (J3-J7)
# ---------------------------------------------------------------------------


@register(
    "q_anti_join_customers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    ANTI JOIN orders ON c_custkey = o_custkey
    """,
)
def q_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders — left_anti join (J4/J5 cache-eviction
    pattern, reference omim_txt_parser.py:579-580).

    Scale: anti join on the customer key; build side is the distinct
    custkeys of orders (shuffled hash or broadcast under AQE).
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_semi_join_customers",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    SEMI JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
      ON c_custkey = o.o_custkey
    """,
)
def q_semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with ≥1 big order — left_semi membership test (J5,
    reference omim_txt_parser.py:150-157 dedup guard)."""
    cust = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "q_conflict_drop_join",
    oracle="""
    WITH lo AS (
      SELECT c_nationkey AS k, MIN(c_mktsegment) AS v FROM customer GROUP BY c_nationkey
    ), hi AS (
      SELECT c_nationkey AS k, MAX(c_mktsegment) AS v FROM customer GROUP BY c_nationkey
    )
    SELECT COALESCE(lo.k, hi.k) AS k, lo.v AS v
    FROM lo FULL OUTER JOIN hi ON lo.k = hi.k
    WHERE lo.v IS NOT DISTINCT FROM hi.v
    """,
)
def q_conflict_drop_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-source reconciliation: full-outer join two key→value maps
    and DROP conflicting keys (J3 — reference
    omim_txt_parser.py:426-438 drops mim→symbol keys where
    mim2gene and genemap2 disagree, rather than picking a winner)."""
    cust = table(spark, sf_dir, "customer")
    lo = cust.groupBy(F.col("c_nationkey").alias("k")).agg(F.min("c_mktsegment").alias("v"))
    hi = cust.groupBy(F.col("c_nationkey").alias("k")).agg(F.max("c_mktsegment").alias("v"))
    joined = lo.alias("lo").join(hi.alias("hi"), F.col("lo.k") == F.col("hi.k"), "full_outer")
    return joined.filter(F.col("lo.v").eqNullSafe(F.col("hi.v"))).select(
        F.coalesce(F.col("lo.k"), F.col("hi.k")).alias("k"), F.col("lo.v").alias("v")
    )


@register(
    "q_self_join_pairs",
    oracle="""
    SELECT a.l_orderkey AS orderkey, COUNT(*) AS n_pairs
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
    WHERE a.l_partkey = b.l_partkey
    GROUP BY a.l_orderkey
    ORDER BY orderkey
    """,
)
def q_self_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self join (J7 — reference omim_entry_parser.py:432-441 looks a
    phenotype MIM up as a gene MIM in the same aggregate): orders
    containing the same part on two line numbers.

    Scale: self equi join on orderkey — one shuffle, both sides
    co-partitioned by construction, pair explosion bounded by
    lines-per-order (≤7 in TPC-H-ish data).
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_linenumber") < F.col("b.l_linenumber"))
            & (F.col("a.l_partkey") == F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_orderkey").alias("orderkey"))
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("orderkey")
    )


@register(
    "q_upsert_merge",
    oracle="""
    WITH cached AS (
      SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
    ), fresh AS (
      SELECT o_orderkey, 'U' AS o_orderstatus, CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_orderstatus, COUNT(*) AS n, CAST(SUM(price) AS DOUBLE) AS total
    FROM (
      SELECT * FROM fresh
      UNION ALL
      SELECT * FROM cached ANTI JOIN fresh USING (o_orderkey)
    )
    GROUP BY o_orderstatus
    """,
)
def q_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cache upsert (J8 — reference
    omim_txt_parser.py:516-585: fetch-new ∪ (cached − new), with the
    1-day overlap window making rows appear in both sides):
    new rows win, old rows survive via anti join.

    Scale: the anti join shuffles on the upsert key once; with a
    Delta/Iceberg table this is MERGE INTO, here expressed as the
    equivalent pure-DataFrame dataflow.
    """
    orders = table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)").alias("price")
    cached = orders.filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    ).select("o_orderkey", "o_orderstatus", price)
    fresh = orders.filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    ).select("o_orderkey", F.lit("U").alias("o_orderstatus"), price)
    merged = fresh.unionByName(cached.join(fresh, "o_orderkey", "left_anti"))
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.sum("price").cast("double").alias("total")
    )


# ---------------------------------------------------------------------------
# Graph-pattern join over a triples view (J9/J10 — the SPARQL shape)
# ---------------------------------------------------------------------------


@register(
    "q_triple_graph_pattern",
    oracle="""
    WITH triples AS (
      SELECT CAST(c_custkey AS VARCHAR) AS s, 'in_nation' AS p,
             CAST(c_nationkey AS VARCHAR) AS o FROM customer
      UNION ALL
      SELECT CAST(n_nationkey AS VARCHAR), 'in_region',
             CAST(n_regionkey AS VARCHAR) FROM nation
      UNION ALL
      SELECT CAST(n_nationkey AS VARCHAR), 'label', n_name FROM nation
      UNION ALL
      SELECT CAST(r_regionkey AS VARCHAR), 'label', r_name FROM region
      UNION ALL
      SELECT CAST(c_custkey AS VARCHAR), 'label', c_name FROM customer
    )
    SELECT cl.o AS customer_name, nl.o AS nation_name
    FROM triples cn
    JOIN triples nr ON cn.p = 'in_nation' AND nr.p = 'in_region' AND cn.o = nr.s
    JOIN triples rl ON rl.p = 'label' AND rl.s = nr.o AND rl.o = 'EUROPE'
    JOIN triples nl ON nl.p = 'label' AND nl.s = cn.o
    JOIN triples cl ON cl.p = 'label' AND cl.s = cn.s
    ORDER BY customer_name
    """,
)
def q_triple_graph_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL-style graph-pattern query as triples-DataFrame self joins
    (J9 — reference sparql/disease-gene-relationships.sparql:9-37 runs
    multi-way joins over triple patterns; here the same shape finds
    customers whose nation is in region EUROPE).

    Scale: the triples relation self-joins on subject — at 100 TB
    this is the classic RDF store layout (partition by subject,
    predicate-filtered scans prune first); each pattern filter pushes
    to the scan before the join.
    """
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    t = (
        cust.select(
            F.col("c_custkey").cast("string").alias("s"),
            F.lit("in_nation").alias("p"),
            F.col("c_nationkey").cast("string").alias("o"),
        )
        .unionByName(
            nation.select(
                F.col("n_nationkey").cast("string").alias("s"),
                F.lit("in_region").alias("p"),
                F.col("n_regionkey").cast("string").alias("o"),
            )
        )
        .unionByName(
            nation.select(
                F.col("n_nationkey").cast("string").alias("s"),
                F.lit("label").alias("p"),
                F.col("n_name").alias("o"),
            )
        )
        .unionByName(
            region.select(
                F.col("r_regionkey").cast("string").alias("s"),
                F.lit("label").alias("p"),
                F.col("r_name").alias("o"),
            )
        )
        .unionByName(
            cust.select(
                F.col("c_custkey").cast("string").alias("s"),
                F.lit("label").alias("p"),
                F.col("c_name").alias("o"),
            )
        )
    )
    cn = t.filter(F.col("p") == "in_nation").alias("cn")
    nr = t.filter(F.col("p") == "in_region").alias("nr")
    rl = t.filter((F.col("p") == "label") & (F.col("o") == "EUROPE")).alias("rl")
    nl = t.filter(F.col("p") == "label").alias("nl")
    cl = t.filter(F.col("p") == "label").alias("cl")
    return (
        cn.join(nr, F.col("cn.o") == F.col("nr.s"))
        .join(rl, F.col("rl.s") == F.col("nr.o"))
        .join(nl, F.col("nl.s") == F.col("cn.o"))
        .join(cl, F.col("cl.s") == F.col("cn.s"))
        .select(F.col("cl.o").alias("customer_name"), F.col("nl.o").alias("nation_name"))
        .orderBy("customer_name")
    )


# ---------------------------------------------------------------------------
# Grouped collection / windows (A1-A6, §2.5)
# ---------------------------------------------------------------------------


@register(
    "q_group_collect_parts",
    oracle="""
    SELECT l_orderkey,
           STRING_AGG(DISTINCT CAST(l_partkey AS VARCHAR), ','
                      ORDER BY CAST(l_partkey AS VARCHAR)) AS parts,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_orderkey
    HAVING COUNT(*) >= 6
    ORDER BY l_orderkey
    """,
)
def q_group_collect_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-collect into a nested list (A1 — reference
    parse_morbid_map omim_txt_parser.py:441-495 builds
    gene→[associations]); emitted as a sorted joined string so the
    oracle comparison is order-stable.

    Scale: collect_set is a map-side-combinable aggregate; list size
    is bounded by lines-per-order, so no skew risk.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set(F.col("l_partkey").cast("string"))), ","
            ).alias("parts"),
            F.count("*").alias("n_lines"),
        )
        .filter(F.col("n_lines") >= 6)
        .orderBy("l_orderkey")
    )


@register(
    "q_clique_suppliers",
    oracle="""
    SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name,
           STRING_AGG(o.s_name, ';' ORDER BY o.s_name) AS same_nation_suppliers
    FROM supplier s
    LEFT JOIN supplier o ON s.s_nationkey = o.s_nationkey
                        AND s.s_suppkey <> o.s_suppkey
    GROUP BY s.s_suppkey, s.s_name
    ORDER BY s.s_suppkey
    """,
)
def q_clique_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-value clique list (A6 — reference
    analyses/equivalency_cliques.py:68-94 lists the *other* terms
    sharing a value): per supplier, the other suppliers in its nation,
    via a window collect + array_remove instead of a self join.
    """
    s = table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey")
    return (
        s.withColumn("all_names", F.collect_list("s_name").over(w))
        .select(
            "s_suppkey",
            "s_name",
            F.array_join(
                F.sort_array(F.array_remove(F.col("all_names"), F.col("s_name"))), ";"
            ).alias("same_nation_suppliers"),
        )
        .withColumn(
            "same_nation_suppliers",
            F.when(F.col("same_nation_suppliers") == "", F.lit(None)).otherwise(
                F.col("same_nation_suppliers")
            ),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q_window_assoc_count",
    oracle="""
    SELECT o_orderkey, o_custkey,
           COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders_of_cust
    FROM orders
    WHERE o_orderstatus = 'O'
    ORDER BY o_orderkey
    """,
)
def q_window_assoc_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition count window (A3 — reference main.py:467,475
    chooses the RO predicate by the number of gene associations a
    phenotype has; a window count avoids the regroup-and-rejoin)."""
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    w = Window.partitionBy("o_custkey")
    return orders.select(
        "o_orderkey", "o_custkey", F.count("*").over(w).alias("n_orders_of_cust")
    ).orderBy("o_orderkey")


@register(
    "q_rank_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT c_mktsegment, o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders JOIN customer ON o_custkey = c_custkey
    )
    WHERE rk <= 3
    ORDER BY c_mktsegment, rk
    """,
)
def q_rank_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 orders per market segment (§2.5 — the
    reference's sequential review-case numbering
    omim_entry_parser.py:469-475 is this rank pattern).

    Scale: rank-then-filter is pushed by Spark into a per-partition
    top-k (WindowGroupLimit) — no full sort of the fact table.
    """
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_mktsegment",
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("price"),
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
        .orderBy("c_mktsegment", "rk")
    )


@register(
    "q_singleton_groups",
    oracle="""
    SELECT l_partkey, COUNT(*) AS n
    FROM lineitem
    GROUP BY l_partkey
    HAVING COUNT(*) = 1
    ORDER BY l_partkey
    """,
)
def q_singleton_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-counts == 1 (A8 — reference morbidmap analysis notebook's
    gold-standard step: phenotypes appearing exactly once)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") == 1)
        .orderBy("l_partkey")
    )


# ---------------------------------------------------------------------------
# Sorts / set ops (O1-O6) + grouping-set extension
# ---------------------------------------------------------------------------


@register(
    "q_distinct_pairs",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey
    FROM customer
    ORDER BY c_mktsegment, c_nationkey
    """,
)
def q_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (O5/A5)."""
    return (
        table(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_nationkey")
        .distinct()
        .orderBy("c_mktsegment", "c_nationkey")
    )


@register(
    "q_except_members",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders
    ORDER BY c_custkey
    """,
)
def q_except_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (O3 — reference mims_all − mims_cached,
    omim_txt_parser.py:543)."""
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    ordered = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return cust.exceptAll(ordered).distinct().orderBy("c_custkey")


@register(
    "q_union_parties",
    oracle="""
    SELECT 'S' AS kind, s_suppkey AS pkey, s_name AS pname, s_nationkey AS nationkey
    FROM supplier
    UNION ALL
    SELECT 'C', c_custkey, c_name, c_nationkey
    FROM customer WHERE c_custkey <= 100
    ORDER BY kind, pkey
    """,
)
def q_union_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of heterogeneous sources into one schema (O2 — reference
    protected-row append omim_txt_parser.py:172,191)."""
    supp = table(spark, sf_dir, "supplier").select(
        F.lit("S").alias("kind"),
        F.col("s_suppkey").alias("pkey"),
        F.col("s_name").alias("pname"),
        F.col("s_nationkey").alias("nationkey"),
    )
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 100)
        .select(
            F.lit("C").alias("kind"),
            F.col("c_custkey").alias("pkey"),
            F.col("c_name").alias("pname"),
            F.col("c_nationkey").alias("nationkey"),
        )
    )
    return supp.unionByName(cust).orderBy("kind", "pkey")


@register(
    "q_rollup_acctbal",
    oracle="""
    SELECT r_name, n_name,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
           COUNT(*) AS n_suppliers
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """,
)
def q_rollup_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (engine extension beyond the reference —
    SURVEY §2.4 notes the reference has none; a 100 TB reporting
    engine needs them as partial-agg-friendly single-pass plans)."""
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.sum(F.col("s_acctbal").cast("decimal(18,2)")).cast("double").alias("total_bal"),
            F.count("*").alias("n_suppliers"),
        )
        .orderBy(F.asc_nulls_first("r_name"), F.asc_nulls_first("n_name"))
    )


@register(
    "q_stats_aggregates",
    oracle="""
    SELECT c_mktsegment,
           QUANTILE_CONT(o_totalprice, 0.5) AS p50,
           QUANTILE_CONT(o_totalprice, 0.9) AS p90,
           ROUND(STDDEV_SAMP(o_totalprice), 4) AS sd,
           ROUND(VAR_SAMP(o_totalprice), 2) AS variance,
           ROUND(CORR(o_totalprice, c_acctbal), 6) AS price_bal_corr,
           COUNT(*) AS n
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per group: exact interpolated
    percentiles, sample stddev/variance, correlation (engine-parity
    verified: Spark `percentile` ≡ DuckDB `quantile_cont`, both exact;
    skewness deliberately excluded — the engines use different bias
    corrections).

    Scale: exact percentile requires a per-group sort — at 100 TB
    switch to approx_percentile (t-digest) unless exactness is a
    contract; stddev/var/corr are single-pass algebraic."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
            F.round(F.stddev_samp("o_totalprice"), 4).alias("sd"),
            F.round(F.var_samp("o_totalprice"), 2).alias("variance"),
            F.round(F.corr("o_totalprice", "c_acctbal"), 6).alias("price_bal_corr"),
            F.count("*").alias("n"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q_unpivot_melt",
    oracle="""
    SELECT c_custkey, metric, value
    FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
      UNION ALL
      SELECT c_custkey, 'name_len', CAST(LENGTH(c_name) AS DOUBLE) FROM customer
    )
    ORDER BY c_custkey, metric
    """,
)
def q_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (O-tier: the inverse of q_user_activity_pivot):
    three per-customer metrics rotated into (key, metric, value) rows
    via the stack generator — a map-side Generate, no shuffle besides
    the output sort; the oracle replays it as the equivalent UNION ALL
    so wide→long semantics are pinned cross-engine."""
    c = table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.expr(
                "stack(3, 'acctbal', c_acctbal,"
                " 'nationkey', cast(c_nationkey as double),"
                " 'name_len', cast(length(c_name) as double))"
                " AS (metric, value)"
            ),
        )
        .orderBy("c_custkey", "metric")
    )


# ---------------------------------------------------------------------------
# Snapshot diff (data-versioning comparison)
# ---------------------------------------------------------------------------

SNAP_T1 = "2001-01-01"
SNAP_T2 = "2001-09-01"


@register(
    "q_snapshot_diff",
    oracle=f"""
    WITH snap_a AS (
      SELECT o_custkey, COUNT(*) AS n_orders,
             {_dsum_sql('o_totalprice')} AS total
      FROM orders WHERE o_orderdate < DATE '{SNAP_T1}'
      GROUP BY o_custkey
    ),
    snap_b AS (
      SELECT o_custkey, COUNT(*) AS n_orders,
             {_dsum_sql('o_totalprice')} AS total
      FROM orders WHERE o_orderdate < DATE '{SNAP_T2}'
      GROUP BY o_custkey
    )
    SELECT COALESCE(a.o_custkey, b.o_custkey) AS o_custkey,
           CASE WHEN a.o_custkey IS NULL THEN 'added'
                WHEN b.o_custkey IS NULL THEN 'removed'
                ELSE 'changed' END AS status,
           COALESCE(a.n_orders, 0) AS old_n,
           COALESCE(b.n_orders, 0) AS new_n,
           COALESCE(a.total, 0.0) AS old_total,
           COALESCE(b.total, 0.0) AS new_total
    FROM snap_a a FULL OUTER JOIN snap_b b USING (o_custkey)
    WHERE a.o_custkey IS NULL OR b.o_custkey IS NULL
       OR a.n_orders <> b.n_orders OR a.total <> b.total
    ORDER BY o_custkey
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the data-versioning comparison a pipeline runs
    between two materializations of the same rollup (here per-customer
    order totals as of {SNAP_T1} vs {SNAP_T2}): keys classified
    added / removed / changed, unchanged keys suppressed.  The
    time-travel diff primitive (what a lakehouse table-format diff
    computes) expressed as one full-outer join of the two snapshot
    aggregations.

    Scale: each snapshot is a map-side-combinable agg (date filter
    pushed to the scan); the diff is a single shuffle join on the
    snapshot key — at 100 TB both snapshots shuffle once; equality on
    decimal-exact totals means no false 'changed' rows from float
    noise."""
    o = table(spark, sf_dir, "orders")

    def snap(cutoff: str) -> DataFrame:
        return (
            o.filter(F.col("o_orderdate") < F.lit(cutoff).cast("date"))
            .groupBy("o_custkey")
            .agg(
                F.count("*").alias("n_orders"),
                dsum(F.col("o_totalprice")).alias("total"),
            )
        )

    a = snap(SNAP_T1).alias("a")
    b = snap(SNAP_T2).alias("b")
    j = a.join(b, "o_custkey", "full_outer").filter(
        F.col("a.n_orders").isNull()
        | F.col("b.n_orders").isNull()
        | (F.col("a.n_orders") != F.col("b.n_orders"))
        | (F.col("a.total") != F.col("b.total"))
    )
    return (
        j.select(
            "o_custkey",
            F.when(F.col("a.n_orders").isNull(), "added")
            .when(F.col("b.n_orders").isNull(), "removed")
            .otherwise("changed")
            .alias("status"),
            F.coalesce("a.n_orders", F.lit(0)).alias("old_n"),
            F.coalesce("b.n_orders", F.lit(0)).alias("new_n"),
            F.coalesce("a.total", F.lit(0.0)).alias("old_total"),
            F.coalesce("b.total", F.lit(0.0)).alias("new_total"),
        )
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# Bloom-filter scan-side join pruning (the 100 TB selective-join shape)
# ---------------------------------------------------------------------------


@register(
    "q_bloom_prune_join",
    oracle=f"""
    SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
           COUNT(*) AS n_orders,
           {_dsum_sql('o.o_totalprice')} AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY month
    ORDER BY month
    """,
)
def q_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective fact-dim join with explicit Bloom-filter scan pruning
    (`operators/bloom.py`): aggregate the BUILDING customers' keys
    into a Bloom filter sized ~10 bits/key from the build-side count
    (map-side-combinable bit_or; a KiB-scale broadcast at dim
    cardinalities that would never fit a hash relation), ship it
    broadcast, drop non-matching orders INSIDE the scan stage, then
    run the exact semi join over the survivors only.

    The oracle is the plain semi join — Bloom filters have no false
    negatives, so the gate proves the pruned plan's output is
    byte-identical to the unpruned one on real data (false positives
    are killed by the exact join that follows).

    Scale: at 100 TB the dim side may be too big to broadcast as a
    hash relation (→ shuffle join of the full fact table); the Bloom
    bits always broadcast, so the fact side is filtered to ~selectivity
    before its exchange.  AQE injects a similar runtime filter for some
    shuffle joins; this shape is explicit, deterministic (md5-derived
    positions), and works in sinks/streams where AQE doesn't reach."""
    from ..operators.bloom import bloom_prune

    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    pruned = bloom_prune(orders, cust, "o_custkey", "c_custkey")
    return (
        pruned.join(cust, pruned.o_custkey == cust.c_custkey, "semi")
        .groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month")
        )
        .agg(
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("revenue"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# Incremental materialized-rollup maintenance
# ---------------------------------------------------------------------------


@register(
    "q_incremental_rollup",
    oracle=f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           COUNT(*) AS n_orders,
           {_dsum_sql('o_totalprice')} AS revenue
    FROM orders
    GROUP BY month
    ORDER BY month
    """,
)
def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a materialized monthly rollup: the
    'existing' rollup (orders with o_orderkey % 10 != 0, standing in
    for yesterday's materialization) is merged with the rollup of just
    the delta batch (o_orderkey % 10 = 0) via a full-outer key merge —
    counts add, decimal-exact revenues add.  The oracle is the full
    recompute, so the gate proves merge(base, delta) == recompute —
    the algebraic property incremental view maintenance rests on.

    Scale: the whole point at 100 TB — the delta rollup touches only
    the new partition's rows and the merge shuffles |months| rows, so
    refreshing the view costs O(delta), not O(history).  Works for
    any commutative-monoid aggregate (count/sum/min/max/HLL — see
    q_hll_merge_rollup for the sketch version)."""
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        "o_totalprice",
    )

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy("month").agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev_d"),
        )

    base = rollup(orders.filter(F.col("o_orderkey") % 10 != 0))
    delta = rollup(orders.filter(F.col("o_orderkey") % 10 == 0))
    b, d = base.alias("b"), delta.alias("d")
    return (
        b.join(d, "month", "full_outer")
        .select(
            "month",
            (
                F.coalesce(F.col("b.n_orders"), F.lit(0))
                + F.coalesce(F.col("d.n_orders"), F.lit(0))
            ).alias("n_orders"),
            (
                F.coalesce(F.col("b.rev_d"), F.lit(0).cast("decimal(18,6)"))
                + F.coalesce(F.col("d.rev_d"), F.lit(0).cast("decimal(18,6)"))
            )
            .cast("decimal(18,6)")
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# A/B experiment readout (Welch's t)
# ---------------------------------------------------------------------------


@register(
    "q_ab_experiment",
    oracle="""
    WITH assigned AS (
      SELECT CASE WHEN STRPOS('0123456789abcdef',
                       SUBSTR(MD5(CAST(o_custkey AS VARCHAR)), 1, 1)) - 1 < 8
                  THEN 'A' ELSE 'B' END AS arm,
             o_totalprice AS y
      FROM orders
    ),
    s AS (
      SELECT arm,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(y * y AS DECIMAL(22,6))) AS DOUBLE) AS syy
      FROM assigned GROUP BY arm
    ),
    w AS (
      SELECT MAX(CASE WHEN arm = 'A' THEN n END) AS na,
             MAX(CASE WHEN arm = 'A' THEN sy END) AS sya,
             MAX(CASE WHEN arm = 'A' THEN syy END) AS syya,
             MAX(CASE WHEN arm = 'B' THEN n END) AS nb,
             MAX(CASE WHEN arm = 'B' THEN sy END) AS syb,
             MAX(CASE WHEN arm = 'B' THEN syy END) AS syyb
      FROM s
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           ROUND(sya / na, 6) AS mean_a,
           ROUND(syb / nb, 6) AS mean_b,
           CASE WHEN ((syya / na - (sya / na) * (sya / na)) / na
                      + (syyb / nb - (syb / nb) * (syb / nb)) / nb) > 0
                THEN ROUND((sya / na - syb / nb)
                     / SQRT((syya / na - (sya / na) * (sya / na)) / na
                            + (syyb / nb - (syb / nb) * (syb / nb)) / nb), 6)
           END AS t_stat
    FROM w
    """,
)
def q_ab_experiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: customers assign to arms by md5 parity
    (deterministic, never rand() — membership survives reruns); per
    arm, n / mean / Welch's t-statistic for the order-value metric,
    all from decimal-exact sufficient statistics (Σy, Σy²) with the
    final arithmetic in double, identical operation order on both
    engines.  Degenerate corpora (an empty arm, or two zero-variance
    arms) yield a NULL t_stat on BOTH engines — the t-statistic is
    undefined there, and an explicit ``> 0`` guard on the pooled
    variance keeps Spark and DuckDB from disagreeing about 1/0.

    Scale: the experiment readout over 100 TB is TWO numbers per arm
    shuffled (map-side-combinable sums); assignment is a stateless
    hash — no assignment table to join, no skew (md5 is uniform)."""
    orders = table(spark, sf_dir, "orders")
    nib = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("o_custkey").cast("string").cast("binary")), 1, 1),
        )
        - 1
    )
    assigned = orders.select(
        F.when(nib < 8, "A").otherwise("B").alias("arm"),
        F.col("o_totalprice").alias("y"),
    )
    s = assigned.groupBy("arm").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("y").cast("decimal(18,6)")).cast("double").alias("sy"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(22,6)"))
        .cast("double")
        .alias("syy"),
    )
    w = s.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("sy"))).alias("sya"),
        F.max(F.when(F.col("arm") == "A", F.col("syy"))).alias("syya"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("sy"))).alias("syb"),
        F.max(F.when(F.col("arm") == "B", F.col("syy"))).alias("syyb"),
    )
    ma = F.col("sya") / F.col("na")
    mb = F.col("syb") / F.col("nb")
    va = (F.col("syya") / F.col("na") - ma * ma) / F.col("na")
    vb = (F.col("syyb") / F.col("nb") - mb * mb) / F.col("nb")
    return w.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.when(
            va + vb > 0, F.round((ma - mb) / F.sqrt(va + vb), 6)
        ).alias("t_stat"),
    )


# ---------------------------------------------------------------------------
# k-anonymity audit (data-governance gate)
# ---------------------------------------------------------------------------

K_ANON = 5


@register(
    "q_k_anonymity",
    oracle=f"""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS group_size
      FROM customer
      GROUP BY c_nationkey, c_mktsegment
    )
    SELECT c_nationkey, c_mktsegment, group_size
    FROM g WHERE group_size < {K_ANON}
    ORDER BY c_nationkey, c_mktsegment
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the (nation, market-segment) quasi-
    identifier pair: emit every equivalence class smaller than
    k={K_ANON} — the rows a release would have to suppress or
    generalize before publication.  The governance gate a training-
    data pipeline runs before any customer-derived dataset ships.

    Scale: one map-side-combinable aggregation on the quasi-identifier
    key; the audit output is bounded by the (tiny) violating-class
    count, never the table.  Wider quasi-identifier sets are the same
    plan with a longer grouping key (or a grouping-sets lattice — see
    q_grouping_sets_lattice — to audit every subset at once)."""
    cust = table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("group_size"))
        .filter(F.col("group_size") < K_ANON)
        .orderBy("c_nationkey", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Join-key skew diagnostic (Gini over per-key counts)
# ---------------------------------------------------------------------------


@register(
    "q_skew_report",
    oracle="""
    WITH k AS (
      SELECT 'lineitem.l_orderkey' AS key_name, l_orderkey AS k FROM lineitem
      UNION ALL
      SELECT 'events.user_id', user_id FROM events
    ),
    cnt AS (SELECT key_name, k, COUNT(*) AS c FROM k GROUP BY key_name, k),
    ranked AS (
      SELECT key_name, c,
             ROW_NUMBER() OVER (PARTITION BY key_name ORDER BY c, k) AS i,
             COUNT(*) OVER (PARTITION BY key_name) AS n,
             SUM(c) OVER (PARTITION BY key_name) AS tot
      FROM cnt
    )
    SELECT key_name,
           CAST(MAX(n) AS BIGINT) AS n_keys,
           CAST(MAX(tot) AS BIGINT) AS n_rows,
           MAX(c) AS max_key_rows,
           ROUND(2.0 * SUM(CAST(i AS DOUBLE) * c) / (MAX(n) * MAX(tot))
                 - (MAX(n) + 1.0) / MAX(n), 6) AS gini
    FROM ranked
    GROUP BY key_name
    ORDER BY key_name
    """,
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: the Gini coefficient of per-key row
    counts for the two workhorse shuffle keys (lineitem.l_orderkey,
    events.user_id) — 0 is perfectly uniform, near 1 means a few hot
    keys own the table and the join needs salting/AQE (see
    operators/skew.py).  The readout an ops team checks BEFORE a
    100 TB shuffle, not after it stragglers.

    Scale: per-key counts are one map-side-combinable aggregation; the
    Gini rank-sum runs over |keys| rows (the rollup, not the table)
    with deterministic (count, key) ordering; the final reduction is
    one row per audited key."""
    li = table(spark, sf_dir, "lineitem").select(
        F.lit("lineitem.l_orderkey").alias("key_name"),
        F.col("l_orderkey").alias("k"),
    )
    ev = events_table(spark, sf_dir).select(
        F.lit("events.user_id").alias("key_name"),
        F.col("user_id").alias("k"),
    )
    cnt = li.unionByName(ev).groupBy("key_name", "k").agg(
        F.count("*").alias("c")
    )
    w = Window.partitionBy("key_name").orderBy("c", "k")
    wp = Window.partitionBy("key_name")
    ranked = cnt.select(
        "key_name",
        "c",
        F.row_number().over(w).alias("i"),
        F.count("*").over(wp).alias("n"),
        F.sum("c").over(wp).alias("tot"),
    )
    return (
        ranked.groupBy("key_name")
        .agg(
            F.max("n").cast("bigint").alias("n_keys"),
            F.max("tot").cast("bigint").alias("n_rows"),
            F.max("c").alias("max_key_rows"),
            F.round(
                F.lit(2.0)
                * F.sum(F.col("i").cast("double") * F.col("c"))
                / (F.max("n") * F.max("tot"))
                - (F.max("n") + F.lit(1.0)) / F.max("n"),
                6,
            ).alias("gini"),
        )
        .orderBy("key_name")
    )
