"""Subquery-shaped relational coverage: EXISTS / NOT EXISTS, IN,
scalar subqueries, correlated aggregates, HAVING — the decorrelation
surface of Catalyst.

Every query here is ONE ANSI SQL string executed verbatim by BOTH
engines (Spark SQL over registered temp views; DuckDB over the same
parquet views) — dialect-free parity, no translation layer at all.

Scale notes: Catalyst rewrites each correlated subquery below into a
join (left-semi / left-anti / aggregated-then-joined); `.explain`
confirms no per-row subquery execution survives — these are the plans
a 100 TB deployment wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import QUERIES, QueryDef, events_table, table

_BASE_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "embeddings",
]


def _register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in _BASE_TABLES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    events_table(spark, sf_dir).createOrReplaceTempView("events")


def sql_query(name: str, sql: str, headline: bool = False) -> None:
    """Register a query whose Spark plan and DuckDB oracle are the
    SAME SQL text."""

    def fn(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        _register_views(spark, sf_dir)
        return spark.sql(_sql)

    fn.__name__ = name
    QUERIES[name] = QueryDef(name=name, fn=fn, oracle=sql, headline=headline)


DSUM = "CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


sql_query(
    "q04_exists_priority",
    f"""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_discount > 0.09
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)

sql_query(
    "q12_case_agg_shipmode",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)

sql_query(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)

sql_query(
    "q14_promo_share",
    f"""
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'ECONOMY'
                     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                     ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
           AS promo_revenue_pct,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)

sql_query(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {DSUM.format(expr='l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)

sql_query(
    "q16_parts_suppliers",
    """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 2, 3, 4, 5)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)

sql_query(
    "q17_small_quantity_revenue",
    f"""
    SELECT {DSUM.format(expr='l_extendedprice')} / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (
        SELECT 0.5 * AVG(l_quantity) FROM lineitem li2
        WHERE li2.l_partkey = lineitem.l_partkey
      )
    """,
)

sql_query(
    "q18_large_orders",
    f"""
    SELECT c_name, c_custkey, o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
           {DSUM.format(expr='l_quantity')} AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    GROUP BY c_name, c_custkey, o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
    ORDER BY price DESC, o_orderkey
    LIMIT 20
    """,
)

sql_query(
    "q19_disjunctive_predicates",
    f"""
    SELECT {DSUM.format(expr='l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_type = 'STANDARD' AND l_quantity >= 40)
    """,
)

sql_query(
    "q21_exists_not_exists",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      )
    ORDER BY c_custkey
    """,
)

sql_query(
    "q20_dominant_supplier",
    """
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l1.l_suppkey
      FROM lineitem l1
      WHERE l1.l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'
        )
        AND l1.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l1.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l1.l_suppkey, l1.l_partkey
      HAVING SUM(CAST(l1.l_quantity AS DECIMAL(18,6))) > 0.5 * (
        SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,6)))
        FROM lineitem l2
        WHERE l2.l_partkey = l1.l_partkey
          AND l2.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l2.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      )
    )
    ORDER BY s_name
    """,
)

sql_query(
    "q22_global_avg_balance",
    """
    SELECT c_mktsegment, COUNT(*) AS n_rich_inactive,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 250000)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)

sql_query(
    "q07_nation_trade",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           {DSUM.format(expr='volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)

sql_query(
    "q11_important_stock",
    f"""
    WITH value_by_part AS (
      SELECT l_partkey,
             {DSUM.format(expr='l_extendedprice * l_quantity')} AS part_value
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_2'
      GROUP BY l_partkey
    )
    SELECT l_partkey, part_value
    FROM value_by_part
    WHERE part_value > (SELECT SUM(part_value) * 0.002 FROM value_by_part)
    ORDER BY part_value DESC, l_partkey
    """,
)

sql_query(
    "q02_min_cost_supplier",
    """
    SELECT p_partkey, p_name, s_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS volume
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE p_size <= 3
      AND l_extendedprice = (
        SELECT MIN(l_extendedprice) FROM lineitem li2
        WHERE li2.l_partkey = part.p_partkey
      )
    GROUP BY p_partkey, p_name, s_name
    ORDER BY p_partkey, s_name
    """,
)

sql_query(
    "q08_market_share",
    """
    WITH volumes AS (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
           COUNT(*) AS n_lines
    FROM volumes
    GROUP BY o_year
    ORDER BY o_year
    """,
)

sql_query(
    "q09_product_profit",
    """
    SELECT n_name AS nation,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         - 0.8 * p_retailprice * l_quantity
                         AS DECIMAL(18,6))) AS DOUBLE) AS amount
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER)
    ORDER BY nation, o_year
    """,
)

sql_query(
    "q_event_islands_rle",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS grp
      FROM events
    ),
    islands AS (
      SELECT user_id, event_type, grp, COUNT(*) AS run_len
      FROM seq GROUP BY user_id, event_type, grp
    )
    SELECT user_id, event_type, COUNT(*) AS n_runs, MAX(run_len) AS max_run,
           CAST(SUM(run_len) AS BIGINT) AS n_events
    FROM islands GROUP BY user_id, event_type
    ORDER BY user_id, event_type
    """,
)

sql_query(
    "q_scd2_priority_intervals",
    """
    WITH h AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             LAG(o_orderpriority) OVER w AS prev_p,
             ROW_NUMBER() OVER w AS rn
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    changes AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
      FROM h WHERE rn = 1 OR o_orderpriority <> prev_p
    )
    SELECT o_custkey, o_orderpriority,
           CAST(CAST(o_orderdate AS DATE) AS STRING) AS valid_from,
           CAST(CAST(LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS DATE) AS STRING)
             AS valid_to
    FROM changes
    ORDER BY o_custkey, valid_from, o_orderpriority
    """,
)

sql_query(
    "q_median_doc_stats",
    """
    SELECT source,
           MEDIAN(n_chars) AS median_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)

sql_query(
    "q_window_zoo",
    """
    SELECT c_custkey,
           c_mktsegment,
           NTILE(4) OVER w AS quartile,
           CAST(PERCENT_RANK() OVER w AS DOUBLE) AS pr,
           CAST(CUME_DIST() OVER w AS DOUBLE) AS cd,
           FIRST_VALUE(c_custkey) OVER w AS seg_min_cust,
           NTH_VALUE(c_custkey, 2) OVER (PARTITION BY c_mktsegment
               ORDER BY c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS seg_second_cust,
           LEAD(c_custkey, 2) OVER w AS cust_plus2
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_custkey)
    ORDER BY c_custkey
    """,
)

sql_query(
    "q_null_semantics",
    """
    WITH t AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_orderpriority END AS p,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL
                  ELSE o_totalprice END AS v
      FROM orders
    )
    SELECT p IS NOT DISTINCT FROM '1-URGENT' AS is_urgent,
           COALESCE(p, 'missing') AS p_filled,
           COUNT(*) AS n,
           COUNT(v) AS n_nonnull,
           CAST(SUM(CAST(COALESCE(v, 0) AS DECIMAL(18,6))) AS DOUBLE)
             AS total_filled,
           MIN(NULLIF(p, '5-LOW')) AS min_not_low
    FROM t
    GROUP BY 1, 2
    ORDER BY is_urgent, p_filled
    """,
)
