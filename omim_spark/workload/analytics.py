"""Analytics-tier workload: multi-level aggregation and user-journey ops.

Rounds out the A/O operator tiers (SURVEY.md §2) beyond plain
group-by: GROUPING SETS lattices, histogram bucketing, funnel
conversion, and cohort retention — the reporting queries a
training-data pipeline runs over its event/telemetry tables.  Each is
expressed so the heavy lifting is one keyed shuffle (or none), the
shape that survives a 1000-executor 100 TB run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.profile import profile
from .registry import events_table, register, table
from .relational import _dsum_sql, dsum


@register(
    "q_grouping_sets_lattice",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
           COUNT(*) AS n_orders,
           {total}
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority), ())
    ORDER BY gid, status, priority
    """.format(total=_dsum_sql("o_totalprice") + " AS total_price"),
)
def q_grouping_sets_lattice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-tier lattice aggregation: GROUPING SETS over (status, priority)
    — the general form of q_rollup_acctbal's ROLLUP.  Spark expands the
    lattice in a single Expand+HashAggregate pass (one shuffle total,
    partials map-side), so the 4-cuboid answer costs the same shuffle
    as a plain group-by; gid disambiguates subtotal rows exactly as the
    SQL-standard GROUPING bit vector (first column = MSB, identical in
    DuckDB)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [
                ["o_orderstatus", "o_orderpriority"],
                ["o_orderstatus"],
                ["o_orderpriority"],
                [],
            ],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "n_orders",
            "total_price",
        )
        .orderBy("gid", "status", "priority")
    )


# Fixed histogram grid over c_acctbal (TPC-H domain [-999.99, 9999.99]).
# The bucket expression is written IDENTICALLY on both engines so the
# double arithmetic rounds identically; it is what width_bucket(v,
# -1000.0, 10000.0, 11) computes, spelled out because DuckDB lacks
# width_bucket.
_HIST_LO, _HIST_STEP, _HIST_N = -1000.0, 1000.0, 11


@register(
    "q_histogram_acctbal",
    oracle=f"""
    SELECT bucket,
           CAST({_HIST_LO} + bucket * {_HIST_STEP} AS DOUBLE) AS bucket_lo,
           COUNT(*) AS n_customers,
           {_dsum_sql('c_acctbal')} AS bal_sum
    FROM (
      SELECT c_acctbal,
             CAST(FLOOR((c_acctbal - {_HIST_LO}) / {_HIST_STEP}) AS INT) AS bucket
      FROM customer
    )
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def q_histogram_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram bucketing (A-tier): fixed-width binning of a numeric
    column entirely in JVM expressions — floor((v-lo)/step) — followed
    by a tiny (≤ n_buckets keys) aggregation.  At 100 TB this is a
    map-side-combine count whose shuffle carries at most n_buckets rows
    per task, i.e. effectively free; no sampling or approx sketch
    needed for a fixed grid."""
    c = table(spark, sf_dir, "customer")
    bucket = F.floor((F.col("c_acctbal") - F.lit(_HIST_LO)) / F.lit(_HIST_STEP)).cast(
        "int"
    )
    return (
        c.select(F.col("c_acctbal"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_customers"),
            dsum(F.col("c_acctbal")).alias("bal_sum"),
        )
        .select(
            "bucket",
            (F.lit(_HIST_LO) + F.col("bucket") * F.lit(_HIST_STEP)).alias("bucket_lo"),
            "n_customers",
            "bal_sum",
        )
        .orderBy("bucket")
    )


@register(
    "q_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click,
           (SELECT COUNT(*) FROM p) AS n_purchase
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view -> click -> purchase) in ONE
    shuffle: group events by user, array_sort the (ts, type) structs,
    and walk the funnel with F.aggregate carrying a (t1, t2, t3) state
    struct — each stage latches the first qualifying event strictly
    after the previous stage.  The naive formulation (the oracle's
    3-level self-join cascade) shuffles the events table three times;
    at 100 TB the single groupBy(user_id) + JVM array fold is the only
    viable plan, and per-user event counts bound the array size.
    Same-timestamp ties are immune to sort order because stage k
    requires ts strictly greater than stage k-1."""
    e = events_table(spark, sf_dir).filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    per_user = e.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "event_type"))).alias("evs")
    )
    init = F.struct(
        F.lit(None).cast("timestamp").alias("t1"),
        F.lit(None).cast("timestamp").alias("t2"),
        F.lit(None).cast("timestamp").alias("t3"),
    )

    def step(acc, ev):
        ts, et = ev["ts"], ev["event_type"]
        return F.struct(
            F.when(acc["t1"].isNull() & (et == F.lit("view")), ts)
            .otherwise(acc["t1"])
            .alias("t1"),
            F.when(
                acc["t2"].isNull()
                & acc["t1"].isNotNull()
                & (et == F.lit("click"))
                & (ts > acc["t1"]),
                ts,
            )
            .otherwise(acc["t2"])
            .alias("t2"),
            F.when(
                acc["t3"].isNull()
                & acc["t2"].isNotNull()
                & (et == F.lit("purchase"))
                & (ts > acc["t2"]),
                ts,
            )
            .otherwise(acc["t3"])
            .alias("t3"),
        )

    walked = per_user.select(F.aggregate("evs", init, step).alias("s"))
    return walked.agg(
        F.count(F.col("s.t1")).alias("n_view"),
        F.count(F.col("s.t2")).alias("n_click"),
        F.count(F.col("s.t3")).alias("n_purchase"),
    )


@register(
    "q_cohort_retention",
    oracle="""
    WITH cohort AS (
      SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS cohort_week
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, DATE_TRUNC('week', ts) AS act_week
      FROM events
    )
    SELECT c.cohort_week,
           CAST(DATE_DIFF('day', c.cohort_week, a.act_week) // 7 AS INT)
             AS week_offset,
           COUNT(*) AS n_users
    FROM cohort c JOIN activity a ON c.user_id = a.user_id
    WHERE a.act_week >= c.cohort_week
    GROUP BY c.cohort_week, week_offset
    ORDER BY c.cohort_week, week_offset
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by signup week, counted
    in each subsequent activity week.  The oracle's natural shape
    (aggregate signups, DISTINCT activity weeks, join on user) costs
    three shuffles because DISTINCT partitions on (user, week), not
    user; instead we compute BOTH the cohort week (min over a
    conditional) and the distinct activity weeks (collect_set, bounded
    by the calendar, ~tens of entries) in ONE groupBy(user_id) pass,
    then explode — one wide shuffle plus a tiny final rollup.  Week
    buckets are Monday-truncated in both engines (date_trunc 'week');
    offsets divide an exact multiple of 7 days, so the division is
    exact cross-engine."""
    e = events_table(spark, sf_dir)
    week = F.to_date(F.date_trunc("week", F.col("ts")))
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.to_date(
                F.date_trunc(
                    "week",
                    F.min(F.when(F.col("event_type") == "signup", F.col("ts"))),
                )
            ).alias("cohort_week"),
            F.collect_set(week).alias("weeks"),
        )
        .filter(F.col("cohort_week").isNotNull())
    )
    return (
        per_user.select("cohort_week", F.explode("weeks").alias("act_week"))
        .filter(F.col("act_week") >= F.col("cohort_week"))
        .select(
            "cohort_week",
            (F.datediff("act_week", "cohort_week") / F.lit(7))
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


_PROFILE_COLS = (
    "c_custkey",
    "c_name",
    "c_nationkey",
    "c_acctbal",
    "c_mktsegment",
)


@register(
    "q_profile_table",
    oracle="""
    SELECT * FROM (
    {unions}
    ) ORDER BY column_name
    """.format(
        unions="\n    UNION ALL\n".join(
            f"""
    SELECT '{c}' AS column_name,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT({c}) AS n_nulls,
           COUNT(DISTINCT {c}) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_str,
           CAST(MAX({c}) AS VARCHAR) AS max_str
    FROM customer"""
            for c in _PROFILE_COLS
        )
    ),
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of a whole table in ONE aggregation pass
    (operators/profile.py): null counts, exact cardinalities, and
    min/max per column, unpivoted to long form.  The oracle replays it
    as one scan per column (UNION ALL) — the shape Spark's Expand
    plan makes unnecessary: at 100 TB the single-scan difference is
    5x the I/O.  Exact COUNT(DISTINCT) keeps it oracle-checkable;
    profile(approx=True) is the HLL variant for full-scale runs."""
    c = table(spark, sf_dir, "customer")
    return profile(c, _PROFILE_COLS).orderBy("column_name")
