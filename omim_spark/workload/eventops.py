"""Event-stream operators over the ``events`` table: tumbling-window
rollups, gap-based sessionization, JSON prop extraction, and a
per-user activity pivot.

These are the batch twins of the Structured Streaming operators in
``omim_spark.streaming`` — same logical windows, so a job can be
validated in batch and deployed streaming (the reference is pure
batch, SURVEY §2.8; the streaming tier is an engine extension).

Timestamps are compared in integer microseconds (unix_micros /
epoch_us) — never float seconds — so window and session boundaries are
bit-identical across engines and at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import events_table, register, register_bench_only, spread
from .relational import dsum, _dsum_sql

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


@register(
    "q_events_hourly",
    oracle=f"""
    SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:00') AS hour,
           event_type,
           COUNT(*) AS n_events,
           {_dsum_sql('value')} AS total_value,
           COUNT(DISTINCT user_id) AS n_users,
           TRUE AS approx_users_ok
    FROM events
    GROUP BY 1, 2
    ORDER BY hour, event_type
    """,
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup (hourly) with both distinct-count
    flavors — the batch form of a Structured Streaming windowed
    aggregation.

    The HLL sketch (approx_count_distinct, rsd=0.02 → 4096 registers;
    0.01 quadruples sketch state across the ~3.4k (hour,type) groups
    for no contract benefit) is the 100 TB shape: one pass, fixed
    memory, map-side-combinable where exact COUNT(DISTINCT) needs a
    distinct expansion.  Its estimate is engine-specific, so the
    hash-matchable contract emits the EXACT count plus a
    Spark-computed boolean `approx_users_ok` (|approx−exact| ≤
    5%·exact); the oracle emits the exact count and literal TRUE.
    Spark's HLL is deterministic, so the boolean is stable on the gate
    data (verified at sf0.001/0.01/0.1).  At 100 TB a user drops the
    exact column and keeps the sketch.

    Tolerance is `greatest(5%·exact, 5)`: a pure-relative bound is
    meaningless for tiny groups (an 8-user hour fails 5% on a ±1
    sketch deviation), so small groups get an absolute ±5 floor — the
    standard combined abs/rel error contract."""
    ev = events_table(spark, sf_dir)
    # Two-level aggregation instead of a mixed distinct/non-distinct
    # agg: level 1 pre-aggregates per (hour, type, user) — map-side
    # combinable, no Expand duplication — then level 2 gets the exact
    # distinct as a plain count(*), the decimal partials re-summed
    # (associative, so bit-identical to the one-level sum), and the
    # HLL built over the already-deduplicated users (identical
    # registers — the sketch is a set function).  Measured 2.2× faster
    # than the countDistinct form at sf0.1.
    l1 = ev.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour"),
        "event_type",
        "user_id",
    ).agg(
        F.count("*").alias("_n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("_pv"),
    )
    return (
        l1.groupBy("hour", "event_type")
        .agg(
            F.sum("_n").alias("n_events"),
            F.sum("_pv").cast("double").alias("total_value"),
            F.count("*").alias("n_users"),
            F.approx_count_distinct("user_id", 0.02).alias("_approx_users"),
        )
        .select(
            "hour",
            "event_type",
            "n_events",
            "total_value",
            "n_users",
            (
                F.abs(F.col("_approx_users") - F.col("n_users"))
                <= F.greatest(0.05 * F.col("n_users"), F.lit(5.0))
            ).alias("approx_users_ok"),
        )
        .orderBy("hour", "event_type")
    )


@register_bench_only("q_events_hourly_hll")
def q_events_hourly_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of the hourly rollup: ONE map-side-combinable
    aggregation — count, decimal sum, HLL sketch (rsd=0.02, 4096
    registers) — with no exact COUNT(DISTINCT) anywhere in the plan
    (no Expand, no per-user pre-aggregation level; partial sketches
    merge in the combiner).  This is what a metrics pipeline runs
    continuously.

    BENCH-ONLY since round 10 (r9 VERDICT #4): the raw HLL estimate is
    engine-specific, so this output can never hash-match DuckDB — it
    was the registry's one permanent rows-only row.  It now lives
    outside the driver gate so the headline bench keeps tracking the
    production sketch-merge plan, while its exactness witness is the
    hash-gated sibling q_events_hourly (same grouping, exact distinct
    + tolerance boolean proving the sketch) and the plan shape stays
    pinned by tools/explain_audit.py (no Expand, 4-column scan)."""
    ev = events_table(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_format(
                F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00"
            ).alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        )
        .orderBy("hour", "event_type")
    )


@register(
    "q_sessionize",
    headline=True,
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
             EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER w AS gap_us,
             EPOCH_US(ts) AS ts_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    flagged AS (
      SELECT user_id, ts_us, value,
             SUM(CASE WHEN gap_us IS NULL OR gap_us > {SESSION_GAP_US}
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           (MAX(ts_us) - MIN(ts_us)) // 1000000 AS duration_s,
           {_dsum_sql('value')} AS session_value
    FROM flagged
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + running
    sum — the batch twin of a session window in Structured Streaming.

    Scale: one shuffle on user_id; each user's events sort locally
    within the window — per-user cardinality bounds the sort, and a
    hot user is the skew case AQE handles."""
    ev = spread(
        events_table(spark, sf_dir).select(
            "user_id", "event_id", "value", F.unix_micros("ts").alias("ts_us")
        ),
        sf_dir,
        "events",
        "user_id",
    )
    w_lag = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = (
        ev.withColumn("gap_us", F.col("ts_us") - F.lag("ts_us").over(w_lag))
        .withColumn(
            "new_sess",
            F.when(
                F.col("gap_us").isNull() | (F.col("gap_us") > SESSION_GAP_US), 1
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_sess").over(w_run))
    )
    return (
        flagged.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            ((F.max("ts_us") - F.min("ts_us")) / 1_000_000)
            .cast("long")
            .alias("duration_s"),
            dsum(F.col("value")).alias("session_value"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "q_json_props",
    oracle=f"""
    SELECT event_type,
           CAST(SUM(CAST(REGEXP_EXTRACT(props, '"k":\\s*(\\d+)', 1) AS BIGINT))
                AS BIGINT) AS k_total,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured prop extraction from the JSON ``props`` column
    (reference parses nested API JSON, omim_entry_parser.py:386-422;
    at scale prefer from_json with an explicit schema — here a regexp
    keeps the oracle engine-neutral)."""
    ev = events_table(spark, sf_dir)
    k = F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("k_total"), F.count("*").alias("n"))
        .orderBy("event_type")
    )


@register(
    "q_user_activity_pivot",
    oracle="""
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'click'    THEN 1 END) AS clicks,
           COUNT(CASE WHEN event_type = 'view'     THEN 1 END) AS views,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
           COUNT(CASE WHEN event_type = 'signup'   THEN 1 END) AS signups,
           COUNT(CASE WHEN event_type = 'error'    THEN 1 END) AS errors
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_user_activity_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity pivot (fixed column set → single-pass
    conditional aggregation; with a dynamic set use df.pivot, which
    plans the same conditional aggs after a values scan)."""
    ev = events_table(spark, sf_dir)

    def cnt(t: str, alias: str):
        return F.count(F.when(F.col("event_type") == t, 1)).alias(alias)

    return (
        ev.groupBy("user_id")
        .agg(
            cnt("click", "clicks"),
            cnt("view", "views"),
            cnt("purchase", "purchases"),
            cnt("signup", "signups"),
            cnt("error", "errors"),
        )
        .orderBy("user_id")
    )


@register(
    "q_events_sliding_window",
    oracle=f"""
    WITH slid AS (
      SELECT event_type, value,
             -- MAKE_TIMESTAMP(us) yields a PLAIN timestamp; TO_TIMESTAMP
             -- returns TIMESTAMPTZ, which STRFTIME would render in the
             -- SYSTEM zone — wrong whenever the host isn't UTC (the
             -- Spark side is session-pinned to UTC by events_table)
             MAKE_TIMESTAMP((EPOCH_US(ts) // 1800000000 + s) * 1800000000)
               AS w_start
      FROM events
      CROSS JOIN (SELECT UNNEST([0, -1]) AS s)
    )
    SELECT STRFTIME(w_start, '%Y-%m-%d %H:%M') AS window_start,
           event_type, COUNT(*) AS n_events,
           {_dsum_sql('value')} AS total_value
    FROM slid
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
)
def q_events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h length, 30min slide) per event type — each
    event lands in exactly two windows (F.window with slideDuration;
    the oracle reconstructs the window algebra by hand).

    Scale: window assignment is a per-row explode (×2), the aggregate
    is map-side-combinable on (window, type) — the standard streaming
    rollup shape, run here in batch."""
    ev = events_table(spark, sf_dir)
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "q_asof_click_purchase",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, ts, MAX(event_id) AS p_event_id,
             ARG_MAX(value, event_id) AS p_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    )
    SELECT c.event_id AS click_id, c.user_id,
           EPOCH_US(c.ts) AS click_ts_us,
           p.p_event_id AS purchase_id,
           p.p_value AS purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    ORDER BY click_id
    """,
)
def q_asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: each click annotated with the user's most
    recent purchase at-or-before the click.  The oracle is DuckDB's
    NATIVE ``ASOF JOIN``; the Spark side is the
    operators/asof.py:asof_join_backward composition — union both
    sides, one shuffle on user_id, one ordered window carrying the
    latest purchase payload forward.  Right side is pre-deduplicated
    per (user, ts) by max event_id so tie semantics are explicit.

    Scale: cost is ONE exchange on the key + per-key sort — no range
    join, no per-row subquery; 100 TB of events as-of-join at shuffle
    speed."""
    from omim_spark.operators.asof import asof_join_backward

    ev = events_table(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("p_event_id"),
            F.max_by("value", "event_id").alias("p_value"),
        )
    )
    joined = asof_join_backward(
        clicks,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=("p_event_id", "p_value"),
        tiebreak="p_event_id",
        prefix="",
    )
    return joined.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros("ts").alias("click_ts_us"),
        F.col("p_event_id").alias("purchase_id"),
        F.col("p_value").alias("purchase_value"),
    ).orderBy("click_id")


@register(
    "q_interval_join_attribution",
    oracle="""
    WITH clicks AS (
      SELECT event_id AS click_id, user_id, EPOCH_US(ts) AS ts_us
      FROM events WHERE event_type = 'click'
    ),
    windows AS (
      SELECT event_id AS purchase_id, user_id,
             EPOCH_US(ts) - 1800000000 AS lo_us,
             EPOCH_US(ts) AS hi_us
      FROM events WHERE event_type = 'purchase'
    )
    SELECT c.click_id, w.purchase_id, c.user_id,
           w.hi_us - c.ts_us AS lead_us
    FROM clicks c
    JOIN windows w
      ON c.user_id = w.user_id
     AND c.ts_us BETWEEN w.lo_us AND w.hi_us
    ORDER BY click_id, purchase_id
    """,
)
def q_interval_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval attribution join: every click falling in the
    30 minutes before a purchase by the same user (ad-attribution /
    conversion-window shape).  Spark-side this is
    operators/rangejoin.py:interval_join — the range predicate
    rewritten as an equi-join on 30-minute time buckets, so Catalyst
    plans a hash join instead of a BroadcastNestedLoop.

    Scale: shuffle carries |clicks| + 2x|purchases| rows keyed by
    (user, bucket); no cartesian anywhere; AQE can split hot users."""
    from omim_spark.operators.rangejoin import interval_join

    ev = events_table(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
    )
    half_hour_us = 30 * 60 * 1_000_000
    windows = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        (F.unix_micros("ts") - half_hour_us).alias("lo_us"),
        F.unix_micros("ts").alias("hi_us"),
    )
    joined = interval_join(
        clicks,
        windows,
        key="user_id",
        point_ts_us="ts_us",
        start_us="lo_us",
        end_us="hi_us",
        bucket_width_us=half_hour_us,
    )
    return joined.select(
        "click_id",
        "purchase_id",
        "user_id",
        (F.col("hi_us") - F.col("ts_us")).alias("lead_us"),
    ).orderBy("click_id", "purchase_id")


@register(
    "q_approx_distinct_sketch",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           COUNT(*) AS n_events,
           TRUE AS approx_within_5pct
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based aggregates under the hash gate: HLL estimates are
    engine-specific by design, so the contract emits only deterministic
    outputs — the exact distinct count plus a Spark-computed boolean
    `approx_within_5pct` (|approx−exact| ≤ 5%·exact, rsd=0.01); the
    oracle emits exact counts and literal TRUE.  At 100 TB the HLL
    needs one pass and fixed memory where COUNT(DISTINCT) needs a
    distinct expansion; the pytest tier additionally asserts the raw
    estimate's error on the driver tables."""
    ev = events_table(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.01).alias("_approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
            F.count("*").alias("n_events"),
        )
        .select(
            "event_type",
            "exact_users",
            "n_events",
            (
                F.abs(F.col("_approx_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("approx_within_5pct"),
        )
        .orderBy("event_type")
    )


GAPFILL_MIN_VALUE = 250.0  # rare-event filter => day-level gaps at every sf


@register(
    "q_gapfill_locf",
    oracle=f"""
    WITH e AS (SELECT * FROM events WHERE value > {GAPFILL_MIN_VALUE}),
    daily AS (
      SELECT event_type, DATE_TRUNC('day', ts) AS d,
             COUNT(*) AS n_events,
             {_dsum_sql('value')} AS day_value
      FROM e GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM daily),
    types AS (SELECT DISTINCT event_type FROM daily),
    spine AS (
      SELECT event_type, UNNEST(GENERATE_SERIES(mn, mx, INTERVAL 1 DAY)) AS d
      FROM types CROSS JOIN bounds
    ),
    j AS (
      SELECT s.event_type, s.d, daily.n_events, daily.day_value
      FROM spine s
      LEFT JOIN daily ON s.event_type = daily.event_type AND s.d = daily.d
    )
    SELECT event_type, STRFTIME(d, '%Y-%m-%d') AS day,
           COALESCE(n_events, 0) AS n_events,
           day_value IS NULL AS is_gap,
           LAST_VALUE(day_value IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM j
    ORDER BY event_type, day
    """,
)
def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill: a dense daily spine per event_type
    (generated from broadcast global bounds) left-joined onto a sparse
    rare-event rollup, missing buckets carried forward with
    last-observation-carried-forward (timescaledb-style
    time_bucket_gapfill + locf, here as pure DataFrame ops:
    sequence/explode + last(ignorenulls) window).

    Scale: the LOCF window runs over the ROLLUP (|keys| × |buckets|
    rows — small by construction), never over raw events; the spine is
    |keys| × |days| generated map-side from a broadcast 1-row bounds
    frame, and the rare-event filter is pushed to the scan."""
    ev = events_table(spark, sf_dir).filter(F.col("value") > GAPFILL_MIN_VALUE)
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("d"), "event_type"
    ).agg(F.count("*").alias("n_events"), dsum(F.col("value")).alias("day_value"))
    # the three consumers (bounds, types, join) branch from the SAME
    # groupBy subtree: its exchange is computed once and reused at
    # runtime (ReusedExchange), so no checkpoint is needed and the
    # scan-level pushdown stays visible to the plan audit
    bounds = daily.agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
    types = daily.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 day"))).alias("d"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["event_type", "d"], "left")
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.col("day_value").isNull().alias("is_gap"),
            F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "q_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ),
    margin AS (
      SELECT prev_type, CAST(SUM(n) AS BIGINT) AS n_from
      FROM trans GROUP BY prev_type
    )
    SELECT prev_type, next_type, n, n_from,
           CAST(n AS DOUBLE) / n_from AS p_next
    FROM trans JOIN margin USING (prev_type)
    ORDER BY prev_type, next_type
    """,
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current) — the temporal analogue of
    the bigram LM (corpusstats.py), used for funnel design and
    session-behavior drift monitoring.

    Scale: one shuffle on user_id for the lag window (per-user local
    sort, the same shape q_sessionize proves); the transition count is
    map-side combinable to |types|² rows and the row margin derives
    from the aggregated matrix, not a second pass.  p_next is an
    int/int IEEE division — deterministic across engines."""
    ev = events_table(spark, sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w))
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    margin = trans.groupBy("prev_type").agg(F.sum("n").alias("n_from"))
    return (
        trans.join(F.broadcast(margin), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            "n_from",
            (F.col("n").cast("double") / F.col("n_from")).alias("p_next"),
        )
        .orderBy("prev_type", "next_type")
    )


@register(
    "q_trending_rank_delta",
    oracle="""
    WITH daily AS (
      SELECT DATE_TRUNC('day', ts) AS d, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT d, event_type, n,
             CAST(RANK() OVER (PARTITION BY d ORDER BY n DESC, event_type)
                  AS INT) AS rnk
      FROM daily
    ),
    lagged AS (
      SELECT d, event_type, n, rnk,
             CAST(LAG(rnk) OVER (PARTITION BY event_type ORDER BY d) AS INT)
               AS prev_rnk
      FROM ranked
    )
    SELECT STRFTIME(d, '%Y-%m-%d') AS day, event_type, n, rnk,
           prev_rnk,
           prev_rnk - rnk AS rank_delta
    FROM lagged
    WHERE rnk <= 3
    ORDER BY day, rnk, event_type
    """,
)
def q_trending_rank_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending detection: daily top-3 event types with their rank
    movement vs the previous day (positive delta = climbing) — the
    leaderboard-drift query a monitoring pipeline runs over rollups.
    Two stacked windows over the AGGREGATE (rank within day, lag of
    that rank within type), never over raw events.

    Scale: the only full-data pass is the map-side-combinable daily
    count; both windows partition the tiny |days|×|types| rollup.
    (The top-3 filter cannot push into a WindowGroupLimit here by
    design: yesterday's rank must be computed for ALL types, else a
    type entering the top 3 would have no previous rank to diff
    against.)"""
    ev = events_table(spark, sf_dir)
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("d"), "event_type"
    ).agg(F.count("*").alias("n"))
    w_day = Window.partitionBy("d").orderBy(F.desc("n"), "event_type")
    w_type = Window.partitionBy("event_type").orderBy("d")
    ranked = daily.withColumn("rnk", F.rank().over(w_day).cast("int")).withColumn(
        "prev_rnk", F.lag("rnk").over(w_type).cast("int")
    )
    return (
        ranked.filter(F.col("rnk") <= 3)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "event_type",
            "n",
            "rnk",
            "prev_rnk",
            (F.col("prev_rnk") - F.col("rnk")).alias("rank_delta"),
        )
        .orderBy("day", "rnk", "event_type")
    )


@register(
    "q_rolling_7day",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             DATE_DIFF('day', DATE '1970-01-01', CAST(DATE_TRUNC('day', ts) AS DATE))
               AS dayno,
             STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,6))) AS v
      FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type, day, n AS day_events,
           CAST(SUM(n) OVER w AS BIGINT) AS rolling_events,
           CAST(CAST(SUM(v) OVER w AS DECIMAL(18,6)) AS DOUBLE) AS rolling_value,
           CAST(COUNT(*) OVER w AS INT) AS days_in_window
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY dayno
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY event_type, day
    """,
)
def q_rolling_7day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day rolling aggregates via a TIME-RANGE window frame
    (RANGE BETWEEN 6 PRECEDING over the day number) — unlike a
    ROWS-frame, missing days correctly shrink the window, and unlike
    the hopping `F.window`, every day gets a full trailing view.  The
    moving-average shape of every metrics dashboard.

    Scale: the range frame runs over the daily ROLLUP (|days|×|types|
    rows), never raw events; the full-data pass is one
    map-side-combinable aggregation.  Decimal partials flow through
    the frame so the rolling sum is order-exact."""
    ev = events_table(spark, sf_dir)
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01").cast("date")).alias(
            "dayno"
        ),
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("v"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("dayno")
        .rangeBetween(-6, Window.currentRow)
    )
    return (
        daily.select(
            "event_type",
            "day",
            F.col("n").alias("day_events"),
            F.sum("n").over(w).cast("long").alias("rolling_events"),
            F.sum("v").over(w).cast("decimal(18,6)").cast("double").alias(
                "rolling_value"
            ),
            F.count("*").over(w).cast("int").alias("days_in_window"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# Event-sequence pattern matching (MATCH_RECOGNIZE-lite)
# ---------------------------------------------------------------------------


@register(
    "q_sequence_pattern",
    oracle="""
    WITH j AS (
      SELECT user_id,
             STRING_AGG(SUBSTR(event_type, 1, 1), ''
                        ORDER BY ts, event_id) AS journey
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT user_id,
             CASE WHEN REGEXP_MATCHES(journey, 'v.*c.*p')
                  THEN 1 ELSE 0 END AS hit
      FROM j
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(hit) AS BIGINT) AS n_matched,
           ROUND(CAST(SUM(hit) AS DOUBLE) / COUNT(*), 6) AS match_rate
    FROM m
    """,
)
def q_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern matching (the MATCH_RECOGNIZE shape):
    each user's journey is their event-type initials in strict
    (ts, event_id) order; count users whose journey matches
    view -> ... -> click -> ... -> purchase (regex ``v.*c.*p``).

    Scale: one shuffle on user_id; the journey builds as an in-group
    sort of an already-grouped collect (array_sort of structs — NO
    per-user window pass), and the regex runs once per USER, not per
    event.  Journeys are bounded by per-user event counts; a pattern
    needing only the last-k events would slice the array first."""
    ev = events_table(spark, sf_dir)
    j = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts"), F.col("event_id"),
                F.substring("event_type", 1, 1).alias("c"),
            ).alias("e"),
        )
        .groupBy("user_id")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(e)), x -> x.c), '')"
            ).alias("journey")
        )
    )
    hit = F.when(F.col("journey").rlike("v.*c.*p"), 1).otherwise(0)
    return j.select(hit.alias("hit")).agg(
        F.count("*").alias("n_users"),
        F.sum("hit").cast("bigint").alias("n_matched"),
        F.round(
            F.sum("hit").cast("double") / F.count("*"), 6
        ).alias("match_rate"),
    )


# ---------------------------------------------------------------------------
# Closed-form linear regression per group
# ---------------------------------------------------------------------------


@register(
    "q_linear_fit",
    oracle="""
    WITH pts AS (
      SELECT event_type,
             CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS x, value AS y
      FROM events
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(18,6))) AS DOUBLE) AS sxy
      FROM pts GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           ROUND((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0), 6)
             AS slope,
           ROUND((sy - (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0)
                  * sx) / n, 6)
             AS intercept
    FROM s ORDER BY event_type
    """,
)
def q_linear_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form per-group linear regression (value ~ hour-of-day
    per event_type): slope and intercept from the five sufficient
    statistics (n, Σx, Σx², Σy, Σxy), each an exact aggregate — the
    float sums go through DECIMAL(18,6) so partition order cannot
    change them, then the normal-equation arithmetic runs in double
    with an identical operation order on both engines.  A group with
    a single distinct x (zero x-variance) gets NULL slope/intercept on
    BOTH engines via an explicit nullif on the determinant.

    Scale: THE pattern for distributed ML-ish fitting — sufficient
    statistics are map-side-combinable (one shuffle of 5 numbers per
    group, regardless of row count); the solve is O(groups).  A
    multivariate fit ships X'X / X'y the same way."""
    ev = events_table(spark, sf_dir)
    pts = ev.select(
        "event_type",
        F.hour("ts").cast("bigint").alias("x"),
        F.col("value").alias("y"),
    )
    s = pts.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y").cast("decimal(18,6)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(18,6)"))
        .cast("double")
        .alias("sxy"),
    )
    # A group whose x has a single distinct value has zero x-variance
    # (n*sxx - sx^2 == 0 — EXACTLY zero: the sums are integer-exact in
    # double at any realistic row count); the fit is undefined there,
    # and nullif makes both engines agree on NULL instead of relying
    # on each one's divide-by-zero convention.
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.nullif(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)
    )
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Latest-record-per-key (the CDC compaction primitive)
# ---------------------------------------------------------------------------


@register(
    "q_latest_per_key",
    oracle="""
    SELECT user_id, STRFTIME(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           event_type, value
    FROM (
      SELECT user_id, ts, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rk
      FROM events
    )
    WHERE rk = 1
    ORDER BY user_id
    """,
)
def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-per-key (event_id breaks timestamp ties) — the
    CDC/changelog compaction primitive: collapsing an append-only
    update stream to current state is exactly this query, run at
    every materialization.

    Scale: one shuffle on the key; Spark turns the rk=1 filter into a
    per-partition WindowGroupLimit (top-1 retained during the sort,
    never the full per-key history buffered) — the same plan
    invariant pinned for q_rank_topk_per_group in
    tools/explain_audit.py."""
    ev = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            # Render JVM-side under the UTC session pin: a raw
            # TimestampType survives the plan TZ-correctly but
            # PySpark's row collection localizes it to the SYSTEM
            # zone — the one leak the session pin cannot cover
            # (caught by the r11 TZ=America/New_York full sweep).
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
            "event_type",
            "value",
        )
        .orderBy("user_id")
    )
