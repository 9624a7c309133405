"""Structured Streaming tier (engine extension — SURVEY §2.8: the
reference is pure batch; its weekly-cron incremental cache is the only
incremental pattern, kept batch in cache.py).

Each job here is the streaming twin of a batch operator in
``omim_spark.workload.eventops`` — same logical window semantics, so
results can be validated in batch and deployed streaming:

- hourly_rollup:   tumbling window + watermark (late data bounded).
- session_stats:   native session_window gap sessionization.
- upsert_stream:   foreachBatch micro-batch upsert into a parquet
                   cache — the streaming form of cache.upsert_cache
                   (J8), i.e. what the reference's weekly re-fetch
                   would look like as a live feed.

At scale: state store size is bounded by the watermark horizon ×
key cardinality; shuffle partitions size the state store shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_rollup(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour window per event_type: count + sum(value).
    Late rows beyond the watermark are dropped deterministically."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_stats(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows (gap-based) per user: the streaming twin
    of workload.eventops.q_sessionize."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "session_value"
            ),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def interval_join_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    max_lag: str = "6 hours",
    watermark: str = "48 hours",
) -> DataFrame:
    """Stream-stream inner interval join: each purchase joined to every
    click by the same user within ``max_lag`` before it.

    Both sides carry a watermark plus the time-range join condition, so
    Spark bounds each side's state buffer to the watermark + lag
    horizon — the state-store size is (horizon × per-user rate), not
    the stream length, which is what makes the join deployable 24/7.
    Inner-join rows emit as soon as both sides are present (the
    watermark gates state eviction, not emission)."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("amount"),
    ).withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        F.expr(
            f"""c_user = p_user
                AND purchase_ts >= click_ts
                AND purchase_ts <= click_ts + INTERVAL {max_lag}"""
        ),
        "inner",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (
            (F.unix_micros("purchase_ts") - F.unix_micros("click_ts"))
            / 1_000_000
        )
        .cast("long")
        .alias("lag_s"),
        "amount",
    )


def upsert_stream(
    events: DataFrame,
    cache_path: str,
    checkpoint: str,
    key: str = "user_id",
    order: tuple[str, ...] = ("ts", "event_id"),
) -> None:
    """foreachBatch micro-batch upsert into a parquet cache — the
    streaming form of ``cache.upsert_cache`` (J8): per micro-batch,
    pick each key's winner deterministically (max ``order`` tuple via
    row_number, so within-batch arrival order never matters), then
    merge new-side-wins against the existing cache with an anti join.

    The cache swap is write-temp → rename-aside → atomic promote, with
    crash recovery at merge start (an interrupted swap leaves the
    ``._old`` copy, which the next micro-batch restores before
    reading); the fresh-cache path is taken ONLY when the cache path
    verifiably does not exist — any read failure on an existing cache
    propagates so the micro-batch retries instead of silently
    rebuilding from one batch.  A production deployment points this at
    a table format with transactional MERGE and deletes the rename.
    Drains all input with Trigger.AvailableNow.

    Scale: each micro-batch shuffles once on the key; the cache
    re-merge is the same anti-join plan as the batch J8 — cost scales
    with cache size, which a real deployment bounds via partitioned
    rewrite (only touched partitions re-merge)."""
    import os as _os
    import shutil as _shutil
    from pyspark.sql.window import Window as _W

    def merge(batch_df: DataFrame, _epoch: int) -> None:
        spark = batch_df.sparkSession
        w = _W.partitionBy(key).orderBy(*[F.desc(c) for c in order])
        fresh = (
            batch_df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )
        old = cache_path + "._old"
        if not _os.path.exists(cache_path) and _os.path.exists(old):
            # recover from a swap interrupted between rename-aside and
            # promote: the previous cache is intact under ._old
            _os.rename(old, cache_path)
        if _os.path.exists(cache_path):
            # any read failure on an EXISTING cache propagates — the
            # micro-batch retries rather than discarding the cache
            cached = spark.read.parquet(cache_path)
            merged = fresh.unionByName(cached.join(fresh, key, "left_anti"))
        else:
            merged = fresh
        tmp = cache_path + "._tmp"
        merged.write.mode("overwrite").parquet(tmp)
        _shutil.rmtree(old, ignore_errors=True)
        if _os.path.exists(cache_path):
            _os.rename(cache_path, old)  # atomic move-aside
        _os.rename(tmp, cache_path)  # atomic promote
        _shutil.rmtree(old, ignore_errors=True)

    (
        events.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def hourly_then_daily(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """CHAINED stateful aggregation (Spark 3.4+ multi-stateful
    pipeline): hourly tumbling windows re-aggregated into daily totals
    inside ONE streaming query — the rollup cascade a metrics pipeline
    runs continuously.  The second groupBy windows over
    ``window_time(w1)`` (the event-time column of the first window),
    which is what makes the chain legal in append mode; the watermark
    propagates through both operators, so a daily row emits once the
    watermark passes the day end.

    The hourly partial stays DECIMAL(18,6) between the stages so the
    daily total is an exact decimal sum (order-independent), cast to
    double only at the edge.

    At scale: state = open hours × types + open days × types — the
    cascade keeps per-operator state bounded by its own horizon."""
    hourly = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w1"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("_hv"),
        )
    )
    return (
        hourly.groupBy(
            F.window(F.window_time("w1"), "1 day").alias("w2"), "event_type"
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("_hv").cast("double").alias("total_value"),
        )
        .select(
            F.col("w2.start").alias("day_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_to_completion(stream_df: DataFrame, sink_path: str, checkpoint: str) -> None:
    """Drain all available input (Trigger.AvailableNow) into a parquet
    sink — micro-batch semantics with a bounded run, used by tests and
    by backfills (same code path as a 24/7 deployment, different
    trigger)."""
    (
        stream_df.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
