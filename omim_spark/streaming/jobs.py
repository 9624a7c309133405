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
