"""Point-in-interval (range) join — Spark expresses ``ts BETWEEN
lo AND hi`` joins as BroadcastNestedLoop/cartesian plans, which die at
scale.  This operator rewrites the range join as an EQUI-join on
coarse time buckets:

- each interval is replicated to every bucket it overlaps
  (``ceil(len/width)+1`` rows — bounded when interval length is),
- each point lives in exactly one bucket, so every qualifying
  (point, interval) pair meets exactly once — no post-join dedupe,
- the exact containment predicate filters within the bucket.

Cost: one shuffle of |points| + |intervals| × avg-span rows on
(key, bucket) — hash-joinable, AQE-skew-splittable, and Catalyst sees
a plain equi-join.  Pick ``bucket_width`` ≈ the typical interval
length: wider buckets mean fewer replicas but more false candidates to
filter; narrower the reverse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts_us: str,
    start_us: str,
    end_us: str,
    bucket_width_us: int,
) -> DataFrame:
    """Inner-join each point row to every interval row (same ``key``)
    with ``start_us <= point_ts_us <= end_us``.  Timestamp columns are
    bigint microseconds.  Output: all point columns + all interval
    columns (names must not collide apart from ``key``)."""
    w = F.lit(bucket_width_us)
    p = points.withColumn("_b", F.floor(F.col(point_ts_us) / w))
    i = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_us) / w), F.floor(F.col(end_us) / w)
            )
        ),
    )
    joined = p.join(i, on=[key, "_b"], how="inner").filter(
        (F.col(point_ts_us) >= F.col(start_us))
        & (F.col(point_ts_us) <= F.col(end_us))
    )
    return joined.drop("_b")
