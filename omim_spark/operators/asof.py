"""As-of (backward) join — an operator Spark's DataFrame API lacks
natively (pandas-on-Spark has merge_asof; plain SQL needs a correlated
subquery that explodes into a range join).

Implemented as a composition of existing operators so Catalyst keeps
full visibility: union both sides, one shuffle on the join key, one
ordered window pass carrying the most recent right-side payload
forward, then keep the left rows.  Cost at any scale: ONE exchange on
the key + a per-key sort — never a per-row subquery, never an
O(|L|×|R|) range join, and skew maps to key skew (salt the key if one
entity dominates).

Tie semantics: when several right rows share the latest timestamp
≤ the left timestamp, the one latest in ``tiebreak`` order wins —
deterministic by construction (pass a unique column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: tuple[str, ...] = ("value",),
    tiebreak: str | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` for the same ``key`` (NULLs if none).
    Right columns come back as ``{prefix}{col}``.

    Equal timestamps match (a right row AT the left timestamp is
    eligible) — right rows order before left rows at equal ts."""
    r2 = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("_tie"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_rpay"),
    )
    l2 = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r2.schema["_tie"].dataType).alias("_tie"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lpay"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)  # nulls fill _rpay/_lpay
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn("_m", F.last("_rpay", ignorenulls=True).over(w))
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_lpay.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_payload],
    )
