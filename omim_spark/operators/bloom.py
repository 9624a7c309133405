"""Deterministic Bloom-filter build / probe for scan-side join pruning.

The classic 100 TB pattern: the build side of a selective join is far
too big to broadcast as a hash relation but its *membership bits* are
not.  Build a fixed-size Bloom filter over the join keys with one
map-side-combinable aggregation (``bit_or`` over 64-bit lanes), ship
the resulting few-KiB array of longs to every task via ``broadcast``,
and drop non-matching fact rows *inside the scan stage* — before any
exchange.  The exact join that follows only pays shuffle/probe cost
for the Bloom survivors (false-positive rate ~(1-e^{-kn/m})^k);
Bloom filters have no false negatives, so correctness is untouched.

Spark's AQE runtime row-level filtering does this implicitly for some
shuffle joins; this operator makes the shape explicit, deterministic
(md5-derived bit positions, no RNG, no JVM-internal hash), and
reusable against any probe-side predicate — including sinks and
streaming micro-batches where AQE's injection does not reach.

Everything stays in JVM expressions: one md5 per key, three 32-bit
slices → three bit positions; no Python, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BITS_DEFAULT = 4096  # floor: 64 lanes x 64 bits = 512 bytes broadcast
N_BITS_MAX = 1 << 30  # 128 MiB of lanes — past this, broadcast cost wins
N_HASHES = 3
BITS_PER_KEY = 10  # k=3, m/n=10 -> FP ~ (1 - e^{-0.3})^3 ~ 1.7%


def bloom_nbits(n_keys: int) -> int:
    """Filter size for a build side of ``n_keys``: ~``BITS_PER_KEY``
    bits per key rounded UP to a power of two (so the mod-slicing
    stays cheap and lane counts are round), floored at
    ``N_BITS_DEFAULT`` and capped at ``N_BITS_MAX``.  A fixed 4096-bit
    filter saturates once the build side passes a few hundred keys
    (n=3000 -> FP~0.7, pruning nothing); sizing from the count keeps
    the FP rate ~2% at any cardinality the broadcast can afford."""
    n_bits = N_BITS_DEFAULT
    while n_bits < n_keys * BITS_PER_KEY and n_bits < N_BITS_MAX:
        n_bits <<= 1
    return n_bits


def _positions_sql(key_sql: str, n_bits: int) -> str:
    """SQL expression: array of ``N_HASHES`` bit positions for a key —
    one md5 of the key's string form, sliced into three independent
    32-bit hex words (md5 is 32 hex chars; slices at 1, 9, 17), each
    reduced mod ``n_bits``.  String-derived → bit-identical in any
    engine."""
    h = f"md5(cast(cast(({key_sql}) as string) as binary))"
    slices = ", ".join(
        f"cast(conv(substring({h}, {1 + 8 * j}, 8), 16, 10) as bigint) % {n_bits}"
        for j in range(N_HASHES)
    )
    return f"array({slices})"


def bloom_build(
    df: DataFrame, key_col: str, n_bits: int = N_BITS_DEFAULT
) -> DataFrame:
    """Aggregate the build side's keys into ONE row holding the filter
    as ``bloom: array<bigint>`` (``n_bits / 64`` lanes, lane ``l`` =
    OR of ``1 << (pos % 64)`` for every position with ``pos div 64 ==
    l``).

    Scale: explode is 3 rows per key; the per-lane ``bit_or`` is
    map-side combinable (each task sends at most 64 partial lanes
    regardless of input size); the final single-row assembly touches
    64 rows.  The output is ~512 bytes — broadcastable at any build
    cardinality, unlike the key set itself.

    NULL keys are dropped on both sides (a NULL never equi-joins, so
    excluding it from the filter and from the probe keeps Bloom
    pruning exactly consistent with inner/semi join semantics — and a
    NULL position would otherwise poison the lane map)."""
    n_lanes = n_bits // 64
    lanes = (
        df.filter(F.col(key_col).isNotNull())
        .select(
            F.explode(F.expr(_positions_sql(key_col, n_bits))).alias("pos")
        )
        .select(
            F.expr("cast(pos div 64 as int)").alias("lane"),
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").alias(
                "mask"
            ),
        )
        .groupBy("lane")
        .agg(F.bit_or("mask").alias("bits"))
    )
    return lanes.agg(
        F.map_from_entries(F.collect_list(F.struct("lane", "bits"))).alias("m")
    ).select(
        F.expr(
            f"transform(sequence(0, {n_lanes - 1}), l -> coalesce(m[l], 0L))"
        ).alias("bloom")
    )


def bloom_might_contain(
    bloom_col: str, key_sql: str, n_bits: int = N_BITS_DEFAULT
) -> Column:
    """Membership predicate: all ``N_HASHES`` bits set.  Pure row-local
    expression — apply it in the scan stage, before any exchange."""
    return F.expr(
        f"forall({_positions_sql(key_sql, n_bits)}, p -> "
        f"(element_at({bloom_col}, cast(p div 64 as int) + 1) & "
        "shiftleft(cast(1 as bigint), cast(p % 64 as int))) != 0)"
    )


def bloom_prune(
    fact: DataFrame,
    build: DataFrame,
    fact_key: str,
    build_key: str,
    n_bits: int | None = None,
) -> DataFrame:
    """Prune ``fact`` to rows whose ``fact_key`` *might* be in
    ``build``'s ``build_key`` set: build the Bloom filter, broadcast
    its single row, filter map-side.  Survivors still need the exact
    join (false positives possible); no true match is ever dropped.

    ``n_bits=None`` (the default) sizes the filter from the build
    side's distinct-key count (:func:`bloom_nbits`, ~10 bits/key) —
    the count is one extra map-side-combinable pass over the build
    keys, cheap by construction because the whole point of the
    pattern is a small-relative-to-fact build side.  Callers that
    already know the cardinality (a maintained dimension, a catalog
    statistic) pass ``n_bits`` explicitly and skip the count."""
    if n_bits is None:
        n_keys = (
            build.select(build_key)
            .filter(F.col(build_key).isNotNull())
            .distinct()
            .count()
        )
        n_bits = bloom_nbits(n_keys)
    bloom = bloom_build(build.select(build_key), build_key, n_bits)
    return (
        fact.crossJoin(F.broadcast(bloom))
        .filter(bloom_might_contain("bloom", fact_key, n_bits))
        .drop("bloom")
    )
