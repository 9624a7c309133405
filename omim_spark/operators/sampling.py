"""Deterministic sampling / splitting / chunking / packing operators
for training-data pipelines (engine extension; the reference has no
sampling surface — its closest analog is the seed-run MIM partition in
omim_client.py:28-45, a driver-side resume protocol).

Design rules for 100 TB:

- Every sampling decision is a pure per-row expression on a stable key
  (md5-derived bucket), so the same row lands in the same split on any
  cluster size, any partitioning, any rerun — no RNG state, no
  ``rand()`` (which is per-task nondeterministic on retry).
- Chunking is a per-row explode (map-side fan-out, no shuffle).
- Packing shuffles once on the group key, then runs a window per
  group — parallel across groups, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def md5_bucket(key: Column, buckets: int = 256) -> Column:
    """Deterministic bucket in [0, buckets) from the first two hex
    chars of md5(key) — 256 base cells, engine-portable (the same
    arithmetic is expressible in ANSI SQL: STRPOS over the hex
    alphabet), unlike xxhash64/DuckDB-hash which differ per engine.

    Use for split/sample decisions where cross-run stability matters
    more than bucket granularity; for ≥64k buckets chain more chars.
    """
    h = F.md5(key.cast("string"))
    cell = (F.instr(F.lit(_HEX), F.substring(h, 1, 1)) - 1) * 16 + (
        F.instr(F.lit(_HEX), F.substring(h, 2, 1)) - 1
    )
    return cell % buckets if buckets != 256 else cell


def train_test_split(
    df: DataFrame, key: str, train_cells: int = 230
) -> DataFrame:
    """Append a ``split`` column ('train' / 'test') by hashing ``key``
    into 256 cells; cells < train_cells go to train (230/256 ≈ 89.8%).

    Deterministic: membership depends only on the key value, so a
    re-partitioned, re-scaled, or re-run pipeline produces the identical
    split — the property ``df.sample(fraction)`` does NOT have.
    """
    return df.withColumn(
        "split",
        F.when(md5_bucket(F.col(key)) < train_cells, "train").otherwise("test"),
    )


def weighted_sample(
    df: DataFrame, key: str, group: str, weights: dict[str, float],
    default_weight: float = 1.0,
) -> DataFrame:
    """Deterministic per-group Bernoulli sampling: keep a row iff its
    256-cell bucket < weight(group) * 256.  The domain-mixing primitive
    (e.g. upweight curated sources, downsample crawl) — a pure filter,
    no shuffle, stable under reruns."""
    w = F.lit(default_weight)
    for g, wt in sorted(weights.items()):
        w = F.when(F.col(group) == g, F.lit(wt)).otherwise(w)
    return df.filter(md5_bucket(F.col(key)) < w * 256)


def chunk_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 32,
    stride: int = 16,
) -> DataFrame:
    """Explode each document into overlapping token windows: chunk c
    (1-based) covers tokens [1 + (c-1)*stride, …] up to ``size`` long;
    starts run while they stay ≤ n_tokens (trailing chunks may be
    short).  Output: id, chunk_id, chunk_tokens, chunk_text.

    Scale: map-side fan-out only — the explode pipelines into whatever
    consumes it; no shuffle, no UDF (sequence/slice/array_join are
    codegen'd JVM expressions)."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # chunk starts: 1, 1+stride, ... <= n  → chunk ids 1..ceil(n/stride)
    n_chunks = F.ceil(n.cast("double") / stride).cast("int")
    out = (
        df.withColumn("_toks", toks)
        .withColumn("chunk_id", F.explode(F.sequence(F.lit(1), n_chunks)))
        .withColumn(
            "chunk_tokens",
            F.slice(F.col("_toks"), (F.col("chunk_id") - 1) * stride + 1, size),
        )
        .select(
            F.col(id_col),
            "chunk_id",
            F.size("chunk_tokens").alias("n_chunk_tokens"),
            F.array_join("chunk_tokens", " ").alias("chunk_text"),
        )
    )
    return out


def pack_contiguous(
    df: DataFrame,
    group: str,
    order: str,
    tokens: str,
    capacity: int = 512,
) -> DataFrame:
    """Assign each row a ``pack_id`` by contiguous greedy packing:
    within each group, rows in ``order`` order are laid end-to-end and
    cut every ``capacity`` tokens (pack = floor(exclusive-cumsum /
    capacity)) — the sequence-packing step that turns variable-length
    documents into fixed-budget training contexts.

    Scale: one shuffle on the group key, then a per-group running sum;
    parallelism = number of groups (pick group = source/shard/date so
    groups are many and bounded — never pack globally)."""
    w = (
        Window.partitionBy(group)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(tokens).over(w), F.lit(0))
    return df.withColumn(
        "pack_id", F.floor(cum_before / F.lit(capacity)).cast("bigint")
    )
