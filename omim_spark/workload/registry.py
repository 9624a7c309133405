"""Registry mapping query name → (spark callable, oracle SQL).

Contract (driver): each spark callable takes ``(spark, sf_dir)`` and
returns a DataFrame; the oracle SQL is ANSI SQL runnable by DuckDB on
the same parquet tables (pre-registered views: region nation customer
supplier part orders lineitem events documents embeddings).  Column
names must match exactly — the comparator sorts columns by name and
hashes values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: SparkQuery
    oracle: str | None  # None → driver records a rows-only check
    headline: bool = False  # included in bench.py


QUERIES: dict[str, QueryDef] = {}

# Headline bench entries that are NOT driver-gated: plans whose OUTPUT
# is engine-specific by design (raw HLL sketches) so no DuckDB oracle
# can hash-match them, but whose 100 TB production shape the bench
# must keep tracking round-over-round.  Each one must name a
# registered hash-gated sibling in its docstring (the exactness
# witness).  bench.py runs QUERIES headline entries plus these.
BENCH_ONLY: dict[str, SparkQuery] = {}


def register(
    name: str, oracle: str | None = None, headline: bool = False
) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QueryDef(name=name, fn=fn, oracle=oracle, headline=headline)
        return fn

    return deco


def register_bench_only(name: str) -> Callable[[SparkQuery], SparkQuery]:
    # Cross-namespace duplicate check lives HERE (not in register):
    # register's AST is in every gated query's ledger closure, so
    # touching it would spuriously re-flag all 178 queries.
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES or name in BENCH_ONLY:
            raise ValueError(f"duplicate query name: {name}")
        BENCH_ONLY[name] = fn
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver parquet table (S1/S4-equivalent source).

    Pins the session timezone to UTC (runtime-settable) so timestamp
    rendering matches the tz-naive DuckDB oracle regardless of the
    caller's session defaults."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the events table, normalizing `ts` to a microsecond
    timestamp whatever physical type the generator used.

    Generators have shipped `ts` as TIMESTAMP(NANOS) — which Spark's
    vectorized reader only accepts as long via the legacy nanosAsLong
    conf — and as TIMESTAMP(MICROS), which reads natively as a
    (tz-naive) timestamp.  Sniff the decoded type: long → treat as
    epoch nanos and truncate to micros (matching DuckDB's epoch_us());
    TIMESTAMP_NTZ → cast to session-tz TIMESTAMP (the session tz is
    pinned UTC, so the cast is value-preserving) because unix_micros()
    and Structured Streaming watermarks require the tz-aware type."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, TimestampNTZType):
        # Explicit target type: cast("timestamp") resolves via
        # spark.sql.timestampType and would silently no-op if a caller
        # set that conf to TIMESTAMP_NTZ.
        df = df.withColumn("ts", F.col("ts").cast(TimestampType()))
    elif not isinstance(ts_type, TimestampType):
        # Fail loudly at the scan on generator format drift instead of
        # with an opaque analysis error deep in the plan.
        raise TypeError(f"unexpected events.ts type: {ts_type}")
    return df
