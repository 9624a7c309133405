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


def register(
    name: str, oracle: str | None = None, headline: bool = False
) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QueryDef(name=name, fn=fn, oracle=oracle, headline=headline)
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
    """Scan the events table, whose parquet `ts` is TIMESTAMP(NANOS) —
    a type Spark's vectorized reader rejects.  We read nanos as long
    (runtime-settable legacy conf) and truncate to microsecond
    timestamps, matching DuckDB's epoch_us() truncation."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
