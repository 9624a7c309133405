"""Timezone-safety contract (r11): the driver compares collected Python
values, and PySpark's row collection localizes raw TimestampType
columns to the SYSTEM zone — the one leak a UTC session pin cannot
cover (q_latest_per_key drifted 5 h under TZ=America/New_York until it
rendered JVM-side).  Enforce the contract structurally: no registered
query's result schema may contain a raw timestamp column; timestamps
must be rendered to strings (date_format under the pinned UTC session)
or epoch integers before leaving the JVM.

Streaming gates are excluded here only because their fns execute a
full streaming job to produce the result DataFrame (the r11 non-UTC
FULL-registry sweep, which covers them too, passed 184/184 — recorded
in COVERAGE.md)."""

from __future__ import annotations

from pyspark.sql.types import TimestampNTZType, TimestampType

SF_DIR = "/root/testdata/sf0.001"


def test_no_query_outputs_raw_timestamps(spark):
    from omim_spark.workload.registry import QUERIES

    offenders = []
    for name, qd in QUERIES.items():
        if name.startswith("q_stream_"):
            continue
        schema = qd.fn(spark, SF_DIR).schema
        for f in schema.fields:
            if isinstance(f.dataType, (TimestampType, TimestampNTZType)):
                offenders.append(f"{name}.{f.name}: {f.dataType}")
    assert not offenders, (
        "raw timestamp columns leave the JVM and localize to the system "
        f"zone at collect time: {offenders}"
    )
