"""Grouped pandas operators (applyInPandas) — the per-group escape
hatch for logic that wants a whole group in memory as a pandas frame
(rank transforms, per-group model fits, resampling).

Rule of thumb at 100 TB: a group must fit in one executor's memory —
use these for many-small-groups shapes (per-source, per-user,
per-shard), never for one global group.  The shuffle is the same
hash-on-key exchange a groupBy costs; the Python stage is Arrow-
batched per group.

The rank normalization here is integer arithmetic (rank, count), so
its output is bit-identical to the SQL window equivalent — which is
how the driver's DuckDB gate verifies the applyInPandas path itself.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType


def rank_normalize(df: DataFrame, group: str, value: str) -> DataFrame:
    """Append ``pct_rank``: (min-rank − 1) / (n − 1) of ``value``
    within ``group`` (0 for the minimum, 1 for the maximum; 0.0 when
    the group has a single row).  Equivalent SQL:
    ``(RANK() OVER (PARTITION BY group ORDER BY value) - 1) /
    (COUNT(*) OVER (PARTITION BY group) - 1)``."""
    out_schema = StructType(
        df.schema.fields + [StructField("pct_rank", DoubleType())]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        ranks = pdf[value].rank(method="min")
        pdf = pdf.copy()
        pdf["pct_rank"] = 0.0 if n == 1 else (ranks - 1.0) / (n - 1.0)
        return pdf

    return df.groupBy(group).applyInPandas(fn, out_schema)
