"""Delta-style MERGE INTO as a single distributed full-outer join.

``merge_into`` implements the three-clause MERGE semantics (WHEN
MATCHED [AND cond] THEN DELETE / WHEN MATCHED THEN UPDATE / WHEN NOT
MATCHED THEN INSERT) without a transaction log: one full-outer join on
the merge key, then a row-wise CASE.  This is exactly the shuffle
shape Delta Lake / Iceberg produce for a non-partition-pruned MERGE —
one exchange per side on the key, no driver involvement, so it holds
at 100 TB (and benefits from AQE skew splitting on a hot key).

The reference's nearest analog is the incremental cache upsert
(omim2obo/utils/api_entries_to_cache.py — fetch new entries, replace
matching rows, append the rest); ``omim_spark.cache`` covers that J8
path, while this operator generalizes it to conditional delete +
update + insert in one pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_T_FLAG = "__merge_t"
_S_FLAG = "__merge_s"


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: str,
    *,
    update_set: dict[str, Column],
    insert_values: dict[str, Column],
    delete_condition: Column | None = None,
) -> DataFrame:
    """Merge ``source`` into ``target`` on key column ``on``.

    - matched + ``delete_condition``      -> row dropped
    - matched otherwise                   -> target columns overridden by
      ``update_set`` (columns not listed keep the target value)
    - source-only rows                    -> inserted via ``insert_values``
      (must cover every target column)
    - target-only rows                    -> kept unchanged

    ``update_set`` / ``insert_values`` / ``delete_condition`` reference
    the joined sides as ``t.<col>`` and ``s.<col>``.  Returns a frame
    with exactly the target's columns.  One shuffle per side; never
    collects to the driver.
    """
    missing = [c for c in target.columns if c not in insert_values]
    if missing:
        raise ValueError(f"insert_values missing target columns: {missing}")

    t = target.withColumn(_T_FLAG, F.lit(True)).alias("t")
    s = source.withColumn(_S_FLAG, F.lit(True)).alias("s")
    joined = t.join(s, F.col(f"t.{on}") == F.col(f"s.{on}"), "full_outer")

    matched = F.col(_T_FLAG).isNotNull() & F.col(_S_FLAG).isNotNull()
    if delete_condition is not None:
        joined = joined.filter(~(matched & delete_condition))

    out_cols = []
    for c in target.columns:
        updated = update_set.get(c, F.col(f"t.{c}"))
        out_cols.append(
            F.when(matched, updated)
            .when(F.col(_T_FLAG).isNotNull(), F.col(f"t.{c}"))
            .otherwise(insert_values[c])
            .alias(c)
        )
    return joined.select(*out_cols)
