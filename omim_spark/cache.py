"""Incremental API-cache merge (SURVEY §2.3 J8 — reference
update_cache__pubmed_refs_and_mappings, omim_txt_parser.py:516-585).

The reference fetches entries updated since the last cached date
(minus a 1-day overlap, omim_txt_parser.py:548-552) and upserts:
fetch-new ∪ (cached − new), sorted by mim.  Here that is an anti-join
merge — idempotent by construction, and the exact dataflow a Delta
`MERGE INTO` would plan.

Scale: one shuffle on the upsert key; the overlap window means
duplicate keys appear across the two inputs, which the anti join
resolves new-side-wins — no distinct needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert_cache(cached: DataFrame, fresh: DataFrame, key: str = "mim") -> DataFrame:
    """fresh ∪ (cached − fresh) on ``key`` — new rows win."""
    survivors = cached.join(fresh, key, "left_anti")
    return fresh.unionByName(survivors)


def mims_to_fetch(all_mims: DataFrame, cached: DataFrame) -> DataFrame:
    """Seed-run set difference: mims_all − mims_cached (reference
    omim_txt_parser.py:543; O3)."""
    return all_mims.join(
        cached.select(F.col("mim")).distinct(),
        all_mims["mim_number"] == F.col("mim"),
        "left_anti",
    )


def unpack_packed_ids(df: DataFrame, col: str) -> DataFrame:
    """'|'-packed cell → exploded (mim, id) rows (T11 —
    reference main.py:507-509)."""
    return (
        df.filter(F.col(col).isNotNull() & (F.col(col) != ""))
        .select("mim", F.explode(F.split(F.col(col), r"\|")).alias("id"))
        .filter(F.col("id") != "")
    )


def pack_ids(df: DataFrame, key: str, id_col: str, out_col: str) -> DataFrame:
    """Inverse of unpack: deterministic '|'-join (reference
    omim_txt_parser.py:569-573)."""
    return df.groupBy(key).agg(
        F.array_join(F.sort_array(F.collect_list(id_col)), "|").alias(out_col)
    )
