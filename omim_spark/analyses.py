"""Ad-hoc analyses parity (reference analyses/ directory).

- equivalency_cliques: analyses/equivalency_cliques.py:68-150 — group
  MIM terms by shared HGNC symbol; for each term, list the *other*
  terms sharing the value (A6/J1/F9).
- morbidmap_gold_standard: analyses/morbidmap-data-analysis
  notebooks — phenotypes appearing exactly once with mapping key 3
  (A8), the independent cross-check of the disease-defining set.

Both are window/groupBy one-liners here — the reference's pandas loops
become partition-local array ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def equivalency_cliques(
    mim_titles: DataFrame, hgnc_symbol_map: DataFrame
) -> DataFrame:
    """mimTitles ⋈ mim→symbol map (left, J1), then per shared symbol
    the sorted list of other MIMs (A6 clique lists).

    Returns (mim_number, omim_type, hgnc_symbol, clique_size,
    other_mims)."""
    joined = mim_titles.join(
        F.broadcast(hgnc_symbol_map.withColumnRenamed("mim", "mim_number")),
        "mim_number",
        "left",
    ).filter(F.col("hgnc_symbol").isNotNull())
    w = Window.partitionBy("hgnc_symbol")
    return (
        joined.withColumn("all_mims", F.collect_list("mim_number").over(w))
        .select(
            "mim_number",
            "omim_type",
            "hgnc_symbol",
            F.size("all_mims").alias("clique_size"),
            F.array_join(
                F.sort_array(F.array_remove(F.col("all_mims"), F.col("mim_number"))),
                ";",
            ).alias("other_mims"),
        )
        .filter(F.col("clique_size") > 1)
        .orderBy("hgnc_symbol", "mim_number")
    )


def morbidmap_gold_standard(assocs: DataFrame) -> DataFrame:
    """Phenotypes appearing exactly once in morbidmap with mapping key
    3 — the notebook's expected disease-defining set (A8)."""
    return (
        assocs.filter(F.col("p_mim") != "")
        .groupBy("p_mim")
        .agg(
            F.count("*").alias("n_assocs"),
            F.sum((F.col("map_key") == "3").cast("int")).alias("n_key3"),
        )
        .filter((F.col("n_assocs") == 1) & (F.col("n_key3") == 1))
        .select("p_mim")
        .orderBy("p_mim")
    )
