"""Gene↔disease association derivation (SURVEY §4.2 — the decision
table at reference main.py:417-488, README.md:226-282).

The reference walks a phenotype→assocs dict row by row with mutable
short-circuit state; here the same semantics are one window count +
two broadcast joins + an ordered when-cascade, evaluated once over the
flat association relation:

1. protected (curator) short-circuits everything → bidirectional
   causal emission + HGNC exactMatch;
2. missing p_mim or mapping key '1' → skip;
3. key ≠ '3' or excluded phenotype → non-causal restriction, with the
   key-specific predicate only for single-assoc unexcluded phenotypes,
   else RO:0003302;
4. key '3': skip multi-assoc or non-definitive labels ([{?-prefixed),
   else bidirectional causal;
5. protected rows absent from morbidmap are appended (anti join) with
   default evidence.

Scale: exclusions/protected are curator files (hundreds of rows) →
broadcast; the window count shuffles once on p_mim; no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from omim_spark.omim_types import MORBIDMAP_KEY_PREDICATES

MAPPING_KEY_MEANINGS = {
    "1": "The disorder is placed on the map based on its association with a gene, "
    "but the underlying defect is not known.",
    "2": "The disorder has been placed on the map by linkage or other statistical "
    "method; no mutation has been found.",
    "3": "The molecular basis for the disorder is known; a mutation has been found "
    "in the gene.",
    "4": "A contiguous gene deletion or duplication syndrome, multiple genes are "
    "deleted or duplicated causing the phenotype.",
}

ACT_PROTECTED = "causal_protected"
ACT_CAUSAL = "causal"
ACT_NONCAUSAL = "noncausal"
ACT_SKIP = "skip"

PROTECTED_EVIDENCE = "Evidence: (3) disease-defining (protected association)"


def _map_label(col):
    expr = None
    for k, v in MAPPING_KEY_MEANINGS.items():
        expr = F.when(col == k, v) if expr is None else expr.when(col == k, v)
    return expr.otherwise(F.lit(""))


def derive_associations(
    assocs: DataFrame,
    exclusions: DataFrame,
    protected: DataFrame,
) -> DataFrame:
    """assocs: parse.parse_morbid_map output.
    exclusions: (p_mim, orcid) curator exclusions (utils.py:70-80).
    protected: (p_mim, gene_mim, hgnc_id, orcid) curator protections.

    Returns one row per decision: p_mim, gene_mim, p_label, map_key,
    n_assocs, action, predicate, evidence, orcid, hgnc_id, row_order.
    """
    linked = assocs.filter(F.col("p_mim") != "")
    w = Window.partitionBy("p_mim")
    counted = (
        linked.withColumn("n_assocs", F.count("*").over(w))
        .join(
            F.broadcast(
                exclusions.select(
                    F.col("p_mim").alias("x_mim"), F.col("orcid").alias("x_orcid")
                )
            ),
            F.col("p_mim") == F.col("x_mim"),
            "left",
        )
        .join(
            F.broadcast(
                protected.select(
                    F.col("p_mim").alias("pp_mim"),
                    F.col("gene_mim").alias("pp_gene"),
                    F.col("hgnc_id").alias("prot_hgnc"),
                    F.col("orcid").alias("prot_orcid"),
                )
            ),
            (F.col("p_mim") == F.col("pp_mim"))
            & (F.col("gene_mim") == F.col("pp_gene")),
            "left",
        )
        .withColumn("excluded", F.col("x_mim").isNotNull())
        .withColumn("is_protected", F.col("pp_mim").isNotNull())
    )

    evidence = F.format_string(
        "Evidence: (%s) %s", F.col("map_key"), _map_label(F.col("map_key"))
    )
    nondefinitive = F.col("p_label").rlike(r"^[\[{?]")
    key_pred = F.lit(None).cast("string")
    for k, pred in MORBIDMAP_KEY_PREDICATES.items():
        if pred:
            key_pred = F.when(F.col("map_key") == k, pred).otherwise(key_pred)

    action = (
        F.when(F.col("is_protected"), ACT_PROTECTED)
        .when(F.col("map_key") == "1", ACT_SKIP)
        .when((F.col("map_key") != "3") | F.col("excluded"), ACT_NONCAUSAL)
        .when((F.col("n_assocs") > 1) | nondefinitive, ACT_SKIP)
        .otherwise(ACT_CAUSAL)
    )
    predicate = (
        F.when(F.col("is_protected"), "RO:0004013")
        .when(F.col("map_key") == "1", F.lit(None))
        .when(
            (F.col("map_key") != "3") | F.col("excluded"),
            F.when((F.col("n_assocs") == 1) & ~F.col("excluded"), key_pred).otherwise(
                "RO:0003302"
            ),
        )
        .when((F.col("n_assocs") > 1) | nondefinitive, F.lit(None))
        .otherwise("RO:0004013")
    )
    orcid = (
        F.when(F.col("is_protected"), F.col("prot_orcid"))
        .when(F.col("excluded") & (action == ACT_NONCAUSAL), F.col("x_orcid"))
        .otherwise(F.lit(None))
    )
    decided = counted.select(
        "p_mim",
        "gene_mim",
        "p_label",
        "map_key",
        "n_assocs",
        action.alias("action"),
        predicate.alias("predicate"),
        evidence.alias("evidence"),
        orcid.alias("orcid"),
        F.col("prot_hgnc").alias("hgnc_id"),
        "row_order",
    )

    # J6: protected associations absent from morbidmap (main.py:483-488)
    leftover = (
        protected.join(
            linked.select("p_mim", "gene_mim").distinct(),
            ["p_mim", "gene_mim"],
            "left_anti",
        )
        .select(
            "p_mim",
            "gene_mim",
            F.lit(None).cast("string").alias("p_label"),
            F.lit("3").alias("map_key"),
            F.lit(0).cast("long").alias("n_assocs"),
            F.lit(ACT_PROTECTED).alias("action"),
            F.lit("RO:0004013").alias("predicate"),
            F.lit(PROTECTED_EVIDENCE).alias("evidence"),
            F.col("orcid"),
            F.col("hgnc_id"),
            F.lit(None).cast("long").alias("row_order"),
        )
    )
    return decided.unionByName(leftover)


def susceptibility_rows(assocs: DataFrame, omim_to_mondo: DataFrame) -> DataFrame:
    """Susceptibility subset (reference main.py:434-438 + S11 sink):
    '{'-prefixed labels → (mondo_id, omim_curie), one row per SSSOM
    MONDO mapping, distinct + sorted downstream."""
    susc = (
        assocs.filter(
            (F.col("p_mim") != "")
            & F.ltrim(F.col("p_label")).startswith("{")
        )
        .select("p_mim")
        .distinct()
    )
    return (
        susc.join(omim_to_mondo, susc.p_mim == omim_to_mondo.omim_mim)
        .select(
            F.col("mondo_id"),
            F.concat(F.lit("OMIM:"), F.col("p_mim")).alias("omim_id"),
        )
        .distinct()
    )


def review_cases(decided: DataFrame, assocs: DataFrame, omim_types: DataFrame) -> DataFrame:
    """Review-case log (reference omim_entry_parser.py:444-487), as a
    derived DataFrame instead of a global accumulator (SURVEY §4.1):
    only rows reaching the causal branch are logged.

    Case 1 digenic / 3 somatic: substring of the label.
    Case 2 self-referential: the phenotype MIM is itself a gene MIM in
      morbidmap with associations lacking a p_mim; numbered
      sequentially in file order (dense_rank over first-occurrence
      order — reproduces the reference's counter deterministically).
    Case 4/5: unexpected phenotype MIM type.
    """
    causal = decided.filter(F.col("action") == ACT_CAUSAL)
    info = F.format_string(
        "(Phenotype: %s %s), (Map key: %s), (Gene: %s)",
        F.col("p_mim"),
        F.col("p_label"),
        F.col("map_key"),
        F.col("gene_mim"),
    )

    digenic = causal.filter(F.lower(F.col("p_label")).contains("digenic")).select(
        F.lit(1).alias("classCode"), info.alias("value")
    )
    somatic = causal.filter(F.lower(F.col("p_label")).contains("somatic")).select(
        F.lit(3).alias("classCode"), info.alias("value")
    )

    # Self-referential: p_mim appears as gene_mim with empty-p_mim assocs
    self_ref_genes = (
        assocs.filter(F.col("p_mim") == "")
        .select(
            F.col("gene_mim").alias("sr_gene"),
            F.col("p_label").alias("sr_label"),
            F.col("map_key").alias("sr_key"),
        )
    )
    sr = causal.join(
        self_ref_genes, causal.p_mim == self_ref_genes.sr_gene, "inner"
    )
    sr_i = F.dense_rank().over(Window.orderBy("row_order", "p_mim", "gene_mim"))
    sr_numbered = sr.withColumn("sr_i", sr_i)
    sr_head = sr_numbered.select(
        F.lit(2).alias("classCode"),
        F.format_string("%s: %s", F.col("sr_i"), info).alias("value"),
    ).distinct()
    sr_detail = sr_numbered.select(
        F.lit(2).alias("classCode"),
        F.format_string(
            "%s: (Phenotype: %s), (Map key: %s), (Gene: %s)",
            F.col("sr_i"),
            F.col("sr_label"),
            F.col("sr_key"),
            F.col("p_mim"),
        ).alias("value"),
    )

    # Unexpected phenotype MIM types
    typed = causal.join(
        F.broadcast(omim_types.select(F.col("mim_number").alias("t_mim"), "omim_type")),
        causal.p_mim == F.col("t_mim"),
        "left",
    )
    type_err = F.format_string(
        "(Phenotype MIM type %s), %s", F.col("omim_type"), info
    )
    case4 = typed.filter(F.col("omim_type") == "GENE").select(
        F.lit(4).alias("classCode"), type_err.alias("value")
    )
    case5 = typed.filter(
        F.col("omim_type").isin("OBSOLETE", "SUSPECTED", "HAS_AFFECTED_FEATURE")
    ).select(F.lit(5).alias("classCode"), type_err.alias("value"))

    name_map = {
        1: "D2G: digenic",
        2: "D2G: self-referential",
        3: "D2G: somatic",
        4: "D2G: Phenotype is gene",
        5: "D2G: Phenotype type error",
    }
    name_expr = None
    for code, name in name_map.items():
        cond = F.col("classCode") == code
        name_expr = (
            F.when(cond, name) if name_expr is None else name_expr.when(cond, name)
        )
    all_cases = (
        digenic.unionByName(somatic)
        .unionByName(sr_head)
        .unionByName(sr_detail)
        .unionByName(case4)
        .unionByName(case5)
    )
    return all_cases.select(
        "classCode", name_expr.alias("classShortName"), "value"
    ).orderBy("classCode", "value")
