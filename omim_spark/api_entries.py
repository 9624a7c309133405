"""OMIM REST API entry transform (S7/§2.7 JSON path — reference
transform_entry, omim2obo/parsers/omim_entry_parser.py:62-160, and the
nested-field extractors at :386-448).

``read_entry_json`` (io/readers.py) lands the API envelope as one row
per entry with a nested struct; everything here is nested-column
access + explode — the Spark-native form of the reference's dict
walking.  The same title pipeline (titles.py) applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from omim_spark.omim_types import PREFIX_CHAR_TO_TYPE
from omim_spark.titles import cleanup_title_udf


def _omim_type_from_char(col):
    expr = None
    for ch, typ in PREFIX_CHAR_TO_TYPE.items():
        cond = col == ch
        expr = F.when(cond, typ) if expr is None else expr.when(cond, typ)
    return expr.otherwise("SUSPECTED")


def entry_core(entries: DataFrame) -> DataFrame:
    """entry struct → flat core columns: mim_number (zero-padded
    string — leading zeros are semantic), omim_type, preferred title
    (raw + cleaned), abbrev (first ';' symbol), cyto location,
    genemap comments."""
    e = F.col("entry")
    pref = e["titles"]["preferredTitle"]
    return entries.select(
        F.lpad(e["mimNumber"].cast("string"), 6, "0").alias("mim_number"),
        _omim_type_from_char(e["prefix"]).alias("omim_type"),
        pref.alias("preferred_title"),
        cleanup_title_udf()(F.substring_index(pref, ";", 1)).alias("label"),
        F.when(
            pref.contains(";"), F.trim(F.substring_index(pref, ";", -1))
        ).alias("abbrev"),
        e["titles"]["alternativeTitles"].alias("alternative_titles"),
        e["titles"]["includedTitles"].alias("included_titles"),
        e["geneMap"]["cytoLocation"].alias("cyto_location"),
        e["geneMap"]["comments"].alias("genemap_comments"),
    )


def entry_pubmed_refs(entries: DataFrame) -> DataFrame:
    """referenceList[].reference.pubmedID → (mim_number, pmid)
    (reference get_pubs :392-398)."""
    e = F.col("entry")
    return (
        entries.select(
            F.lpad(e["mimNumber"].cast("string"), 6, "0").alias("mim_number"),
            F.explode_outer(e["referenceList"]).alias("ref"),
        )
        .select(
            "mim_number",
            F.col("ref")["reference"]["pubmedID"].cast("string").alias("pmid"),
        )
        .filter(F.col("pmid").isNotNull())
    )


def entry_mapped_ids(entries: DataFrame) -> DataFrame:
    """externalLinks → (mim_number, namespace, id): geneIDs/umlsIDs are
    comma-packed; orphanetDiseases is `id;;code;;label` triples joined
    by ';;;' (reference get_mapped_ids :401-410, get_mapped_gene_ids
    :386-389)."""
    e = F.col("entry")
    base = entries.select(
        F.lpad(e["mimNumber"].cast("string"), 6, "0").alias("mim_number"),
        e["externalLinks"]["geneIDs"].alias("gene_ids"),
        e["externalLinks"]["umlsIDs"].alias("umls_ids"),
        e["externalLinks"]["orphanetDiseases"].alias("orphanet"),
    )

    def unpack(col, ns, splitter):
        return (
            base.filter(F.col(col).isNotNull() & (F.col(col) != ""))
            .select(
                "mim_number",
                F.lit(ns).alias("namespace"),
                F.explode(splitter).alias("id"),
            )
            .filter(F.col("id") != "")
        )

    genes = unpack(
        "gene_ids", "NCBIGENE", F.transform(F.split("gene_ids", ","), lambda x: F.trim(x))
    )
    umls = unpack(
        "umls_ids", "UMLS", F.transform(F.split("umls_ids", ","), lambda x: F.trim(x))
    )
    orpha = unpack(
        "orphanet",
        "ORPHANET",
        F.transform(
            F.split("orphanet", ";;;"),
            lambda item: F.trim(F.substring_index(item, ";;", 1)),
        ),
    )
    return genes.unionByName(umls).unionByName(orpha)


def entry_phenotypic_series(entries: DataFrame) -> DataFrame:
    """phenotypeMapList[].phenotypeMap.phenotypicSeriesNumber (also
    nested under geneMap) → distinct (mim_number, ps_number)
    (reference get_phenotypic_series :413-422)."""
    e = F.col("entry")
    top = entries.select(
        F.lpad(e["mimNumber"].cast("string"), 6, "0").alias("mim_number"),
        F.explode_outer(e["phenotypeMapList"]).alias("pm"),
    ).select(
        "mim_number",
        F.col("pm")["phenotypeMap"]["phenotypicSeriesNumber"].alias("ps_packed"),
    )
    nested = entries.select(
        F.lpad(e["mimNumber"].cast("string"), 6, "0").alias("mim_number"),
        F.explode_outer(e["geneMap"]["phenotypeMapList"]).alias("pm"),
    ).select(
        "mim_number",
        F.col("pm")["phenotypeMap"]["phenotypicSeriesNumber"].alias("ps_packed"),
    )
    return (
        top.unionByName(nested)
        .filter(F.col("ps_packed").isNotNull() & (F.col("ps_packed") != ""))
        .select(
            "mim_number", F.explode(F.split("ps_packed", ",")).alias("ps_number")
        )
        .filter(F.col("ps_number") != "")
        .distinct()
    )
