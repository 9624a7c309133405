"""Source-file parsers → typed DataFrames (SURVEY §2.2-§2.4,
reference omim2obo/parsers/omim_txt_parser.py).

Every parser is a pure Column-expression transform over the
comment-filtered scans from ``omim_spark.io.readers`` — the
reference's per-line loops and dict builds become select/filter/
groupBy plans that Catalyst can push down and parallelize.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from omim_spark.omim_types import (
    GENE_ENTRY_TYPES,
    PHENOTYPE_ENTRY_TYPES,
    omim_type_from_prefix_word,
)

# ---------------------------------------------------------------------------
# T1: MIM id validation/repair (reference omim_txt_parser.py:281-308)
# ---------------------------------------------------------------------------


def parse_omim_id(col: Column) -> Column:
    """Validate/repair a MIM id: 6 digits pass through; '{123456}' and
    '123456,...' forms are repaired; anything else → NULL."""
    repaired = (
        F.when(col.rlike(r"^\d{6}$"), col)
        .when(col.rlike(r"^\{\d{6}\}"), F.regexp_extract(col, r"^\{(\d{6})\}", 1))
        .when(col.rlike(r"^\d{6},"), F.regexp_extract(col, r"^(\d{6}),", 1))
    )
    return repaired


# ---------------------------------------------------------------------------
# mimTitles (reference omim_txt_parser.py:311-346)
# ---------------------------------------------------------------------------


def parse_mim_titles(raw: DataFrame) -> DataFrame:
    """mimTitles scan → (mim_number, omim_type, preferred_title,
    alternative_titles, included_titles, replaced_by array).

    'Caret' rows with 'MOVED TO …' yield the repaired replacement MIM
    list (the 'AND' token is dropped); other Caret rows (REMOVED FROM
    DATABASE) yield an empty array; non-obsolete rows yield NULL.
    """
    trimmed = raw.select(
        *[F.trim(F.col(c)).alias(c) for c in raw.columns]
    ).filter(
        ~(
            F.coalesce(F.col("prefix"), F.lit("")).eqNullSafe("")
            & F.coalesce(F.col("mim_number"), F.lit("")).eqNullSafe("")
            & F.coalesce(F.col("preferred_title"), F.lit("")).eqNullSafe("")
        )
        & F.col("mim_number").isNotNull()
    )
    moved = F.when(
        (F.col("prefix") == "Caret")
        & F.col("preferred_title").startswith("MOVED TO "),
        F.filter(
            F.transform(
                F.split(F.substring(F.col("preferred_title"), 10, 10_000), " "),
                lambda t: parse_omim_id(t),
            ),
            lambda x: x.isNotNull(),
        ),
    ).when(F.col("prefix") == "Caret", F.array().cast("array<string>"))
    return trimmed.select(
        F.col("mim_number"),
        omim_type_from_prefix_word(F.col("prefix")).alias("omim_type"),
        F.col("preferred_title"),
        F.col("alternative_titles"),
        F.col("included_titles"),
        moved.alias("replaced_by"),
    )


# ---------------------------------------------------------------------------
# morbidmap (reference omim_txt_parser.py:441-495)
# ---------------------------------------------------------------------------

_P_REGEX = r"(.*)(\d{6})\s*(?:\((\d+)\))?"  # label, mim, key (greedy: last 6-digit run)
_P_REGEX_NO_MIM = r"(.*)\s+\((\d+)\)"  # label, key


def parse_morbid_map(raw: DataFrame) -> DataFrame:
    """morbidmap scan → flat association rows
    (gene_mim, cyto_location, gene_symbols array,
    p_label, p_mim, map_key, row_order).

    The reference aggregates into gene→{...} dicts; the flat relation
    is the Spark-native shape — downstream groupings (by gene for A1,
    by phenotype for A2) are groupBys over this one DataFrame instead
    of two hand-built dict indexes.  ``row_order`` preserves file
    order for first-wins semantics (SURVEY §4.2).
    """
    with_order = raw.withColumn("row_order", F.monotonically_increasing_id())
    has_mim = F.col("phenotype").rlike(r"\d{6}")
    p_label = F.when(
        has_mim, F.regexp_extract("phenotype", _P_REGEX, 1)
    ).otherwise(F.regexp_extract("phenotype", _P_REGEX_NO_MIM, 1))
    p_mim = F.when(has_mim, F.regexp_extract("phenotype", _P_REGEX, 2)).otherwise(
        F.lit("")
    )
    map_key = F.when(
        has_mim, F.regexp_extract("phenotype", _P_REGEX, 3)
    ).otherwise(F.regexp_extract("phenotype", _P_REGEX_NO_MIM, 2))
    return with_order.filter(
        F.col("mim_number").isNotNull() & (F.trim(F.col("mim_number")) != "")
    ).select(
        F.trim(F.col("mim_number")).alias("gene_mim"),
        F.trim(F.col("cyto_location")).alias("cyto_location"),
        F.split(F.col("gene_symbols"), ", ").alias("gene_symbols"),
        p_label.alias("p_label"),
        p_mim.alias("p_mim"),
        map_key.alias("map_key"),
        F.col("row_order"),
    )


def gene_phenotypes(assocs: DataFrame) -> DataFrame:
    """A1: regroup associations by gene with first-wins gene-level
    fields (reference parse_morbid_map builds this dict directly;
    min_by(row_order) reproduces file-order 'first')."""
    return assocs.groupBy("gene_mim").agg(
        F.min_by("cyto_location", "row_order").alias("cyto_location"),
        F.min_by("gene_symbols", "row_order").alias("gene_symbols"),
        F.sort_array(
            F.collect_list(
                F.struct("row_order", "p_mim", "p_label", "map_key")
            )
        ).alias("phenotype_associations"),
    )


def phenotype_genes(assocs: DataFrame) -> DataFrame:
    """A2: inverted grouping phenotype → gene associations
    (reference get_phenotype_genes omim_txt_parser.py:673-688)."""
    return (
        assocs.filter(F.col("p_mim") != "")
        .groupBy("p_mim")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct("row_order", "gene_mim", "p_label", "map_key")
                )
            ).alias("gene_associations")
        )
    )


# ---------------------------------------------------------------------------
# mim2gene + genemap2 reconciliation (reference omim_txt_parser.py:404-438)
# ---------------------------------------------------------------------------


def parse_mim2gene(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """mim2gene scan → (gene_map, pheno_map) of mim → entrez id
    (F3: one scan, two filtered projections)."""
    base = raw.filter(
        F.col("entrez_id").isNotNull() & (F.col("entrez_id") != "")
    )
    gene_map = base.filter(F.col("entry_type").isin(*GENE_ENTRY_TYPES)).select(
        "mim_number", "entrez_id"
    )
    pheno_map = base.filter(
        F.col("entry_type").isin(*PHENOTYPE_ENTRY_TYPES)
    ).select("mim_number", "entrez_id")
    return gene_map, pheno_map


def reconcile_hgnc_symbol_maps(
    mim2gene: DataFrame, genemap2: DataFrame
) -> DataFrame:
    """J3: mim→HGNC-symbol from mim2gene ∪ genemap2; a key mapped to
    two different symbols is DROPPED, not resolved (reference
    omim_txt_parser.py:426-438)."""
    a = mim2gene.filter(
        F.col("hgnc_symbol").isNotNull() & (F.col("hgnc_symbol") != "")
    ).select(F.col("mim_number").alias("mim"), F.col("hgnc_symbol").alias("sym_a"))
    b = genemap2.filter(
        F.col("approved_gene_symbol").isNotNull()
        & (F.col("approved_gene_symbol") != "")
    ).select(
        F.col("mim_number").alias("mim"),
        F.col("approved_gene_symbol").alias("sym_b"),
    )
    joined = a.join(b, "mim", "full_outer")
    return joined.filter(
        F.col("sym_a").isNull()
        | F.col("sym_b").isNull()
        | (F.col("sym_a") == F.col("sym_b"))
    ).select(
        "mim", F.coalesce("sym_a", "sym_b").alias("hgnc_symbol")
    )


# ---------------------------------------------------------------------------
# phenotypicSeries (reference omim_txt_parser.py:349-364)
# ---------------------------------------------------------------------------


def parse_phenotypic_series(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Ragged file → (series(ps, title), members(ps, member_mim)); the
    'PS' prefix is stripped (stored bare, re-prefixed at emission)."""
    ps = F.regexp_replace(F.trim(F.col("ps_id")), "^PS", "")
    series = raw.filter(
        F.col("col2").isNotNull() & F.col("col3").isNull()
    ).select(ps.alias("ps"), F.trim(F.col("col2")).alias("title"))
    members = raw.filter(F.col("col3").isNotNull()).select(
        ps.alias("ps"), F.trim(F.col("col2")).alias("member_mim")
    )
    return series, members


# ---------------------------------------------------------------------------
# HGNC id↔symbol with quality gate (reference omim_txt_parser.py:610-655)
# ---------------------------------------------------------------------------


class HgncQualityError(ValueError):
    pass


def hgnc_symbol_id_map(
    hgnc: DataFrame, max_bad_ratio: float = 0.01
) -> DataFrame:
    """symbol → numeric hgnc id ('HGNC:5' → '5'), skipping null rows;
    fails the build if >1% of rows are bad (F10 quality gate — the one
    driver-side action, a 2-number aggregate)."""
    bad = F.col("hgnc_id").isNull() | F.col("symbol").isNull()
    counts = hgnc.agg(
        F.count("*").alias("total"), F.sum(bad.cast("long")).alias("n_bad")
    ).collect()[0]
    if counts.total and counts.n_bad / counts.total > max_bad_ratio:
        raise HgncQualityError(
            f"{counts.n_bad}/{counts.total} HGNC rows missing id/symbol "
            f"(> {max_bad_ratio:.0%} threshold)"
        )
    return hgnc.filter(~bad).select(
        F.col("symbol"),
        F.substring_index("hgnc_id", ":", -1).alias("hgnc_id"),
    )
