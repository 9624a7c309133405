"""End-to-end build pipeline (SURVEY §3.1): source TSVs → triples
DataFrame + report DataFrames — the Spark equivalent of
`python -m omim2obo` (reference omim2obo/main.py:227-528).

The whole build is ONE logical plan per sink: scans → parse
projections → broadcast-joined overlays → window-counted decision
table → union of ~20 triple emitters.  Stage boundaries appear only
at the A1/A2 groupBys and the p_mim window — exactly where the
reference materializes dict indexes (SURVEY §3.1 note).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omim_spark import associations as assoc_mod
from omim_spark import parse, schemas, triples as T
from omim_spark.entries import transform_entries
from omim_spark.io import readers
from omim_spark.queries import (
    add_flipped_mondo_mappings,
    add_hgnc_links,
    disease_gene_relationships,
    mondo_omim_genes,
    pmid_mentions,
)
from omim_spark.operators.checkpoint import cut_lineage


@dataclass
class BuildResult:
    triples: DataFrame
    review_cases: DataFrame
    susceptibility: DataFrame
    decided: DataFrame
    reports: dict[str, DataFrame] = field(default_factory=dict)


def load_known_capitalizations(spark: SparkSession, path: str) -> dict[str, str]:
    if not os.path.exists(path):
        return {}
    df = readers.read_curator_tsv(spark, path, schemas.KNOWN_CAPITALIZATIONS)
    return {
        r["lower_name"]: r["cap_name"]
        for r in df.collect()
        if r["lower_name"] is not None
    }


def load_omim_to_mondo(spark: SparkSession, path: str) -> DataFrame:
    """S5: SSSOM → (omim_mim, mondo_id), either orientation
    (reference main.py:87-109)."""
    raw = readers.read_sssom(spark, path)
    subj_is_omim = F.col("subject_id").startswith("OMIM:")
    obj_is_omim = F.col("object_id").startswith("OMIM:")
    oriented = raw.filter(subj_is_omim | obj_is_omim).select(
        F.when(subj_is_omim, F.col("subject_id"))
        .otherwise(F.col("object_id"))
        .alias("omim"),
        F.when(subj_is_omim, F.col("object_id"))
        .otherwise(F.col("subject_id"))
        .alias("mondo"),
    )
    return (
        oriented.filter(F.col("mondo").startswith("MONDO:"))
        .select(
            F.substring_index("omim", ":", -1).alias("omim_mim"),
            F.col("mondo").alias("mondo_id"),
        )
        .distinct()
    )


def build_graph(
    spark: SparkSession, data_dir: str, version_date: str = "1970-01-01"
) -> BuildResult:
    """Build the full triples graph + reports from a directory holding
    mimTitles.txt, morbidmap.txt, mim2gene.txt, genemap2.txt,
    phenotypicSeries.txt, hgnc_complete_set.txt,
    mondo_exactmatch_omim.sssom.tsv, protected-disease-gene.tsv,
    exclusions-disease-gene.tsv, known_capitalizations.tsv, and
    optionally pubmed-refs.tsv / mappings.tsv caches.

    ``version_date`` is an explicit parameter — the single permitted
    source of non-input state (SURVEY §7.4 determinism rule; the
    reference stamps datetime.now(), main.py:254-257).
    """
    p = lambda name: os.path.join(data_dir, name)  # noqa: E731

    # --- Parse sources -----------------------------------------------------
    # The multiply-consumed parsed bases are materialized ONCE via
    # cut_lineage (r13 optimization round): the triple emission below
    # is a ~20-leg union, and every leg that referenced mim_titles /
    # entries / assocs re-ran the text scan AND the parse projections
    # per leg — the build's dominant stage re-read mimTitles.txt in
    # FULL 17 times (event-log task census at 2000 replicas; that one
    # stage was 526 of 614 executor-seconds).  These tables are
    # source-proportional metadata (bounded by the OMIM entry count,
    # never corpus-scale), so materializing them is safe at any SF,
    # and the cut routes through the same deployment-tiered
    # cut_lineage as every other operator.
    # NOTE (r14, measured and rejected): hash-repartitioning mim_titles
    # here to parallelize the single-task entries leg (§2.5 input skew)
    # made the build ~7x SLOWER at 2000 replicas — the repartition
    # pushes the two ArrowEvalPython title-cleanup stages onto 32
    # concurrent tasks, and the Python-worker cold-start storm (32+
    # fresh workers importing pandas at once in the fresh-JVM bench
    # regime) costs 82 s cold / 13 s warm vs 2.1 s serial.  The Arrow
    # UDF stage must stay coarse; only post-checkpoint JVM work may
    # spread.
    mim_titles = parse.parse_mim_titles(
        readers.read_mim_titles(spark, p("mimTitles.txt"))
    ).transform(cut_lineage, eager=False)
    caps = load_known_capitalizations(spark, p("known_capitalizations.tsv"))
    entries = transform_entries(mim_titles, caps).transform(
        cut_lineage, eager=False
    )

    assocs = parse.parse_morbid_map(
        readers.read_morbidmap(spark, p("morbidmap.txt"))
    ).transform(cut_lineage, eager=False)
    mim2gene_raw = readers.read_mim2gene(spark, p("mim2gene.txt")).transform(
        cut_lineage, eager=False
    )
    gene_map, pheno_map = parse.parse_mim2gene(mim2gene_raw)
    genemap2 = (
        readers.read_genemap2(spark, p("genemap2.txt"))
        if os.path.exists(p("genemap2.txt"))
        else None
    )
    hgnc_symbol_map = (
        parse.reconcile_hgnc_symbol_maps(mim2gene_raw, genemap2)
        if genemap2 is not None
        else mim2gene_raw.filter(
            F.col("hgnc_symbol").isNotNull() & (F.col("hgnc_symbol") != "")
        ).select(F.col("mim_number").alias("mim"), "hgnc_symbol")
    )
    hgnc_ids = parse.hgnc_symbol_id_map(
        readers.read_hgnc(spark, p("hgnc_complete_set.txt"))
    )
    series, members = parse.parse_phenotypic_series(
        readers.read_phenotypic_series(spark, p("phenotypicSeries.txt"))
    )
    omim_to_mondo = load_omim_to_mondo(spark, p("mondo_exactmatch_omim.sssom.tsv"))

    protected = readers.read_curator_tsv(
        spark, p("protected-disease-gene.tsv"), schemas.PROTECTED_D2G
    ).select(
        F.substring_index("phenotype_mim", ":", -1).alias("p_mim"),
        F.substring_index("gene_mim", ":", -1).alias("gene_mim"),
        F.substring_index("hgnc_id", ":", -1).alias("hgnc_id"),
        F.col("orcid"),
        F.col("mondo_id"),
    )
    exclusions = readers.read_curator_tsv(
        spark, p("exclusions-disease-gene.tsv"), schemas.EXCLUSIONS_D2G
    ).select(
        F.substring_index("omim_id", ":", -1).alias("p_mim"), F.col("orcid")
    )

    # --- Decision table ----------------------------------------------------
    decided = assoc_mod.derive_associations(assocs, exclusions, protected)
    decided.cache()  # feeds three sinks (triples, review, robot tsv)

    # --- Triple emission ---------------------------------------------------
    # The entries checkpoint is single-partition (the mimTitles text
    # source reads as one split, and the Arrow-UDF cleanup must stay
    # coarse — see the parse-section note), so the fused entry-classes
    # explode, the heaviest emission leg, ran as ONE 3.2 s straggler
    # task that set the 4.3 s emission-stage wall (r14 event-log
    # census, 2000 replicas).  Repartition AFTER the checkpoint so
    # only the JVM-side explode spreads: the exchange moves a few MB
    # of OMIM-bounded rows, the Python boundary stays one task, and
    # the target derives from the session's parallelism.  Interleaved
    # full-build A/B (two rounds of 6 pairs, warm JVM): min 15.6/16.7
    # → 13.4/15.1 s.
    parts: list[DataFrame] = [
        T.ontology_header(spark, version_date),
        T.emit_entry_classes(
            entries.repartition(
                spark.sparkContext.defaultParallelism, "mim_number"
            )
        ),
    ]

    # Gene ids: OMIM gene → NCBIGENE exactMatch; phenotype → RO:0002200
    # has-phenotype restriction (reference main.py:385-394)
    parts.append(
        T.emit_exact_match(
            gene_map, "mim_number", F.concat(F.lit("NCBIGENE:"), F.col("entrez_id"))
        )
    )
    parts.append(
        T.emit_subclassof_restriction(
            pheno_map,
            F.lit("RO:0002200"),
            F.concat(F.lit("OMIM:"), F.col("mim_number")),
            F.concat(F.lit("NCBIGENE:"), F.col("entrez_id")),
        )
    )
    # HGNC symbol + id matches (main.py:390-394)
    parts.append(
        T.emit_exact_match(
            hgnc_symbol_map, "mim", F.concat(F.lit("HGNC_symbol:"), F.col("hgnc_symbol"))
        )
    )
    with_ids = hgnc_symbol_map.join(
        F.broadcast(hgnc_ids), hgnc_symbol_map.hgnc_symbol == hgnc_ids.symbol
    )
    parts.append(
        T.emit_exact_match(
            with_ids, "mim", F.concat(F.lit("HGNC:"), F.col("hgnc_id"))
        )
    )

    # Phenotypic series (main.py:396-404)
    parts.append(T.emit_phenotypic_series(series, members))

    # Gene-chromosome restrictions (main.py:407-415): first-wins cyto
    gene_cyto = parse.gene_phenotypes(assocs).filter(
        F.col("cyto_location").isNotNull() & (F.col("cyto_location") != "")
    )
    parts.append(
        T.emit_subclassof_restriction(
            gene_cyto,
            F.lit("RO:0002525"),  # is subsequence of
            F.concat(F.lit("CHR:9606chr"), F.col("cyto_location")),
            F.concat(F.lit("OMIM:"), F.col("gene_mim")),
        )
    )

    # Associations
    causal = decided.filter(
        F.col("action").isin(assoc_mod.ACT_CAUSAL, assoc_mod.ACT_PROTECTED)
    )
    parts.append(T.emit_gene_disease_associations(causal))
    prot_match = decided.filter(
        (F.col("action") == assoc_mod.ACT_PROTECTED) & F.col("hgnc_id").isNotNull()
    )
    parts.append(
        T.emit_exact_match(
            prot_match, "gene_mim", F.concat(F.lit("HGNC:"), F.col("hgnc_id"))
        )
    )
    noncausal = decided.filter(F.col("action") == assoc_mod.ACT_NONCAUSAL)
    parts.append(
        T.emit_restriction_with_evidence(
            noncausal,
            F.col("predicate"),
            F.concat(F.lit("OMIM:"), F.col("p_mim")),
            F.concat(F.lit("OMIM:"), F.col("gene_mim")),
            F.col("evidence"),
            F.col("orcid"),
        )
    )

    # Protected MONDO mappings (main.py:490-497)
    parts.append(
        T.emit_exact_match(
            protected.filter(F.col("mondo_id").isNotNull()),
            "p_mim",
            F.col("mondo_id"),
        )
    )

    # PubMed / UMLS / Orphanet links from caches (main.py:500-509)
    pubmed_path, mappings_path = p("pubmed-refs.tsv"), p("mappings.tsv")
    if os.path.exists(pubmed_path):
        pubmed = readers.read_cache_tsv(spark, pubmed_path, schemas.PUBMED_REFS_CACHE)
        parts.append(
            T.emit_packed_id_links(pubmed, "mim", "pmid_refs", "IAO:0000142", "PMID:")
        )
    if os.path.exists(mappings_path):
        mappings = readers.read_cache_tsv(spark, mappings_path, schemas.MAPPINGS_CACHE)
        parts.append(
            T.emit_packed_id_links(
                mappings, "mim", "umls_ids", "skos:exactMatch", "UMLS:"
            )
        )
        parts.append(
            T.emit_packed_id_links(
                mappings, "mim", "orphanet_ids", "skos:exactMatch", "ORPHANET:"
            )
        )

    all_triples = T.union_triples(*parts).distinct()

    # --- Merged graph (the reference's `make omim.owl` stage:
    # ROBOT merge of omim.ttl + SSSOM mapping OWL, then the two SPARQL
    # INSERT rewrites — makefile:61-66) -------------------------------------
    sssom_triples = omim_to_mondo.select(
        F.concat(F.lit("OMIM:"), F.col("omim_mim")).alias("subject"),
        F.lit("skos:exactMatch").alias("predicate"),
        F.col("mondo_id").alias("object"),
        F.lit("uri").alias("obj_kind"),
        F.lit(None).cast("string").alias("datatype"),
    )
    # Materialize between stages: the rewrites self-join the graph, so
    # feeding them the raw ~20-way-union plan would replan the whole
    # build per pattern leg (plan-depth blowup).  localCheckpoint cuts
    # the lineage — the graph is the natural pipeline breaker here,
    # same role as the reference's serialized omim.ttl between make
    # stages.
    #
    # r14: EVERY rewrite layer gets its own cut, not just the ends.
    # add_flipped_mondo_mappings references its input 3× (union +
    # filter leg + anti-join leg) and add_hgnc_links 5× (union + four
    # pattern legs), and because Catalyst pushes each leg's filter
    # below the layer's distinct, the subtrees are not exchange-
    # reusable — the event-log census showed five stages re-reading
    # the 136 MB all_triples checkpoint and re-running the union+
    # distinct per leg (guide §2.4 shared-subtree recompute).  Each
    # layer is graph-sized (OMIM-entry-proportional, never corpus-
    # scale), so materializing it once per layer is scale-safe.
    all_triples = all_triples.transform(cut_lineage, eager=True)
    base = (
        T.union_triples(all_triples, sssom_triples)
        .distinct()
        .transform(cut_lineage, eager=False)
    )
    # r14: the two INSERT rewrites are applied to the SAME base layer
    # and unioned in one pass instead of sequentially (each former
    # layer carried its own checkpoint materialization + a second
    # full-graph distinct).  Equivalent by construction:
    # add_flipped_mondo_mappings emits only skos:exactMatch triples
    # whose object starts with "MONDO:" (the flip swaps a subject that
    # passed a startswith("MONDO:") filter into the object slot), while
    # add_hgnc_links pattern-matches only rdfs:subClassOf /
    # owl:onProperty / owl:someValuesFrom predicates and exactMatch
    # edges whose OBJECT starts with "HGNC:" — so no flipped triple can
    # ever match an hgnc_links pattern and
    # add_hgnc_links(base ∪ flipped) ≡ add_hgnc_links(base) for every
    # input, not just this data.  The final distinct subsumes the
    # per-layer ones, so the merged SET is identical (pinned by
    # tests/test_pipeline.py::test_merged_rewrite_fusion).
    merged = (
        T.union_triples(base, add_flipped_mondo_mappings(base), add_hgnc_links(base))
        .distinct()
        .transform(cut_lineage, eager=True)
    )

    # --- Reports -----------------------------------------------------------
    omim_types = mim_titles.select("mim_number", "omim_type")
    review = assoc_mod.review_cases(decided, assocs, omim_types)
    susceptibility = assoc_mod.susceptibility_rows(assocs, omim_to_mondo)

    return BuildResult(
        triples=all_triples,
        review_cases=review,
        susceptibility=susceptibility,
        decided=decided,
        reports={
            "disease_gene_relationships": disease_gene_relationships(merged),
            "mondo_omim_genes": mondo_omim_genes(merged),
            "pmid_mentions": pmid_mentions(all_triples),
        },
    )
