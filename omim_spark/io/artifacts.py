"""Release-artifact converters — the tail of the reference's makefile
chain (makefile:41-58):

- ``omim.sssom.tsv``   (reference: ``sssom parse omim.json -m
  data/metadata.sssom.yml``) — the mapping-set TSV flattening every
  ``skos:exactMatch`` edge of the graph, with the SSSOM ``# ``-prefixed
  YAML metadata header and a curie_map derived from the prefixes the
  mappings actually use.
- ``omim.json``        (reference: ``robot convert -i omim.owl -o
  omim.json``) — an obographs-shaped JSON export of the triples
  DataFrame.  Schema (documented simplification of obographs 1.0):
  ``{"graphs": [{"id", "nodes": [{"id", "lbl"?, "type": "CLASS",
  "meta"?: {"deprecated"?, "synonyms"?: [{"pred", "val"}],
  "xrefs"?: [{"val"}]}}], "edges": [{"sub", "pred", "obj"}]}]}`` where
  ``pred`` is ``is_a`` for direct subClassOf between named classes and
  the expanded property URI for subClassOf-someValuesFrom restrictions
  (exactly obographs' ExistentialRestrictionExpression edge collapse);
  node/edge ids are full URIs (curies.NAMESPACES expansion).  Axiom
  reifications and restriction scaffolding are intentionally collapsed
  into edges, as robot's obographs writer does.

Scale: both artifacts derive from the triples DataFrame with joins on
the subject key only; serialization streams ordered partitions through
the driver in bounded memory (same contract as write_ttl/write_tsv).
Output is byte-deterministic: every row stream is totally ordered and
blank-node ids are already deterministic md5 (triples.py:59-69).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from omim_spark.curies import NAMESPACES
from omim_spark.curies import curie_to_uri as _curie_to_uri_base
from omim_spark.operators.checkpoint import cut_lineage

# The TTL sink binds NCBITaxon in its header rather than NAMESPACES;
# the obographs export needs the expansion inline.
_EXTRA_NS = {"NCBITaxon": "http://purl.obolibrary.org/obo/NCBITaxon_"}


def curie_to_uri(col):
    return _curie_to_uri_base(col, extra=_EXTRA_NS)

# ---------------------------------------------------------------------------
# SSSOM mapping-set TSV
# ---------------------------------------------------------------------------

SSSOM_COLUMNS = [
    "subject_id",
    "subject_label",
    "predicate_id",
    "object_id",
    "mapping_justification",
]

# sssom-py assigns semapv:UnspecifiedMatching to mappings ingested
# from an ontology's own xref/exactMatch assertions — which is what
# the reference's `sssom parse omim.json` produces.  (It must be a
# semapv EntityMatching term or SSSOM validators reject the file.)
SSSOM_JUSTIFICATION = "semapv:UnspecifiedMatching"


def sssom_rows(triples: DataFrame) -> DataFrame:
    """Flatten the graph's ``skos:exactMatch`` edges to SSSOM rows.

    subject_label left-joins the subject's ``rdfs:label`` (min() picks
    deterministically if an entry ever carried two); mappings without
    a label keep an empty string, matching sssom-py's TSV rendering."""
    ex = triples.filter(
        (F.col("predicate") == "skos:exactMatch") & (F.col("obj_kind") == "uri")
    )
    labels = (
        triples.filter(F.col("predicate") == "rdfs:label")
        .groupBy("subject")
        .agg(F.min("object").alias("subject_label"))
        .withColumnRenamed("subject", "subject_id")
    )
    return (
        ex.select(
            F.col("subject").alias("subject_id"),
            F.col("object").alias("object_id"),
        )
        .distinct()
        .join(labels, "subject_id", "left")
        .select(
            "subject_id",
            F.coalesce("subject_label", F.lit("")).alias("subject_label"),
            F.lit("skos:exactMatch").alias("predicate_id"),
            "object_id",
            F.lit(SSSOM_JUSTIFICATION).alias("mapping_justification"),
        )
    )


def _used_curie_map(rows: DataFrame) -> dict[str, str]:
    """curie_map restricted to prefixes the mapping rows actually use
    (what sssom-py writes) — a bounded distinct over two id columns.
    A prefix with no NAMESPACES expansion raises: the header's
    contract is that every prefix in the file is declared, so an
    unknown prefix must fail the export loudly, not ship an
    unresolvable mapping set.

    ``skos`` and ``semapv`` are added unconditionally: every row uses
    them in predicate_id / mapping_justification, so the map must
    declare them rather than lean on consumers' builtin contexts.
    Documented divergence from the reference curie_map: this pipeline
    emits ``ORPHANET:`` CURIEs (the prefix its triple emitters use)
    where the reference's metadata.sssom.yml declares ``ORPHA`` —
    both expand to the same ORDO namespace."""
    prefixes = {
        r.p
        for r in rows.select(
            F.explode(
                F.array(
                    F.substring_index("subject_id", ":", 1),
                    F.substring_index("object_id", ":", 1),
                )
            ).alias("p")
        )
        .distinct()
        .collect()
    } | {"skos", "semapv"}
    unknown = sorted(p for p in prefixes if p not in NAMESPACES)
    if unknown:
        raise ValueError(
            f"SSSOM export: mapping rows use prefixes with no declared "
            f"namespace expansion: {unknown} — add them to "
            "curies.NAMESPACES (or fix the emitter)"
        )
    return {p: NAMESPACES[p] for p in sorted(prefixes)}


def _yaml_header(metadata: dict) -> str:
    """Minimal deterministic YAML renderer for the SSSOM header: flat
    string values plus one level of nested mapping (curie_map).  Values
    are emitted as single-line double-quoted scalars — a documented
    simplification of the reference's hand-written metadata.sssom.yml
    (whose one folded multi-line value round-trips to a single line
    anyway)."""
    lines: list[str] = []
    for k, v in metadata.items():
        if isinstance(v, dict):
            lines.append(f"# {k}:")
            for k2, v2 in sorted(v.items()):
                lines.append(f"#   {k2}: {json.dumps(str(v2))}")
        else:
            lines.append(f"# {k}: {json.dumps(str(v))}")
    return "\n".join(lines) + "\n"


def write_sssom_tsv(
    triples: DataFrame, path: str, metadata: dict | None = None
) -> None:
    """SSSOM sink: ``# ``-YAML metadata header, tab-separated columns,
    rows ordered (subject_id, object_id).  ``metadata`` defaults to the
    reference's data/metadata.sssom.yml fields (mapping_set_id /
    license / curie_map); a passed dict is written as-is except
    curie_map, which is always recomputed from the data so the header
    never lies about the prefixes in the file."""
    # The rows lineage is executed twice (curie_map scan + the ordered
    # body stream) — checkpoint so the exactMatch filter, label
    # aggregate, and join run once.
    rows = sssom_rows(triples).transform(cut_lineage, eager=False)
    meta = dict(metadata or {})
    meta.setdefault(
        "mapping_set_id",
        "http://purl.obolibrary.org/obo/mondo/mondo-ingest/mapping/omim.sssom.tsv",
    )
    meta.setdefault(
        "mapping_set_description",
        "The file `omim.sssom.tsv` flattens every skos:exactMatch edge "
        "of the OMIM graph build. For data sources, assumptions, and "
        "computations, refer to the repository README.",
    )
    meta.setdefault("license", "https://creativecommons.org/licenses/by/4.0/")
    meta.setdefault("creator_id", "https://orcid.org/0000-0002-2906-7319")
    meta["curie_map"] = _used_curie_map(rows)
    with open(path, "w") as f:
        f.write(_yaml_header(meta))
        f.write("\t".join(SSSOM_COLUMNS) + "\n")
        for r in rows.orderBy("subject_id", "object_id").toLocalIterator():
            f.write("\t".join("" if v is None else str(v) for v in r) + "\n")


# ---------------------------------------------------------------------------
# Obographs JSON
# ---------------------------------------------------------------------------


def obograph_nodes(triples: DataFrame) -> DataFrame:
    """One row per named owl:Class: (id, json) where json is the
    obographs node object.  Labels/synonyms/deprecation/exactMatch
    aggregate per subject in one grouped pass; ids expand to URIs."""
    named = F.col("subject").contains(":")  # bnode subjects are md5 hex
    classes = (
        triples.filter(
            (F.col("predicate") == "rdf:type")
            & (F.col("object") == "owl:Class")
            & named
        )
        .select("subject")
        .distinct()
    )
    props = (
        triples.join(classes, "subject", "semi")
        .filter(
            F.col("predicate").isin(
                "rdfs:label",
                "oboInOwl:hasExactSynonym",
                "oboInOwl:hasRelatedSynonym",
                "owl:deprecated",
                "skos:exactMatch",
            )
        )
        .groupBy("subject")
        .agg(
            F.min(
                F.when(F.col("predicate") == "rdfs:label", F.col("object"))
            ).alias("lbl"),
            F.sort_array(
                F.collect_set(
                    F.when(
                        F.col("predicate").startswith("oboInOwl:has"),
                        F.struct(
                            F.substring_index("predicate", ":", -1).alias(
                                "pred"
                            ),
                            F.col("object").alias("val"),
                        ),
                    )
                )
            ).alias("synonyms"),
            # robot's obographs writer emits xref val as the raw CURIE
            # string (node/edge ids stay expanded URIs) — match that,
            # since the reference's `sssom parse -I obographs-json`
            # step consumes this exact checkpoint format.
            F.sort_array(
                F.collect_set(
                    F.when(
                        F.col("predicate") == "skos:exactMatch",
                        F.struct(F.col("object").alias("val")),
                    )
                )
            ).alias("xrefs"),
            F.max(
                F.when(F.col("predicate") == "owl:deprecated", F.lit(True))
            ).alias("deprecated"),
        )
    )
    node = classes.join(props, "subject", "left").select(
        curie_to_uri(F.col("subject")).alias("id"),
        F.to_json(
            F.struct(
                curie_to_uri(F.col("subject")).alias("id"),
                F.col("lbl"),
                F.lit("CLASS").alias("type"),
                F.when(
                    F.col("deprecated").isNotNull()
                    | (F.size(F.coalesce("synonyms", F.array())) > 0)
                    | (F.size(F.coalesce("xrefs", F.array())) > 0),
                    F.struct(
                        F.col("deprecated"),
                        F.when(F.size("synonyms") > 0, F.col("synonyms")).alias(
                            "synonyms"
                        ),
                        F.when(F.size("xrefs") > 0, F.col("xrefs")).alias(
                            "xrefs"
                        ),
                    ),
                ).alias("meta"),
            )
        ).alias("json"),
    )
    return node


def obograph_edges(triples: DataFrame) -> DataFrame:
    """One row per edge: (sub, pred, obj, json).

    Direct named-class subClassOf → ``is_a``; subClassOf pointing at a
    restriction bnode collapses to (sub, onProperty URI, someValuesFrom
    URI) — obographs' standard existential-restriction edge."""
    sub_named = triples.filter(
        (F.col("predicate") == "rdfs:subClassOf") & (F.col("obj_kind") == "uri")
    ).select(
        curie_to_uri(F.col("subject")).alias("sub"),
        F.lit("is_a").alias("pred"),
        curie_to_uri(F.col("object")).alias("obj"),
    )
    sub_bnode = (
        triples.filter(
            (F.col("predicate") == "rdfs:subClassOf")
            & (F.col("obj_kind") == "bnode")
        )
        .select("subject", F.col("object").alias("bn"))
    )
    on_prop = triples.filter(F.col("predicate") == "owl:onProperty").select(
        F.col("subject").alias("bn"), F.col("object").alias("prop")
    )
    svf = triples.filter(
        F.col("predicate") == "owl:someValuesFrom"
    ).select(F.col("subject").alias("bn"), F.col("object").alias("filler"))
    restriction = sub_bnode.join(on_prop, "bn").join(svf, "bn").select(
        curie_to_uri(F.col("subject")).alias("sub"),
        curie_to_uri(F.col("prop")).alias("pred"),
        curie_to_uri(F.col("filler")).alias("obj"),
    )
    edges = sub_named.unionByName(restriction).distinct()
    return edges.select(
        "sub",
        "pred",
        "obj",
        F.to_json(F.struct("sub", "pred", "obj")).alias("json"),
    )


def write_obograph_json(
    triples: DataFrame, path: str, graph_id: str = "https://omim.org/"
) -> None:
    """Stream the obographs document to ``path``: nodes ordered by id,
    edges ordered by (sub, pred, obj) — byte-deterministic across runs
    and partitionings, bounded driver memory (one partition at a time
    through ``toLocalIterator``, same contract as write_ttl)."""
    nodes = obograph_nodes(triples).orderBy("id").select("json")
    edges = obograph_edges(triples).orderBy("sub", "pred", "obj").select("json")
    with open(path, "w") as f:
        f.write('{"graphs":[{"id":%s,"nodes":[' % json.dumps(graph_id))
        first = True
        for r in nodes.toLocalIterator():
            f.write(("" if first else ",") + r.json)
            first = False
        f.write('],"edges":[')
        first = True
        for r in edges.toLocalIterator():
            f.write(("" if first else ",") + r.json)
            first = False
        f.write("]}]}")
