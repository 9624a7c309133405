"""Release-artifact converters (omim_spark/io/artifacts.py) — the
reference makefile's serialization tail (makefile:41-58):
``omim.sssom.tsv`` (sssom parse) and ``omim.json`` (robot convert).
Golden-style assertions over the synthetic fixture graph, plus the
byte-determinism contract every sink in this repo carries."""

from __future__ import annotations

import json

import pytest

from omim_spark.io.artifacts import (
    SSSOM_COLUMNS,
    obograph_edges,
    obograph_nodes,
    sssom_rows,
    write_obograph_json,
    write_sssom_tsv,
)
from omim_spark.pipeline import build_graph


@pytest.fixture(scope="module")
def build(spark, omim_data_dir):
    return build_graph(spark, omim_data_dir, version_date="2026-01-01")


class TestSssomTsv:
    def test_rows_flatten_exact_matches_with_labels(self, build):
        rows = {
            (r.subject_id, r.object_id): r
            for r in sssom_rows(build.triples).collect()
        }
        # the fixture's UMLS + ORPHANET mappings for Prune belly
        # (conftest MAPPINGS) and the HGNC gene link
        pb = rows[("OMIM:100100", "UMLS:C0033770")]
        assert pb.subject_label == "prune belly syndrome"
        assert pb.predicate_id == "skos:exactMatch"
        # semapv EntityMatching term sssom-py assigns to ingested
        # xref/exactMatch assertions (validators reject non-semapv)
        assert pb.mapping_justification == "semapv:UnspecifiedMatching"
        assert ("OMIM:100100", "ORPHANET:2970") in rows
        assert ("OMIM:118494", "HGNC:1950") in rows

    def test_file_has_yaml_header_and_used_curie_map(self, build, tmp_path):
        path = tmp_path / "omim.sssom.tsv"
        write_sssom_tsv(build.triples, str(path))
        lines = path.read_text().splitlines()
        header = [l for l in lines if l.startswith("#")]
        body = [l for l in lines if not l.startswith("#")]
        assert any(l.startswith("# mapping_set_id:") for l in header)
        assert any(l.startswith("# license:") for l in header)
        assert "# curie_map:" in header
        declared = {
            l.split(":")[0].removeprefix("#").strip()
            for l in header
            if l.startswith("#   ")
        }
        assert body[0] == "\t".join(SSSOM_COLUMNS)
        # every prefix used by a mapping row is declared in the header
        used = set()
        for l in body[1:]:
            cells = l.split("\t")
            used.add(cells[0].split(":")[0])
            used.add(cells[3].split(":")[0])
        assert used <= declared
        # prefixes used by the fixed columns are declared too
        assert {"skos", "semapv"} <= declared
        # reference metadata defaults carried through
        assert any(l.startswith("# mapping_set_description:") for l in header)
        assert any(l.startswith("# creator_id:") for l in header)
        # rows are ordered
        keys = [(l.split("\t")[0], l.split("\t")[3]) for l in body[1:]]
        assert keys == sorted(keys)

    def test_byte_deterministic(self, build, tmp_path):
        a, b = tmp_path / "a.tsv", tmp_path / "b.tsv"
        write_sssom_tsv(build.triples, str(a))
        write_sssom_tsv(build.triples, str(b))
        assert a.read_bytes() == b.read_bytes()


class TestObographJson:
    def test_document_parses_and_expands_uris(self, build, tmp_path):
        path = tmp_path / "omim.json"
        write_obograph_json(build.triples, str(path))
        doc = json.loads(path.read_text())
        (g,) = doc["graphs"]
        assert g["nodes"] and g["edges"]
        for n in g["nodes"]:
            assert n["id"].startswith("http"), n["id"]
            assert n["type"] == "CLASS"
        for e in g["edges"]:
            assert e["sub"].startswith("http")
            assert e["obj"].startswith("http")
        ids = [n["id"] for n in g["nodes"]]
        assert ids == sorted(ids)  # deterministic node order

    def test_restriction_edges_collapse_to_property(self, build):
        """The Prune belly golden (reference README.md:202-224): the
        gene→disease restriction must surface as an edge whose pred is
        the expanded RO property, not scaffolding bnodes."""
        edges = {
            (e.sub, e.pred, e.obj) for e in obograph_edges(build.triples).collect()
        }
        assert (
            "https://omim.org/entry/100100",
            "http://purl.obolibrary.org/obo/RO_0004003",
            "https://omim.org/entry/118494",
        ) in edges
        # direct named-class subClassOf (series membership) → is_a
        assert (
            "https://omim.org/entry/100100",
            "is_a",
            "https://omim.org/phenotypicSeries/PS100100",
        ) in edges
        # no bnode ever leaks into the edge set
        assert all(
            s.startswith("http") and o.startswith("http")
            for s, _, o in edges
        )

    def test_node_meta_carries_synonyms_and_label(self, build, tmp_path):
        path = tmp_path / "omim.json"
        write_obograph_json(build.triples, str(path))
        doc = json.loads(path.read_text())
        nodes = {n["id"]: n for n in doc["graphs"][0]["nodes"]}
        pb = nodes["https://omim.org/entry/100100"]
        assert pb["lbl"] == "prune belly syndrome"
        syns = {s["val"] for s in pb.get("meta", {}).get("synonyms", [])}
        assert syns  # fixture titles carry symbol synonyms
        # xref val is the raw CURIE (robot's obographs format), while
        # node/edge ids stay expanded URIs
        xrefs = {x["val"] for x in pb.get("meta", {}).get("xrefs", [])}
        assert "UMLS:C0033770" in xrefs
        assert all(not v.startswith("http") for v in xrefs)
        # NCBITaxon expands via the artifact-local extra namespace
        assert "http://purl.obolibrary.org/obo/NCBITaxon_9606" in nodes

    def test_byte_deterministic(self, build, tmp_path):
        a, b = tmp_path / "a.json", tmp_path / "b.json"
        write_obograph_json(build.triples, str(a))
        write_obograph_json(build.triples, str(b))
        assert a.read_bytes() == b.read_bytes()

    def test_nodes_cover_every_named_class(self, build):
        from pyspark.sql import functions as F

        named_classes = (
            build.triples.filter(
                (F.col("predicate") == "rdf:type")
                & (F.col("object") == "owl:Class")
                & F.col("subject").contains(":")
            )
            .select("subject")
            .distinct()
            .count()
        )
        assert obograph_nodes(build.triples).count() == named_classes
