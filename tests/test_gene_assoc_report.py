"""entry_gene_association_report — the Spark twin of the reference's
``extract_omim_information.py`` enrichment utility (:24-125).  Fixture
entries mirror the OMIM API response shape the script consumes
(prefix / textSectionList / externalLinks.hgnc / phenotypeMapList);
assertions pin the script's row-explosion and default-empty semantics,
including the OMIMPS no-entry branch and the no-phenotype ``or [{}]``
branch."""

from __future__ import annotations

import json

import pytest

from omim_spark.api_entries import entry_gene_association_report
from omim_spark.io.readers import read_entry_json

ENTRIES = {
    "omim": {
        "entryList": [
            {
                "entry": {
                    "prefix": "#",
                    "mimNumber": 100100,
                    "titles": {"preferredTitle": "PRUNE BELLY SYNDROME; PBS"},
                    "textSectionList": [
                        {
                            "textSection": {
                                "textSectionTitle": "Description",
                                "textSectionContent": "not the one",
                            }
                        },
                        {
                            "textSection": {
                                "textSectionTitle": "Text",
                                "textSectionContent": "Prune belly\nsyndrome is rare.",
                            }
                        },
                    ],
                    "externalLinks": {"hgnc": ""},
                    "phenotypeMapList": [
                        {
                            "phenotypeMap": {
                                "phenotype": "Prune belly syndrome",
                                "phenotypeMimNumber": 100100,
                                "mimNumber": 118494,
                                "phenotypeMappingKey": 3,
                                "approvedGeneSymbols": "CHRM3",
                            }
                        },
                        {
                            "phenotypeMap": {
                                "phenotype": "Some second phenotype",
                                "phenotypeMappingKey": 2,
                            }
                        },
                    ],
                }
            },
            {
                "entry": {
                    "prefix": "*",
                    "mimNumber": 118494,
                    "titles": {"preferredTitle": "CHRM3"},
                    "externalLinks": {"hgnc": "1950"},
                }
            },
        ]
    }
}

EVIDENCE = [
    (
        "MONDO:0008556",
        "prune belly syndrome",
        "OMIM:100100, UMLS:C0033770, OMIMPS:999999",
        "TRUE",
    ),
    ("MONDO:0000001", "gene row", "OMIM:118494", "FALSE"),
    ("MONDO:0000002", "no omim xref", "Orphanet:2970", "TRUE"),
]


@pytest.fixture(scope="module")
def report(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("gene_assoc")
    (d / "entries.json").write_text(json.dumps(ENTRIES))
    entries = read_entry_json(spark, str(d / "entries.json"))
    evidence = spark.createDataFrame(
        EVIDENCE,
        "mondo_id string, mondo_label string, xrefs string, "
        "should_have_gene_annotation string",
    )
    return entry_gene_association_report(evidence, entries).collect()


def test_phenotypes_explode_one_row_each(report):
    pb = [r for r in report if r.extracted_omim_curie == "OMIM:100100"]
    assert len(pb) == 2  # two phenotypeMap entries
    full = next(r for r in pb if r.phenotype == "Prune belly syndrome")
    assert full.omim_prefix == "#"
    assert full.phenotypeMimNumber == "100100"
    assert full.geneMimNumber == "118494"
    assert full.phenotypeMappingKey == "3"
    assert full.approvedGeneSymbols == "CHRM3"
    assert full.omimURL == (
        '=HYPERLINK("https://omim.org/entry/100100", '
        '"https://omim.org/entry/100100")'
    )
    assert full.textSectionContent == "Prune belly syndrome is rare."
    assert full.mondo_id == "MONDO:0008556"


def test_phenotype_without_mim_gets_empty_url(report):
    partial = next(r for r in report if r.phenotype == "Some second phenotype")
    assert partial.phenotypeMimNumber == ""
    assert partial.geneMimNumber == ""
    assert partial.omimURL == ""
    assert partial.approvedGeneSymbols == ""


def test_unresolvable_curie_keeps_row_with_empty_fields(report):
    """OMIMPS ids 404 in the script (:77-84) → one row, empty entry
    fields — the evidence context survives."""
    ps = [r for r in report if r.extracted_omim_curie == "OMIMPS:999999"]
    assert len(ps) == 1
    r = ps[0]
    assert r.omim_prefix == "" and r.phenotype == "" and r.hgncID == ""
    assert r.mondo_id == "MONDO:0008556"


def test_entry_without_phenotypes_yields_single_row(report):
    """The ``or [{}]`` branch (:100): a gene entry with no
    phenotypeMapList still produces one row with its hgnc link."""
    gene = [r for r in report if r.extracted_omim_curie == "OMIM:118494"]
    assert len(gene) == 1
    assert gene[0].hgncID == "1950"
    assert gene[0].omim_prefix == "*"
    assert gene[0].phenotype == ""
    assert gene[0].textSectionContent == ""


def test_rows_without_omim_xrefs_are_dropped(report):
    """The script only iterates extracted OMIM ids (:96-99) — an
    evidence row with no OMIM xref contributes nothing."""
    assert not [r for r in report if r.mondo_id == "MONDO:0000002"]


def test_schema_tolerates_sparse_cache(spark):
    """A landed cache missing every optional branch (no text sections,
    no external links, no phenotype maps anywhere in the file) must
    degrade to empty strings, not AnalysisException — the reference
    script's ``.get(..., '')`` chains at schema level."""
    import tempfile, os

    d = tempfile.mkdtemp()
    sparse = {
        "omim": {
            "entryList": [
                {
                    "entry": {
                        "prefix": "%",
                        "mimNumber": 200200,
                        "titles": {"preferredTitle": "X"},
                    }
                }
            ]
        }
    }
    p = os.path.join(d, "entries.json")
    open(p, "w").write(json.dumps(sparse))
    entries = read_entry_json(spark, p)
    evidence = spark.createDataFrame(
        [("MONDO:1", "l", "OMIM:200200", "TRUE")],
        "mondo_id string, mondo_label string, xrefs string, "
        "should_have_gene_annotation string",
    )
    (r,) = entry_gene_association_report(evidence, entries).collect()
    assert r.omim_prefix == "%"
    assert r.textSectionContent == "" and r.hgncID == ""
    assert r.phenotype == "" and r.omimURL == ""


def test_filewide_missing_prefix_blanks_all_enrichment(spark):
    """The script's bare ``entry["prefix"]`` raises KeyError into its
    error branch (:34, :77-84), emptying EVERY enrichment field — when
    the landed cache carries no prefix column at all, the twin takes
    the same branch (see the docstring's divergence note for the
    row-level-null case, which schema inference cannot distinguish)."""
    import tempfile, os

    d = tempfile.mkdtemp()
    noprefix = {
        "omim": {
            "entryList": [
                {
                    "entry": {
                        "mimNumber": 100100,
                        "titles": {"preferredTitle": "X"},
                        "externalLinks": {"hgnc": "1950"},
                        "phenotypeMapList": [
                            {"phenotypeMap": {"phenotype": "P", "phenotypeMimNumber": 1}}
                        ],
                    }
                }
            ]
        }
    }
    p = os.path.join(d, "entries.json")
    open(p, "w").write(json.dumps(noprefix))
    entries = read_entry_json(spark, p)
    evidence = spark.createDataFrame(
        [("MONDO:1", "l", "OMIM:100100", "TRUE")],
        "mondo_id string, mondo_label string, xrefs string, "
        "should_have_gene_annotation string",
    )
    (r,) = entry_gene_association_report(evidence, entries).collect()
    assert r.omim_prefix == ""
    assert r.hgncID == "" and r.textSectionContent == ""
    assert r.phenotype == "" and r.phenotypeMimNumber == ""
