"""Decision-table tests (reference main.py:417-488 semantics,
README.md:226-282)."""

import pytest
from pyspark.sql import functions as F

from omim_spark import associations as A
from omim_spark import parse, schemas
from omim_spark.io import readers
from omim_spark.pipeline import load_omim_to_mondo


@pytest.fixture(scope="module")
def decided(spark, omim_data_dir):
    assocs = parse.parse_morbid_map(
        readers.read_morbidmap(spark, f"{omim_data_dir}/morbidmap.txt")
    )
    protected = readers.read_curator_tsv(
        spark, f"{omim_data_dir}/protected-disease-gene.tsv", schemas.PROTECTED_D2G
    ).select(
        F.substring_index("phenotype_mim", ":", -1).alias("p_mim"),
        F.substring_index("gene_mim", ":", -1).alias("gene_mim"),
        F.substring_index("hgnc_id", ":", -1).alias("hgnc_id"),
        "orcid",
        "mondo_id",
    )
    exclusions = readers.read_curator_tsv(
        spark, f"{omim_data_dir}/exclusions-disease-gene.tsv", schemas.EXCLUSIONS_D2G
    ).select(F.substring_index("omim_id", ":", -1).alias("p_mim"), "orcid")
    return {
        (r.p_mim, r.gene_mim): r
        for r in A.derive_associations(assocs, exclusions, protected).collect()
    }, assocs


class TestDecisionTable:
    def test_causal_single_definitive(self, decided):
        d, _ = decided
        row = d[("100100", "118494")]
        assert row.action == A.ACT_CAUSAL
        assert row.predicate == "RO:0004013"
        assert row.evidence.startswith("Evidence: (3) The molecular basis")

    def test_susceptibility_label_skipped(self, decided):
        d, _ = decided
        assert d[("200100", "118500")].action == A.ACT_SKIP

    def test_nondisease_and_multi_skip(self, decided):
        d, _ = decided
        # 300100 has two assocs → both skip under key 3
        assert d[("300100", "118501")].action == A.ACT_SKIP
        assert d[("300100", "118502")].action == A.ACT_SKIP

    def test_key2_single_gets_key_predicate(self, decided):
        d, _ = decided
        row = d[("400100", "118503")]
        assert row.action == A.ACT_NONCAUSAL
        assert row.predicate == "RO:0003303"

    def test_key1_skipped(self, decided):
        d, _ = decided
        assert d[("500100", "118504")].action == A.ACT_SKIP

    def test_excluded_key3_downgraded(self, decided):
        d, _ = decided
        row = d[("600100", "118506")]
        assert row.action == A.ACT_NONCAUSAL
        assert row.predicate == "RO:0003302"
        assert row.orcid is not None  # exclusion orcid flows through

    def test_protected_short_circuits(self, decided):
        d, _ = decided
        row = d[("700100", "118507")]
        assert row.action == A.ACT_PROTECTED
        assert row.hgnc_id == "9001"

    def test_leftover_protected_appended(self, decided):
        d, _ = decided
        row = d[("800100", "118509")]
        assert row.action == A.ACT_PROTECTED
        assert row.evidence == A.PROTECTED_EVIDENCE


class TestSusceptibilityAndReview:
    def test_susceptibility_rows(self, spark, omim_data_dir, decided):
        _, assocs = decided
        o2m = load_omim_to_mondo(
            spark, f"{omim_data_dir}/mondo_exactmatch_omim.sssom.tsv"
        )
        rows = sorted(
            (r.mondo_id, r.omim_id)
            for r in A.susceptibility_rows(assocs, o2m).collect()
        )
        assert rows == [("MONDO:0011111", "OMIM:200100")]

    def test_review_cases(self, spark, omim_data_dir, decided):
        d, assocs = decided
        decided_df = spark.createDataFrame(list(d.values()))
        mim_titles = parse.parse_mim_titles(
            readers.read_mim_titles(spark, f"{omim_data_dir}/mimTitles.txt")
        )
        cases = A.review_cases(
            decided_df, assocs, mim_titles.select("mim_number", "omim_type")
        ).collect()
        by_code = {}
        for r in cases:
            by_code.setdefault(r.classCode, []).append(r.value)
        assert any("900100" in v for v in by_code[1])  # digenic
        assert any("901100" in v for v in by_code[3])  # somatic
        assert any("118505" in v for v in by_code[2])  # self-referential
        assert any("118494" in v for v in by_code[4])  # phenotype-is-gene
        names = {r.classCode: r.classShortName for r in cases}
        assert names[1] == "D2G: digenic"
        assert names[2] == "D2G: self-referential"
