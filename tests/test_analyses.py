"""Analyses parity tests (reference analyses/ directory)."""

from pyspark.sql import functions as F

from omim_spark import analyses, parse
from omim_spark.io import readers


def test_equivalency_cliques(spark, omim_data_dir):
    mim_titles = parse.parse_mim_titles(
        readers.read_mim_titles(spark, f"{omim_data_dir}/mimTitles.txt")
    )
    # symbol map with a deliberate clique: two MIMs sharing CHRM3
    sym = spark.createDataFrame(
        [("118494", "CHRM3"), ("200200", "CHRM3"), ("100100", "UNIQ1")],
        ["mim", "hgnc_symbol"],
    )
    out = analyses.equivalency_cliques(mim_titles, sym).collect()
    by_mim = {r.mim_number: r for r in out}
    assert set(by_mim) == {"118494", "200200"}  # singleton UNIQ1 excluded
    assert by_mim["118494"].other_mims == "200200"
    assert by_mim["200200"].other_mims == "118494"
    assert by_mim["118494"].clique_size == 2


def test_morbidmap_gold_standard(spark, omim_data_dir):
    assocs = parse.parse_morbid_map(
        readers.read_morbidmap(spark, f"{omim_data_dir}/morbidmap.txt")
    )
    gold = [r.p_mim for r in analyses.morbidmap_gold_standard(assocs).collect()]
    assert "100100" in gold  # single key-3 assoc
    assert "300100" not in gold  # two assocs
    assert "400100" not in gold  # key 2
    assert "500100" not in gold  # key 1
