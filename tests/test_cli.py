"""End-to-end CLI smoke: ``python -m omim_spark`` main() over the
synthetic fixture dir must produce the full artifact set (TTL +
review + ROBOT subset + reports) — the user-facing entry point the
pipeline tests bypass."""

from __future__ import annotations

from pathlib import Path

from omim_spark import cli


def test_cli_builds_all_artifacts(spark, omim_data_dir, tmp_path):
    out = tmp_path / "out"
    cli.main(
        [
            "--data-dir",
            str(omim_data_dir),
            "--out-dir",
            str(out),
            "--version-date",
            "2026-01-01",
        ]
    )
    ttl = out / "omim.ttl"
    assert ttl.is_file() and ttl.stat().st_size > 0
    head = ttl.read_text().splitlines()[:5]
    assert any(line.startswith("@prefix") for line in head)
    assert (out / "review.tsv").is_file()
    # makefile-tail artifacts (makefile:41-58)
    sssom = out / "omim.sssom.tsv"
    assert sssom.is_file()
    assert sssom.read_text().startswith("# mapping_set_id:")
    import json as _json

    doc = _json.loads((out / "omim.json").read_text())
    assert doc["graphs"][0]["nodes"]
    robot = out / "mondo-omim-susceptibility-subset.robot.tsv"
    assert robot.is_file()
    lines = robot.read_text().splitlines()
    # ROBOT template: header row then the subheader marker row
    assert lines[0].split("\t")[0] == "mondo_id"
    assert lines[1].split("\t")[0] == "ID"
    # at least one report written
    assert list(Path(out).glob("*.tsv"))


def test_cli_deterministic_ttl(spark, omim_data_dir, tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    for d in (a, b):
        cli.main(["--data-dir", str(omim_data_dir), "--out-dir", str(d)])
    assert (a / "omim.ttl").read_bytes() == (b / "omim.ttl").read_bytes()
