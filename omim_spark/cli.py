"""CLI: python -m omim_spark --data-dir <dir> --out-dir <dir>
(the Spark twin of `python -m omim2obo`, reference
omim2obo/interfaces/cli.py:30-46)."""

from __future__ import annotations

import argparse
import os

from omim_spark.io.artifacts import write_obograph_json, write_sssom_tsv
from omim_spark.io.writers import write_tsv, write_ttl
from omim_spark.pipeline import build_graph
from omim_spark.session import get_spark

SUSCEPTIBILITY_SUBHEADER = [
    "ID",
    "AI oboInOwl:inSubset",
    ">A oboInOwl:source",
]


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser("omim-spark")
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--out-dir", default="output")
    ap.add_argument("--version-date", default="1970-01-01")
    args = ap.parse_args(argv)

    spark = get_spark("omim-spark-build")
    os.makedirs(args.out_dir, exist_ok=True)
    result = build_graph(spark, args.data_dir, args.version_date)

    write_ttl(result.triples, os.path.join(args.out_dir, "omim.ttl"))
    # Release-artifact tail of the reference makefile (makefile:41-58):
    # obographs JSON (robot convert) + SSSOM mapping set (sssom parse).
    write_obograph_json(result.triples, os.path.join(args.out_dir, "omim.json"))
    write_sssom_tsv(result.triples, os.path.join(args.out_dir, "omim.sssom.tsv"))
    write_tsv(
        result.review_cases,
        os.path.join(args.out_dir, "review.tsv"),
        order_by=["classCode", "value"],
    )
    susc = result.susceptibility.selectExpr(
        "mondo_id",
        "'http://purl.obolibrary.org/obo/mondo#omim_susceptibility' AS subset",
        "omim_id",
    )
    write_tsv(
        susc,
        os.path.join(args.out_dir, "mondo-omim-susceptibility-subset.robot.tsv"),
        order_by=["mondo_id", "omim_id"],
        subheader=SUSCEPTIBILITY_SUBHEADER,
    )
    for name, df in result.reports.items():
        write_tsv(
            df,
            os.path.join(args.out_dir, f"{name}.tsv"),
            order_by=df.columns[:1],
        )
    print(f"Build complete → {args.out_dir}")


if __name__ == "__main__":
    main()
