"""Sinks (SURVEY §2.1 S9-S13): deterministic Turtle serializer, ROBOT
two-row-header templates, review TSV.

Determinism contract (SURVEY §7.4): the reference's outputs are
diffed across weekly releases, so every sink imposes a total order —
triples sort by (subject kind, subject, predicate, object); report
rows sort by their natural keys.  Blank-node ids are already
deterministic md5 (triples.py), so two runs — or two differently
partitioned cluster executions — produce byte-identical files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from omim_spark.curies import NAMESPACES

_XSD = "http://www.w3.org/2001/XMLSchema#"

def _pred_order():
    """Predicate ordering inside a subject block: rdf:type first
    (Turtle idiom), then alphabetical."""
    return F.when(F.col("predicate") == "rdf:type", F.lit("0")).otherwise(F.lit("1"))


def _escape_literal(col):
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    out = F.replace(out, F.lit("\t"), F.lit("\\t"))
    return out


def _term(subject_like, kind_col, datatype_col=None):
    """Render a term: bnode → _:id, literal → quoted+escaped(+^^dt),
    everything else → CURIE as-is."""
    lit_rendered = F.concat(F.lit('"'), _escape_literal(subject_like), F.lit('"'))
    if datatype_col is not None:
        lit_rendered = F.when(
            datatype_col.isNotNull(),
            F.concat(lit_rendered, F.lit("^^"), datatype_col),
        ).otherwise(lit_rendered)
    return (
        F.when(kind_col == "bnode", F.concat(F.lit("_:"), subject_like))
        .when(kind_col == "literal", lit_rendered)
        .otherwise(subject_like)
    )


def ttl_lines(triples: DataFrame, assume_distinct: bool = False) -> DataFrame:
    """Triples → one formatted DataFrame of (sort_key, line) rows:
    prefix header + one `s p o .` statement per triple, totally
    ordered.  Statement-per-line (N-Triples-style body with CURIEs)
    keeps the serializer a pure projection — no driver loops, no
    per-subject state — while remaining valid Turtle.

    ``assume_distinct=True`` skips the dedup exchange for callers that
    guarantee ``triples`` is already a set (build_graph's triples are
    ``.distinct()``-ed before their lineage cut; re-running distinct
    inside the timed write was a full extra shuffle for zero rows
    removed — r14 optimization, guide §2.4).  Since distinct(distinct
    X) == distinct X, the flag can only ever be a plan change, not an
    output change; callers that cannot prove the invariant leave it
    False."""
    # Subjects that are bnode objects elsewhere are bnode subjects here
    # (restriction/axiom nodes): detect by md5 shape (32 hex chars).
    subj_is_bnode = F.col("subject").rlike("^[0-9a-f]{32}$")
    subj = F.when(
        subj_is_bnode, F.concat(F.lit("_:"), F.col("subject"))
    ).otherwise(F.col("subject"))
    obj = _term(F.col("object"), F.col("obj_kind"), F.col("datatype"))
    line = F.concat_ws(" ", subj, F.col("predicate"), obj, F.lit("."))
    deduped = triples if assume_distinct else triples.distinct()
    body = deduped.select(
        F.concat_ws(
            "\x00",
            F.when(subj_is_bnode, "1").otherwise("0"),
            F.col("subject"),
            _pred_order(),
            F.col("predicate"),
            F.col("object"),
        ).alias("sort_key"),
        line.alias("line"),
    )
    return body


def _ttl_header() -> str:
    header = [f"@prefix {p}: <{uri}> ." for p, uri in sorted(NAMESPACES.items())]
    header.append(f"@prefix xsd: <{_XSD}> .")
    header.append("@prefix obo: <http://purl.obolibrary.org/obo/> .")
    header.append(
        "@prefix NCBITaxon: <http://purl.obolibrary.org/obo/NCBITaxon_> ."
    )
    return "\n".join(header) + "\n\n"


# Above this many triples, write_ttl (in auto mode) routes through
# the sharded writer.  The r13 interleaved crossover measurement
# (same checkpointed triples, min-of-3 per size, outputs verified
# byte-identical at every size) put the break-even near 100k rows:
# driver 0.60 s vs sharded 0.77 s at 50k, driver 1.58 vs sharded
# 1.27 at 150k, 3.84 vs 2.85 at 400k, and 6.05 vs 0.92 at the
# pipeline bench's 736k — the toLocalIterator relay is a serial
# driver loop whose cost is linear in rows (r10 probe: its share
# grew 35% -> 59% from 7.3M -> 73M triples), while the sharded
# path's shuffle+concat overhead is a near-constant floor.
TTL_SHARDED_THRESHOLD = 100_000

# Deployment tier for the TTL sink (r12 verdict #5), mirroring
# spark.omim.checkpoint.mode: one conf flips the writer instead of
# editing call sites.
# - auto (default): count the triples once and dispatch on
#   TTL_SHARDED_THRESHOLD — small sets stream through the driver,
#   large ones go sharded.
# - driver: force the toLocalIterator path (skips the sizing count —
#   for callers that KNOW the output is small).
# - sharded: force the distributed shards + driver bulk concat (still
#   one output file; skips the sizing count).
# - sharded_keep: fully distributed — executors write range shards +
#   a manifest, NO driver concat at all.  The 100 TB form: the driver
#   never touches the bytes; downstream consumers read the manifest.
TTL_WRITER_CONF = "spark.omim.ttl.writer"
_TTL_WRITER_MODES = ("auto", "driver", "sharded", "sharded_keep")


def _exceeds(df: DataFrame, threshold: int) -> bool:
    """Does ``df`` have more than ``threshold`` rows — WITHOUT a full
    count.  ``df.count()`` executes the entire input plan; for the
    pipeline's ~20-leg emission union that sizing count re-ran the
    whole build inside the timed write (r13 verdict).  A LIMIT
    threshold+1 on a constant projection instead short-circuits: Spark
    executes partitions incrementally until the limit fills, so a
    large input answers from its first partitions and a small input
    costs no more than its own (small) full scan.  The projection to a
    literal prunes every column below the limit."""
    probe = df.select(F.lit(1).alias("one")).limit(threshold + 1).count()
    return probe > threshold


def write_ttl(
    triples: DataFrame, path: str, assume_distinct: bool = False
) -> None:
    """Serialize to a single Turtle file, dispatching on the
    ``spark.omim.ttl.writer`` conf (default ``auto``: size-thresholded
    — small triple sets stream through the driver via
    ``toLocalIterator``, one partition at a time with bounded driver
    memory; anything past ``TTL_SHARDED_THRESHOLD`` rows routes
    through :func:`write_ttl_sharded`, whose executor-written range
    shards + bulk byte concat remove the row-at-a-time driver relay
    entirely).  ``driver``/``sharded`` force a path without the sizing
    count; ``sharded_keep`` skips even the driver concat (shards +
    manifest only).  The single-file paths emit byte-identical files
    (test_writers.py pins it), so a naive caller gets the scale path
    automatically."""
    mode = triples.sparkSession.conf.get(TTL_WRITER_CONF, "auto")
    if mode not in _TTL_WRITER_MODES:
        raise ValueError(
            f"{TTL_WRITER_CONF}={mode!r}: expected one of {_TTL_WRITER_MODES}"
        )
    if mode == "sharded_keep":
        write_ttl_sharded(
            triples, path, keep_shards=True, assume_distinct=assume_distinct
        )
        return
    if mode == "sharded" or (mode == "auto" and _exceeds(triples, TTL_SHARDED_THRESHOLD)):
        write_ttl_sharded(triples, path, assume_distinct=assume_distinct)
        return
    body = (
        ttl_lines(triples, assume_distinct=assume_distinct)
        .orderBy("sort_key", "line")
        .select("line")
    )
    with open(path, "w") as f:
        f.write(_ttl_header())
        for r in body.toLocalIterator():
            f.write(r.line + "\n")


def write_ttl_sharded(
    triples: DataFrame,
    path: str,
    shards: int = 16,
    keep_shards: bool = False,
    assume_distinct: bool = False,
) -> None:
    """Distributed Turtle sink — the 100 TB shape of :func:`write_ttl`.

    The ordered body is range-partitioned on the sort key
    (``repartitionByRange`` + ``sortWithinPartitions`` = a total order
    ACROSS part files, each sorted by its own executor — no single-task
    global sort, no row-at-a-time driver iterator), every executor
    writes its own text shard, and the driver then concatenates the
    shards in range order with a bulk byte copy.  Output is
    byte-identical to :func:`write_ttl`.

    With ``keep_shards=True`` the part files stay on disk next to a
    ``manifest.txt`` listing them in range order, and the driver concat
    is skipped entirely — the fully distributed form for a downstream
    consumer that can read a sharded artifact."""
    body = (
        ttl_lines(triples, assume_distinct=assume_distinct)
        .repartitionByRange(shards, "sort_key")
        .sortWithinPartitions("sort_key", "line")
        .select("line")
    )
    shard_dir = path + ".shards"
    body.write.mode("overwrite").text(shard_dir)
    parts = sorted(
        f
        for f in os.listdir(shard_dir)
        if f.startswith("part-") and not f.endswith(".crc")
    )
    if keep_shards:
        with open(os.path.join(shard_dir, "manifest.txt"), "w") as m:
            m.write("\n".join(parts) + "\n")
        with open(path, "w") as f:
            f.write(_ttl_header())
        return
    import shutil

    with open(path, "wb") as f:
        f.write(_ttl_header().encode())
        for p in parts:
            with open(os.path.join(shard_dir, p), "rb") as src:
                shutil.copyfileobj(src, f, length=1 << 20)
    shutil.rmtree(shard_dir)


def write_tsv(
    df: DataFrame, path: str, order_by: list[str], subheader: list[str] | None = None
) -> None:
    """Ordered single-file TSV (S10/S11): optional ROBOT directive
    second row (reference main.py:512-519,
    mondo_omim_genes_robot_tsv.py:11-41).  Streams ordered partitions
    through the driver (``toLocalIterator``) instead of collecting —
    bounded driver memory for any input size."""
    cols = df.columns
    with open(path, "w") as f:
        f.write("\t".join(cols) + "\n")
        if subheader is not None:
            f.write("\t".join(subheader) + "\n")
        for r in df.orderBy(*order_by).toLocalIterator():
            f.write(
                "\t".join("" if v is None else str(v) for v in r) + "\n"
            )


def write_csv(df: DataFrame, path: str, order_by: list[str]) -> None:
    """Analysis CSV sink (S13; reference analyses write pandas
    ``to_csv`` outputs, e.g. analyses/equivalency_cliques.py:141-150).
    RFC-4180 quoting for cells containing comma/quote/newline; ordered,
    single file, streamed through the driver in bounded memory."""

    def cell(v) -> str:
        s = "" if v is None else str(v)
        if any(c in s for c in (",", '"', "\n", "\r")):
            s = '"' + s.replace('"', '""') + '"'
        return s

    cols = df.columns
    with open(path, "w") as f:
        f.write(",".join(cell(c) for c in cols) + "\n")
        for r in df.orderBy(*order_by).toLocalIterator():
            f.write(",".join(cell(v) for v in r) + "\n")


def write_parquet_sorted(df: DataFrame, path: str, order_by: list[str]) -> None:
    """Cache/report sink for big outputs: distributed parquet write,
    sorted within partitions for scan locality."""
    df.repartition(1).sortWithinPartitions(*order_by).write.mode(
        "overwrite"
    ).parquet(path)


def ensure_dir(path: str) -> None:
    os.makedirs(path, exist_ok=True)
