"""Bounded iterative graph operators (BSP rounds as DataFrame joins).

``propagate_min_labels`` runs K synchronous rounds of min-label
propagation over an undirected edge list — the Pregel/GraphX
"connected components" kernel expressed in pure DataFrame ops.  Each
round is: join labels onto edge endpoints, min-aggregate incoming
labels per node, fold into the node's current label.  Lineage is
truncated per round with ``localCheckpoint`` so the plan stays flat
regardless of K.

Scale: every round costs one co-partitioned join + one shuffle agg on
the node key.  K is bounded and explicit (this is label propagation,
not run-to-fixpoint CC — the round-1 engine already has fixpoint CC
with a recursive-CTE oracle in ``operators/dedup.py``); at 100 TB you
pick K ~ graph diameter of interest and pre-partition edges by node so
the per-round join is exchange-free after the first shuffle.

Complements the reference's equivalency-clique analysis
(analyses/equivalency_cliques.py:68-94), which groups by an exact
shared value; label propagation covers the transitive case where
cliques chain through multi-hop links.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from omim_spark.operators.checkpoint import cut_lineage


def propagate_min_labels(
    edges: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """K rounds of min-label propagation; returns (node, label).

    Labels initialize to the node id itself; each round every node
    takes the min of its own label and its neighbors' labels.  After
    ``rounds`` rounds two nodes share a label iff they are within
    ``rounds`` hops of a common minimum — deterministic, so it is
    oracle-checkable by unrolling the same K steps in SQL.
    """
    und = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    nodes = und.select(F.col("u").alias("node")).distinct()
    labels = nodes.withColumn("label", F.col("node"))
    for _ in range(rounds):
        msgs = (
            und.join(labels.withColumnRenamed("node", "u"), "u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("label").alias("nb"))
        )
        labels = labels.join(msgs, "node", "left").select(
            "node",
            F.least(F.col("label"), F.coalesce(F.col("nb"), F.col("label"))).alias(
                "label"
            ),
        )
        if checkpoint:
            labels = labels.transform(cut_lineage, eager=False)
    return labels


def pagerank_steps(
    edges: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    damping_pct: int = 85,
    unit: int = 1_000_000,
    checkpoint: bool = True,
) -> DataFrame:
    """K power-iteration steps of PageRank over a directed edge list,
    in integer micro-units: ranks start at ``unit``, a node passes
    ``rank div outdegree`` along each out-edge, and the damping mix is
    ``(100-d)%·unit + (d%·incoming) div 100`` — all 64-bit integer
    arithmetic with floor division, so the result is bit-identical on
    any engine/cluster topology (no float summation-order drift) and
    exactly oracle-checkable by unrolling the K rounds in SQL.
    Dangling-node mass is dropped (the standard simplification).
    Returns (node, pr).

    Scale: each round is one join of edges onto the rank table plus
    one sum-aggregate shuffle on the destination key — partial-agged,
    skew bounded by in-degree; lineage truncated per round so the plan
    stays flat regardless of K.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("u").agg(F.count("*").alias("d"))
    ed = e.join(outdeg, "u")
    base = (unit * (100 - damping_pct)) // 100
    ranks = nodes.select("node", F.lit(unit).cast("long").alias("pr"))
    for _ in range(rounds):
        contrib = (
            ed.join(ranks.withColumnRenamed("node", "u"), "u")
            .select(F.col("v").alias("node"), F.expr("pr div d").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(contrib, 0L)) div 100")
            ).alias("pr"),
        )
        if checkpoint:
            ranks = ranks.transform(cut_lineage, eager=False)
    return ranks
