"""Unit tests for the round-2 operators: Delta-style MERGE
(operators/merge.py) and bounded min-label propagation
(operators/graph.py) — semantics on hand-built frames, independent of
the workload oracle queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from omim_spark.operators.graph import propagate_min_labels
from omim_spark.operators.merge import merge_into


@pytest.fixture()
def target(spark):
    return spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "C")],
        "k int, bal double, seg string",
    )


class TestMergeInto:
    def test_update_insert_delete_keep(self, spark, target):
        source = spark.createDataFrame(
            [(2, 5.0), (3, 999.0), (4, 7.0)], "k int, amt double"
        )
        out = merge_into(
            target,
            source,
            on="k",
            update_set={"bal": F.col("t.bal") + F.col("s.amt")},
            insert_values={
                "k": F.col("s.k"),
                "bal": F.col("s.amt"),
                "seg": F.lit("NEW"),
            },
            delete_condition=F.col("s.amt") > 100.0,
        )
        rows = {r.k: (r.bal, r.seg) for r in out.collect()}
        assert rows == {
            1: (10.0, "A"),  # target-only: kept unchanged
            2: (25.0, "B"),  # matched: updated
            4: (7.0, "NEW"),  # source-only: inserted
        }  # 3 deleted (matched + condition)
        assert out.columns == target.columns

    def test_no_delete_condition(self, spark, target):
        source = spark.createDataFrame([(1, 1.0)], "k int, amt double")
        out = merge_into(
            target,
            source,
            on="k",
            update_set={"bal": F.col("s.amt")},
            insert_values={
                "k": F.col("s.k"),
                "bal": F.col("s.amt"),
                "seg": F.lit("NEW"),
            },
        )
        assert out.count() == 3
        assert {r.bal for r in out.filter("k = 1").collect()} == {1.0}

    def test_insert_values_must_cover_target(self, spark, target):
        source = spark.createDataFrame([(9, 1.0)], "k int, amt double")
        with pytest.raises(ValueError, match="insert_values missing"):
            merge_into(
                target,
                source,
                on="k",
                update_set={},
                insert_values={"k": F.col("s.k")},
            )


class TestLabelPropagation:
    def test_two_components_converge(self, spark):
        # component {1,2,3} (chain) and {10, 11}
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "src long, dst long"
        )
        out = propagate_min_labels(edges, rounds=3, checkpoint=False)
        labels = {r.node: r.label for r in out.collect()}
        assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_bounded_rounds_partial(self, spark):
        # a path 1-2-3-4-5: after ONE round node 5 only sees node 4's
        # initial label — bounded propagation, not fixpoint CC
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
        )
        one = {
            r.node: r.label
            for r in propagate_min_labels(edges, 1, checkpoint=False).collect()
        }
        assert one == {1: 1, 2: 1, 3: 2, 4: 3, 5: 4}
        four = {
            r.node: r.label
            for r in propagate_min_labels(edges, 4, checkpoint=False).collect()
        }
        assert four == {n: 1 for n in range(1, 6)}

    def test_checkpoint_path_same_result(self, spark):
        edges = spark.createDataFrame(
            [(7, 3), (3, 9), (20, 21)], "src long, dst long"
        )
        a = sorted(
            tuple(r)
            for r in propagate_min_labels(edges, 2, checkpoint=True).collect()
        )
        b = sorted(
            tuple(r)
            for r in propagate_min_labels(edges, 2, checkpoint=False).collect()
        )
        assert a == b


class TestPagerankSteps:
    def test_two_rounds_hand_computed(self, spark):
        from omim_spark.operators.graph import pagerank_steps

        edges = spark.createDataFrame(
            [(1, 2), (1, 3), (2, 3), (3, 1)], ["src", "dst"]
        )
        out = {r.node: r.pr for r in pagerank_steps(edges, 2).collect()}
        # unit=1_000_000, base=150_000, damping 85%:
        # r1 = {1: 1_000_000, 2: 575_000, 3: 1_425_000}
        # r2(1) = 150000 + 85*1425000//100 = 1_361_250
        # r2(3) = 150000 + 85*(500000+575000)//100 = 1_063_750
        assert out == {1: 1_361_250, 2: 575_000, 3: 1_063_750}

    def test_dangling_and_isolated_target(self, spark):
        from omim_spark.operators.graph import pagerank_steps

        # 2 is dangling (no out-edges): its mass drops, it still gets
        # a rank row; 1 receives nothing -> base only after round 1
        edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
        out = {r.node: r.pr for r in pagerank_steps(edges, 1).collect()}
        assert out == {1: 150_000, 2: 1_000_000}
