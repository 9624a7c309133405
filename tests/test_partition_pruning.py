"""Partition-pruning invariants: a date-partitioned parquet layout must
prune at PLANNING time (PartitionFilters, not data filters) — at 100 TB
the difference between scanning one day and scanning three years.

The driver tables land unpartitioned, so this writes a partitioned copy
to scratch and asserts the plan-level properties a production layout
relies on: partition filters recognized, non-matching files never
listed, dynamic partition pruning available for dim-filtered joins.
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
_SCRATCH = Path(__file__).resolve().parent.parent / ".scratch"


@pytest.fixture(scope="module")
def part_dir(spark):
    """Events written partitioned by event_date (hive-style layout)."""
    from omim_spark.workload.registry import events_table

    base = _SCRATCH / f"part_{uuid.uuid4().hex[:12]}"
    ev = events_table(spark, SF_DIR).withColumn(
        "event_date", F.to_date("ts")
    )
    ev.write.partitionBy("event_date").mode("overwrite").parquet(str(base))
    yield str(base)
    shutil.rmtree(base, ignore_errors=True)


def _formatted_plan(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


class TestPartitionPruning:
    def test_equality_filter_becomes_partition_filter(self, spark, part_dir):
        days = [r[0] for r in spark.read.parquet(part_dir)
                .select("event_date").distinct().limit(3).collect()]
        df = spark.read.parquet(part_dir).filter(F.col("event_date") == days[0])
        plan = _formatted_plan(df)
        assert "PartitionFilters" in plan
        # the date predicate must appear as a partition filter, not
        # (only) a pushed data filter
        import re
        pf = " ".join(re.findall(r"PartitionFilters: \[([^\]]*)\]", plan))
        assert "event_date" in pf

    def test_pruned_scan_reads_one_partition(self, spark, part_dir):
        all_days = spark.read.parquet(part_dir).select("event_date").distinct().count()
        assert all_days > 1  # layout actually has multiple partitions
        one = [r[0] for r in spark.read.parquet(part_dir)
               .select("event_date").distinct().limit(1).collect()][0]
        df = spark.read.parquet(part_dir).filter(F.col("event_date") == one)
        # input_file_name() reflects the files the pruned scan actually
        # read (relation-level inputFiles() ignores the filter)
        files = [
            r[0]
            for r in df.select(F.input_file_name()).distinct().collect()
        ]
        assert files and all(f"event_date={one}" in f for f in files)

    def test_range_filter_prunes(self, spark, part_dir):
        lo = [r[0] for r in spark.read.parquet(part_dir)
              .select(F.max("event_date")).collect()][0]
        df = spark.read.parquet(part_dir).filter(F.col("event_date") >= lo)
        files = [
            r[0]
            for r in df.select(F.input_file_name()).distinct().collect()
        ]
        assert files and all(f"event_date={lo}" in f for f in files)

    def test_dynamic_partition_pruning_enabled(self, spark):
        # DPP is the join-time analogue (dim filter prunes fact
        # partitions at runtime); assert the session has it on — the
        # 100 TB layout depends on it
        assert (
            spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
            == "true"
        )


class TestCompaction:
    """Small-file compaction — the maintenance op that keeps a 100 TB
    table's file count sane: repartition + maxRecordsPerFile rewrite,
    content-preserving."""

    def test_compaction_reduces_files_preserving_rows(self, spark):
        import uuid as _uuid

        from omim_spark.workload.registry import events_table

        base = _SCRATCH / f"compact_{_uuid.uuid4().hex[:12]}"
        frag, tidy = str(base / "frag"), str(base / "tidy")
        try:
            ev = events_table(spark, SF_DIR).select("event_id", "user_id")
            ev.repartition(64).write.mode("overwrite").parquet(frag)
            fragged = spark.read.parquet(frag)
            n_frag_files = len(
                {r[0] for r in fragged.select(F.input_file_name()).distinct().collect()}
            )
            assert n_frag_files >= 32  # genuinely fragmented
            fragged.repartition(4).write.mode("overwrite").parquet(tidy)
            tidied = spark.read.parquet(tidy)
            n_tidy_files = len(
                {r[0] for r in tidied.select(F.input_file_name()).distinct().collect()}
            )
            assert n_tidy_files == 4
            # content preserved exactly
            assert tidied.count() == ev.count()
            assert tidied.exceptAll(ev).count() == 0
        finally:
            shutil.rmtree(base, ignore_errors=True)


class TestIvfStoredLayout:
    """The IVF serving claim, measured on the real layout: the corpus
    written ``partitionBy("cid")``, the probe's literal cell predicate
    pruning non-probed cells at PLANNING time, and the rerank touching
    only the probed cells' files (q_ann_ivf_stored's 100 TB story —
    closes the r4 claim-vs-measurement gap)."""

    def test_probe_scans_only_probed_cells(self, spark):
        import re

        from omim_spark.workload.registry import table
        from omim_spark.workload.similarity import (
            IVF_K,
            IVF_NPROBE,
            _ivf_probe_cells,
            _ivf_train,
            _vec_double,
        )

        base = _SCRATCH / f"ivf_{uuid.uuid4().hex[:12]}"
        idx = str(base / "index")
        try:
            emb = table(spark, SF_DIR, "embeddings").select(
                "vec_id", _vec_double().alias("v")
            )
            assigned, cents = _ivf_train(emb)
            assigned.write.mode("overwrite").partitionBy("cid").parquet(idx)
            q = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
            probe_ids = [r.cid for r in _ivf_probe_cells(cents, q).collect()]
            assert len(probe_ids) == IVF_NPROBE < IVF_K

            stored = spark.read.parquet(idx).filter(
                F.col("cid").isin(probe_ids)
            )
            # 1) the cell predicate is a PLANNING-time partition filter
            plan = _formatted_plan(stored)
            pf = " ".join(re.findall(r"PartitionFilters: \[([^\]]*)\]", plan))
            assert "cid" in pf
            # 2) the scan touches ONLY the probed cells' directories...
            files = [
                r[0]
                for r in stored.select(F.input_file_name()).distinct().collect()
            ]
            assert files and all(
                any(f"cid={cid}/" in f for cid in probe_ids) for f in files
            )
            # 3) ...which is a strict subset of the stored layout
            all_files = {
                r[0]
                for r in spark.read.parquet(idx)
                .select(F.input_file_name())
                .distinct()
                .collect()
            }
            assert len(set(files)) < len(all_files)
            # 4) and the layout did not change the answer: stored-path
            # top-10 == in-query top-10
            from omim_spark.workload.similarity import (
                q_ann_ivf_probe,
                q_ann_ivf_stored,
            )

            got = [
                tuple(r)
                for r in q_ann_ivf_stored(spark, SF_DIR).collect()
            ]
            want = [tuple(r) for r in q_ann_ivf_probe(spark, SF_DIR).collect()]
            assert got == want
        finally:
            shutil.rmtree(base, ignore_errors=True)
