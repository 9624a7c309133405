"""Runtime (AQE-era) plan invariants: the two mitigations the engine
relies on at 100 TB that only materialize during or just before
execution — AQE skew-join splitting and runtime bloom-filter pushdown
— demonstrated and asserted against real executed plans.

These complement tests/test_plans.py (static plan invariants): a
cluster deployment gets these for free ONLY if the confs are sane, so
the tests double as documentation of the exact knobs involved.
"""

import contextlib

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


@contextlib.contextmanager
def confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        try:
            old[key] = spark.conf.get(key)
        except Exception:
            old[key] = None
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


class TestAqeSkewJoin:
    def test_skewed_partition_is_split(self, spark):
        """A 90%-hot join key must be split by OptimizeSkewedJoin into
        multiple tasks (SortMergeJoin(skew=true)) instead of one
        straggler task processing 90% of the rows — the AQE tier of
        skew handling that complements the explicit salting in
        operators/skew.py (which covers aggregations and joins AQE
        cannot rewrite)."""
        with confs(
            spark,
            **{
                "spark.sql.autoBroadcastJoinThreshold": "-1",
                "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
                "spark.sql.adaptive.skewJoin.enabled": "true",
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32k",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16k",
            },
        ):
            left = spark.range(0, 500_000).select(
                F.when(F.col("id") < 450_000, F.lit(0))
                .otherwise(F.col("id"))
                .alias("k"),
                # incompressible payload so shuffle-partition byte sizes
                # reflect the row skew (a bare constant key compresses
                # to nothing and dodges the size-based detector)
                F.md5(F.col("id").cast("string")).alias("pad"),
            )
            right = spark.range(0, 1_000).select(
                F.col("id").alias("k"), F.lit("r").alias("v")
            )
            out = left.join(right, "k").agg(
                F.count("*").alias("n"), F.max("pad").alias("mp")
            )
            [row] = out.collect()
            assert row.n == 450_000  # correctness unchanged by the split
            final = out._jdf.queryExecution().executedPlan().toString()
            final = final.split("== Initial Plan ==")[0]
            assert "skew=true" in final, final
            assert "skewed" in final  # AQEShuffleRead ... skewed


class TestRuntimeBloomFilter:
    def test_bloom_filter_injected_on_probe_side(self, spark):
        """A selective dimension filter must be re-applied to the fact
        side as a runtime bloom filter (bloom_filter_agg on the build
        side, might_contain on the probe scan): at 100 TB this prunes
        fact rows BEFORE the join shuffle, the single biggest saving a
        shuffled star join can get when broadcast is off the table."""
        with confs(
            spark,
            **{
                "spark.sql.autoBroadcastJoinThreshold": "-1",
                "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
                # local test files are KBs; production default (10GB
                # probe-side minimum) would correctly suppress it there
                "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            },
        ):
            part = spark.read.parquet(f"{SF_DIR}/part.parquet").filter(
                "p_size = 1"
            )
            li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
            out = li.join(part, li.l_partkey == part.p_partkey).agg(
                F.count("*").alias("n")
            )
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            plan = out._jdf.queryExecution().explainString(mode)
            assert "bloom_filter_agg" in plan
            assert "might_contain" in plan
            # and it still computes the right thing
            [row] = out.collect()
            expected = (
                li.join(part.hint("broadcast"), li.l_partkey == part.p_partkey)
                .count()
            )
            assert row.n == expected


class TestBucketedCleanCorpus:
    """clean_corpus_bucketed: on a doc_id-bucketed corpus the substring
    excision rewrite is shuffle-free on TEXT by construction — every
    Exchange in the executed plan moves only ids/positions/hashes.
    This is the scale path for redundancy-heavy corpora, where the
    plain clean_corpus left join degrades to shuffling the corpus text
    (operators/dedup.py docstrings tell the same story)."""

    def test_no_text_crosses_an_exchange(self, spark, tmp_path):
        import re

        from omim_spark.operators.bucketing import exchange_count, write_bucketed
        from omim_spark.operators.dedup import clean_corpus, clean_corpus_bucketed

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        write_bucketed(docs, "docs_ccb", "doc_id", 8)
        try:
            with confs(
                spark,
                # force the fact×fact regime: at 100 TB neither side of
                # the rewrite join broadcasts
                spark__sql__autoBroadcastJoinThreshold="-1",
                spark__sql__adaptive__autoBroadcastJoinThreshold="-1",
                # DisableUnnecessaryBucketedScan may opt OUT of the
                # bucketed scan at toy sizes when AQE's runtime stats
                # make the shuffle look cheap (session-state-dependent,
                # observed flaky across full-suite runs) — pin it off
                # so the test exercises the 100 TB regime, where the
                # bucketed scan always wins and the rule never fires
                spark__sql__sources__bucketing__autoBucketedScan__enabled=(
                    "false"
                ),
                # THE deployment rule this operator carries: align the
                # shuffle partition count with the bucket count.  If
                # the non-bucketed (fixed) side arrives with MORE
                # partitions than the table has buckets,
                # EnsureRequirements co-partitions by re-shuffling the
                # BUCKETED side up — the full corpus schema crosses an
                # Exchange and the whole point is lost.  (Observed in
                # full-suite sessions where accumulated AQE state
                # yielded >8-partition intermediates; a real cluster
                # hits the same thing whenever shuffle.partitions >
                # n_buckets.)
                spark__sql__shuffle__partitions="8",
                spark__sql__adaptive__coalescePartitions__enabled="false",
            ):
                out = clean_corpus_bucketed(spark, "docs_ccb")
                rows = {r.doc_id: r.text for r in out.collect()}
                # correctness: same rewrite as the plain operator
                plain = {
                    r.doc_id: r.text for r in clean_corpus(docs).collect()
                }
                assert rows == plain

                # executed plan: count exchanges in the FINAL plan only
                # (post-execution AQE plan strings repeat the initial
                # plan below the final one)
                executed = out._jdf.queryExecution().executedPlan().toString()
                final = executed.split("== Initial Plan ==")[0]
                keys = re.findall(
                    r"Exchange hashpartitioning\((\w+)#", final
                )
                # every exchange keys on the span hash or a doc id —
                # never on text.  (AQE may add re-exchanges on the
                # same keys when bucket count != coalesced partition
                # count, and may move the excision OUTPUT — affected
                # docs' clean_text — once; both are id-keyed.  The key
                # SET is the invariant, not the count.)
                assert keys, final
                assert set(keys) <= {"id", "h", "doc_id"}, keys
                # and the corpus (full-schema) scan feeds the final
                # rewrite join with no Exchange in between
                assert re.search(
                    r"SortMergeJoin \[doc_id#\d+L\], \[doc_id#\d+L\], LeftOuter",
                    final,
                ), final

                mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
                plan = out._jdf.queryExecution().explainString(mode)
                # THE invariant: the corpus `text` attribute never
                # crosses an Exchange.  (`clean_text` — the excision
                # output for affected docs — is the operator's result
                # and AQE may legitimately move it once; \btext# does
                # not match clean_text# since '_' is a word char.)
                for m in re.finditer(
                    r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", plan
                ):
                    cols = m.group(1)
                    assert not re.search(r"\btext#", cols), (
                        f"corpus text crosses an Exchange: [{cols}]"
                    )
                # the corpus scans really use the bucketed layout
                assert "Bucketed: true" in plan
        finally:
            spark.sql("DROP TABLE IF EXISTS docs_ccb")
