"""cut_lineage (operators/checkpoint.py): the deployment-configurable
lineage-cut tier behind every production operator's former
unconditional localCheckpoint."""

import pytest

from omim_spark.operators.checkpoint import (
    CHECKPOINT_MODE_CONF,
    cut_lineage,
)


@pytest.fixture
def _restore_mode(spark):
    yield
    spark.conf.set(CHECKPOINT_MODE_CONF, "local")


class TestCutLineage:
    def test_default_local(self, spark, _restore_mode):
        spark.conf.unset(CHECKPOINT_MODE_CONF)
        df = cut_lineage(spark.range(10), eager=True)
        assert df.count() == 10
        # localCheckpoint truncates the logical plan to a scan
        assert "LogicalRDD" in df._jdf.queryExecution().logical().toString()

    def test_none_keeps_lineage(self, spark, _restore_mode):
        spark.conf.set(CHECKPOINT_MODE_CONF, "none")
        df = cut_lineage(spark.range(10), eager=True)
        assert df.count() == 10
        assert "LogicalRDD" not in df._jdf.queryExecution().logical().toString()

    def test_reliable_requires_checkpoint_dir(self, spark, _restore_mode):
        spark.conf.set(CHECKPOINT_MODE_CONF, "reliable")
        if spark.sparkContext.getCheckpointDir() is not None:
            pytest.skip("checkpoint dir already set in this session")
        with pytest.raises(ValueError, match="setCheckpointDir"):
            cut_lineage(spark.range(10))

    def test_reliable_checkpoints(
        self, spark, tmp_path_factory, _restore_mode
    ):
        spark.conf.set(CHECKPOINT_MODE_CONF, "reliable")
        # setCheckpointDir is context-global and can't be unset, so
        # the dir must OUTLIVE this test: a session-scoped factory
        # path, not function tmp_path (which pytest may reclaim while
        # later tests still carry the stale pointer).
        ckpt = tmp_path_factory.mktemp("spark_ckpt")
        spark.sparkContext.setCheckpointDir(str(ckpt))
        df = cut_lineage(spark.range(10), eager=True)
        assert df.count() == 10
        assert any(ckpt.iterdir())

    def test_invalid_mode_raises(self, spark, _restore_mode):
        spark.conf.set(CHECKPOINT_MODE_CONF, "bogus")
        with pytest.raises(ValueError, match="bogus"):
            cut_lineage(spark.range(10))
