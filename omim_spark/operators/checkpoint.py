"""Lineage-cut checkpointing with a deployment-configurable
reliability tier (r11 verdict #6 / advice).

Production operators (span funnels, connected components, the
pipeline build) truncate lineage at reuse points so a DataFrame
consumed by several downstream plans is computed once and the
iterative plans stay flat.  The RIGHT truncation primitive differs by
deployment:

- ``localCheckpoint`` materializes to executor-local storage
  (MEMORY_AND_DISK blocks, no replication).  Fastest — the local
  bench default — but the blocks die with their executor: under
  executor loss or dynamic-allocation downscaling the job FAILS
  instead of recomputing, because the truncated lineage can't be
  replayed.
- ``checkpoint`` writes to the reliable store configured via
  ``SparkContext.setCheckpointDir`` (HDFS/S3).  Survives executor
  loss; costs a write+read of the materialized table.  The correct
  tier for long 100 TB jobs on preemptible/dynamic clusters.
- no cut at all: keep full lineage.  Free and always recomputable,
  but iterative algorithms pay exponential plan growth and shared
  subtrees recompute per consumer.  Measured warning (SCALING.md r13
  addendum): the pipeline build's self-join rewrite stage grows the
  DRIVER-side analysis cost quadratically without its cuts — under
  ``mode=none`` plan construction alone exceeded 230 s at bench scale
  vs ~20 s with the default ``local`` tier.  ``none`` is for linear
  plans one wants fully recomputable, not for the pipeline.

``cut_lineage`` picks the tier from the session conf
``spark.omim.checkpoint.mode`` (``local`` | ``reliable`` | ``none``,
default ``local``), so a cluster deployment flips ONE conf instead of
editing operators.  ``reliable`` requires a checkpoint dir and raises
a clear error if none is set.  See SCALING.md "Checkpointing and
executor loss".
"""

from __future__ import annotations

from pyspark.sql import DataFrame

CHECKPOINT_MODE_CONF = "spark.omim.checkpoint.mode"
_VALID_MODES = ("local", "reliable", "none")


def cut_lineage(df: DataFrame, eager: bool = False) -> DataFrame:
    """Truncate ``df``'s lineage at the configured reliability tier.

    Drop-in replacement for the production operators' former
    unconditional ``.localCheckpoint(eager=...)`` calls."""
    mode = df.sparkSession.conf.get(CHECKPOINT_MODE_CONF, "local")
    if mode not in _VALID_MODES:
        raise ValueError(
            f"{CHECKPOINT_MODE_CONF}={mode!r}: expected one of {_VALID_MODES}"
        )
    if mode == "none":
        return df
    if mode == "reliable":
        # Fail fast with a CLEAR error when no checkpoint dir is set —
        # via the public getCheckpointDir().  Spark Connect sessions
        # don't expose a driver-side SparkContext at all; there the
        # probe is skipped and df.checkpoint() itself surfaces any
        # missing-dir error (Connect manages checkpoint storage
        # server-side).  Only the Connect-shaped exceptions skip the
        # probe (r12 advice: a bare except also swallowed genuine
        # py4j/driver failures, degrading this fail-fast into a later,
        # less clear df.checkpoint() error) — anything else propagates.
        # NotImplementedError covers every pyspark vintage: modern
        # Connect raises PySparkNotImplementedError (a subclass), 3.4
        # raised it plain.
        try:
            sc = df.sparkSession.sparkContext
        except (AttributeError, NotImplementedError):
            sc = None
        if sc is not None and sc.getCheckpointDir() is None:
            raise ValueError(
                f"{CHECKPOINT_MODE_CONF}=reliable requires "
                "SparkContext.setCheckpointDir(<reliable store path>)"
            )
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def materialize_before_cleanup(df: DataFrame) -> DataFrame:
    """Eager executor-local materialization that must happen REGARDLESS
    of ``spark.omim.checkpoint.mode`` — for results whose input files
    are deleted immediately after (scratch fixtures, the IVF probe's
    temporary parquet index).  This is a correctness pin on the
    fixture's lifetime, NOT a deployment-tier lineage cut: under
    ``mode=none`` a cut_lineage here would return the lazy plan and the
    later collect would read already-deleted files.  Kept separate so
    "every raw localCheckpoint outside fixture bodies routes through
    cut_lineage" stays auditable."""
    return df.localCheckpoint(eager=True)
