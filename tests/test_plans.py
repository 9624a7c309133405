"""Physical-plan invariants as tests: the scale properties the
workload docstrings claim (pushdown, broadcast, decorrelation,
window-group-limit, take-ordered) must hold in the executed plan —
regressions here mean a 100 TB deployment silently degrades even
though results stay correct."""

import sys

sys.path.insert(0, ".")

from tools.explain_audit import audit  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_plan_invariants(spark):
    failures = audit(spark, SF_DIR)
    assert not failures, "\n".join(failures)


def test_hinted_join_size_walker(spark):
    """Pin tools/plan_sweep's JVM plan traversal: it must see a
    broadcast hint on the hinted side of a join and read that side's
    optimizer-estimated sizeInBytes (the 100x sweep's flag signal).
    Guards the py4j accessor chain (Join.hint / Option / stats)
    against Spark upgrades silently blinding the audit."""
    from pyspark.sql import functions as F

    from tools.plan_sweep import _hinted_join_sizes

    big = spark.range(1000).withColumnRenamed("id", "k")
    dim = spark.range(10).withColumnRenamed("id", "k")
    hinted = big.join(F.broadcast(dim), "k")
    sizes = _hinted_join_sizes(hinted._jdf)
    assert len(sizes) == 1
    side, nbytes = sizes[0]
    assert side == "right"
    # range(10) of one long column: a real (small, known) estimate,
    # not the Long.MaxValue unknown-stats sentinel.
    assert 0 < nbytes < 1 << 20

    unhinted = big.join(dim, "k")
    assert _hinted_join_sizes(unhinted._jdf) == []
