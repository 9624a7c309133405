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
