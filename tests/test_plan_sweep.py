"""Registry-wide plan anti-pattern sweep (tools/plan_sweep.py).

Every registered gate's physical plan is scanned for the three
patterns that do not survive a 100x scale-up: CartesianProduct,
BroadcastNestedLoopJoin (unless the gate is allowlisted with a
documented bounded-broadcast reason), and BatchEvalPython (row-at-a-
time Python UDF; Arrow-batched forms pass).  A new gate cannot land
with a quadratic join without a visible allowlist entry.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_registry_plan_sweep(spark):
    from tools.plan_sweep import BNLJ_ALLOWED, UNAUDITABLE, sweep

    from oteldb_spark.queries import QUERIES

    findings = sweep(spark, SF_DIR)
    assert not findings, findings
    # the allowlists must not rot: every entry names a live gate, and
    # every allowlisted gate actually still NEEDS its exemption
    # (dropping to an equi-join should force the entry's removal)
    stale = (set(BNLJ_ALLOWED) | set(UNAUDITABLE)) - set(QUERIES)
    assert not stale, f"allowlist names unknown gates: {stale}"
