"""Third-implementation coverage for the parsed gate families.

Every registered ``lql_parsed_*`` / ``ppql_parsed_*`` gate expression
is evaluated by BOTH the Spark engine and the pure-Python Loki /
Prometheus referee transcriptions over the same sf0.001 rows
(tools/referee_gates.py), and must agree point-by-point.  Combined
with the DuckDB oracle each gate already carries, every parsed gate
has three independent evaluations.  Gates the referees cannot model
are excluded with a documented pointer to their coverage
(EXCLUDED in tools/referee_gates.py); the sweep's completeness assert
keeps the table in lockstep with the registry.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_parsed_gates_referee_agreement(spark):
    from tools.referee_gates import EXCLUDED, run_sweep

    results = run_sweep(spark, SF_DIR)
    failures = {
        name: (cls, detail)
        for name, (cls, detail) in results.items()
        if cls not in ("match", "both_error")
    }
    assert not failures, failures
    # the sweep must be substantive: nothing silently excluded beyond
    # the documented list, and the vast majority genuinely refereed
    assert len(results) >= 45
    assert len(EXCLUDED) <= 10
