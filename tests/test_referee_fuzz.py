"""Differential fuzzing gate: seeded-random PromQL expressions must
evaluate identically on the Spark engine and the pure-Python referee
(tools/referee_fuzz.py holds the generator; 420 cases across three
seeds were clean when this gate was added — it pins that property).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.referee_fuzz import run_fuzz  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="testdata not available"
)


def test_fuzz_engine_matches_referee(spark):
    stats, failures = run_fuzz(spark, SF_DIR, n=50, seed=0)
    assert not failures, failures[:3]
    # the cases must overwhelmingly execute, not error out in pairs
    assert stats["match"] >= 45, stats


def test_logql_fuzz_engine_matches_referee(spark):
    from tools.logql_fuzz import run_logql_fuzz

    stats, failures = run_logql_fuzz(spark, SF_DIR, n=50, seed=0)
    assert not failures, failures[:3]
    assert stats["match"] >= 45, stats


def test_logql_pushdown_fuzz_engine_matches_referee(spark):
    """The grouping-pushdown rewrite's exact trigger shape (sum/min/max
    by(...) directly over distributive range aggs, parser pipelines and
    unwrap below) fuzzed against the referee — verifies the rewrite's
    equivalence on random inputs, not just pinned regression cases.
    The rewrite must demonstrably FIRE across the sweep (plan-level
    witness via _push_grouping_down), including by-unwrap-label cases
    exercising the bail-out."""
    from tools.logql_fuzz import run_pushdown_fuzz

    stats, failures = run_pushdown_fuzz(spark, SF_DIR, n=200, seed=1)
    assert not failures, failures[:3]
    assert stats["match"] == 200, stats
    assert stats["rewrite_fired"] >= 120, stats


def test_logql_sliding_fuzz_engine_matches_referee(spark):
    """Random decomposable range aggs at fine step (60s over 1h, range
    32m-4h: ratio 32-240) — the shapes range_aggregate auto-routes
    through the sliding bucket-merge — must match the referee's naive
    per-step evaluation.  Plan witness: the representative shape
    compiles to the Window merge with no Generate fan-out."""
    from pyspark.sql import functions as F

    from oteldb_spark.compliance import START_US
    from oteldb_spark.logql import EvalParams, LogSource, compile_logql
    from oteldb_spark.plans.audit import audit
    from oteldb_spark.signals import logs_frame
    from tools.logql_fuzz import run_sliding_fuzz

    stats, failures = run_sliding_fuzz(spark, SF_DIR, n=100, seed=0)
    assert not failures, failures[:3]
    assert stats["match"] == 100, stats

    src = LogSource(
        df=logs_frame(spark, SF_DIR),
        label_cols={"service": "service", "env": "env", "level": "level"},
    )
    start = START_US + 6 * 3_600_000_000
    out = compile_logql(
        'count_over_time({env="prod"}[2h])',
        src,
        EvalParams(start, start + 3_600_000_000, 60_000_000),
        spark,
    )
    facts = audit(out)
    assert "Window" in facts.text and "Generate" not in facts.text


def test_traceql_fuzz_engine_matches_referee(spark):
    from tools.traceql_fuzz import run_traceql_fuzz

    stats, failures = run_traceql_fuzz(spark, n=40, seed=0)
    assert not failures, failures[:3]
    # random trees + full op table must actually execute
    assert stats["match"] >= 36, stats


def test_traceql_metrics_fuzz_engine_matches_referee(spark):
    from tools.traceql_fuzz import run_traceql_metrics_fuzz

    stats, failures = run_traceql_metrics_fuzz(spark, n=30, seed=0)
    assert not failures, failures[:3]
    assert stats["match"] >= 27, stats


def test_pprof_fuzz_wire_roundtrip_matches_fold(spark):
    from tools.pprof_fuzz import run_pprof_fuzz

    stats, failures = run_pprof_fuzz(spark, n=10, seed=0)
    assert not failures, failures[:2]
    assert stats["match"] == 10
