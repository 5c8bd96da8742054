"""Compliance anchoring against an INDEPENDENT evaluator: every entry
of the reference's PromQL compliance corpus is executed by both the
Spark engine and the pure-Python referee (a direct transcription of
the upstream Prometheus algorithms, ``oteldb_spark/referee.py``) on
the same sf0.001 points, and the full results are diffed
point-by-point.

This closes the shared-misreading gap the self-recorded golden
fingerprints leave open (no live Prometheus exists here — the
reference diffs against a real server via
``cmd/promql-compliance-tester``; the referee is the closest available
third implementation).  Required: 100% agreement — every entry either
matches numerically or is refused by BOTH implementations (Prometheus
errors on many-to-many vector matches, invalid label_replace
regexes/label names; the engine mirrors those errors).
"""

from __future__ import annotations

import os
from collections import Counter

import pytest

from oteldb_spark.compliance import (
    END_US,
    PROMQL_CORPUS,
    START_US,
    STEP_US,
    expand,
    load_corpus,
    rewrite_promql,
)
from oteldb_spark.referee import build_referee, compare_corpus_entry

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
LOOKBACK_US = 12 * 3_600_000_000

pytestmark = pytest.mark.skipif(
    not os.path.exists(PROMQL_CORPUS),
    reason="reference compliance corpus not available",
)


def test_referee_corpus_full_agreement(spark):
    from oteldb_spark.engine import PromQLEngine
    from oteldb_spark.promql import MetricSource
    from oteldb_spark.signals import counter_points_frame

    counters = counter_points_frame(spark, SF_DIR)
    peng = PromQLEngine(
        MetricSource(
            df=counters,
            metrics={
                "events_gauge": "gauge",
                "events_value_total": "counter_mod",
            },
            label_cols=["mtype", "instance"],
        ),
        lookback_us=LOOKBACK_US,
    )
    referee = build_referee(spark, SF_DIR, LOOKBACK_US)

    entries = load_corpus(PROMQL_CORPUS)
    stats: Counter = Counter()
    failures = []
    for e in entries:
        q = rewrite_promql(expand(e.query))
        cls, detail = compare_corpus_entry(
            peng, referee, q, START_US, END_US, STEP_US
        )
        stats[cls] += 1
        if cls not in ("match", "both_error"):
            failures.append((q, cls, detail))
    total = sum(stats.values())
    agreed = stats["match"] + stats["both_error"]
    assert agreed == total, (
        f"{total - agreed}/{total} disagreements: {failures[:5]}"
    )
    # the corpus must be substantively exercised, not error'd through
    assert stats["match"] >= total * 0.85, dict(stats)
