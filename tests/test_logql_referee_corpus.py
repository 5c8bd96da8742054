"""LogQL compliance anchoring against an INDEPENDENT evaluator: every
entry of the reference's LogQL compliance corpus is executed by both
the Spark engine and the pure-Python LogQL referee
(``oteldb_spark/logql_referee.py``, a transcription of the upstream
Loki pipeline/aggregation semantics that shares only the parser and
the vector-layer referee with the engine-side code) on the same
sf0.001 lines, and results are diffed line-by-line (listings) /
point-by-point (matrices).  Required: 100% agreement.
"""

from __future__ import annotations

import os
from collections import Counter

import pytest

from oteldb_spark.compliance import (
    END_US,
    LOGQL_CORPUS,
    START_US,
    STEP_US,
    expand,
    load_corpus,
    rewrite_logql,
)
from oteldb_spark.logql_referee import (
    build_logql_referee,
    compare_logql_entry,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.exists(LOGQL_CORPUS),
    reason="reference compliance corpus not available",
)


def test_logql_referee_corpus_full_agreement(spark):
    from oteldb_spark.engine import LogQLEngine
    from oteldb_spark.logql import LogSource
    from oteldb_spark.signals import logs_frame

    leng = LogQLEngine(
        LogSource(
            df=logs_frame(spark, SF_DIR),
            label_cols={"service": "service", "env": "env", "level": "level"},
        )
    )
    referee = build_logql_referee(spark, SF_DIR)
    entries = load_corpus(LOGQL_CORPUS)
    stats: Counter = Counter()
    failures = []
    for e in entries:
        q = rewrite_logql(expand(e.query))
        cls, detail = compare_logql_entry(
            leng, referee, q, START_US, END_US, STEP_US
        )
        stats[cls] += 1
        if cls not in ("match", "both_error"):
            failures.append((q, cls, detail[:300]))
    total = sum(stats.values())
    agreed = stats["match"] + stats["both_error"]
    assert agreed == total, (
        f"{total - agreed}/{total} disagreements: {failures[:5]}"
    )
    assert stats["match"] >= total * 0.9, dict(stats)
