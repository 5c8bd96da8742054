"""Smoke tests: the driver contract plus every registered query runs
at sf0.001 and returns a well-formed DataFrame."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns
    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 50


@pytest.mark.parametrize(
    "name",
    [
        "tpch_q1",
        "logql_count_over_time",
        "logql_topk",
        "promql_rate",
        "traceql_structural_child",
        "dedup_ngram_jaccard",
        "ann_cosine_top10",
        "text_quality",
    ],
)
def test_query_smoke(spark, name):
    from oteldb_spark.queries import QUERIES

    df = QUERIES[name](spark, SF_DIR)
    assert df.count() > 0


def test_bench_headline_names_registered():
    """Every bench headline name must resolve in the registry — a
    dropped @register decorator otherwise surfaces only when the
    driver's bench run crashes."""
    import bench
    from oteldb_spark.queries import ORACLES, QUERIES

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, missing
    # and every registered query has an oracle (driver's hash gate)
    no_oracle = [n for n in QUERIES if n not in ORACLES]
    assert not no_oracle, no_oracle
