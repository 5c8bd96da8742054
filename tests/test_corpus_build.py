"""End-to-end corpus-build funnel (queries/pipeline4.py): stage flags
are internally consistent and the attrition report matches the
per-doc frame it summarizes."""

from __future__ import annotations

from oteldb_spark.queries.pipeline4 import (
    corpus_build_funnel,
    corpus_build_survivors,
)

SF_DIR = "/root/testdata/sf0.001"


def test_funnel_flags_consistent(spark):
    rows = corpus_build_survivors(spark, SF_DIR).collect()
    assert rows, "empty corpus"
    for r in rows:
        # survivorship is exactly the conjunction of the stage flags
        assert r["survives"] == (
            r["passed_quality"]
            and r["is_canonical"]
            and not r["near_dup_dropped"]
            and not r["contaminated"]
        ), r
        # canonical only defined among quality docs
        if r["is_canonical"]:
            assert r["passed_quality"], r
        # near-dup suppression only applies to stage-2 survivors
        if r["near_dup_dropped"]:
            assert r["is_canonical"], r
        assert r["n_tokens"] >= 1
        # eval shard held out of the corpus
        assert r["doc_id"] % 50 != 0


def test_funnel_report_matches_frame(spark):
    rows = corpus_build_survivors(spark, SF_DIR).collect()
    rep = corpus_build_funnel(spark, SF_DIR).collect()[0]
    assert rep["n_corpus"] == len(rows)
    assert rep["n_quality"] == sum(r["passed_quality"] for r in rows)
    assert rep["n_exact"] == sum(r["is_canonical"] for r in rows)
    assert rep["n_after_neardup"] == sum(
        r["is_canonical"] and not r["near_dup_dropped"] for r in rows
    )
    assert rep["n_survivors"] == sum(r["survives"] for r in rows)
    assert rep["survivor_tokens"] == sum(
        r["n_tokens"] for r in rows if r["survives"]
    )
    # monotone attrition
    assert (
        rep["n_corpus"]
        >= rep["n_quality"]
        >= rep["n_exact"]
        >= rep["n_after_neardup"]
        >= rep["n_survivors"]
    )
    # every stage engaged at this SF: quality rejects something and the
    # near-dup + decontamination tiers each drop at least one doc
    assert rep["n_quality"] < rep["n_corpus"]
    assert rep["n_after_neardup"] < rep["n_exact"]
    assert rep["n_survivors"] < rep["n_after_neardup"]
