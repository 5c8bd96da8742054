"""Differential testing (the reference's pushdown-on/off strategy,
storagebackend/traces_pushdown_diff_internal_test.go analog):
independent implementations must agree.

Also a concurrency smoke: one session serving parallel queries
(concurrent_stress_test.go analog)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_lsh_recall_of_high_jaccard_pairs(spark):
    """Every exact-Jaccard pair ≥ 0.5 must be recovered by the
    MinHash-LSH candidates (deterministic on this corpus)."""
    from oteldb_spark.queries import QUERIES

    exact = QUERIES["dedup_ngram_jaccard"](spark, SF)
    high = {
        (r.doc_a, r.doc_b) for r in exact.filter(F.col("jaccard") >= 0.5).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_minhash_lsh"](spark, SF).collect()
    }
    assert high, "corpus should contain at least one high-jaccard pair"
    missed = high - lsh
    assert not missed, f"LSH missed high-similarity pairs: {missed}"


def test_structural_child_vs_descendant_consistency(spark):
    """On a two-level tree, child and descendant must agree."""
    from oteldb_spark.operators.structural import child_join, descendants
    from oteldb_spark.signals import spans_frame

    spans = spans_frame(spark, SF)
    anc = (F.col("service") == "frontend") & (F.col("status_code") == 2)
    des = F.col("duration_us") > 100_000
    a = {
        (r.trace_id, r.span_id)
        for r in child_join(spans, anc, des).select("trace_id", "span_id").collect()
    }
    b = {
        (r.trace_id, r.span_id)
        for r in descendants(spans, anc, des).select("trace_id", "span_id").collect()
    }
    assert a == b


def test_concurrent_queries_one_session(spark):
    """8 threads × mixed queries on one SparkSession — results must
    match the serial run (scheduler-level smoke)."""
    from oteldb_spark.queries import QUERIES

    names = [
        "logql_count_over_time",
        "promql_rate",
        "traceql_structural_child",
        "tpch_q1",
        "text_quality",
        "logql_topk",
        "dedup_exact_keyed",
        "ann_cosine_top10",
    ]
    serial = {n: QUERIES[n](spark, SF).count() for n in names}

    def run(n):
        return n, QUERIES[n](spark, SF).count()

    with ThreadPoolExecutor(max_workers=8) as ex:
        parallel = dict(ex.map(run, names))
    assert parallel == serial
