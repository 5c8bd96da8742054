"""Bucketed-store plan assertions: a trace self-join over the
bucketed span table must plan with zero Exchange nodes (both sides
pre-co-partitioned by trace_id at write time), and bucket-key filters
still prune columns/rows at the scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oteldb_spark.operators.structural import child_join
from oteldb_spark.plans.audit import audit
from oteldb_spark.signals import spans_frame
from oteldb_spark.sources.bucketed import (
    read_table,
    write_bucketed_points,
    write_bucketed_spans,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_spans(spark):
    spans = spans_frame(spark, SF)
    write_bucketed_spans(spans, "t_spans_bucketed", n_buckets=8)
    yield read_table(spark, "t_spans_bucketed")
    spark.sql("DROP TABLE IF EXISTS t_spans_bucketed")


def test_bucketed_trace_join_no_shuffle(spark, bucketed_spans):
    t = bucketed_spans
    # force the sort-merge path so the assertion is about bucketing,
    # not about the broadcast threshold hiding the shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = child_join(
            t, F.col("status_code") == 2, F.col("duration_us") > 0
        )
        facts = audit(joined)
        assert facts.n_exchanges == 0, facts.text
        # and the layout-aware plan returns the same spans as the
        # plain-frame join
        plain = child_join(
            spans_frame(spark, SF),
            F.col("status_code") == 2,
            F.col("duration_us") > 0,
        )
        assert joined.count() == plain.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_does_shuffle(spark):
    # control: same join over the raw frame needs Exchanges
    spans = spans_frame(spark, SF)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = child_join(
            spans, F.col("status_code") == 2, F.col("duration_us") > 0
        )
        assert audit(joined).n_exchanges > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_no_shuffle(spark, bucketed_spans):
    # per-trace aggregation over the bucketed table: partial+final agg
    # collapse into one stage, no Exchange
    agg = bucketed_spans.groupBy("trace_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert audit(agg).n_exchanges == 0


def test_bucketed_points_rate_groups_locally(spark, tmp_path):
    from oteldb_spark.signals import counter_points_frame

    pts = counter_points_frame(spark, SF).withColumn(
        "series_hash", F.xxhash64("mtype", "instance")
    )
    write_bucketed_points(pts, "t_points_bucketed", n_buckets=8)
    try:
        t = read_table(spark, "t_points_bucketed")
        agg = t.groupBy("series_hash").agg(F.max("ts_us").alias("m"))
        assert audit(agg).n_exchanges == 0
        assert agg.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_points_bucketed")
