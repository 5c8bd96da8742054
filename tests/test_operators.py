"""Unit tests for the core operator machinery with hand-computed
expectations (the reference's operator-unit-test strategy, SURVEY §5).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oteldb_spark.operators.binop import scalar_binop, vector_binop
from oteldb_spark.operators.range_agg import range_aggregate
from oteldb_spark.operators.rate import rate_family, with_reset_adjustment
from oteldb_spark.operators.stepfanout import fanout, step_spine
from oteldb_spark.operators.vector_agg import vector_aggregate

US = 1_000_000


def _samples(spark, rows):
    return spark.createDataFrame(rows, "svc string, ts_us long, sample double")


def test_fanout_window_membership(spark):
    # step=10s, range=20s, start=0, end=40s: sample at t=15s belongs to
    # steps 20s and 30s ((t-range, t] windows)
    df = _samples(spark, [("a", 15 * US, 1.0)])
    out = fanout(df, 0, 40 * US, 10 * US, 20 * US)
    steps = sorted(r.step_us for r in out.collect())
    assert steps == [20 * US, 30 * US]


def test_fanout_boundaries(spark):
    # sample exactly ON a step belongs to that step (right-closed), and
    # to the next step while strictly inside its left-open window
    df = _samples(spark, [("a", 10 * US, 1.0)])
    out = fanout(df, 0, 40 * US, 10 * US, 20 * US)
    steps = sorted(r.step_us for r in out.collect())
    assert steps == [10 * US, 20 * US]  # not 30: window (10,30] excludes 10


def test_step_spine(spark):
    spine = step_spine(spark, 0, 30 * US, 10 * US)
    assert [r.step_us for r in spine.orderBy("step_us").collect()] == [
        0,
        10 * US,
        20 * US,
        30 * US,
    ]


def test_count_over_time(spark):
    df = _samples(
        spark,
        [("a", 5 * US, 1.0), ("a", 15 * US, 1.0), ("b", 15 * US, 1.0)],
    )
    out = range_aggregate(
        df,
        "count_over_time",
        start_us=0,
        end_us=20 * US,
        step_us=10 * US,
        range_us=10 * US,
        by=["svc"],
    )
    got = {(r.svc, r.step_us): r.value for r in out.collect()}
    assert got == {
        ("a", 10 * US): 1.0,
        ("a", 20 * US): 1.0,
        ("b", 20 * US): 1.0,
    }


def test_absent_over_time(spark):
    df = _samples(spark, [("a", 5 * US, 1.0)])
    out = range_aggregate(
        df,
        "absent_over_time",
        start_us=0,
        end_us=30 * US,
        step_us=10 * US,
        range_us=10 * US,
        by=[],
        spark=spark,
    )
    # sample covers only step 10s; 0s, 20s and 30s are absent
    assert sorted(r.step_us for r in out.collect()) == [0, 20 * US, 30 * US]


def test_reset_adjustment(spark):
    rows = [("a", t * US, v) for t, v in [(1, 10.0), (2, 20.0), (3, 5.0), (4, 8.0)]]
    df = spark.createDataFrame(rows, "svc string, ts_us long, v double")
    adj = with_reset_adjustment(df, ["svc"], "v")
    vals = [r.adj for r in adj.orderBy("ts_us").collect()]
    # reset at t=3 (20 -> 5): correction += 20
    assert vals == [10.0, 20.0, 25.0, 28.0]


def test_rate_simple_counter(spark):
    # perfectly regular counter: 0,10,20,30,40 every 10s; rate over a
    # 40s window at t=40 with full coverage → slope 1.0/s (Prometheus
    # extrapolates to the window edges; samples at 0 and 40 already
    # touch both edges so factor == 1)
    rows = [("a", t * US, float(t)) for t in range(0, 50, 10)]
    df = spark.createDataFrame(rows, "svc string, ts_us long, v double")
    out = rate_family(
        df,
        "rate",
        series=["svc"],
        value_col="v",
        start_us=40 * US,
        end_us=40 * US,
        step_us=10 * US,
        range_us=40 * US,
    )
    rows = out.collect()
    assert len(rows) == 1
    assert abs(rows[0].value - 1.0) < 1e-9


def test_irate_uses_last_two(spark):
    rows = [("a", 10 * US, 0.0), ("a", 20 * US, 10.0), ("a", 30 * US, 40.0)]
    df = spark.createDataFrame(rows, "svc string, ts_us long, v double")
    out = rate_family(
        df,
        "irate",
        series=["svc"],
        value_col="v",
        start_us=30 * US,
        end_us=30 * US,
        step_us=10 * US,
        range_us=30 * US,
    )
    rows = out.collect()
    assert len(rows) == 1
    assert abs(rows[0].value - 3.0) < 1e-9  # (40-10)/10s


def test_vector_topk_tiebreak(spark):
    rows = [
        ("a", "x", 0, 5.0),
        ("b", "x", 0, 5.0),
        ("c", "x", 0, 3.0),
        ("d", "x", 0, 1.0),
    ]
    df = spark.createDataFrame(rows, "svc string, lvl string, step_us long, value double")
    out = vector_aggregate(df, "topk", by=[], k=2, keep_labels=["svc", "lvl"])
    got = sorted((r.svc, r.value) for r in out.collect())
    assert got == [("a", 5.0), ("b", 5.0)]


def test_binop_set_ops(spark):
    l = spark.createDataFrame(
        [("a", 0, 1.0), ("b", 0, 2.0)], "svc string, step_us long, value double"
    )
    r = spark.createDataFrame([("a", 0, 9.0)], "svc string, step_us long, value double")
    assert {x.svc for x in vector_binop(l, r, "and", on=["svc"]).collect()} == {"a"}
    assert {x.svc for x in vector_binop(l, r, "unless", on=["svc"]).collect()} == {"b"}
    both = vector_binop(l, r, "or", on=["svc"]).collect()
    assert {(x.svc, x.value) for x in both} == {("a", 1.0), ("b", 2.0)}


def test_binop_arith_and_cmp(spark):
    l = spark.createDataFrame([("a", 0, 10.0)], "svc string, step_us long, value double")
    r = spark.createDataFrame([("a", 0, 4.0)], "svc string, step_us long, value double")
    assert vector_binop(l, r, "/", on=["svc"]).collect()[0].value == 2.5
    # comparison filter semantics: keep left value where pred holds
    assert vector_binop(l, r, ">", on=["svc"]).collect()[0].value == 10.0
    assert vector_binop(l, r, "<", on=["svc"]).collect() == []
    # bool mode
    assert (
        vector_binop(l, r, "<", on=["svc"], bool_mode=True).collect()[0].value == 0.0
    )
    assert scalar_binop(l, "*", 3.0).collect()[0].value == 30.0


def test_asof_join_ties_and_no_match(spark):
    """asof_join: equal timestamps match, earlier-only semantics,
    null when nothing precedes (operators/asof.py)."""
    from oteldb_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 5, "c")], "k long, ts long, tag string"
    )
    right = spark.createDataFrame(
        [(1, 10, "r10"), (1, 8, "r8"), (2, 25, "r25")], "k long, ts long, v string"
    )
    out = {
        r.tag: r.v
        for r in asof_join(
            left, right, on=["k"], ts_col="ts", value_cols=["v"], suffix=""
        ).collect()
    }
    assert out == {"a": "r10", "b": None, "c": None}
