"""Bare json/logfmt discovery, absent(), predict_linear()."""

from __future__ import annotations

from oteldb_spark.logql import EvalParams, LogSource, compile_logql
from oteldb_spark.promql import MetricSource, PromParams, compile_promql

US = 1_000_000


def test_bare_json_discovery(spark):
    df = spark.createDataFrame(
        [(1, 1 * US, '{"status": "500", "path": "/a"}'),
         (2, 2 * US, '{"status": "200", "path": "/b"}')],
        "event_id long, ts_us long, body string",
    )
    src = LogSource(df=df, label_cols={})
    out = compile_logql(
        "{} | json | status >= 400",
        src,
        EvalParams(0, 10 * US, US),
        spark,
    )
    rows = out.collect()
    assert len(rows) == 1 and '"status": "500"' in rows[0].body


def test_bare_logfmt_discovery(spark):
    df = spark.createDataFrame(
        [(1, 1 * US, "status=500 path=/a"), (2, 2 * US, "status=200 path=/b")],
        "event_id long, ts_us long, body string",
    )
    src = LogSource(df=df, label_cols={})
    out = compile_logql(
        '{} | logfmt | status = "200"',
        src,
        EvalParams(0, 10 * US, US),
        spark,
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0].body == "status=200 path=/b"


def _msrc(spark):
    rows = [("s1", t * US, float(v)) for t, v in [(10, 0), (20, 10), (30, 20), (40, 30)]]
    df = spark.createDataFrame(rows, "inst string, ts_us long, v double")
    return MetricSource(df=df, metrics={"m": "v"}, label_cols=["inst"])


def test_predict_linear(spark):
    src = _msrc(spark)
    params = PromParams(40 * US, 40 * US, 10 * US)
    out = compile_promql("predict_linear(m[40s], 60)", src, params, spark).collect()
    # perfect line slope 1/s through the window; prediction at window
    # end + 60s → value at t=40s is 30, +60s → 90
    assert len(out) == 1
    assert abs(out[0].value - 90.0) < 1e-6


def test_absent_instant(spark):
    src = _msrc(spark)
    params = PromParams(0, 100 * US, 50 * US, lookback_us=15 * US)
    out = compile_promql('absent(m{inst="nope"})', src, params, spark).collect()
    # selector matches nothing → absent = 1 at every step
    assert sorted(r.step_us for r in out) == [0, 50 * US, 100 * US]
    assert all(r.value == 1.0 for r in out)


def test_ip_line_filter_matches(spark):
    from oteldb_spark.logql import LogSource, EvalParams, compile_logql

    df = spark.createDataFrame(
        [
            (1_704_067_300_000_000, "conn from 10.1.2.3 ok", "a"),
            (1_704_067_400_000_000, "conn from 192.168.1.50 ok", "a"),
            (1_704_067_500_000_000, "no address here", "a"),
            (1_704_067_600_000_000, "peer 10.255.0.9 and 127.0.0.1", "a"),
        ],
        "ts_us long, body string, svc string",
    )
    src = LogSource(df=df, label_cols={"svc": "svc"})
    p = EvalParams(1_704_067_200_000_000, 1_704_070_000_000_000, 3_600_000_000)

    def rows(q):
        return {r["body"] for r in compile_logql(q, src, p, spark).collect()}

    assert rows('{svc="a"} |= ip("10.0.0.0/8")') == {
        "conn from 10.1.2.3 ok",
        "peer 10.255.0.9 and 127.0.0.1",
    }
    assert rows('{svc="a"} |= ip("192.168.1.1-192.168.1.99")') == {
        "conn from 192.168.1.50 ok"
    }
    assert rows('{svc="a"} |= ip("127.0.0.1")') == {
        "peer 10.255.0.9 and 127.0.0.1"
    }
    assert rows('{svc="a"} != ip("10.0.0.0/8")') == {
        "conn from 192.168.1.50 ok",
        "no address here",
    }
    # or-chained patterns
    assert (
        len(rows('{svc="a"} |= ip("127.0.0.1") or ip("192.168.1.0/24")')) == 2
    )


def test_promql_literal_edge_syntax(spark):
    src = MetricSource(
        df=spark.createDataFrame(
            [("g", 1 * US, 1.0)], "mtype string, ts_us long, gauge double"
        ),
        metrics={"events_gauge": "gauge"},
        label_cols=["mtype"],
    )
    params = PromParams(0, 4 * US, US, lookback_us=10 * US)

    def val(q):
        return compile_promql(q, src, params, spark).collect()[0]["value"]

    assert val("0x3d") == 61.0
    assert val(".5 * 2") == 1.0
    assert val("Inf") == float("inf")
    assert val("-Inf") == float("-inf")
    assert str(val("NaN")) == "nan"
    assert val("-1 ^ 2") == -1.0  # unary minus binds looser than ^
    assert val("1 <= bool 2") == 1.0
    assert val("3 > bool 4") == 0.0


def test_promql_unary_minus_vector(spark):
    src = MetricSource(
        df=spark.createDataFrame(
            [("g", 1 * US, 3.0), ("h", 2 * US, 5.0)],
            "mtype string, ts_us long, gauge double",
        ),
        metrics={"events_gauge": "gauge"},
        label_cols=["mtype"],
    )
    params = PromParams(0, 4 * US, US, lookback_us=10 * US)
    pos = compile_promql("sum(events_gauge)", src, params, spark).collect()
    neg = compile_promql("-sum(events_gauge)", src, params, spark).collect()
    by_step = {r["step_us"]: r["value"] for r in pos}
    for r in neg:
        assert r["value"] == -by_step[r["step_us"]]


def test_logql_implicit_and_label_filters(spark):
    from oteldb_spark.logql import LogSource, EvalParams, compile_logql

    df = spark.createDataFrame(
        [
            (1_704_067_300_000_000, '{"st": 500, "ms": 9}', "a"),
            (1_704_067_400_000_000, '{"st": 200, "ms": 9}', "a"),
            (1_704_067_500_000_000, '{"st": 500, "ms": 1}', "a"),
        ],
        "ts_us long, body string, svc string",
    )
    src = LogSource(df=df, label_cols={"svc": "svc"})
    p = EvalParams(1_704_067_200_000_000, 1_704_070_000_000_000, 3_600_000_000)
    # space-separated predicates are an implicit `and`
    out = compile_logql(
        '{svc="a"} | json | st >= 400 ms > 5', src, p, spark
    ).collect()
    assert len(out) == 1 and '"ms": 9' in out[0]["body"]


def test_logfmt_quoted_values_and_escapes(spark):
    from oteldb_spark.functions.parsers import logfmt_error, logfmt_map
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ('msg="hello world" n=1',),
            ('msg="esc \\" quote" n=2',),
            ("dup=a dup=b",),
            ('bad="unterminated n=3',),
        ],
        "body string",
    )
    rows = df.select(
        logfmt_map("body").alias("m"), logfmt_error("body").alias("err")
    ).collect()
    assert dict(rows[0].m) == {"msg": "hello world", "n": "1"}
    assert dict(rows[1].m) == {"msg": 'esc " quote', "n": "2"}
    assert dict(rows[2].m) == {"dup": "b"}  # last occurrence wins
    assert [r.err for r in rows] == [False, False, False, True]


def test_logfmt_error_label_through_pipeline(spark):
    df = spark.createDataFrame(
        [
            (1, 1 * US, 'msg="ok" status=200'),
            (2, 2 * US, 'msg="broken status=500'),
        ],
        "event_id long, ts_us long, body string",
    )
    src = LogSource(df=df, label_cols={}, error_labels=True)
    out = compile_logql(
        "{} | logfmt msg, status",
        src,
        EvalParams(0, 10 * US, US),
        spark,
    ).collect()
    by_body = {r.body: r for r in out}
    good = by_body['msg="ok" status=200']
    bad = by_body['msg="broken status=500']
    # well-formed line parses; malformed line keeps NULL labels and
    # carries __error__ (logfmt.go:51-61: scanned map discarded)
    assert good.msg == "ok" and good["__error__"] is None
    assert bad.msg is None
    assert bad["__error__"] == "logfmt parsing error"


def test_grouping_pushdown_compositions(spark):
    """sum/min by (x) over distributive range aggs compile to the
    range agg grouped directly; values must match the unpushed
    semantics (topk wrapper, scalar threshold, unwrap min)."""
    import json as _json

    rows = [
        (1_000_000 * i, _json.dumps({"k": i}), "s%d" % (i % 3))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "ts_us long, body string, svc string")
    src = LogSource(df=df, label_cols={"svc": "svc"})
    p = EvalParams(30_000_000, 30_000_000, 30_000_000)

    out = compile_logql(
        'topk(2, sum by (svc) (count_over_time({svc=~".+"}[30s])))',
        src,
        p,
        spark,
    )
    assert sorted((r["svc"], r["value"]) for r in out.collect()) == [
        ("s1", 10.0),
        ("s2", 10.0),
    ]
    out2 = compile_logql(
        'sum by (svc) (count_over_time({svc=~".+"}[30s])) > 5', src, p, spark
    )
    assert sorted((r["svc"], r["value"]) for r in out2.collect()) == [
        ("s0", 9.0),
        ("s1", 10.0),
        ("s2", 10.0),
    ]
    out3 = compile_logql(
        'min by (svc) (min_over_time({svc=~".+"} | json | unwrap k [30s]))',
        src,
        p,
        spark,
    )
    assert sorted((r["svc"], r["value"]) for r in out3.collect()) == [
        ("s0", 3.0),
        ("s1", 1.0),
        ("s2", 2.0),
    ]
    # avg does NOT distribute — must stay on the two-stage path
    out4 = compile_logql(
        'avg by (svc) (count_over_time({svc=~".+"}[30s]))', src, p, spark
    )
    assert sorted((r["svc"], r["value"]) for r in out4.collect()) == [
        ("s0", 9.0),
        ("s1", 10.0),
        ("s2", 10.0),
    ]
    # by() over the unwrapped label itself must NOT push down: the
    # unpushed path drops the unwrap label from series identity, so
    # every series groups under k="" — one output group.
    out5 = compile_logql(
        'min by (k) (min_over_time({svc=~".+"} | json | unwrap k [30s]))',
        src,
        p,
        spark,
    )
    assert [(r["k"], r["value"]) for r in out5.collect()] == [("", 1.0)]
