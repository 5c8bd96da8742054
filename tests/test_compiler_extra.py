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
