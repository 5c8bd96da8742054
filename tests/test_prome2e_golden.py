"""Reference Prometheus e2e suite, replayed from its checked-in corpus.

``integration/prome2e/_testdata/metrics.json`` is the reference's
exact test corpus (real scraped OTLP metrics; 51
``prometheus_http_requests_total`` series over handler/code labels),
and ``common_test.go:675-790`` checks count/aggregation queries with
recorded constants at EVERY step of a 5s range — plus the
min ≤ avg ≤ max ≤ sum invariant.  Ingest goes through the real
OTLP/JSON metrics flattener.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from oteldb_spark.promql import MetricSource, PromParams, compile_promql

CORPUS = "/root/reference/integration/prome2e/_testdata/metrics.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CORPUS), reason="reference corpus not available"
)

METRIC = "prometheus_http_requests_total"


@pytest.fixture(scope="module")
def prom_src(spark):
    from oteldb_spark.sources.otlp import (
        OTLP_METRICS_SCHEMA,
        flatten_otlp_metrics,
    )

    raw = spark.createDataFrame(
        [(line,) for line in open(CORPUS)], "j string"
    )
    flat = flatten_otlp_metrics(
        raw.select(F.from_json("j", OTLP_METRICS_SCHEMA).alias("r")).select(
            "r.*"
        )
    )
    pts = (
        flat.filter(F.col("name") == METRIC)
        .select(
            F.col("labels").getItem("handler").alias("handler"),
            F.col("labels").getItem("code").alias("code"),
            (F.col("ts_ns") / 1000).cast("long").alias("ts_us"),
            F.col("value").cast("double").alias("v"),
        )
        .cache()
    )
    n_series = pts.select("handler", "code").distinct().count()
    assert n_series == 51
    lo, hi = pts.agg(F.min("ts_us"), F.max("ts_us")).first()
    src = MetricSource(
        df=pts,
        metrics={METRIC: "v"},
        label_cols=["handler", "code"],
    )
    return src, int(lo), int(hi)


# common_test.go:683-714 — query, constant value at every step, empty?
POINT_CASES = [
    ("All", f"count({METRIC}{{}})", 51, False),
    ("GroupingAll", f"sum by (__name__) (count({METRIC}{{}}))", 51, False),
    ("AllRegexFilter", f'count({METRIC}{{handler=~".+"}})', 51, False),
    (
        "AllNegativeFilter",
        f'count({METRIC}{{"handler"!="clearly-not-exist"}})',
        51,
        False,
    ),
    ("AllNegativeEmptyFilter", f'count({METRIC}{{"handler"!=""}})', 51, False),
    ("AllNegativeRegexFilter", f'count({METRIC}{{"handler"!~"^$"}})', 51, False),
    ("SelectFilter", f'count({METRIC}{{"handler"="/api/v1/query"}})', 1, False),
    (
        "SelectRegexFilter",
        f'count({METRIC}{{"handler"=~"^/api/v1/query$"}})',
        1,
        False,
    ),
    # unanchored regex must still full-match: must not hit query_range
    (
        "SelectRegexFilterFullMatch",
        f'count({METRIC}{{"handler"=~"/api/v1/query"}})',
        1,
        False,
    ),
    (
        "ExcludeFilter",
        f'count({METRIC}{{"handler"!="/api/v1/query"}})',
        50,
        False,
    ),
    (
        "ExcludeRegexFilter",
        f'count({METRIC}{{"handler"!~"^/api/v1/query$"}})',
        50,
        False,
    ),
    (
        "ExcludeRegexFilterFullMatch",
        f'count({METRIC}{{"handler"!~"/api/v1/query"}})',
        50,
        False,
    ),
    ("Empty", f'count({METRIC}{{"handler"="clearly-not-exist"}})', 0, True),
    (
        "GroupingEmpty",
        f'sum by (handler) (count({METRIC}{{"handler"="clearly-not-exist"}}))',
        0,
        True,
    ),
    # count by (__name__) counts series, not values
    ("CountByName", f"count by (__name__) ({METRIC})", 51, False),
    # several handlers never receive requests
    ("MinByName", f"min by (__name__) ({METRIC})", 0, False),
    # a single never-incremented series: all four aggregators read 0
    (
        "SumSingleZeroSeries",
        f'sum by (handler) ({METRIC}{{handler="/api/v1/query"}})',
        0,
        False,
    ),
    (
        "MinSingleZeroSeries",
        f'min by (handler) ({METRIC}{{handler="/api/v1/query"}})',
        0,
        False,
    ),
    (
        "MaxSingleZeroSeries",
        f'max by (handler) ({METRIC}{{handler="/api/v1/query"}})',
        0,
        False,
    ),
    (
        "AvgSingleZeroSeries",
        f'avg by (handler) ({METRIC}{{handler="/api/v1/query"}})',
        0,
        False,
    ),
]


@pytest.mark.parametrize(
    "name,query,count,empty",
    POINT_CASES,
    ids=[c[0] for c in POINT_CASES],
)
def test_prome2e_point_constants(spark, prom_src, name, query, count, empty):
    src, lo, hi = prom_src
    params = PromParams(lo, hi, 5_000_000)
    out = compile_promql(query, src, params, spark)
    rows = out.collect()
    if empty:
        assert not rows, name
        return
    label_cols = [c for c in out.columns if c not in ("step_us", "value")]
    series = {tuple(r[c] for c in label_cols) for r in rows}
    assert len(series) == 1, name
    assert rows, name
    for r in rows:
        assert r["value"] == float(count), (name, r)


def test_prome2e_aggregation_invariants(spark, prom_src):
    """min ≤ avg ≤ max ≤ sum at every step (common_test.go:748-790) —
    guards against sampled-points aggregation collapsing min/max/avg
    into sums."""
    src, lo, hi = prom_src
    params = PromParams(lo, hi, 5_000_000)

    def vals(q):
        out = compile_promql(q, src, params, spark)
        rows = sorted(out.collect(), key=lambda r: r["step_us"])
        assert rows
        return [r["value"] for r in rows]

    s = vals(f"sum by (__name__) ({METRIC})")
    mn = vals(f"min by (__name__) ({METRIC})")
    mx = vals(f"max by (__name__) ({METRIC})")
    av = vals(f"avg by (__name__) ({METRIC})")
    assert len(s) == len(mn) == len(mx) == len(av)
    for i in range(len(s)):
        assert s[i] >= mx[i] >= av[i] >= mn[i] >= 0.0


def test_prome2e_label_values_matchers(spark, prom_src):
    """GET /api/v1/label/handler/values with match[] selectors —
    common_test.go:280-420: one/regex/negative/multi matchers, unknown
    labels/values, out-of-range windows."""
    from oteldb_spark.engine import PromQLEngine

    src, lo, hi = prom_src
    eng = PromQLEngine(source=src, spark=spark)

    all_handlers = sorted(
        r[0]
        for r in src.df.select("handler").distinct().collect()
        if r[0] is not None
    )
    assert len(all_handlers) == 50

    def vals(label, match=None, start_us=None, end_us=None):
        return eng.label_values(
            label, match=match, start_us=start_us, end_us=end_us
        )["data"]

    mk = METRIC
    assert vals("handler", ['{handler="/api/v1/series"}']) == ["/api/v1/series"]
    assert vals("__name__", [f"{mk}{{}}"]) == [mk]
    assert vals("handler", ['{handler=~"/api/v1/(series|query)$"}']) == [
        "/api/v1/query",
        "/api/v1/series",
    ]
    expect_minus_query = [h for h in all_handlers if h != "/api/v1/query"]
    assert (
        vals("handler", [f'{mk}{{handler!="/api/v1/query"}}'])
        == expect_minus_query
    )
    assert (
        vals("handler", [f'{mk}{{handler!~"^/api/v1/query$"}}'])
        == expect_minus_query
    )
    assert vals("handler", [f'{mk}{{handler!=""}}']) == all_handlers
    assert vals(
        "handler", ['{handler="/api/v1/series"}', '{handler="/api/v1/query"}']
    ) == ["/api/v1/query", "/api/v1/series"]
    assert vals("handler", ['{handler="/api/v1/series",code="200"}']) == [
        "/api/v1/series"
    ]
    assert vals(
        "handler",
        [
            f'{mk}{{handler="/api/v1/series"}}',
            f'{mk}{{handler="/api/v1/query"}}',
        ],
    ) == ["/api/v1/query", "/api/v1/series"]
    assert vals("label_clearly_not_exist") == []
    assert vals("handler", ['{handler="value_clearly_not_exist"}']) == []
    assert vals("handler", ['{handler=~".+",clearly="not_exist"}']) == []
    # out-of-range window excludes everything
    assert (
        vals(
            "handler",
            [f'{mk}{{handler="/api/v1/series"}}'],
            start_us=10_000_000,
            end_us=20_000_000,
        )
        == []
    )
