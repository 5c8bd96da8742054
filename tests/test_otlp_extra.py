"""OTLP span/metric flatteners + collapsed profile rendering."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from oteldb_spark.api.serializers import profile_collapsed
from oteldb_spark.sources.otlp import (
    OTLP_METRICS_SCHEMA,
    OTLP_TRACES_SCHEMA,
    flatten_otlp_metrics,
    flatten_otlp_spans,
)


def _trace_payload() -> dict:
    return {
        "resourceSpans": [
            {
                "resource": {
                    "attributes": [
                        {"key": "service.name", "value": {"stringValue": "cart"}}
                    ]
                },
                "scopeSpans": [
                    {
                        "spans": [
                            {
                                "traceId": "ab" * 16,
                                "spanId": "cd" * 8,
                                "parentSpanId": "",
                                "name": "GET /cart",
                                "kind": 2,
                                "startTimeUnixNano": "1704067200000000000",
                                "endTimeUnixNano": "1704067200020000000",
                                "attributes": [
                                    {
                                        "key": "http.route",
                                        "value": {"stringValue": "/cart"},
                                    }
                                ],
                                "status": {"code": 2, "message": "boom"},
                            }
                        ]
                    }
                ],
            }
        ]
    }


def _metric_payload() -> dict:
    return {
        "resourceMetrics": [
            {
                "resource": {"attributes": []},
                "scopeMetrics": [
                    {
                        "metrics": [
                            {
                                "name": "http_requests_total",
                                "unit": "1",
                                "sum": {
                                    "isMonotonic": True,
                                    "dataPoints": [
                                        {
                                            "timeUnixNano": "1704067200000000000",
                                            "asInt": "42",
                                            "attributes": [
                                                {
                                                    "key": "code",
                                                    "value": {"stringValue": "200"},
                                                }
                                            ],
                                        }
                                    ],
                                },
                            },
                            {
                                "name": "mem_free",
                                "unit": "By",
                                "gauge": {
                                    "dataPoints": [
                                        {
                                            "timeUnixNano": "1704067201000000000",
                                            "asDouble": 12.5,
                                            "attributes": [],
                                        }
                                    ]
                                },
                            },
                        ]
                    }
                ],
            }
        ]
    }


def test_flatten_spans(spark, tmp_path):
    p = tmp_path / "t.jsonl"
    p.write_text(json.dumps(_trace_payload()))
    raw = spark.read.schema(OTLP_TRACES_SCHEMA).json(str(p))
    rows = flatten_otlp_spans(raw).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.service_name == "cart"
    assert r.duration_ns == 20_000_000
    assert r.status_code == 2
    assert r.attrs["http.route"] == "/cart"
    assert str(r.date) == "2024-01-01"


def test_flatten_metrics(spark, tmp_path):
    p = tmp_path / "m.jsonl"
    p.write_text(json.dumps(_metric_payload()))
    raw = spark.read.schema(OTLP_METRICS_SCHEMA).json(str(p))
    rows = {r["name"]: r for r in flatten_otlp_metrics(raw).collect()}
    assert rows["http_requests_total"].value == 42.0
    assert rows["http_requests_total"].is_monotonic is True
    assert rows["http_requests_total"].labels == {"code": "200"}
    assert rows["mem_free"].value == 12.5
    assert rows["mem_free"].series_hash != rows["http_requests_total"].series_hash


def _histogram_payload() -> dict:
    return {
        "resourceMetrics": [
            {
                "resource": {"attributes": []},
                "scopeMetrics": [
                    {
                        "metrics": [
                            {
                                "name": "req_duration",
                                "unit": "ms",
                                "histogram": {
                                    "aggregationTemporality": 2,
                                    "dataPoints": [
                                        {
                                            "timeUnixNano": "1704067200000000000",
                                            "count": "17",
                                            "sum": 55.5,
                                            "min": 0.1,
                                            "max": 9.9,
                                            # trailing overflow bucket (7)
                                            "bucketCounts": ["2", "3", "5", "7"],
                                            "explicitBounds": [1.0, 2.5, 5.0],
                                            "attributes": [
                                                {
                                                    "key": "svc",
                                                    "value": {"stringValue": "api"},
                                                }
                                            ],
                                        }
                                    ],
                                },
                            },
                            {
                                "name": "rpc_lat",
                                "unit": "s",
                                "summary": {
                                    "dataPoints": [
                                        {
                                            "timeUnixNano": "1704067200000000000",
                                            "count": "10",
                                            "sum": 4.2,
                                            "quantileValues": [
                                                {"quantile": 0.5, "value": 0.3},
                                                {"quantile": 0.99, "value": 1.7},
                                            ],
                                            "attributes": [],
                                        }
                                    ]
                                },
                            },
                        ]
                    }
                ],
            }
        ]
    }


def test_histogram_explosion(spark, tmp_path):
    p = tmp_path / "h.jsonl"
    p.write_text(json.dumps(_histogram_payload()))
    raw = spark.read.schema(OTLP_METRICS_SCHEMA).json(str(p))
    rows = flatten_otlp_metrics(raw).collect()
    buckets = {
        r.labels["le"]: r.value for r in rows if r.name == "req_duration_bucket"
    }
    # cumulative counts; le formatted like Go 'f' -1 (no trailing .0);
    # +Inf folds the overflow bucket so it equals the point count
    assert buckets == {"1": 2.0, "2.5": 5.0, "5": 10.0, "+Inf": 17.0}
    by_name = {r.name: r for r in rows if r.name.startswith("req_duration")}
    assert by_name["req_duration_count"].value == 17.0
    assert by_name["req_duration_sum"].value == 55.5
    assert by_name["req_duration_min"].value == 0.1
    assert by_name["req_duration_max"].value == 9.9
    # mapped scalar series drop the unit; _bucket keeps it
    assert by_name["req_duration_count"].unit == ""
    assert by_name["req_duration_bucket"].unit == "ms"
    assert by_name["req_duration_bucket"].labels["svc"] == "api"
    # distinct le → distinct series hashes
    hashes = {
        r.series_hash for r in rows if r.name == "req_duration_bucket"
    }
    assert len(hashes) == 4


def test_summary_explosion(spark, tmp_path):
    p = tmp_path / "s.jsonl"
    p.write_text(json.dumps(_histogram_payload()))
    raw = spark.read.schema(OTLP_METRICS_SCHEMA).json(str(p))
    rows = [r for r in flatten_otlp_metrics(raw).collect() if "rpc_lat" in r.name]
    quantiles = {
        r.labels["quantile"]: r.value
        for r in rows
        if r.mapping == "summary_quantile"
    }
    assert quantiles == {"0.5": 0.3, "0.99": 1.7}
    by = {(r.name, r.mapping): r.value for r in rows}
    assert by[("rpc_lat_count", "summary_count")] == 10.0
    assert by[("rpc_lat_sum", "summary_sum")] == 4.2


def test_profile_collapsed(spark):
    df = spark.createDataFrame(
        [("frontend>order-1", 1500, 3), ("frontend>order-1>line-N", 700, 2)],
        "stack string, total_us long, samples long",
    )
    out = profile_collapsed(df)
    assert out.splitlines() == [
        "frontend;order-1 1500",
        "frontend;order-1;line-N 700",
    ]
