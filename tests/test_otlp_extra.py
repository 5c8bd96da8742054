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
