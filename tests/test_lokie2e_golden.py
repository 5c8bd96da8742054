"""Reference Loki e2e suite, replayed from its checked-in golden corpus.

``integration/lokie2e/_golden/logs.yml`` is the reference's EXACT test
corpus (123 OTLP log batches, YAML-marshaled), and
``integration/lokie2e/common_test.go:394-526`` checks ~90 LogQL
queries against it with exact entry counts — including both dotted and
sanitized attr spellings, Prometheus-style quoted label names, ip()
filters, distinct, and a grouped metric query.  Ingest goes through
the real OTLP/JSON flattener; the label model mirrors the reference's
(level from severity, case-folded level/trace_id/span_id matchers,
record attrs as the dynamic label map).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from oteldb_spark.logql import EvalParams, LogSource, compile_logql

GOLDEN = "/root/reference/integration/lokie2e/_golden/logs.yml"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="reference golden corpus not available"
)

N = 123  # len(set.Records): generate_test.go:106-117 batch counts


@pytest.fixture(scope="module")
def e2e_source(spark):
    import yaml

    from oteldb_spark.sources.otlp import OTLP_LOGS_SCHEMA, flatten_otlp_logs

    with open(GOLDEN) as f:
        docs = [d for d in yaml.safe_load_all(f) if d]
    raw = spark.createDataFrame([(json.dumps(d),) for d in docs], "j string")
    flat = flatten_otlp_logs(
        raw.select(F.from_json("j", OTLP_LOGS_SCHEMA).alias("r")).select("r.*")
    )
    level = (
        F.when(F.col("severity_number").between(1, 4), "TRACE")
        .when(F.col("severity_number").between(5, 8), "DEBUG")
        .when(F.col("severity_number").between(9, 12), "INFO")
        .when(F.col("severity_number").between(13, 16), "WARN")
        .when(F.col("severity_number").between(17, 20), "ERROR")
        .when(F.col("severity_number").between(21, 24), "FATAL")
        .otherwise("")
    )
    df = flat.select(
        (F.col("timestamp_ns") / 1000).cast("long").alias("ts_us"),
        "body",
        level.alias("level"),
        "service_name",
        "service_namespace",
        F.coalesce(
            F.col("resource_attrs").getItem("service.version"), F.lit("")
        ).alias("service_version"),
        F.coalesce(F.col("trace_id"), F.lit("")).alias("trace_id"),
        F.coalesce(F.col("span_id"), F.lit("")).alias("span_id"),
        "attrs",
    ).cache()
    assert df.count() == N
    return LogSource(
        df=df,
        label_cols={
            "level": "level",
            "service_name": "service_name",
            "service_namespace": "service_namespace",
            "service_version": "service_version",
            "trace_id": "trace_id",
            "span_id": "span_id",
        },
        attrs_map_col="attrs",
        hexid_labels=frozenset({"trace_id", "span_id"}),
        severity_labels=frozenset({"level"}),
    )


# evaluation window: [set.Start, set.End] per common_test.go
START_US = 1_609_459_200_000_000  # 2021-01-01T00:00:00Z
END_US = START_US + N * 120_000 + 1  # 120ms per record, inclusive end
PARAMS = EvalParams(START_US, END_US, END_US - START_US)

# common_test.go:394-526 — (query, exact entries); N-relative counts
# spelled via the constant like the reference does
E2E_CASES = [
    # by trace id (case-folded hex)
    ('{trace_id="af36000000000000c517000000000003"}', 1),
    ('{trace_id="AF36000000000000C517000000000003"}', 1),
    ('{trace_id=~"AF3600.+000C517000.+00003"}', 1),
    ('{trace_id="badbadbadbadbadbaddeadbeafbadbad"}', 0),
    ('{trace_id=~"bad.+"}', 0),
    # by span id
    ('{span_id="e3daccf703000003"}', 1),
    ('{span_id="E3DACCF703000003"}', 1),
    ('{span_id=~"E3DA.+F7030000.+3"}', 1),
    ('{span_id="0123456789abcdef"}', 0),
    ('{span_id=~"bad.+"}', 0),
    # by severity (case-folded)
    ('{level="Info"}', 121),
    ('{level="INFO"}', 121),
    ('{level=~"I.+"}', 121),
    ('{level!~"(WARN|DEBUG)"}', 123),
    ('{level=~"(WARN|DEBUG)"}', 0),
    # by service name
    ('{service_name="testService"}', 59),
    ('{service_name=~"test.+"}', 59),
    # sanitized spellings of the dotted record attr
    ('{http_method="GET"}', 21),
    ('{http_method=~".*GET.*"}', 21),
    ('{http_method=~"^GET$"}', 21),
    ('{http_method!~"(HEAD|POST|DELETE|PUT|PATCH|TRACE|OPTIONS)"}', 21),
    # dotted spellings
    ('{http.method="GET"}', 21),
    ('{http.method=~".*GET.*"}', 21),
    ('{http.method=~"^GET$"}', 21),
    ('{http.method!~"(HEAD|POST|DELETE|PUT|PATCH|TRACE|OPTIONS)"}', 21),
    # Prometheus-style quoted label names (oteldb extension)
    ('{"http_method"="GET"}', 21),
    ('{"http_method"=~".*GET.*"}', 21),
    ('{"http_method"=~"^GET$"}', 21),
    ('{"http_method"!~"(HEAD|POST|DELETE|PUT|PATCH|TRACE|OPTIONS)"}', 21),
    ('{"http.method"="GET"}', 21),
    ('{"http.method"=~".*GET.*"}', 21),
    ('{"http.method"=~"^GET$"}', 21),
    ('{"http.method"!~"(HEAD|POST|DELETE|PUT|PATCH|TRACE|OPTIONS)"}', 21),
    # other methods
    ('{http_method="DELETE"}', 20),
    ('{http_method="GET"}', 21),
    ('{http_method="HEAD"}', 22),
    ('{http_method="PATCH"}', 19),
    ('{http_method="POST"}', 21),
    ('{http_method="PUT"}', 20),
    ('{http_method="GET"} | json', 21),
    # negative matchers (N-relative like the reference)
    ('{http_method!="HEAD"}', N - 22),
    ('{http_method!~"^HEAD$"}', N - 22),
    # multiple labels
    ('{http_method="HEAD",http_status_code="500"}', 2),
    ('{http_method="HEAD",http_status_code=~"^500$"}', 2),
    ('{http_method=~".*HEAD.*",http_status_code=~"^500$"}', 2),
    ('{http.method="HEAD",http.status_code="500"}', 2),
    ('{http.method="HEAD",http.status_code=~"^500$"}', 2),
    ('{http.method=~".*HEAD.*",http.status_code=~"^500$"}', 2),
    # line filters
    ('{http_method=~".+"} |= "GET"', 21),
    ('{http_method=~".+"} |= "DELETE"', 20),
    ('{http_method=~".+"} |= "HEAD" |= " 500 "', 2),
    ('{http_method=~".+"} |~ "DELETE"', 20),
    ('{http_method=~".+"} |~ "HEAD" |= " 500 "', 2),
    ('{http_method=~".+"} |~ "(GET|HEAD)"', 43),
    ('{http_method=~".+"} |~ "GE.+"', 21),
    ('{http_method=~".+"} |= "GET" or "HEAD"', 43),
    ('{http_method=~".+"} | line_format "{{ __line__ }}" |= "DELETE"', 20),
    (
        '{http_method=~".+"} | line_format "{{ __line__ }}" |= "HEAD" |= " 500 "',
        2,
    ),
    (
        '{http_method=~".+"} |= "HEAD" | line_format "{{ __line__ }}" |= " 500 "',
        2,
    ),
    ('{http_method=~".+"} != "HEAD"', N - 22),
    ('{http_method=~".+"} !~ "HEAD"', N - 22),
    # label filters
    ('{http_method=~".+"} | http_method = "GET"', 21),
    ('{http_method=~".+"} | http_method = "GET" or http_method = "HEAD"', 43),
    (
        '{http_method=~".+"} | http_method = "HEAD", http_status_code = "500"',
        2,
    ),
    (
        '{http_method=~".+"} | http_method = "HEAD", http_status_code == 500',
        2,
    ),
    ('{http_method=~".+"} | span_id = "e3daccf703000003"', 1),
    ('{http_method=~".+"} | json | span_id = "e3daccf703000003"', 1),
    ('{http_method=~".+"} | trace_id = "af36000000000000c517000000000003"', 1),
    (
        '{http_method=~".+"} | json | trace_id = "af36000000000000c517000000000003"',
        1,
    ),
    # per-protocol counts (protocol is a record attr; | json on the
    # plain-text body errors but keeps the line, and the label filter
    # resolves the attr)
    ('{http_method=~".+"} | json | protocol = "HTTP/1.0"', 55),
    ('{http_method=~".+"} | json | protocol = "HTTP/1.1"', 10),
    ('{http_method=~".+"} | json | protocol = "HTTP/2.0"', 58),
    ('{http_method=~".+"} | json | protocol =~ "HTTP/1.\\\\d"', 65),
    ('{http_method=~".+"} | json | protocol != "HTTP/2.0"', 65),
    ('{http_method=~".+"} | json | protocol !~ "HTTP/2.\\\\d"', 65),
    (
        '{http_method=~".+"} | json | protocol = "HTTP/1.0" or protocol = "HTTP/1.1"',
        65,
    ),
    (
        '{http_method=~".+"} | json | protocol =~ "HTTP/1.\\\\d" and protocol = "HTTP/1.1"',
        10,
    ),
    # ip filters on the dotted client.address attr
    ('{http_method="HEAD"} | client_address = "236.7.233.166"', 1),
    ('{http_method="HEAD"} | client_address = ip("236.7.233.166")', 1),
    ('{http_method="HEAD"} | client_address = ip("236.7.233.0/24")', 1),
    (
        '{http_method="HEAD"} | client_address = ip("236.7.233.0-236.7.233.255")',
        1,
    ),
    # distinct
    ('{http_method=~".+"} | distinct http_method', 6),
    ('{http_method=~".+"} | distinct protocol', 3),
    # definitively empty
    ('{http_method=~".+"} |= "GET" or "HEAD" != "GET" or "HEAD"', 0),
    ('{http_method=~".+"} |= "GET" or "HEAD" !~ "(GET|HEAD)"', 0),
    ('{http_method=~".+"} |= ip("127.0.0.1")', 0),
    ('{http_method=~".+"} |= ip("127.0.0.1") or ip("192.168.1.0/24")', 0),
    ('{http_method="GET"} | http_method != "GET"', 0),
    ('{http_method="HEAD"} | clearly_not_exist > 0', 0),
    ('{http_method=~".+"} | http_method = "GET" and http_method = "HEAD"', 0),
]


@pytest.mark.parametrize(
    "query,want",
    E2E_CASES,
    ids=[f"q{i}" for i in range(len(E2E_CASES))],
)
def test_e2e_log_query_counts(spark, e2e_source, query, want):
    out = compile_logql(query, e2e_source, PARAMS, spark)
    assert out.count() == want, query


def test_e2e_metric_grouped_counts(spark, e2e_source):
    # common_test.go:722-758 — single step past the end, 30s range
    # covers the whole 14.8s corpus
    q = "sum by (http_method) ( count_over_time({http_method=~\".+\"} [30s]) )"
    p = EvalParams(END_US, END_US, 30_000_000)
    out = compile_logql(q, e2e_source, p, spark)
    got = {r["http_method"]: int(r["value"]) for r in out.collect()}
    assert got == {
        "GET": 21,
        "HEAD": 22,
        "DELETE": 20,
        "PUT": 20,
        "POST": 21,
        "PATCH": 19,
    }
    # and the empty complement
    q0 = "sum by (http_method) ( count_over_time({http_method!~\".+\"} [30s]) )"
    assert compile_logql(q0, e2e_source, p, spark).count() == 0


def test_e2e_detected_field_cardinalities(spark, e2e_source):
    """common_test.go:360-392 — per-label distinct-value cardinality
    under the full-range selector: level 2 (INFO, FATAL), service_name
    2, service_namespace 2, service_version 1."""
    from oteldb_spark.engine import LogQLEngine

    eng = LogQLEngine(source=e2e_source, spark=spark)
    fields = eng.detected_fields('{service_name=~".+"}', START_US, END_US)
    card = {f["label"]: f["cardinality"] for f in fields["fields"]}
    assert card["level"] == 2
    assert card["service_name"] == 2
    assert card["service_namespace"] == 2
    assert card["service_version"] == 1


def test_e2e_volume_endpoints(spark, e2e_source):
    """index/volume + volume_range over the reference corpus
    (lokihandler.go:409-491 evalVolumeQuery): per-label log volumes
    with exact corpus counts — testService 59 / fooService 64
    (common_test.go LogQueries), level INFO 121 / FATAL 2."""
    from oteldb_spark.engine import LogQLEngine

    eng = LogQLEngine(source=e2e_source, spark=spark)
    # evalVolumeQuery truncates the aggregation range to whole seconds
    # (lokihandler.go:521 aggRange.Truncate(time.Second)) — a padded
    # start makes the window cover the whole 14.76s corpus, giving the
    # reference's exact per-service totals
    vec = eng.query_volume('{service_name=~".+"}', END_US - 16_000_000, END_US)
    assert vec["status"] == "success"
    assert vec["data"]["resultType"] == "vector"
    got = {
        r["metric"]["service_name"]: float(r["value"][1])
        for r in vec["data"]["result"]
    }
    assert got == {"testService": 59.0, "fooService": 64.0}
    # and the truncation itself: the corpus-tight window floors to 14s,
    # counting exactly the rows in (END-14s, END] — cross-checked
    # against the raw frame
    tight = eng.query_volume('{service_name=~".+"}', START_US, END_US)
    in_window = (
        e2e_source.df.filter(
            (F.col("ts_us") > END_US - 14_000_000) & (F.col("ts_us") <= END_US)
        ).count()
    )
    assert (
        sum(float(r["value"][1]) for r in tight["data"]["result"]) == in_window
    )
    # every vector point is stamped at `end` (evalVolumeQuery sets
    # Start=End)
    assert all(
        float(r["value"][0]) == END_US / 1e6 for r in vec["data"]["result"]
    )

    # volume_range: target_labels regroups; one point per series
    # (same padded start for full-corpus coverage)
    mat = eng.query_volume_range(
        '{level=~".+"}',
        END_US - 16_000_000,
        END_US,
        60_000_000,
        target_labels=["level"],
    )
    assert mat["data"]["resultType"] == "matrix"
    assert all(len(s["values"]) == 1 for s in mat["data"]["result"])
    vals = {
        s["metric"]["level"]: float(s["values"][0][1])
        for s in mat["data"]["result"]
    }
    assert vals == {"INFO": 121.0, "FATAL": 2.0}


def test_e2e_detected_labels(spark, e2e_source):
    """detected_labels (lokihandler.go:165-212): stream-label
    cardinalities under the full-range selector.  Reference-derived
    expectations: level 2 (INFO, FATAL), service_name 2,
    service_namespace 2, service_version 1 (common_test.go:360-392
    comments); per-record hex ids (trace_id/span_id) and the body are
    unbounded-cardinality record-level columns and are excluded, same
    skip set as series() — the reference scans only the deduplicated
    resource attrs."""
    from oteldb_spark.engine import LogQLEngine

    eng = LogQLEngine(source=e2e_source, spark=spark)
    out = eng.detected_labels('{service_name=~".+"}', START_US, END_US)
    card = {d["label"]: d["cardinality"] for d in out["detectedLabels"]}
    assert card["level"] == 2
    assert card["service_name"] == 2
    assert card["service_namespace"] == 2
    assert card["service_version"] == 1
    # the record-attr long tail (http_method et al.) is NOT a stream
    # label — detected_fields' domain, mirroring the reference's
    # resource-map-only scan
    assert "http_method" not in card
    # hexid/body skip set (matches series()): no unbounded-cardinality
    # record-level labels in the response
    assert "trace_id" not in card
    assert "span_id" not in card
    assert "body" not in card


def test_e2e_series_endpoint(spark, e2e_source):
    """series (lokihandler.go:558-603; common_test.go Series subtests):
    distinct stream label sets — high-cardinality trace/span ids are
    NOT part of series identity (the reference re-adds them when
    comparing against the full label universe); matchers restrict,
    multiple match[] union."""
    from oteldb_spark.engine import LogQLEngine

    eng = LogQLEngine(source=e2e_source, spark=spark)
    allseries = eng.series(start_us=START_US, end_us=END_US)
    names = {k for s in allseries for k in s}
    assert names == {"level", "service_name", "service_namespace",
                     "service_version"}
    # OneMatcher
    foo = eng.series(
        '{service_name="fooService"}', start_us=START_US, end_us=END_US
    )
    assert foo and all(s["service_name"] == "fooService" for s in foo)
    # Matchers: union of two selectors
    both = eng.series(
        ['{service_name="testService"}', '{service_name="fooService"}'],
        start_us=START_US,
        end_us=END_US,
    )
    assert {s["service_name"] for s in both} == {"testService", "fooService"}
    # out-of-range window yields nothing
    assert eng.series(start_us=0, end_us=1) == []
