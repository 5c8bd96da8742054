"""Reference golden-bench TraceQL corpus, replicated exactly.

The reference checks in a deterministic 500-trace × 8-span corpus with
EXACT expected match counts per query
(``storagebackend/goldenbench_traceql_test.go:52-109`` corpus spec,
``:279-330`` the golden query set, ``:364-380`` pushdown span counts).
Those wants are recorded outputs of the reference engine — replaying
the identical corpus through this engine and asserting the identical
counts anchors TraceQL semantics to the reference without needing its
runtime.
"""

from __future__ import annotations

import pytest

from oteldb_spark.traceql import SpanSource, compile_traceql

TRACES = 500
ROUTES = 64
ERROR_EVERY = 10
METHODS = ["GET", "POST", "PUT", "PATCH", "DELETE", "HEAD"]
START_US = 1_600_000_000 * 1_000_000

# (service, name, kind, parent_idx, dur_ms, fails) —
# goldenbench_traceql_test.go:102-109 traceqlShape
SHAPE = [
    ("frontend", "GET /api/checkout", 2, -1, 200, False),
    ("frontend", "authorize", 1, 0, 5, False),
    ("cart", "GET /cart", 3, 0, 20, False),
    ("cart", "cart.load", 2, 2, 15, False),
    ("checkout", "POST /checkout", 3, 0, 60, False),
    ("checkout", "checkout.process", 2, 4, 55, False),
    ("payments", "POST /pay", 3, 5, 40, True),
    ("payments", "payments.charge", 2, 6, 35, True),
]


def _corpus_rows():
    rows = []
    for i in range(TRACES):
        base_us = START_US + i * 1000
        route = f"/route/{i % ROUTES}"
        failing = i % ERROR_EVERY == 0
        for j, (svc, name, kind, parent, dur_ms, fails) in enumerate(SHAPE):
            start_us = base_us + j * 1000
            dur_us = (dur_ms + i % 17) * 1000
            status = 500 if (failing and fails) else 200
            rows.append(
                (
                    i,
                    (i << 8) | (j + 1),
                    ((i << 8) | (parent + 1)) if parent >= 0 else None,
                    svc,
                    name,
                    kind,
                    start_us,
                    dur_us,
                    2 if (failing and fails) else 0,
                    "payment declined by upstream" if (failing and fails) else "",
                    METHODS[(i + j) % len(METHODS)],
                    status,
                    route,
                )
            )
    return rows


@pytest.fixture(scope="module")
def golden_src(spark):
    df = spark.createDataFrame(
        _corpus_rows(),
        "trace_id long, span_id long, parent_span_id long, service string,"
        " name string, kind long, start_us long, duration_us long,"
        " status_code long, status_message string, http_request_method string,"
        " http_response_status_code long, http_route string",
    ).cache()
    df.count()
    return SpanSource(
        df=df,
        attr_cols={
            "service.name": "service",
            "http.route": "http_route",
            "http.response.status_code": "http_response_status_code",
            "http.request.method": "http_request_method",
        },
    )


# goldenbench_traceql_test.go:279-330 — query, exact trace count
GOLDEN_CASES = [
    ("scan_all", "{}", TRACES),
    ("by_service", '{resource.service.name = "payments"}', TRACES),
    ("by_name", '{name = "checkout.process"}', TRACES),
    ("attr_route", '{span.http.route = "/route/7"}', 8),
    (
        "attr_status_code",
        "{span.http.response.status_code = 500}",
        TRACES // ERROR_EVERY,
    ),
    ("status_error", "{status = error}", TRACES // ERROR_EVERY),
    ("kind_server", "{kind = server}", TRACES),
    ("duration_gt", "{duration > 150ms}", TRACES),
    (
        "attr_and_status",
        "{span.http.response.status_code = 500 && status = error}",
        TRACES // ERROR_EVERY,
    ),
    (
        "descendant",
        '{resource.service.name = "frontend"} >> {resource.service.name = "cart"}',
        TRACES,
    ),
    ("root_name", '{rootName = "GET /api/checkout"}', TRACES),
    ("root_service_name", '{rootServiceName = "frontend"}', TRACES),
    ("sibling", '{name = "authorize"} ~ {name = "GET /cart"}', TRACES),
    ("child", '{name = "POST /checkout"} > {name = "checkout.process"}', TRACES),
]


@pytest.mark.parametrize(
    "name,query,want", GOLDEN_CASES, ids=[c[0] for c in GOLDEN_CASES]
)
def test_golden_trace_counts(golden_src, name, query, want):
    out = compile_traceql(query, golden_src)
    got = out.select("trace_id").distinct().count()
    assert got == want, f"{name}: {got} != {want}"


# goldenbench_traceql_test.go:364-380 pushdown span counts — the same
# predicates asserted at SPAN granularity
PUSHDOWN_CASES = [
    ("status_code", "{status = error}", TRACES // ERROR_EVERY * 2),
    ("kind", "{kind = server}", TRACES * 4),
    ("name", '{name = "checkout.process"}', TRACES),
    ("route", '{span.http.route = "/route/7"}', 8 * len(SHAPE)),
]


@pytest.mark.parametrize(
    "name,query,want", PUSHDOWN_CASES, ids=[c[0] for c in PUSHDOWN_CASES]
)
def test_golden_span_counts(golden_src, name, query, want):
    out = compile_traceql(query, golden_src)
    assert out.count() == want, name
