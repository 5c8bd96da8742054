"""TraceQL parser + compiler unit tests."""

from __future__ import annotations

import pytest

from oteldb_spark.traceql import SpanSource, compile_traceql, parse
from oteldb_spark.traceql import parser as P


def test_parse_spanset_filter():
    q = parse('{ span.http.route = "/api" && duration > 150ms }')
    e = q.root.expr
    assert e.op == "&&"
    assert e.lhs.lhs.scope == "span" and e.lhs.lhs.name == "http.route"
    assert e.rhs.rhs.kind == "duration" and e.rhs.rhs.value == 150_000


def test_parse_status_kind_enums():
    q = parse("{ status = error && kind = server }")
    e = q.root.expr
    assert e.lhs.rhs.value == 2.0
    assert e.rhs.rhs.value == 2.0


def test_parse_structural_chain():
    q = parse('{ name = "a" } >> { name = "b" }')
    assert isinstance(q.root, P.Structural) and q.root.op == ">>"


def test_parse_scalar_filter():
    q = parse("{ } | count() > 3")
    st = q.stages[0]
    assert st.agg == "count" and st.op == ">" and st.value == 3.0

    q = parse("{ } | max(duration) > 150ms")
    st = q.stages[0]
    assert st.agg == "max" and st.value == 150_000


def test_parse_select():
    q = parse("{ status = error } | select(span.service, duration)")
    st = q.stages[0]
    assert [a.name for a in st.attrs] == ["service", "duration"]


def test_parse_errors():
    with pytest.raises(SyntaxError):
        parse("{ name = }")
    with pytest.raises(SyntaxError):
        parse("{ } | weird()")


def _spans(spark):
    rows = [
        # trace 1: root(err) -> a -> b
        (1, 1, None, "front", "root", 2, 0, 100, 2),
        (1, 2, 1, "svc", "a", 3, 10, 50, 0),
        (1, 3, 2, "svc", "b", 3, 20, 30, 0),
        # trace 2: root(ok) -> a
        (2, 1, None, "front", "root", 2, 0, 100, 0),
        (2, 2, 1, "svc", "a", 3, 10, 50, 0),
    ]
    return spark.createDataFrame(
        rows,
        "trace_id long, span_id long, parent_span_id long, service string,"
        " name string, kind long, start_us long, duration_us long,"
        " status_code long",
    )


def _src(spark):
    return SpanSource(df=_spans(spark), attr_cols={"service": "service"})


def test_compile_filter(spark):
    out = compile_traceql('{ span.service = "svc" && duration >= 50us }', _src(spark))
    assert {(r.trace_id, r.name) for r in out.collect()} == {(1, "a"), (2, "a")}


def test_compile_child_and_descendant(spark):
    out = compile_traceql('{ status = error } > { name = "a" }', _src(spark))
    assert {(r.trace_id, r.name) for r in out.collect()} == {(1, "a")}
    # b is a grandchild of the error root → only >> finds it
    out = compile_traceql('{ status = error } > { name = "b" }', _src(spark))
    assert out.collect() == []
    out = compile_traceql('{ status = error } >> { name = "b" }', _src(spark))
    assert {(r.trace_id, r.name) for r in out.collect()} == {(1, "b")}


def test_compile_intersect_union(spark):
    out = compile_traceql('{ name = "b" } && { name = "a" }', _src(spark))
    # both match only within trace 1 → union of matches there
    assert {(r.trace_id, r.name) for r in out.collect()} == {(1, "a"), (1, "b")}
    out = compile_traceql('{ name = "b" } || { name = "root" }', _src(spark))
    assert {(r.trace_id, r.name) for r in out.collect()} == {
        (1, "b"),
        (1, "root"),
        (2, "root"),
    }


def test_compile_scalar_count(spark):
    out = compile_traceql("{ } | count() > 2", _src(spark))
    assert {r.trace_id for r in out.collect()} == {1}


def test_tempo_v1_tags_tracebyid_and_metrics_range(spark):
    from oteldb_spark.engine import TraceQLEngine
    from oteldb_spark.queries.traceql_parsed import _source as _tql_source

    eng = TraceQLEngine(_tql_source(spark, "/root/testdata/sf0.001"))
    # v1 flat tag surface wraps the v2 scoped one
    tags = eng.search_tags()["tagNames"]
    assert "duration" in tags and tags == sorted(tags)
    vals = eng.search_tag_values("span.service")["tagValues"]
    assert vals and all(isinstance(v, str) for v in vals)
    # trace-by-id: every span of the trace, start-ordered
    tr = eng.trace_by_id(1337)
    assert tr["traceID"] == "1337"
    assert tr["spans"] and all(s["trace_id"] == 1337 for s in tr["spans"])
    starts = [s["start_us"] for s in tr["spans"]]
    assert starts == sorted(starts)
    # metrics query_range (ref 501s): rate of error spans per week
    out = eng.query_range(
        "{ status = error } | rate()",
        820_454_400_000_000,
        820_454_400_000_000 + 28 * 86_400_000_000,
        7 * 86_400_000_000,
        28 * 86_400_000_000,
    )
    assert out["data"]["resultType"] == "matrix"
    assert out["data"]["result"]
