"""Driver-gated queries through the FULL TraceQL front-end (parse →
compile → DataFrame) with SQL oracles."""

from __future__ import annotations

from ..signals import SPANS_CTE, spans_frame, with_ctes
from ..traceql import SpanSource, compile_traceql
from .registry import register

_ALL = "trace_id, span_id, parent_span_id, service, name, kind, start_us, duration_us, status_code"


def _source(spark, sf_dir) -> SpanSource:
    return SpanSource(
        df=spans_frame(spark, sf_dir),
        attr_cols={"service": "service", "service.name": "service"},
    )


def _run(q: str):
    def fn(spark, sf_dir):
        return compile_traceql(q, _source(spark, sf_dir))

    return fn


# { resource.service.name = "svc-1" && duration > 50ms }
register(
    "tql_parsed_filter",
    with_ctes(
        SPANS_CTE,
        body=f"""SELECT {_ALL} FROM spans
WHERE service = 'svc-1' AND duration_us > 50000""",
    ),
)(_run('{ resource.service.name = "svc-1" && duration > 50ms }'))


# { span.service = "frontend" && status = error } > { name = "line-R" }
register(
    "tql_parsed_child",
    with_ctes(
        SPANS_CTE,
        body=f"""SELECT {", ".join("c." + c.strip() for c in _ALL.split(","))}
FROM spans p JOIN spans c
  ON c.trace_id = p.trace_id AND c.parent_span_id = p.span_id
WHERE p.service = 'frontend' AND p.status_code = 2 AND c.name = 'line-R'""",
    ),
)(_run('{ span.service = "frontend" && status = error } > { name = "line-R" }'))


# { } | count() > 6 — spans of traces with more than 6 spans
register(
    "tql_parsed_count",
    with_ctes(
        SPANS_CTE,
        body=f"""SELECT {_ALL} FROM spans
WHERE trace_id IN (
  SELECT trace_id FROM spans GROUP BY trace_id HAVING count(*) > 6)""",
    ),
)(_run("{ } | count() > 6"))


# { status = error } ~ { duration > 60ms } — siblings
register(
    "tql_parsed_sibling",
    with_ctes(
        SPANS_CTE,
        body=f"""SELECT DISTINCT {", ".join("b." + c.strip() for c in _ALL.split(","))}
FROM spans a JOIN spans b
  ON a.trace_id = b.trace_id
 AND a.parent_span_id IS NOT DISTINCT FROM b.parent_span_id
 AND a.span_id <> b.span_id
WHERE a.status_code = 2 AND b.duration_us > 60000""",
    ),
)(_run("{ status = error } ~ { duration > 60ms }"))


# { kind = client && name = "line-R" } || { name = "line-N" } — union
register(
    "tql_parsed_union",
    with_ctes(
        SPANS_CTE,
        body=f"""SELECT {_ALL} FROM spans WHERE kind = 3 AND name = 'line-R'
UNION
SELECT {_ALL} FROM spans WHERE name = 'line-N'""",
    ),
)(_run('{ kind = client && name = "line-R" } || { name = "line-N" }'))


# { } | max(duration) > 300ms — scalar aggregate filter through parser
register(
    "tql_parsed_max_duration",
    with_ctes(
        SPANS_CTE,
        body=f"""SELECT {_ALL} FROM spans
WHERE trace_id IN (
  SELECT trace_id FROM spans GROUP BY trace_id
  HAVING max(duration_us) > 300000)""",
    ),
)(_run("{ } | max(duration) > 300ms"))
