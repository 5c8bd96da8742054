"""Trace-context intrinsics through the FULL TraceQL parse → compile
path: ``rootName`` / ``rootServiceName`` / ``traceDuration`` /
``childCount`` (reference ``traceql/attribute.go:52-65``) — compiled
generically via per-trace enrichment joins (one groupBy(trace) each,
co-partitioned with the structural joins), not bespoke per-gate plans.
"""

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


# { childCount >= 6 } — spans with at least 6 direct children
register(
    "tql_parsed_childcount",
    with_ctes(
        SPANS_CTE,
        body=f"""SELECT {", ".join("s." + c.strip() for c in _ALL.split(","))}
FROM spans s
JOIN (SELECT trace_id, parent_span_id AS sid, count(*) AS c
      FROM spans WHERE parent_span_id IS NOT NULL
      GROUP BY trace_id, parent_span_id) cc
  ON cc.trace_id = s.trace_id AND cc.sid = s.span_id
WHERE cc.c >= 6""",
    ),
)(_run("{ childCount >= 6 }"))


# { childCount = 0 && status = error } — error leaves (exercises the
# coalesce-to-zero path for spans with no child row to join)
register(
    "tql_parsed_childcount_leaf",
    with_ctes(
        SPANS_CTE,
        body=f"""SELECT {", ".join("s." + c.strip() for c in _ALL.split(","))}
FROM spans s
ANTI JOIN (SELECT DISTINCT trace_id, parent_span_id AS sid FROM spans
           WHERE parent_span_id IS NOT NULL) cc
  ON cc.trace_id = s.trace_id AND cc.sid = s.span_id
WHERE s.status_code = 2""",
    ),
)(_run("{ childCount = 0 && status = error }"))


# { rootName =~ "order-1.*" && duration > 80ms } — root-derived
# intrinsic through the generic compiler (cf. the bespoke
# traceql_rootname plan, which it must agree with)
register(
    "tql_parsed_rootname",
    with_ctes(
        SPANS_CTE,
        body=f"""SELECT {", ".join("s." + c.strip() for c in _ALL.split(","))}
FROM spans s
JOIN (SELECT trace_id, arg_min(name, span_id) AS root_name
      FROM spans WHERE parent_span_id IS NULL GROUP BY trace_id) r
  ON r.trace_id = s.trace_id
WHERE regexp_matches(r.root_name, 'order-1.*') AND s.duration_us > 80000""",
    ),
)(_run('{ rootName =~ "order-1.*" && duration > 80ms }'))


# { traceDuration > 3000000000 && kind = client } — trace-window
# duration (max end - min start) joined per span
register(
    "tql_parsed_trace_duration",
    with_ctes(
        SPANS_CTE,
        body=f"""SELECT {", ".join("s." + c.strip() for c in _ALL.split(","))}
FROM spans s
JOIN (SELECT trace_id,
             max(start_us + duration_us) - min(start_us) AS td
      FROM spans GROUP BY trace_id) t
  ON t.trace_id = s.trace_id
WHERE t.td > 3000000000 AND s.kind = 3""",
    ),
)(_run("{ traceDuration > 3000000000 && kind = client }"))
