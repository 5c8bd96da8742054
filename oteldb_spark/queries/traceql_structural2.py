"""Extended TraceQL structural operators — parent ``<``, ancestor
``<<``, and the negated forms ``!>`` / ``!>>`` / ``!~`` — through the
full parse → compile path.

The reference PARSES this whole op set (``traceql/op.go:218-239``)
but its engine evaluates only ``&& || > >> ~`` and rejects the rest
(``traceqlengine/spanset_op.go:89-102``) — these run here, like
TraceQL metrics and by()/coalesce().  Negation compiles to the
rhs-matching spans minus the positive relation (one left-anti join);
``<`` is a semi-join on the child's parent pointer; ``<<`` climbs
parent pointers with the same bounded frontier loop ``>>`` uses
downward.
"""

from __future__ import annotations

from ..signals import SPANS_CTE, spans_frame, with_ctes
from ..traceql import SpanSource, compile_traceql
from .registry import register

_ALL = "trace_id, span_id, parent_span_id, service, name, kind, start_us, duration_us, status_code"


def _run(q: str):
    def fn(spark, sf_dir):
        src = SpanSource(
            df=spans_frame(spark, sf_dir),
            attr_cols={"service": "service", "service.name": "service"},
        )
        out = compile_traceql(q, src)
        return out.select(*[c.strip() for c in _ALL.split(",")])

    return fn


# { status = error } < { kind = server } — parents (roots) with an
# error child
register(
    "tql_parsed_parent_op",
    with_ctes(
        SPANS_CTE,
        body=f"""SELECT {_ALL} FROM spans p
WHERE p.kind = 2 AND EXISTS (
  SELECT 1 FROM spans c
  WHERE c.trace_id = p.trace_id AND c.parent_span_id = p.span_id
    AND c.status_code = 2)""",
    ),
)(_run("{ status = error } < { kind = server }"))


# { duration > 100ms } << { } — ancestors at any depth of a slow span
register(
    "tql_parsed_ancestor_op",
    f"""WITH RECURSIVE {SPANS_CTE},
anc AS (
  SELECT trace_id, parent_span_id AS aid FROM spans
  WHERE duration_us > 100000 AND parent_span_id IS NOT NULL
  UNION
  SELECT sp.trace_id, sp.parent_span_id
  FROM spans sp JOIN anc ON sp.trace_id = anc.trace_id
                        AND sp.span_id = anc.aid
  WHERE sp.parent_span_id IS NOT NULL
)
SELECT {", ".join("s." + c.strip() for c in _ALL.split(","))}
FROM spans s
JOIN (SELECT DISTINCT trace_id, aid FROM anc) a
  ON s.trace_id = a.trace_id AND s.span_id = a.aid""",
)(_run("{ duration > 100ms } << { }"))


# { status = error } !> { duration > 100ms } — slow spans whose direct
# parent is NOT an error span (roots qualify: no parent at all)
register(
    "tql_parsed_not_child",
    with_ctes(
        SPANS_CTE,
        body=f"""SELECT {_ALL} FROM spans b
WHERE b.duration_us > 100000 AND NOT EXISTS (
  SELECT 1 FROM spans a
  WHERE a.trace_id = b.trace_id AND a.span_id = b.parent_span_id
    AND a.status_code = 2)""",
    ),
)(_run("{ status = error } !> { duration > 100ms }"))


# { status = error } !~ { duration > 100ms } — slow spans with no
# error sibling under the same parent
register(
    "tql_parsed_not_sibling",
    with_ctes(
        SPANS_CTE,
        body=f"""SELECT {_ALL} FROM spans b
WHERE b.duration_us > 100000 AND NOT EXISTS (
  SELECT 1 FROM spans a
  WHERE a.trace_id = b.trace_id
    AND a.parent_span_id IS NOT DISTINCT FROM b.parent_span_id
    AND a.span_id <> b.span_id AND a.status_code = 2)""",
    ),
)(_run("{ status = error } !~ { duration > 100ms }"))


# { service = "frontend" } !>> { duration > 100ms } — slow spans with
# no frontend ancestor at any depth
register(
    "tql_parsed_not_descendant",
    f"""WITH RECURSIVE {SPANS_CTE},
cov AS (
  SELECT s.trace_id, s.span_id FROM spans s
  JOIN spans a ON a.trace_id = s.trace_id
              AND s.parent_span_id = a.span_id
  WHERE a.service = 'frontend'
  UNION
  SELECT s.trace_id, s.span_id FROM spans s
  JOIN cov ON s.trace_id = cov.trace_id
          AND s.parent_span_id = cov.span_id
)
SELECT {", ".join("b." + c.strip() for c in _ALL.split(","))}
FROM spans b
WHERE b.duration_us > 100000 AND NOT EXISTS (
  SELECT 1 FROM cov
  WHERE cov.trace_id = b.trace_id AND cov.span_id = b.span_id)""",
)(_run('{ service = "frontend" } !>> { duration > 100ms }'))


# union structural ops: both sides of the relation (op.go:233-239,
# engine-rejected in the reference)

# { status = error } &> { duration > 100ms } — slow children of error
# parents PLUS those error parents themselves
register(
    "tql_parsed_union_child",
    with_ctes(
        SPANS_CTE,
        body=f"""SELECT {_ALL} FROM spans b
WHERE b.duration_us > 100000 AND EXISTS (
  SELECT 1 FROM spans a
  WHERE a.trace_id = b.trace_id AND a.span_id = b.parent_span_id
    AND a.status_code = 2)
UNION
SELECT {_ALL} FROM spans p
WHERE p.status_code = 2 AND EXISTS (
  SELECT 1 FROM spans c
  WHERE c.trace_id = p.trace_id AND c.parent_span_id = p.span_id
    AND c.duration_us > 100000)""",
    ),
)(_run("{ status = error } &> { duration > 100ms }"))


# { status = error } &~ { duration > 100ms } — both sibling sides
register(
    "tql_parsed_union_sibling",
    with_ctes(
        SPANS_CTE,
        body=f"""SELECT {_ALL} FROM spans b
WHERE b.duration_us > 100000 AND EXISTS (
  SELECT 1 FROM spans a
  WHERE a.trace_id = b.trace_id
    AND a.parent_span_id IS NOT DISTINCT FROM b.parent_span_id
    AND a.span_id <> b.span_id AND a.status_code = 2)
UNION
SELECT {_ALL} FROM spans b
WHERE b.status_code = 2 AND EXISTS (
  SELECT 1 FROM spans a
  WHERE a.trace_id = b.trace_id
    AND a.parent_span_id IS NOT DISTINCT FROM b.parent_span_id
    AND a.span_id <> b.span_id AND a.duration_us > 100000)""",
    ),
)(_run("{ status = error } &~ { duration > 100ms }"))


# { duration > 100ms } &<< { kind = server } — server-kind ancestors
# of slow spans PLUS the slow spans below them
register(
    "tql_parsed_union_ancestor",
    f"""WITH RECURSIVE {SPANS_CTE},
anc AS (
  SELECT trace_id, parent_span_id AS aid FROM spans
  WHERE duration_us > 100000 AND parent_span_id IS NOT NULL
  UNION
  SELECT sp.trace_id, sp.parent_span_id
  FROM spans sp JOIN anc ON sp.trace_id = anc.trace_id
                        AND sp.span_id = anc.aid
  WHERE sp.parent_span_id IS NOT NULL
),
cov AS (
  SELECT s.trace_id, s.span_id FROM spans s
  JOIN spans a ON a.trace_id = s.trace_id
              AND s.parent_span_id = a.span_id
  WHERE a.kind = 2
  UNION
  SELECT s.trace_id, s.span_id FROM spans s
  JOIN cov ON s.trace_id = cov.trace_id
          AND s.parent_span_id = cov.span_id
)
SELECT {", ".join("s." + c.strip() for c in _ALL.split(","))}
FROM spans s
JOIN (SELECT DISTINCT trace_id, aid FROM anc) a
  ON s.trace_id = a.trace_id AND s.span_id = a.aid
WHERE s.kind = 2
UNION
SELECT {", ".join("b." + c.strip() for c in _ALL.split(","))}
FROM spans b
WHERE b.duration_us > 100000 AND EXISTS (
  SELECT 1 FROM cov
  WHERE cov.trace_id = b.trace_id AND cov.span_id = b.span_id)""",
)(_run("{ duration > 100ms } &<< { kind = server }"))


# --- TraceQL metrics through the full parse path -----------------------------
# the reference parses metrics queries (parser_metrics_expr.go) but
# 501s execution; compile_traceql_metrics runs them on the shared
# step fan-out machinery

from ..operators.stepfanout import fanout_join_sql  # noqa: E402
from ..traceql import compile_traceql_metrics  # noqa: E402

_M_START_US = 820_454_400_000_000  # 1996-01-01
_M_END_US = _M_START_US + 364 * 86_400_000_000
_M_STEP_US = 7 * 86_400_000_000
_M_RANGE_US = 28 * 86_400_000_000


def _run_metrics(q: str):
    def fn(spark, sf_dir):
        src = SpanSource(
            df=spans_frame(spark, sf_dir),
            attr_cols={"service": "service", "service.name": "service"},
        )
        return compile_traceql_metrics(
            q,
            src,
            start_us=_M_START_US,
            end_us=_M_END_US,
            step_us=_M_STEP_US,
            range_us=_M_RANGE_US,
            spark=spark,
        )

    return fn


_ERR_SAMPLES = """samples AS (
  SELECT service, start_us AS ts_us FROM spans WHERE status_code = 2
)"""

# { status = error } | rate() by (span.service)
register(
    "tql_parsed_metrics_rate",
    with_ctes(
        SPANS_CTE,
        _ERR_SAMPLES,
        body=f"""SELECT service, step_us,
       CAST(count(*) AS DOUBLE) / {_M_RANGE_US / 1e6!r} AS value
FROM {fanout_join_sql("samples", _M_START_US, _M_END_US, _M_STEP_US, _M_RANGE_US)} s
GROUP BY service, step_us""",
    ),
)(_run_metrics("{ status = error } | rate() by (span.service)"))


# { } | quantile_over_time(duration, 0.9) by (span.service)
@register(
    "tql_parsed_metrics_quantile",
    with_ctes(
        SPANS_CTE,
        """dsamples AS (
  SELECT service, start_us AS ts_us, CAST(duration_us AS DOUBLE) AS sample
  FROM spans
)""",
        body=f"""SELECT service, step_us,
       round(quantile_cont(sample, 0.9), 6) AS value
FROM {fanout_join_sql("dsamples", _M_START_US, _M_END_US, _M_STEP_US, _M_RANGE_US)} s
GROUP BY service, step_us""",
    ),
)
def tql_parsed_metrics_quantile(spark, sf_dir):
    from pyspark.sql import functions as F

    out = _run_metrics(
        "{ } | quantile_over_time(duration, 0.9) by (span.service)"
    )(spark, sf_dir)
    return out.withColumn("value", F.round("value", 6))


# { status = error } | avg_over_time(duration) by (span.service)
@register(
    "tql_parsed_metrics_avg",
    with_ctes(
        SPANS_CTE,
        """asamples AS (
  SELECT service, start_us AS ts_us, CAST(duration_us AS DOUBLE) AS sample
  FROM spans WHERE status_code = 2
)""",
        body=f"""SELECT service, step_us,
       round(avg(sample), 6) AS value
FROM {fanout_join_sql("asamples", _M_START_US, _M_END_US, _M_STEP_US, _M_RANGE_US)} s
GROUP BY service, step_us""",
    ),
)
def tql_parsed_metrics_avg(spark, sf_dir):
    from pyspark.sql import functions as F

    out = _run_metrics(
        "{ status = error } | avg_over_time(duration) by (span.service)"
    )(spark, sf_dir)
    return out.withColumn("value", F.round("value", 6))


# { } | histogram_over_time(duration) by (span.service) — Tempo's
# histogram series: scale-0 exp-bucket counts of duration seconds
from ..operators.histogram import bucket_case_sql as _tql_hb  # noqa: E402


@register(
    "tql_parsed_metrics_histogram",
    with_ctes(
        SPANS_CTE,
        """hsamples AS (
  SELECT service, start_us AS ts_us,
         CAST(duration_us AS DOUBLE) / 1e6 AS secs
  FROM spans
)""",
        body=f"""SELECT service, step_us, {_tql_hb("secs")} AS bucket,
       CAST(count(*) AS DOUBLE) AS value
FROM {fanout_join_sql("hsamples", _M_START_US, _M_END_US, _M_STEP_US, _M_RANGE_US)} s
GROUP BY service, step_us, {_tql_hb("secs")}""",
    ),
)
def tql_parsed_metrics_histogram(spark, sf_dir):
    return _run_metrics(
        "{ } | histogram_over_time(duration) by (span.service)"
    )(spark, sf_dir)


# instrumentation:name / instrumentation:version intrinsics
# (attribute.go:80-84) — scope columns derived deterministically on
# the span frame
@register(
    "tql_parsed_instrumentation",
    with_ctes(
        SPANS_CTE,
        body=f"""SELECT {_ALL} FROM spans
WHERE 'otel-' || service = 'otel-svc-1'
  AND '1.' || CAST(span_id % 3 AS VARCHAR) = '1.2'
  AND status_code = 2""",
    ),
)
def tql_parsed_instrumentation(spark, sf_dir):
    from pyspark.sql import functions as F

    spans = spans_frame(spark, sf_dir).withColumns(
        {
            "scope_name": F.concat(F.lit("otel-"), F.col("service")),
            "scope_version": F.concat(
                F.lit("1."), (F.col("span_id") % 3).cast("string")
            ),
        }
    )
    src = SpanSource(
        df=spans,
        attr_cols={"service": "service", "service.name": "service"},
        scope_name_col="scope_name",
        scope_version_col="scope_version",
    )
    out = compile_traceql(
        '{ instrumentation:name = "otel-svc-1"'
        ' && instrumentation:version = "1.2" && status = error }',
        src,
    )
    return out.select(*[c.strip() for c in _ALL.split(",")])


# instrumentation.<attr> scope (ScopeInstrumentation attributes,
# attribute.go:251-265) — scoped column lookup through the parse path
@register(
    "tql_parsed_instrumentation_attr",
    with_ctes(
        SPANS_CTE,
        body=f"""SELECT {_ALL} FROM spans
WHERE 'lib-' || CAST(kind AS VARCHAR) = 'lib-2' AND duration_us > 50000""",
    ),
)
def tql_parsed_instrumentation_attr(spark, sf_dir):
    from pyspark.sql import functions as F

    spans = spans_frame(spark, sf_dir).withColumn(
        "scope_lib", F.concat(F.lit("lib-"), F.col("kind").cast("string"))
    )
    src = SpanSource(
        df=spans,
        attr_cols={
            "service": "service",
            "service.name": "service",
            "instrumentation.lib": "scope_lib",
        },
    )
    out = compile_traceql(
        '{ instrumentation.lib = "lib-2" && duration > 50ms }', src
    )
    return out.select(*[c.strip() for c in _ALL.split(",")])
