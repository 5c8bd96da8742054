"""TraceQL queries (SURVEY §2.5) over the orders/lineitem trace tree.

Span filters are plain predicates; structural operators (child ``>``,
descendant ``>>``, sibling ``~``) are self-joins keyed on
(trace_id, parent_span_id/span_id) — the Spark-native replacement for
the reference's per-trace chain walking (``spanset_op.go:159-232``).
Trace assembly / scalar filters are ``groupBy(trace_id)`` aggregates
(``traceqlengine/engine.go:96-227``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..signals import SPANS_CTE, spans_frame, with_ctes
from .registry import register

SPAN_COLS = ["trace_id", "span_id", "service", "name", "kind", "duration_us", "status_code"]


# { span.duration > 50ms && resource.service.name = "svc-1" }
@register(
    "traceql_span_filter",
    with_ctes(
        SPANS_CTE,
        body="""SELECT trace_id, span_id, service, name, kind, duration_us, status_code
FROM spans WHERE duration_us > 50000 AND service = 'svc-1'""",
    ),
)
def traceql_span_filter(spark, sf_dir):
    spans = spans_frame(spark, sf_dir)
    return spans.filter(
        (F.col("duration_us") > 50000) & (F.col("service") == "svc-1")
    ).select(*SPAN_COLS)


# {status = error} — intrinsic filter (status enum)
@register(
    "traceql_status_filter",
    with_ctes(
        SPANS_CTE,
        body="""SELECT trace_id, span_id, service, name, kind, duration_us, status_code
FROM spans WHERE status_code = 2 AND kind = 3""",
    ),
)
def traceql_status_filter(spark, sf_dir):
    spans = spans_frame(spark, sf_dir)
    return spans.filter((F.col("status_code") == 2) & (F.col("kind") == 3)).select(
        *SPAN_COLS
    )


# {service="frontend" && status=error} > {name="line-R"} — parent>child
# join on span ids within a trace; output = matching child spans
@register(
    "traceql_structural_child",
    with_ctes(
        SPANS_CTE,
        body="""SELECT c.trace_id, c.span_id, c.service, c.name, c.duration_us
FROM spans p JOIN spans c
  ON c.trace_id = p.trace_id AND c.parent_span_id = p.span_id
WHERE p.service = 'frontend' AND p.status_code = 2 AND c.name = 'line-R'""",
    ),
)
def traceql_structural_child(spark, sf_dir):
    spans = spans_frame(spark, sf_dir)
    p = spans.alias("p")
    c = spans.alias("c")
    return (
        p.filter((F.col("p.service") == "frontend") & (F.col("p.status_code") == 2))
        .join(
            c.filter(F.col("c.name") == "line-R"),
            (F.col("c.trace_id") == F.col("p.trace_id"))
            & (F.col("c.parent_span_id") == F.col("p.span_id")),
        )
        .select(
            F.col("c.trace_id").alias("trace_id"),
            F.col("c.span_id").alias("span_id"),
            F.col("c.service").alias("service"),
            F.col("c.name").alias("name"),
            F.col("c.duration_us").alias("duration_us"),
        )
    )


# {A} ~ {B} — sibling: spans sharing a parent within a trace
# (distinct right-hand matches)
@register(
    "traceql_sibling",
    with_ctes(
        SPANS_CTE,
        body="""SELECT DISTINCT b.trace_id, b.span_id, b.service, b.name
FROM spans a JOIN spans b
  ON a.trace_id = b.trace_id
 AND a.parent_span_id = b.parent_span_id
 AND a.span_id <> b.span_id
WHERE a.status_code = 2 AND b.duration_us > 60000""",
    ),
)
def traceql_sibling(spark, sf_dir):
    spans = spans_frame(spark, sf_dir)
    a = spans.alias("a")
    b = spans.alias("b")
    return (
        a.filter(F.col("a.status_code") == 2)
        .join(
            b.filter(F.col("b.duration_us") > 60000),
            (F.col("a.trace_id") == F.col("b.trace_id"))
            & (F.col("a.parent_span_id") == F.col("b.parent_span_id"))
            & (F.col("a.span_id") != F.col("b.span_id")),
        )
        .select(
            F.col("b.trace_id").alias("trace_id"),
            F.col("b.span_id").alias("span_id"),
            F.col("b.service").alias("service"),
            F.col("b.name").alias("name"),
        )
        .distinct()
    )


# spanset scalar filter: { } | count() > 6 → traces with more than 6
# spans (aggregator.go:10-135)
@register(
    "traceql_count_filter",
    with_ctes(
        SPANS_CTE,
        body="""SELECT trace_id, CAST(count(*) AS BIGINT) AS span_count
FROM spans GROUP BY trace_id HAVING count(*) > 6""",
    ),
)
def traceql_count_filter(spark, sf_dir):
    spans = spans_frame(spark, sf_dir)
    return (
        spans.groupBy("trace_id")
        .agg(F.count(F.lit(1)).cast("long").alias("span_count"))
        .filter(F.col("span_count") > 6)
    )


# trace assembly: root name/service, trace duration (max span end −
# min span start), span count — engine.go:96-227
@register(
    "traceql_trace_assembly",
    with_ctes(
        SPANS_CTE,
        body="""SELECT trace_id,
       arg_min(name, span_id) FILTER (WHERE parent_span_id IS NULL) AS root_name,
       CAST(max(start_us + duration_us) - min(start_us) AS BIGINT) AS trace_duration_us,
       CAST(count(*) AS BIGINT) AS span_count
FROM spans GROUP BY trace_id HAVING count(*) >= 5""",
    ),
)
def traceql_trace_assembly(spark, sf_dir):
    spans = spans_frame(spark, sf_dir)
    root_name = F.min_by(
        F.when(F.col("parent_span_id").isNull(), F.col("name")), F.col("span_id")
    )
    return (
        spans.groupBy("trace_id")
        .agg(
            root_name.alias("root_name"),
            (F.max(F.col("start_us") + F.col("duration_us")) - F.min("start_us"))
            .cast("long")
            .alias("trace_duration_us"),
            F.count(F.lit(1)).cast("long").alias("span_count"),
        )
        .filter(F.col("span_count") >= 5)
    )


# {rootName =~ "order-1.*"} && {span.duration > 80ms} — root-derived
# intrinsic + span filter: join root attributes onto spans
@register(
    "traceql_rootname",
    with_ctes(
        SPANS_CTE,
        body="""SELECT s.trace_id, s.span_id, s.name, r.name AS root_name
FROM spans s
JOIN spans r ON r.trace_id = s.trace_id AND r.parent_span_id IS NULL
WHERE regexp_matches(r.name, 'order-1.*') AND s.duration_us > 80000""",
    ),
)
def traceql_rootname(spark, sf_dir):
    spans = spans_frame(spark, sf_dir)
    roots = spans.filter(F.col("parent_span_id").isNull()).select(
        F.col("trace_id").alias("r_trace_id"), F.col("name").alias("root_name")
    )
    return (
        spans.filter(F.col("duration_us") > 80000)
        .join(roots, F.col("trace_id") == F.col("r_trace_id"))
        .filter(F.col("root_name").rlike("order-1.*"))
        .select("trace_id", "span_id", "name", "root_name")
    )


# spanset max aggregate: { } | max(duration) > 300ms → per-trace max
@register(
    "traceql_max_duration",
    with_ctes(
        SPANS_CTE,
        body="""SELECT trace_id, CAST(max(duration_us) AS BIGINT) AS max_duration_us
FROM spans GROUP BY trace_id HAVING max(duration_us) > 300000""",
    ),
)
def traceql_max_duration(spark, sf_dir):
    spans = spans_frame(spark, sf_dir)
    return (
        spans.groupBy("trace_id")
        .agg(F.max("duration_us").cast("long").alias("max_duration_us"))
        .filter(F.col("max_duration_us") > 300000)
    )
