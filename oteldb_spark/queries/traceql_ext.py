"""Extended TraceQL surface: descendant via the nested-set range join
(recursive-CTE oracle; frontier loop remains the opt-in fallback), tag
autocomplete, per-trace scalar aggregates, select() pipeline stage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.structural import descendants
from ..signals import SPANS_CTE, spans_frame, with_ctes
from .registry import register


# {service="frontend" && status=error} >> {duration > 100ms} —
# descendant; oracle uses a recursive CTE, Spark the frontier join
@register(
    "traceql_descendant",
    f"""WITH RECURSIVE {SPANS_CTE},
anc AS (
  SELECT trace_id, span_id FROM spans
  WHERE service = 'frontend' AND status_code = 2
),
cov AS (
  SELECT s.trace_id, s.span_id FROM spans s
  JOIN anc a ON s.trace_id = a.trace_id AND s.parent_span_id = a.span_id
  UNION
  SELECT s.trace_id, s.span_id FROM spans s
  JOIN cov c ON s.trace_id = c.trace_id AND s.parent_span_id = c.span_id
)
SELECT DISTINCT s.trace_id, s.span_id, s.name, s.duration_us
FROM spans s JOIN cov c ON s.trace_id = c.trace_id AND s.span_id = c.span_id
WHERE s.duration_us > 100000""",
)
def traceql_descendant(spark, sf_dir):
    spans = spans_frame(spark, sf_dir)
    # coords_key: amortize the DFS numbering across queries on the
    # same table — a warm serving process answers every ``>>``/``<<``
    # after the first from the one pinned coords frame
    out = descendants(
        spans,
        (F.col("service") == "frontend") & (F.col("status_code") == 2),
        F.col("duration_us") > 100000,
        coords_key=sf_dir,
    )
    return out.select("trace_id", "span_id", "name", "duration_us").distinct()


# tag autocomplete: distinct values of a tag (querier_traces.go
# SearchTagValues) — service and name dictionaries
@register(
    "traceql_tag_values",
    with_ctes(
        SPANS_CTE,
        body="""SELECT service, name, CAST(count(*) AS BIGINT) AS n
FROM spans GROUP BY service, name""",
    ),
)
def traceql_tag_values(spark, sf_dir):
    spans = spans_frame(spark, sf_dir)
    return spans.groupBy("service", "name").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


# { } | avg(duration) > 120ms — spanset scalar aggregate filter
@register(
    "traceql_avg_duration",
    with_ctes(
        SPANS_CTE,
        body="""SELECT trace_id, round(avg(duration_us), 6) AS avg_duration_us
FROM spans GROUP BY trace_id HAVING avg(duration_us) > 120000""",
    ),
)
def traceql_avg_duration(spark, sf_dir):
    spans = spans_frame(spark, sf_dir)
    return (
        spans.groupBy("trace_id")
        .agg(F.avg("duration_us").alias("a"))
        .filter(F.col("a") > 120000)
        .select("trace_id", F.round("a", 6).alias("avg_duration_us"))
    )


# { status=error } | select(span.service, span.duration) — select()
# pipeline stage (parsed-but-unsupported in the reference,
# traceqlengine/pipeline.go:71-80; supported here)
@register(
    "traceql_select_stage",
    with_ctes(
        SPANS_CTE,
        body="""SELECT trace_id, span_id, service, duration_us
FROM spans WHERE status_code = 2""",
    ),
)
def traceql_select_stage(spark, sf_dir):
    spans = spans_frame(spark, sf_dir)
    return spans.filter(F.col("status_code") == 2).select(
        "trace_id", "span_id", "service", "duration_us"
    )


# trace-by-id point lookup (bloom/stats-pruned scan in Delta; plain
# filter here) — querier_traces.go:26-120
@register(
    "traceql_trace_by_id",
    with_ctes(
        SPANS_CTE,
        body="""SELECT trace_id, span_id, parent_span_id, service, name, kind,
       start_us, duration_us, status_code
FROM spans WHERE trace_id = 1337""",
    ),
)
def traceql_trace_by_id(spark, sf_dir):
    spans = spans_frame(spark, sf_dir)
    return spans.filter(F.col("trace_id") == 1337).select(
        "trace_id",
        "span_id",
        "parent_span_id",
        "service",
        "name",
        "kind",
        "start_us",
        "duration_us",
        "status_code",
    )
