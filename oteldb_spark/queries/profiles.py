"""ProfileQL queries (SURVEY §2.6) — flamegraph merge over the span
tree viewed as stack samples.

The reference merges pprof samples into a flamegraph tree
(``profilestorage/flametree.go``, ``profileqlengine/engine.go:75-127``)
— per stack-prefix totals.  Here each span contributes a stack
``root_service>root_name[>child_name]`` with value = duration; the
merge is groupBy(stack).sum — the Spark-native flamegraph fold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..signals import SPANS_CTE, spans_frame, with_ctes
from .registry import register


# merge: per stack-prefix totals across all traces (two-level tree →
# level-1 rows per root name, level-2 rows per root>child)
@register(
    "profile_flamegraph",
    with_ctes(
        SPANS_CTE,
        "roots AS (SELECT trace_id, name AS root_name FROM spans"
        " WHERE parent_span_id IS NULL)",
        body="""SELECT stack, CAST(sum(duration_us) AS BIGINT) AS total_us,
       CAST(count(*) AS BIGINT) AS samples
FROM (
  SELECT 'frontend>' || r.root_name AS stack, s.duration_us
  FROM spans s JOIN roots r ON s.trace_id = r.trace_id
  WHERE s.parent_span_id IS NULL
  UNION ALL
  SELECT 'frontend>' || r.root_name || '>' || s.name AS stack, s.duration_us
  FROM spans s JOIN roots r ON s.trace_id = r.trace_id
  WHERE s.parent_span_id IS NOT NULL
) GROUP BY stack""",
    ),
)
def profile_flamegraph(spark, sf_dir):
    spans = spans_frame(spark, sf_dir)
    roots = spans.filter(F.col("parent_span_id").isNull()).select(
        F.col("trace_id").alias("r_tid"), F.col("name").alias("root_name")
    )
    joined = spans.join(roots, spans.trace_id == F.col("r_tid"))
    stack = F.when(
        F.col("parent_span_id").isNull(),
        F.concat(F.lit("frontend>"), F.col("root_name")),
    ).otherwise(
        F.concat(F.lit("frontend>"), F.col("root_name"), F.lit(">"), F.col("name"))
    )
    return (
        joined.select(stack.alias("stack"), "duration_us")
        .groupBy("stack")
        .agg(
            F.sum("duration_us").cast("long").alias("total_us"),
            F.count(F.lit(1)).cast("long").alias("samples"),
        )
    )


# selector {service=~"svc-[01]"} merge — profile-type + matcher
# selection before the merge (profileql/expr.go:19-56)
@register(
    "profile_selector_merge",
    with_ctes(
        SPANS_CTE,
        body="""SELECT service, name,
       CAST(sum(duration_us) AS BIGINT) AS total_us,
       CAST(count(*) AS BIGINT) AS samples
FROM spans WHERE regexp_matches(service, '^svc-[01]$')
GROUP BY service, name""",
    ),
)
def profile_selector_merge(spark, sf_dir):
    spans = spans_frame(spark, sf_dir)
    return (
        spans.filter(F.col("service").rlike("^svc-[01]$"))
        .groupBy("service", "name")
        .agg(
            F.sum("duration_us").cast("long").alias("total_us"),
            F.count(F.lit(1)).cast("long").alias("samples"),
        )
    )


# label discovery: GetApps / Labels / LabelValues
# (profilehandler.go:54-163) — distinct apps with span counts
@register(
    "profile_apps",
    with_ctes(
        SPANS_CTE,
        body="""SELECT service AS app, CAST(count(*) AS BIGINT) AS spans
FROM spans GROUP BY service""",
    ),
)
def profile_apps(spark, sf_dir):
    spans = spans_frame(spark, sf_dir)
    return spans.groupBy(F.col("service").alias("app")).agg(
        F.count(F.lit(1)).cast("long").alias("spans")
    )
