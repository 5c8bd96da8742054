"""Driver-gated queries for the OTel-key ↔ Prometheus-label
translation surface: dotted attr keys queried under sanitized
(``http_method``) and ``U__``-hex (``U__k8s_2e_node_2e_name``)
spellings, the way Grafana dashboards pointed at OTel-attributed data
query (``otelstorage/attrs.go:11-41``,
``chstorage/querier_metrics.go:145-163``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..logql import EvalParams, LogSource, compile_logql
from ..operators.stepfanout import fanout_join_sql
from ..promql import MetricSource, PromParams, compile_promql
from ..signals import COUNTERS_CTE, LOGS_CTE, counter_points_frame, logs_frame, with_ctes
from .registry import END_US, RANGE_US, START_US, STEP_US, register

_FAN = fanout_join_sql("samples", START_US, END_US, STEP_US, RANGE_US)

# deterministic dotted attrs derived from events columns — the oracle
# recomputes the same values in SQL
_METHOD_SQL = "CASE WHEN user_id % 3 = 0 THEN 'GET' WHEN user_id % 3 = 1 THEN 'POST' ELSE 'PUT' END"


def _attr_logs(spark, sf_dir):
    logs = logs_frame(spark, sf_dir)
    return logs.withColumn(
        "attrs",
        F.create_map(
            F.lit("http.method"),
            F.expr(
                "CASE WHEN user_id % 3 = 0 THEN 'GET' "
                "WHEN user_id % 3 = 1 THEN 'POST' ELSE 'PUT' END"
            ),
            F.lit("k8s.node.name"),
            F.concat(F.lit("node-"), (F.col("user_id") % 4).cast("string")),
        ),
    )


# sum by (http_method) (count_over_time({http_method=~"GET|POST"}[12h]))
# — matcher AND grouping use the sanitized spelling of a dotted
# attrs-MAP key; series identity flows through the dynamic-label map
@register(
    "otel_label_logql_sanitized",
    with_ctes(
        LOGS_CTE,
        f"""samples AS (
  SELECT {_METHOD_SQL} AS http_method, ts_us FROM logs
  WHERE user_id % 3 IN (0, 1))""",
        body=f"""SELECT http_method, step_us, CAST(count(*) AS DOUBLE) AS value
FROM {_FAN} s GROUP BY http_method, step_us""",
    ),
)
def otel_label_logql_sanitized(spark, sf_dir):
    src = LogSource(
        df=_attr_logs(spark, sf_dir),
        label_cols={"service": "service", "env": "env"},
        attrs_map_col="attrs",
    )
    q = 'sum by (http_method) (count_over_time({http_method=~"GET|POST"}[12h]))'
    return compile_logql(
        q, src, EvalParams(START_US, END_US, STEP_US), spark
    ).select("http_method", "step_us", "value")


# {U__k8s_2e_node_2e_name="node-1"} line listing count by sanitized
# grouping — U__ matcher spelling against the dotted attrs-map key
@register(
    "otel_label_logql_uhex",
    with_ctes(
        LOGS_CTE,
        f"""samples AS (
  SELECT {_METHOD_SQL} AS http_method, ts_us FROM logs
  WHERE user_id % 4 = 1)""",
        body=f"""SELECT http_method, step_us, CAST(count(*) AS DOUBLE) AS value
FROM {_FAN} s GROUP BY http_method, step_us""",
    ),
)
def otel_label_logql_uhex(spark, sf_dir):
    src = LogSource(
        df=_attr_logs(spark, sf_dir),
        label_cols={"service": "service", "env": "env"},
        attrs_map_col="attrs",
    )
    q = (
        "sum by (http_method) (count_over_time("
        '{U__k8s_2e_node_2e_name="node-1"}[12h]))'
    )
    return compile_logql(
        q, src, EvalParams(START_US, END_US, STEP_US), spark
    ).select("http_method", "step_us", "value")


_PTS_FAN = fanout_join_sql(
    "(SELECT mtype, instance, ts_us, gauge AS sample FROM counters)",
    START_US,
    END_US,
    STEP_US,
    RANGE_US,
)


def _dotted_metric_source(spark, sf_dir) -> MetricSource:
    # a storage column carrying the raw dotted OTel attr key; the
    # PromQL surface exposes it under the sanitized label name
    pts = counter_points_frame(spark, sf_dir).withColumnRenamed(
        "instance", "k8s.node.name"
    )
    return MetricSource(
        df=pts,
        metrics={"events_gauge": "gauge"},
        label_cols=["mtype", "k8s.node.name"],
    )


# sum by (U__k8s_2e_node_2e_name) (count_over_time(events_gauge[12h]))
# — U__ grouping spelling over a dotted storage column; the result
# label is the Prometheus-safe sanitized name
@register(
    "otel_label_promql_uhex",
    with_ctes(
        COUNTERS_CTE,
        body=f"""SELECT mtype, instance AS k8s_node_name, step_us,
       CAST(count(*) AS DOUBLE) AS value
FROM {_PTS_FAN} s GROUP BY mtype, instance, step_us""",
    ),
)
def otel_label_promql_uhex(spark, sf_dir):
    q = (
        "sum by (mtype, U__k8s_2e_node_2e_name) "
        "(count_over_time(events_gauge[12h]))"
    )
    return compile_promql(
        q,
        _dotted_metric_source(spark, sf_dir),
        PromParams(START_US, END_US, STEP_US, lookback_us=RANGE_US),
        spark,
    ).select("mtype", "k8s_node_name", "step_us", "value")


# events_gauge{k8s_node_name="host-3"} — sanitized matcher spelling
# against the dotted storage column, instant selector
@register(
    "otel_label_promql_sanitized_matcher",
    with_ctes(
        COUNTERS_CTE,
        body=f"""SELECT mtype, instance AS k8s_node_name, step_us,
       arg_max(sample, ts_us) AS value
FROM {_PTS_FAN} s WHERE instance = 'host-3'
GROUP BY mtype, instance, step_us""",
    ),
)
def otel_label_promql_sanitized_matcher(spark, sf_dir):
    return compile_promql(
        'events_gauge{k8s_node_name="host-3"}',
        _dotted_metric_source(spark, sf_dir),
        PromParams(START_US, END_US, STEP_US, lookback_us=RANGE_US),
        spark,
    ).select("mtype", "k8s_node_name", "step_us", "value")
