"""Residual SURVEY §2 coverage: Loki volume / detected-labels /
label-values APIs, remaining vector aggs and set binops, parsed
count_values / label_join / drop-keep, TraceQL same-trace intersect.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..logql import EvalParams, LogSource, compile_logql
from ..operators.stepfanout import fanout_join_sql
from ..promql import MetricSource, PromParams, compile_promql
from ..signals import COUNTERS_CTE, LOGS_CTE, counter_points_frame, logs_frame, with_ctes
from ..traceql import SpanSource, compile_traceql
from ..signals import SPANS_CTE, spans_frame
from .registry import END_US, RANGE_S, RANGE_US, START_US, STEP_US, register

_LBL = {"service": "service", "env": "env", "level": "level", "value": "value"}
_PARAMS = EvalParams(START_US, END_US, STEP_US)
_PPARAMS = PromParams(START_US, END_US, STEP_US, lookback_us=RANGE_US)
_METRICS = {"events_gauge": "gauge", "events_value_total": "counter_mod"}


def _lsrc(spark, sf_dir):
    return LogSource(df=logs_frame(spark, sf_dir), label_cols=dict(_LBL))


def _msrc(spark, sf_dir):
    return MetricSource(
        df=counter_points_frame(spark, sf_dir),
        metrics=dict(_METRICS),
        label_cols=["mtype", "instance"],
    )


# --- Loki secondary APIs -----------------------------------------------------


# volume: total bytes + entries by label over the whole window
# (lokihandler.go:409-556 synthesizes sum bytes_over_time)
@register(
    "logql_volume",
    with_ctes(
        LOGS_CTE,
        body=f"""SELECT service,
       CAST(sum(length(body)) AS BIGINT) AS bytes,
       CAST(count(*) AS BIGINT) AS entries
FROM logs WHERE ts_us BETWEEN {START_US} AND {END_US}
GROUP BY service""",
    ),
)
def logql_volume(spark, sf_dir):
    logs = logs_frame(spark, sf_dir).filter(
        (F.col("ts_us") >= START_US) & (F.col("ts_us") <= END_US)
    )
    return logs.groupBy("service").agg(
        F.sum(F.length("body")).cast("long").alias("bytes"),
        F.count(F.lit(1)).cast("long").alias("entries"),
    )


# detected_labels: per-label cardinality (lokihandler detected_labels)
@register(
    "logql_detected_labels",
    with_ctes(
        LOGS_CTE,
        body="""SELECT 'service' AS label, CAST(count(DISTINCT service) AS BIGINT)
         AS cardinality FROM logs
UNION ALL
SELECT 'env', CAST(count(DISTINCT env) AS BIGINT) FROM logs
UNION ALL
SELECT 'level', CAST(count(DISTINCT level) AS BIGINT) FROM logs""",
    ),
)
def logql_detected_labels(spark, sf_dir):
    logs = logs_frame(spark, sf_dir)
    parts = [
        logs.agg(
            F.lit(name).alias("label"),
            F.countDistinct(name).cast("long").alias("cardinality"),
        )
        for name in ("service", "env", "level")
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# label values API (promhandler label_values / loki labels)
@register(
    "promql_label_values",
    with_ctes(COUNTERS_CTE, body="SELECT DISTINCT instance FROM counters"),
)
def promql_label_values(spark, sf_dir):
    return counter_points_frame(spark, sf_dir).select("instance").distinct()


# series API: distinct label sets for a selector
@register(
    "promql_series",
    with_ctes(
        COUNTERS_CTE,
        body="SELECT DISTINCT mtype, instance FROM counters WHERE mtype LIKE '%e%'",
    ),
)
def promql_series(spark, sf_dir):
    return (
        counter_points_frame(spark, sf_dir)
        .filter(F.col("mtype").contains("e"))
        .select("mtype", "instance")
        .distinct()
    )


# --- remaining vector aggs / binops through the parsers ----------------------

_FAN = fanout_join_sql("samples", START_US, END_US, STEP_US, RANGE_US)

# avg by (level) (count_over_time by service,level) — vector avg
register(
    "lql_parsed_vector_avg",
    with_ctes(
        LOGS_CTE,
        "samples AS (SELECT service, level, ts_us FROM logs WHERE env = 'prod')",
        f"per_series AS (SELECT service, level, step_us,"
        f" CAST(count(*) AS DOUBLE) AS value FROM {_FAN} s"
        f" GROUP BY service, level, step_us)",
        body="SELECT level, step_us, round(avg(value), 6) AS value"
        " FROM per_series GROUP BY level, step_us",
    ),
)(
    lambda spark, sf_dir: compile_logql(
        'avg by (level) (sum by (service, level) (count_over_time({env="prod"}[12h])))',
        _lsrc(spark, sf_dir),
        _PARAMS,
        spark,
    ).withColumn("value", F.round("value", 6))
)

# count of series per step — vector count
register(
    "lql_parsed_vector_count",
    with_ctes(
        LOGS_CTE,
        "samples AS (SELECT service, level, ts_us FROM logs WHERE env = 'prod')",
        f"per_series AS (SELECT service, level, step_us,"
        f" CAST(count(*) AS DOUBLE) AS value FROM {_FAN} s"
        f" GROUP BY service, level, step_us)",
        body="SELECT step_us, CAST(count(*) AS DOUBLE) AS value"
        " FROM per_series GROUP BY step_us",
    ),
)(
    lambda spark, sf_dir: compile_logql(
        'count(sum by (service, level) (count_over_time({env="prod"}[12h])))',
        _lsrc(spark, sf_dir),
        _PARAMS,
        spark,
    )
)

# and / or set binops (bin_op.go:22-32)
_ERR = "errs AS (SELECT service, step_us, CAST(count(*) AS DOUBLE) AS value FROM " + fanout_join_sql(
    "(SELECT service, ts_us FROM logs WHERE level = 'ERROR')",
    START_US,
    END_US,
    STEP_US,
    RANGE_US,
) + " s GROUP BY service, step_us)"
_DBG = "dbgs AS (SELECT service, step_us, CAST(count(*) AS DOUBLE) AS value FROM " + fanout_join_sql(
    "(SELECT service, ts_us FROM logs WHERE level = 'DEBUG' AND env = 'staging')",
    START_US,
    END_US,
    STEP_US,
    RANGE_US,
) + " s GROUP BY service, step_us)"

register(
    "lql_parsed_binop_and",
    with_ctes(
        LOGS_CTE,
        _ERR,
        _DBG,
        body="""SELECT e.service, e.step_us, e.value
FROM errs e WHERE EXISTS (
  SELECT 1 FROM dbgs d WHERE d.service = e.service AND d.step_us = e.step_us)""",
    ),
)(
    lambda spark, sf_dir: compile_logql(
        'sum by (service) (count_over_time({level="ERROR"}[12h]))'
        ' and sum by (service) (count_over_time({level="DEBUG", env="staging"}[12h]))',
        _lsrc(spark, sf_dir),
        _PARAMS,
        spark,
    )
)

register(
    "lql_parsed_binop_or",
    with_ctes(
        LOGS_CTE,
        _ERR,
        _DBG,
        body="""SELECT e.service, e.step_us, e.value FROM errs e
UNION ALL
SELECT d.service, d.step_us, d.value FROM dbgs d
WHERE NOT EXISTS (
  SELECT 1 FROM errs e WHERE e.service = d.service AND e.step_us = d.step_us)""",
    ),
)(
    lambda spark, sf_dir: compile_logql(
        'sum by (service) (count_over_time({level="ERROR"}[12h]))'
        ' or sum by (service) (count_over_time({level="DEBUG", env="staging"}[12h]))',
        _lsrc(spark, sf_dir),
        _PARAMS,
        spark,
    )
)

# drop/keep stages through the parser: project labels away
register(
    "lql_parsed_keep",
    with_ctes(
        LOGS_CTE,
        body=f"""SELECT ts_us, body, service FROM logs
WHERE level = 'ERROR' AND ts_us BETWEEN {START_US} AND {END_US}""",
    ),
)(
    lambda spark, sf_dir: compile_logql(
        '{level="ERROR"} | keep service',
        _lsrc(spark, sf_dir),
        _PARAMS,
        spark,
    )
)

# count_values through the PromQL parser: distribution of per-window
# counts per (mtype, instance) series
register(
    "ppql_parsed_count_values",
    with_ctes(
        COUNTERS_CTE,
        "per_series AS (SELECT mtype, instance, step_us, CAST(count(*) AS DOUBLE)"
        " AS value FROM "
        + fanout_join_sql(
            "(SELECT mtype, instance, ts_us FROM counters)",
            START_US,
            END_US,
            STEP_US,
            RANGE_US,
        )
        + " s GROUP BY mtype, instance, step_us)",
        body="""SELECT CASE WHEN value = floor(value) AND abs(value) < 1e15
            THEN CAST(CAST(value AS BIGINT) AS VARCHAR)
            ELSE CAST(value AS VARCHAR) END AS n, step_us,
       CAST(count(*) AS DOUBLE) AS value
FROM per_series GROUP BY 1, step_us""",
    ),
)(
    lambda spark, sf_dir: compile_promql(
        'count_values("n", count_over_time(events_gauge[12h]))',
        _msrc(spark, sf_dir),
        _PPARAMS,
        spark,
    )
)

# label_join through the PromQL parser
register(
    "ppql_parsed_label_join",
    with_ctes(
        COUNTERS_CTE,
        "per_series AS (SELECT mtype, instance, step_us, CAST(count(*) AS DOUBLE)"
        " AS value FROM "
        + fanout_join_sql(
            "(SELECT mtype, instance, ts_us FROM counters)",
            START_US,
            END_US,
            STEP_US,
            RANGE_US,
        )
        + " s GROUP BY mtype, instance, step_us)",
        body="""SELECT mtype, instance, mtype || '/' || instance AS series,
       step_us, value FROM per_series""",
    ),
)(
    lambda spark, sf_dir: compile_promql(
        'label_join(count_over_time(events_gauge[12h]), "series", "/",'
        ' "mtype", "instance")',
        _msrc(spark, sf_dir),
        _PPARAMS,
        spark,
    )
)


# rate_counter through the parser: unwrapped per-line values treated
# as a Prometheus counter (reset-aware extrapolated rate); the events
# `value` is not monotone per service, so resets genuinely fire
from ..operators.rate import rate_family_oracle_sql as _rf_sql

_RC_INNER = _rf_sql(
    "rate",
    source="(SELECT service, ts_us, value AS v FROM logs WHERE env = 'prod')",
    series_sql=["service"],
    value_col="v",
    start_us=START_US,
    end_us=END_US,
    step_us=STEP_US,
    range_us=RANGE_US,
)
_RC_IDX = _RC_INNER.rfind("\nSELECT ")
register(
    "lql_parsed_rate_counter",
    f"WITH {LOGS_CTE},\n{_RC_INNER[:_RC_IDX].rstrip().rstrip(',')},\n"
    f"final AS (\n{_RC_INNER[_RC_IDX + 1:]}\n)\n"
    "SELECT service, step_us, round(value, 9) AS value FROM final",
)(
    lambda spark, sf_dir: compile_logql(
        'rate_counter({env="prod"} | unwrap value [12h]) by (service)',
        _lsrc(spark, sf_dir),
        _PARAMS,
        spark,
    ).withColumn("value", F.round("value", 9))
)


# Loki index/stats endpoint: stream/entry/byte totals
@register(
    "logql_index_stats",
    with_ctes(
        LOGS_CTE,
        body="""SELECT CAST(count(DISTINCT service || '/' || env || '/' || level)
                    AS BIGINT) AS streams,
       CAST(count(*) AS BIGINT) AS entries,
       CAST(sum(length(body)) AS BIGINT) AS bytes
FROM logs""",
    ),
)
def logql_index_stats(spark, sf_dir):
    logs = logs_frame(spark, sf_dir)
    return logs.agg(
        F.countDistinct(F.concat_ws("/", "service", "env", "level"))
        .cast("long")
        .alias("streams"),
        F.count(F.lit(1)).cast("long").alias("entries"),
        F.sum(F.length("body")).cast("long").alias("bytes"),
    )


# PromQL `group` aggregation: constant 1 per surviving group
register(
    "ppql_parsed_group",
    with_ctes(
        COUNTERS_CTE,
        "per_series AS (SELECT mtype, instance, step_us FROM "
        + fanout_join_sql(
            "(SELECT mtype, instance, ts_us FROM counters)",
            START_US,
            END_US,
            STEP_US,
            RANGE_US,
        )
        + " s GROUP BY mtype, instance, step_us)",
        body="SELECT mtype, step_us, 1.0 AS value FROM per_series"
        " GROUP BY mtype, step_us",
    ),
)(
    lambda spark, sf_dir: compile_promql(
        "group by (mtype) (count_over_time(events_gauge[12h]))",
        _msrc(spark, sf_dir),
        _PPARAMS,
        spark,
    )
)


# TraceQL same-trace intersect through the parser
register(
    "tql_parsed_intersect",
    with_ctes(
        SPANS_CTE,
        "l AS (SELECT * FROM spans WHERE name = 'line-R')",
        "r AS (SELECT * FROM spans WHERE service = 'frontend' AND status_code = 2)",
        "shared AS (SELECT DISTINCT l.trace_id FROM l JOIN r ON l.trace_id = r.trace_id)",
        body="""SELECT u.trace_id, u.span_id, u.parent_span_id, u.service, u.name,
       u.kind, u.start_us, u.duration_us, u.status_code
FROM (SELECT * FROM l UNION SELECT * FROM r) u
JOIN shared USING (trace_id)""",
    ),
)(
    lambda spark, sf_dir: compile_traceql(
        '{ name = "line-R" } && { span.service = "frontend" && status = error }',
        SpanSource(
            df=spans_frame(spark, sf_dir),
            attr_cols={"service": "service", "service.name": "service"},
        ),
    )
)
