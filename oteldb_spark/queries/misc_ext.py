"""Small residual gates: LogQL vector()/offset through the parser,
TraceQL negation and arithmetic field expressions."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..logql import EvalParams, LogSource, compile_logql
from ..operators.stepfanout import fanout_join_sql, spine_sql
from ..signals import LOGS_CTE, SPANS_CTE, logs_frame, spans_frame, with_ctes
from ..traceql import SpanSource, compile_traceql
from .registry import END_US, RANGE_US, START_US, STEP_US, register

_PARAMS = EvalParams(START_US, END_US, STEP_US)
_LBL = {"service": "service", "env": "env", "level": "level", "value": "value"}


def _lsrc(spark, sf_dir):
    return LogSource(df=logs_frame(spark, sf_dir), label_cols=dict(_LBL))


# vector(7) * 3 — literal series over the step spine with constant
# folding on the scalar arithmetic
register(
    "lql_parsed_vector_literal",
    f"SELECT step_us, 21.0 AS value FROM {spine_sql(START_US, END_US, STEP_US)} t",
)(lambda spark, sf_dir: compile_logql("vector(7) * 3", _lsrc(spark, sf_dir), _PARAMS, spark))


# count_over_time(...[12h] offset 1d) through the LogQL parser
_OFF_US = 86_400_000_000
register(
    "lql_parsed_offset",
    with_ctes(
        LOGS_CTE,
        "samples AS (SELECT service, ts_us + {o} AS ts_us FROM logs"
        " WHERE env = 'prod')".format(o=_OFF_US),
        body=f"""SELECT service, step_us, CAST(count(*) AS DOUBLE) AS value
FROM {fanout_join_sql("samples", START_US, END_US, STEP_US, RANGE_US)} s
GROUP BY service, step_us""",
    ),
)(
    lambda spark, sf_dir: compile_logql(
        'sum by (service) (count_over_time({env="prod"}[12h] offset 1d))',
        _lsrc(spark, sf_dir),
        _PARAMS,
        spark,
    )
)


# without-grouping through the parser: drop `level` from the series
register(
    "lql_parsed_without",
    with_ctes(
        LOGS_CTE,
        "samples AS (SELECT service, level, ts_us FROM logs WHERE env = 'prod')",
        "per_series AS (SELECT service, level, step_us,"
        " CAST(count(*) AS DOUBLE) AS value FROM "
        + fanout_join_sql("samples", START_US, END_US, STEP_US, RANGE_US)
        + " s GROUP BY service, level, step_us)",
        body="SELECT service, step_us, CAST(max(value) AS DOUBLE) AS value"
        " FROM per_series GROUP BY service, step_us",
    ),
)(
    lambda spark, sf_dir: compile_logql(
        'max without (level) (sum by (service, level)'
        ' (count_over_time({env="prod"}[12h])))',
        _lsrc(spark, sf_dir),
        _PARAMS,
        spark,
    )
)


# quantile vector aggregation through the PromQL parser
@register(
    "ppql_parsed_quantile_agg",
    with_ctes(
        "counters AS (SELECT event_type AS mtype,"
        " 'host-' || (user_id % 10) AS instance, epoch_us(ts) AS ts_us"
        " FROM events)",
        "per_series AS (SELECT mtype, instance, step_us,"
        " CAST(count(*) AS DOUBLE) AS value FROM "
        + fanout_join_sql(
            "(SELECT mtype, instance, ts_us FROM counters)",
            START_US,
            END_US,
            STEP_US,
            RANGE_US,
        )
        + " s GROUP BY mtype, instance, step_us)",
        body="SELECT mtype, step_us, round(quantile_cont(value, 0.75), 6) AS value"
        " FROM per_series GROUP BY mtype, step_us",
    ),
)  # noqa: E305
def ppql_parsed_quantile_agg(spark, sf_dir):
    from ..promql import MetricSource, PromParams, compile_promql
    from ..signals import counter_points_frame

    src = MetricSource(
        df=counter_points_frame(spark, sf_dir),
        metrics={"events_gauge": "gauge"},
        label_cols=["mtype", "instance"],
    )
    out = compile_promql(
        "quantile by (mtype) (0.75, count_over_time(events_gauge[12h]))",
        src,
        PromParams(START_US, END_US, STEP_US, lookback_us=RANGE_US),
        spark,
    )
    return out.withColumn("value", F.round("value", 6))


def _tsrc(spark, sf_dir):
    return SpanSource(
        df=spans_frame(spark, sf_dir),
        attr_cols={"service": "service", "service.name": "service"},
    )


_ALL = "trace_id, span_id, parent_span_id, service, name, kind, start_us, duration_us, status_code"


# negation in a field expression
register(
    "tql_parsed_negation",
    with_ctes(
        SPANS_CTE,
        body=f"""SELECT {_ALL} FROM spans
WHERE NOT (status_code = 2) AND kind = 3""",
    ),
)(
    lambda spark, sf_dir: compile_traceql(
        "{ !(status = error) && kind = client }", _tsrc(spark, sf_dir)
    )
)


# arithmetic inside a span filter: duration > 2 * 50ms
register(
    "tql_parsed_arith",
    with_ctes(
        SPANS_CTE,
        body=f"SELECT {_ALL} FROM spans WHERE duration_us > 2 * 50000",
    ),
)(
    lambda spark, sf_dir: compile_traceql(
        "{ duration > 2 * 50ms }", _tsrc(spark, sf_dir)
    )
)


# GET /loki/api/v1/detected_fields — stream-label cardinalities under
# a selector (lokihandler.go:116-163, storagebackend/logs.go:629-651)
@register(
    "loki_detected_fields",
    with_ctes(
        LOGS_CTE,
        body=f"""SELECT label, cardinality FROM (
  SELECT 'env' AS label,
         CAST(count(DISTINCT env) AS BIGINT) AS cardinality
  FROM logs WHERE env = 'prod' AND ts_us BETWEEN {START_US} AND {END_US}
  UNION ALL
  SELECT 'level', CAST(count(DISTINCT level) AS BIGINT)
  FROM logs WHERE env = 'prod' AND ts_us BETWEEN {START_US} AND {END_US}
  UNION ALL
  SELECT 'service', CAST(count(DISTINCT service) AS BIGINT)
  FROM logs WHERE env = 'prod' AND ts_us BETWEEN {START_US} AND {END_US}
  UNION ALL
  SELECT 'value', CAST(count(DISTINCT CAST(value AS VARCHAR)) AS BIGINT)
  FROM logs WHERE env = 'prod' AND ts_us BETWEEN {START_US} AND {END_US}
) ORDER BY label""",
    ),
)
def loki_detected_fields(spark, sf_dir):
    from ..engine import LogQLEngine
    from ..logql import LogSource
    from ..signals import logs_frame

    eng = LogQLEngine(
        source=LogSource(df=logs_frame(spark, sf_dir), label_cols=dict(_LBL)),
        spark=spark,
    )
    return eng.detected_fields_frame('{env="prod"}', START_US, END_US)
