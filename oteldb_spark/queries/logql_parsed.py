"""Driver-gated queries that run through the FULL LogQL front-end
(parse → compile → DataFrame) rather than hand-built plans.  Their
oracles restate the semantics in SQL, so a parser or compiler bug
fails the driver's hash gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..logql import EvalParams, LogSource, compile_logql
from ..operators.stepfanout import fanout_join_sql
from ..signals import LOGS_CTE, logs_frame, with_ctes
from .registry import END_US, RANGE_S, RANGE_US, START_US, STEP_US, register

PARAMS = EvalParams(START_US, END_US, STEP_US)
LABELS = {"service": "service", "env": "env", "level": "level", "value": "value"}


def _source(spark, sf_dir) -> LogSource:
    return LogSource(
        df=logs_frame(spark, sf_dir),
        label_cols=dict(LABELS),
        body_col="body",
        ts_col="ts_us",
    )


def _run(q: str):
    def fn(spark, sf_dir):
        return compile_logql(q, _source(spark, sf_dir), PARAMS, spark)

    return fn


_FAN = fanout_join_sql("samples", START_US, END_US, STEP_US, RANGE_US)


# {env="prod"} |= `"k": 7` | json k="k" | k >= 50  — full log pipeline
@register(
    "lql_parsed_pipeline",
    with_ctes(
        LOGS_CTE,
        body="""SELECT ts_us, body, service, env, level, value,
       json_extract_string(body, '$.k') AS k
FROM logs
WHERE env = 'prod' AND body LIKE '%"k": 7%'
  AND CAST(json_extract_string(body, '$.k') AS DOUBLE) >= 50
  AND ts_us BETWEEN {s} AND {e}""".format(s=START_US, e=END_US),
    ),
)
def lql_parsed_pipeline(spark, sf_dir):
    q = '{env="prod"} |= `"k": 7` | json k="k" | k >= 50'
    return compile_logql(q, _source(spark, sf_dir), PARAMS, spark)


# sum by (service, level) (count_over_time({env="prod"}[12h]))
register(
    "lql_parsed_count",
    with_ctes(
        LOGS_CTE,
        "samples AS (SELECT service, level, ts_us FROM logs WHERE env = 'prod')",
        body=f"""SELECT service, level, step_us, CAST(count(*) AS DOUBLE) AS value
FROM {_FAN} s GROUP BY service, level, step_us""",
    ),
)(_run('sum by (service, level) (count_over_time({env="prod"}[12h]))'))


# sum by (service) (rate({env="prod"}[12h]))
register(
    "lql_parsed_rate",
    with_ctes(
        LOGS_CTE,
        "samples AS (SELECT service, ts_us FROM logs WHERE env = 'prod')",
        body=f"""SELECT service, step_us,
       CAST(count(*) AS DOUBLE) / {RANGE_S!r} AS value
FROM {_FAN} s GROUP BY service, step_us""",
    ),
)(_run('sum by (service) (rate({env="prod"}[12h]))'))


# topk(3, sum by (service, level) (count_over_time({env="prod"}[12h])))
register(
    "lql_parsed_topk",
    with_ctes(
        LOGS_CTE,
        "samples AS (SELECT service, level, ts_us FROM logs WHERE env = 'prod')",
        f"per_series AS (SELECT service, level, step_us,"
        f" CAST(count(*) AS DOUBLE) AS value FROM {_FAN} s"
        f" GROUP BY service, level, step_us)",
        body="""SELECT service, level, step_us, value FROM (
  SELECT *, row_number() OVER (
    PARTITION BY step_us ORDER BY value DESC, level, service) AS rn
  FROM per_series) WHERE rn <= 3""",
    ),
)(
    _run(
        'topk(3, sum by (service, level) (count_over_time({env="prod"}[12h])))'
    )
)


# ratio binop through the parser
register(
    "lql_parsed_binop",
    with_ctes(
        LOGS_CTE,
        "err_samples AS (SELECT service, ts_us FROM logs WHERE level = 'ERROR')",
        "all_samples AS (SELECT service, ts_us FROM logs)",
        "errs AS (SELECT service, step_us, CAST(count(*) AS DOUBLE) AS value FROM "
        + fanout_join_sql("err_samples", START_US, END_US, STEP_US, RANGE_US)
        + " s GROUP BY service, step_us)",
        "alls AS (SELECT service, step_us, CAST(count(*) AS DOUBLE) AS value FROM "
        + fanout_join_sql("all_samples", START_US, END_US, STEP_US, RANGE_US)
        + " s GROUP BY service, step_us)",
        body="""SELECT e.service, e.step_us, e.value / a.value AS value
FROM errs e JOIN alls a ON e.service = a.service AND e.step_us = a.step_us""",
    ),
)(
    _run(
        'sum by (service) (count_over_time({level="ERROR"}[12h]))'
        ' / sum by (service) (count_over_time({}[12h]))'
    )
)


# unwrap + quantile through the parser (rounded on both sides)
@register(
    "lql_parsed_quantile",
    with_ctes(
        LOGS_CTE,
        "samples AS (SELECT service, ts_us, value AS sample FROM logs"
        " WHERE env = 'prod')",
        body=f"""SELECT service, step_us,
       round(quantile_cont(sample, 0.9), 6) AS value
FROM {_FAN} s GROUP BY service, step_us""",
    ),
)
def lql_parsed_quantile(spark, sf_dir):
    q = 'quantile_over_time(0.9, {env="prod"} | unwrap value [12h]) by (service)'
    out = compile_logql(q, _source(spark, sf_dir), PARAMS, spark)
    return out.withColumn("value", F.round("value", 6))


# scalar binop through the parser: error rate * 100
register(
    "lql_parsed_scalar_mul",
    with_ctes(
        LOGS_CTE,
        "samples AS (SELECT service, ts_us FROM logs WHERE level = 'ERROR')",
        body=f"""SELECT service, step_us,
       (CAST(count(*) AS DOUBLE) / {RANGE_S!r}) * 100 AS value
FROM {_FAN} s GROUP BY service, step_us""",
    ),
)(_run('sum by (service) (rate({level="ERROR"}[12h])) * 100'))


# line_format with the extended template surface (template.go:33-170):
# printf (builtin), alignRight (Loki), lower|trunc pipeline (sprig)
register(
    "lql_parsed_line_format_fns",
    with_ctes(
        LOGS_CTE,
        body="""SELECT ts_us,
       printf('%s|%s', service, level) || ' k='
         || lpad(json_extract_string(body, '$.k'), 4, ' ')
         || ' ' || substr(lower(level), 1, 2) AS body,
       service, env, level, value,
       json_extract_string(body, '$.k') AS k
FROM logs WHERE env = 'prod' AND ts_us BETWEEN {s} AND {e}""".format(
            s=START_US, e=END_US
        ),
    ),
)(
    _run(
        '{env="prod"} | json k="k" | line_format '
        '`{{ printf "%s|%s" .service .level }}'
        " k={{ .k | alignRight 4 }} {{ .level | lower | trunc 2 }}`"
    )
)


# label_format deriving a label from a template pipeline
register(
    "lql_parsed_label_format_tmpl",
    with_ctes(
        LOGS_CTE,
        body="""SELECT ts_us, body, service, env, level, value,
       substr(lower(level), 1, 2) AS lvl
FROM logs WHERE env = 'prod' AND ts_us BETWEEN {s} AND {e}""".format(
            s=START_US, e=END_US
        ),
    ),
)(_run('{env="prod"} | label_format lvl=`{{ .level | lower | trunc 2 }}`'))
