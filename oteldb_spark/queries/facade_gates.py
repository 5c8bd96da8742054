"""Driver gates through the Loki/Prometheus HTTP FACADES.

``lql_parsed_*`` / ``ppql_parsed_*`` gate the parse→compile path;
these two drive the full engine entry points a user of the reference
hits on every request — ``LogQLEngine.query_range`` (lokihandler.go
QueryRange) and ``PromQLEngine.query_range`` (promhandler.go
GetQueryRange) — via their ``query_range_frame`` halves, which run
parse → metric/log classification → (cache-aware) compile and return
the serializer-shaped frame (labels…, step_us, value): exactly the
rows ``loki_matrix`` / ``prom_matrix`` fold into the wire matrix.
The Tempo analog is ``traceql_search_stored_facade``
(structural_stored.py).  Oracles restate the serializer shape in SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.rate import rate_family_oracle_sql
from ..operators.stepfanout import fanout_join_sql
from ..signals import COUNTERS_CTE, LOGS_CTE, counter_points_frame, logs_frame, with_ctes
from .registry import END_US, RANGE_S, RANGE_US, START_US, STEP_US, register

_FAN = fanout_join_sql("samples", START_US, END_US, STEP_US, RANGE_US)


# GET /loki/api/v1/query_range with a metric expression:
# sum by (service, level) (rate({env="prod"}[12h]))
@register(
    "logql_facade_query_range",
    with_ctes(
        LOGS_CTE,
        "samples AS (SELECT service, level, ts_us FROM logs WHERE env = 'prod')",
        body=f"""SELECT service, level, step_us,
       CAST(count(*) AS DOUBLE) / {RANGE_S!r} AS value
FROM {_FAN} s GROUP BY service, level, step_us""",
    ),
)
def logql_facade_query_range(spark, sf_dir):
    from ..engine import LogQLEngine
    from ..logql import LogSource

    eng = LogQLEngine(
        source=LogSource(
            df=logs_frame(spark, sf_dir),
            label_cols={
                "service": "service",
                "env": "env",
                "level": "level",
                "value": "value",
            },
            body_col="body",
            ts_col="ts_us",
        )
    )
    return eng.query_range_frame(
        'sum by (service, level) (rate({env="prod"}[12h]))',
        START_US,
        END_US,
        STEP_US,
    )


# GET /api/v1/query_range: sum by (mtype) (rate(events_counter_total[12h]))
# — resets-aware rate over the monotone counter, aggregated across
# instances, through the engine facade (staleness lookback = range).
_RATE_INNER = rate_family_oracle_sql(
    "rate",
    source="(SELECT mtype, instance, ts_us, counter AS v FROM counters)",
    series_sql=["mtype", "instance"],
    value_col="v",
    start_us=START_US,
    end_us=END_US,
    step_us=STEP_US,
    range_us=RANGE_US,
)
_IDX = _RATE_INNER.rfind("\nSELECT ")
_RATE_CTES = _RATE_INNER[:_IDX].rstrip().rstrip(",")
_RATE_BODY = _RATE_INNER[_IDX + 1 :]


@register(
    "promql_facade_query_range",
    f"""WITH {COUNTERS_CTE},
{_RATE_CTES},
final AS (
{_RATE_BODY}
)
SELECT mtype, step_us, round(CAST(sum(value) AS DOUBLE), 9) AS value
FROM final GROUP BY mtype, step_us""",
)
def promql_facade_query_range(spark, sf_dir):
    from ..engine import PromQLEngine
    from ..promql import MetricSource

    eng = PromQLEngine(
        source=MetricSource(
            df=counter_points_frame(spark, sf_dir),
            metrics={
                "events_value_total": "counter_mod",
                "events_counter_total": "counter",
                "events_gauge": "gauge",
            },
            label_cols=["mtype", "instance"],
        ),
        lookback_us=RANGE_US,
    )
    out = eng.query_range_frame(
        "sum by (mtype) (rate(events_counter_total[12h]))",
        START_US,
        END_US,
        STEP_US,
    )
    return out.withColumn("value", F.round("value", 9))


# GET /loki/api/v1/query (instant) with a metric expression:
# sum by (service) (count_over_time({env="prod"}[12h])) evaluated at
# END_US — one grid step, the Loki vector shape
_IFAN = fanout_join_sql("samples", END_US, END_US, STEP_US, RANGE_US)


@register(
    "logql_facade_instant",
    with_ctes(
        LOGS_CTE,
        "samples AS (SELECT service, ts_us FROM logs WHERE env = 'prod')",
        body=f"""SELECT service, step_us, CAST(count(*) AS DOUBLE) AS value
FROM {_IFAN} s GROUP BY service, step_us""",
    ),
)
def logql_facade_instant(spark, sf_dir):
    from ..engine import LogQLEngine
    from ..logql import LogSource

    eng = LogQLEngine(
        source=LogSource(
            df=logs_frame(spark, sf_dir),
            label_cols={
                "service": "service",
                "env": "env",
                "level": "level",
                "value": "value",
            },
            body_col="body",
            ts_col="ts_us",
        )
    )
    return eng.query_instant_frame(
        'sum by (service) (count_over_time({env="prod"}[12h]))', END_US
    )


# GET /api/v1/query (instant): sum by (mtype) (events_gauge) at END_US
# with staleness lookback = the 12h range — latest sample per series
# inside the lookback window, summed across instances
@register(
    "promql_facade_instant",
    f"""WITH {COUNTERS_CTE},
w AS (
  SELECT mtype, instance, ts_us, gauge FROM counters
  WHERE ts_us > {END_US - RANGE_US} AND ts_us <= {END_US}
),
last AS (
  SELECT mtype, instance, arg_max(gauge, ts_us) AS v
  FROM w GROUP BY mtype, instance
)
SELECT mtype, CAST({END_US} AS BIGINT) AS step_us,
       CAST(sum(v) AS DOUBLE) AS value
FROM last GROUP BY mtype""",
)
def promql_facade_instant(spark, sf_dir):
    from ..engine import PromQLEngine
    from ..promql import MetricSource

    eng = PromQLEngine(
        source=MetricSource(
            df=counter_points_frame(spark, sf_dir),
            metrics={
                "events_value_total": "counter_mod",
                "events_counter_total": "counter",
                "events_gauge": "gauge",
            },
            label_cols=["mtype", "instance"],
        ),
        lookback_us=RANGE_US,
    )
    return eng.query_instant_frame("sum by (mtype) (events_gauge)", END_US)
