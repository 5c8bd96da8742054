"""Driver-gated queries through the FULL PromQL front-end (parse →
compile → DataFrame) with SQL oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.rate import rate_family_oracle_sql
from ..operators.stepfanout import fanout_join_sql
from ..promql import MetricSource, PromParams, compile_promql
from ..signals import COUNTERS_CTE, counter_points_frame, with_ctes
from .registry import END_US, RANGE_US, START_US, STEP_US, register

# staleness lookback widened to the 12h test range so instant
# selectors always see the (sparse) synthetic series
PARAMS = PromParams(START_US, END_US, STEP_US, lookback_us=RANGE_US)
METRICS = {
    "events_value_total": "counter_mod",
    "events_counter_total": "counter",
    "events_gauge": "gauge",
}


def _source(spark, sf_dir) -> MetricSource:
    pts = counter_points_frame(spark, sf_dir)
    return MetricSource(df=pts, metrics=METRICS, label_cols=["mtype", "instance"])


def _run(q: str, round_digits: int | None = None):
    def fn(spark, sf_dir):
        out = compile_promql(q, _source(spark, sf_dir), PARAMS, spark)
        if round_digits is not None:
            out = out.withColumn("value", F.round("value", round_digits))
        return out

    return fn


def _rate_oracle_filtered(op: str, value_col: str, where: str = "") -> tuple[str, str]:
    src = f"(SELECT mtype, instance, ts_us, {value_col} AS v FROM counters{where})"
    inner = rate_family_oracle_sql(
        op,
        source=src,
        series_sql=["mtype", "instance"],
        value_col="v",
        start_us=START_US,
        end_us=END_US,
        step_us=STEP_US,
        range_us=RANGE_US,
    )
    idx = inner.rfind("\nSELECT ")
    return inner[:idx].rstrip().rstrip(","), inner[idx + 1 :]


# rate(events_value_total{mtype="error"}[12h]) — parsed selector+rate
_C, _S = _rate_oracle_filtered("rate", "counter_mod", " WHERE mtype = 'error'")
register(
    "ppql_parsed_rate",
    f"""WITH {COUNTERS_CTE},
{_C},
final AS (
{_S}
)
SELECT mtype, instance, step_us, round(value, 9) AS value FROM final""",
)(_run('rate(events_value_total{mtype="error"}[12h])', round_digits=9))


# sum by (instance) (increase(events_value_total[12h])) / 1000
_C2, _S2 = _rate_oracle_filtered("increase", "counter_mod")
register(
    "ppql_parsed_sum_increase",
    f"""WITH {COUNTERS_CTE},
{_C2},
final AS (
{_S2}
)
SELECT instance, step_us, round(CAST(sum(value) AS DOUBLE) / 1000, 6) AS value
FROM final GROUP BY instance, step_us""",
)(_run("sum by (instance) (increase(events_value_total[12h])) / 1000", round_digits=6))


# instant selector with staleness lookback: events_gauge
_G_FAN = fanout_join_sql(
    "(SELECT mtype, instance, ts_us, gauge AS sample FROM counters)",
    START_US,
    END_US,
    STEP_US,
    RANGE_US,
)
register(
    "ppql_parsed_instant",
    with_ctes(
        COUNTERS_CTE,
        body=f"""SELECT mtype, instance, step_us,
       arg_max(sample, ts_us) AS value
FROM {_G_FAN} s GROUP BY mtype, instance, step_us""",
    ),
)(_run("events_gauge"))


# topk(3, sum by (instance) (count_over_time(events_gauge[12h]))) —
# exact integer counts ⇒ deterministic ranking with label tie-break
register(
    "ppql_parsed_topk",
    with_ctes(
        COUNTERS_CTE,
        f"per_inst AS (SELECT instance, step_us, CAST(count(*) AS DOUBLE) AS value"
        f" FROM {_G_FAN} s GROUP BY instance, step_us)",
        body="""SELECT instance, step_us, value FROM (
  SELECT *, row_number() OVER (
    PARTITION BY step_us ORDER BY value DESC, instance) AS rn
  FROM per_inst) WHERE rn <= 3""",
    ),
)(_run("topk(3, sum by (instance) (count_over_time(events_gauge[12h])))"))


# comparison filter: series where the 12h event count exceeds 5
register(
    "ppql_parsed_cmp_filter",
    with_ctes(
        COUNTERS_CTE,
        f"per_series AS (SELECT mtype, instance, step_us,"
        f" CAST(count(*) AS DOUBLE) AS value"
        f" FROM {_G_FAN} s GROUP BY mtype, instance, step_us)",
        body="SELECT mtype, instance, step_us, value FROM per_series WHERE value > 5",
    ),
)(_run("count_over_time(events_gauge[12h]) > 5"))


# math function over a vector: sqrt(count_over_time(...))
register(
    "ppql_parsed_sqrt",
    with_ctes(
        COUNTERS_CTE,
        f"per_series AS (SELECT mtype, instance, step_us,"
        f" CAST(count(*) AS DOUBLE) AS value"
        f" FROM {_G_FAN} s GROUP BY mtype, instance, step_us)",
        body="SELECT mtype, instance, step_us, round(sqrt(value), 9) AS value"
        " FROM per_series",
    ),
)(_run("sqrt(count_over_time(events_gauge[12h]))", round_digits=9))


# vector matching with group_left through the parser:
# count by (mtype, instance) / on(mtype) sum of counts
register(
    "ppql_parsed_group_left",
    with_ctes(
        COUNTERS_CTE,
        f"per_series AS (SELECT mtype, instance, step_us,"
        f" CAST(count(*) AS DOUBLE) AS value"
        f" FROM {_G_FAN} s GROUP BY mtype, instance, step_us)",
        "per_type AS (SELECT mtype, step_us, CAST(sum(value) AS DOUBLE) AS value"
        " FROM per_series GROUP BY mtype, step_us)",
        body="""SELECT i.mtype, i.instance, i.step_us, i.value / t.value AS value
FROM per_series i JOIN per_type t
  ON i.mtype = t.mtype AND i.step_us = t.step_us""",
    ),
)(
    _run(
        "sum by (mtype, instance) (count_over_time(events_gauge[12h]))"
        " / on (mtype) group_left"
        " sum by (mtype) (count_over_time(events_gauge[12h]))"
    )
)
