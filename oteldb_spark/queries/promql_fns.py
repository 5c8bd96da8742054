"""resets / changes / deriv driver queries (PromQL function surface)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.rate import deriv, resets_changes
from ..operators.stepfanout import fanout_join_sql, spine_sql
from ..signals import COUNTERS_CTE, counter_points_frame, with_ctes
from .registry import END_US, RANGE_US, START_US, STEP_US, register

SERIES = ["mtype", "instance"]

_LAGGED = """lagged AS (
  SELECT mtype, instance, ts_us, v,
         lag(v) OVER (PARTITION BY mtype, instance ORDER BY ts_us) AS prev,
         lag(ts_us) OVER (PARTITION BY mtype, instance ORDER BY ts_us)
           AS prev_ts_us
  FROM (SELECT mtype, instance, ts_us, {vcol} AS v FROM counters)
)"""


def _rc_oracle(op: str, vcol: str) -> str:
    ind = "v < prev" if op == "resets" else "v <> prev"
    fan = fanout_join_sql("lagged", START_US, END_US, STEP_US, RANGE_US)
    return with_ctes(
        COUNTERS_CTE,
        _LAGGED.format(vcol=vcol),
        body=f"""SELECT mtype, instance, step_us,
       CAST(sum(CASE WHEN prev_ts_us IS NOT NULL
                      AND prev_ts_us > step_us - {RANGE_US}
                      AND ({ind}) THEN 1 ELSE 0 END) AS DOUBLE) AS value
FROM {fan} s GROUP BY mtype, instance, step_us""",
    )


# resets over the wrapped counter (real resets exist by construction)
@register("promql_resets", _rc_oracle("resets", "counter_mod"))
def promql_resets(spark, sf_dir):
    pts = counter_points_frame(spark, sf_dir)
    return resets_changes(
        pts,
        "resets",
        series=SERIES,
        value_col="counter_mod",
        start_us=START_US,
        end_us=END_US,
        step_us=STEP_US,
        range_us=RANGE_US,
    )


# changes over the gauge
@register("promql_changes", _rc_oracle("changes", "gauge"))
def promql_changes(spark, sf_dir):
    pts = counter_points_frame(spark, sf_dir)
    return resets_changes(
        pts,
        "changes",
        series=SERIES,
        value_col="gauge",
        start_us=START_US,
        end_us=END_US,
        step_us=STEP_US,
        range_us=RANGE_US,
    )


# deriv of the monotone counter (per-second least-squares slope)
_DERIV_FAN = fanout_join_sql(
    "(SELECT mtype, instance, ts_us, counter AS y FROM counters)",
    START_US,
    END_US,
    STEP_US,
    RANGE_US,
)


@register(
    "promql_deriv",
    with_ctes(
        COUNTERS_CTE,
        f"""g AS (
  SELECT mtype, instance, step_us,
         count(*) AS n,
         sum((ts_us - (step_us - {RANGE_US})) / 1e6) AS st,
         sum(y) AS sy,
         sum(((ts_us - (step_us - {RANGE_US})) / 1e6) * y) AS sty,
         sum(((ts_us - (step_us - {RANGE_US})) / 1e6)
             * ((ts_us - (step_us - {RANGE_US})) / 1e6)) AS stt
  FROM {_DERIV_FAN} s GROUP BY mtype, instance, step_us
)""",
        body="""SELECT mtype, instance, step_us,
       round((n * sty - st * sy) / (n * stt - st * st), 6) AS value
FROM g WHERE n >= 2""",
    ),
)
def promql_deriv(spark, sf_dir):
    pts = counter_points_frame(spark, sf_dir).select(
        "mtype", "instance", "ts_us", F.col("counter").alias("y")
    )
    out = deriv(
        pts,
        series=SERIES,
        value_col="y",
        start_us=START_US,
        end_us=END_US,
        step_us=STEP_US,
        range_us=RANGE_US,
    )
    return out.withColumn("value", F.round("value", 6))


# predict_linear through the parser: 1h-ahead extrapolation of the
# monotone counter (same decomposable sums as deriv + intercept)
_HORIZON_S = 3600.0


@register(
    "ppql_parsed_predict_linear",
    with_ctes(
        COUNTERS_CTE,
        f"""g AS (
  SELECT mtype, instance, step_us,
         count(*) AS n,
         sum((ts_us - (step_us - {RANGE_US})) / 1e6) AS st,
         sum(y) AS sy,
         sum(((ts_us - (step_us - {RANGE_US})) / 1e6) * y) AS sty,
         sum(((ts_us - (step_us - {RANGE_US})) / 1e6)
             * ((ts_us - (step_us - {RANGE_US})) / 1e6)) AS stt
  FROM {fanout_join_sql("(SELECT mtype, instance, ts_us, counter AS y FROM counters)", START_US, END_US, STEP_US, RANGE_US)} s
  GROUP BY mtype, instance, step_us
)""",
        body=f"""SELECT mtype, instance, step_us,
       round(((sy - ((n * sty - st * sy) / (n * stt - st * st)) * st) / n)
             + ((n * sty - st * sy) / (n * stt - st * st))
               * ({RANGE_US} / 1e6 + {_HORIZON_S!r}), 4) AS value
FROM g WHERE n >= 2""",
    ),
)
def ppql_parsed_predict_linear(spark, sf_dir):
    from ..promql import MetricSource, PromParams, compile_promql

    src = MetricSource(
        df=counter_points_frame(spark, sf_dir),
        metrics={"events_counter_total": "counter"},
        label_cols=["mtype", "instance"],
    )
    out = compile_promql(
        f"predict_linear(events_counter_total[12h], {int(_HORIZON_S)})",
        src,
        PromParams(START_US, END_US, STEP_US),
        spark,
    )
    return out.withColumn("value", F.round("value", 4))


# @ modifier through the parser: the gauge pinned at a fixed time,
# replicated over the step spine
_AT_S = (START_US + 15 * 86_400_000_000) // 1_000_000  # 2024-01-16


@register(
    "ppql_parsed_at",
    with_ctes(
        COUNTERS_CTE,
        f"""pinned AS (
  SELECT mtype, instance, arg_max(gauge, ts_us) AS value
  FROM counters
  WHERE ts_us > {_AT_S * 1_000_000} - {RANGE_US} AND ts_us <= {_AT_S * 1_000_000}
  GROUP BY mtype, instance
)""",
        body=f"""SELECT mtype, instance, step_us, value
FROM pinned CROSS JOIN {spine_sql(START_US, END_US, STEP_US)} t""",
    ),
)
def ppql_parsed_at(spark, sf_dir):
    from ..promql import MetricSource, PromParams, compile_promql

    src = MetricSource(
        df=counter_points_frame(spark, sf_dir),
        metrics={"events_gauge": "gauge"},
        label_cols=["mtype", "instance"],
    )
    return compile_promql(
        f"events_gauge @ {_AT_S}",
        src,
        PromParams(START_US, END_US, STEP_US, lookback_us=RANGE_US),
        spark,
    )


# evaluation-time functions through the parser: hour-of-day per step
# (pure integer epoch math on both sides)
@register(
    "ppql_parsed_hour",
    f"""SELECT step_us,
       CAST((step_us // 1000000 // 3600) % 24 AS DOUBLE) AS value
FROM {spine_sql(START_US, END_US, STEP_US)} t""",
)
def ppql_parsed_hour(spark, sf_dir):
    from ..promql import MetricSource, PromParams, compile_promql

    src = MetricSource(
        df=counter_points_frame(spark, sf_dir),
        metrics={"events_gauge": "gauge"},
        label_cols=["mtype", "instance"],
    )
    return compile_promql(
        "hour()", src, PromParams(START_US, END_US, STEP_US), spark
    ).select("step_us", "value")
