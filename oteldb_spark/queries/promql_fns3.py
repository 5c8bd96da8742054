"""PromQL function tail (round 3): the experimental ``ts_of_*``
family (Prometheus functions.go funcTsOfMaxOverTime /
funcTsOfMinOverTime / funcTsOfLastOverTime, behind
--enable-feature=promql-experimental-functions) — the timestamp, in
float seconds, of the max / min / last sample per trailing window.
Ties resolve to the LATEST occurrence (upstream iterates with >= /
<=).  Closes the last gap between this engine's function surface and
the full Prometheus 3.x list, plus ``info()`` via an
explicit info-metric frame (target_info analog) on MetricSource.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.stepfanout import fanout_join_sql
from ..promql import MetricSource, PromParams, compile_promql
from ..signals import COUNTERS_CTE, counter_points_frame, with_ctes
from .registry import END_US, RANGE_US, START_US, STEP_US, register

PARAMS = PromParams(START_US, END_US, STEP_US, lookback_us=RANGE_US)
METRICS = {
    "events_value_total": "counter_mod",
    "events_counter_total": "counter",
    "events_gauge": "gauge",
}

_G_FAN = fanout_join_sql(
    "(SELECT mtype, instance, ts_us, gauge AS sample FROM counters)",
    START_US,
    END_US,
    STEP_US,
    RANGE_US,
)


def _source(spark, sf_dir) -> MetricSource:
    return MetricSource(
        df=counter_points_frame(spark, sf_dir),
        metrics=METRICS,
        label_cols=["mtype", "instance"],
    )


def _run(q: str):
    def fn(spark, sf_dir):
        return compile_promql(q, _source(spark, sf_dir), PARAMS, spark)

    return fn


register(
    "ppql_parsed_ts_of_max",
    with_ctes(
        COUNTERS_CTE,
        body=f"""SELECT mtype, instance, step_us,
       CAST(max({{'v': sample, 'ts': ts_us}}).ts AS DOUBLE) / 1e6 AS value
FROM {_G_FAN} s GROUP BY mtype, instance, step_us""",
    ),
)(_run("ts_of_max_over_time(events_gauge[12h])"))


register(
    "ppql_parsed_ts_of_min",
    with_ctes(
        COUNTERS_CTE,
        body=f"""SELECT mtype, instance, step_us,
       CAST(max({{'v': -(sample), 'ts': ts_us}}).ts AS DOUBLE) / 1e6 AS value
FROM {_G_FAN} s GROUP BY mtype, instance, step_us""",
    ),
)(_run("ts_of_min_over_time(events_gauge[12h])"))


register(
    "ppql_parsed_ts_of_last",
    with_ctes(
        COUNTERS_CTE,
        body=f"""SELECT mtype, instance, step_us,
       CAST(max(ts_us) AS DOUBLE) / 1e6 AS value
FROM {_G_FAN} s GROUP BY mtype, instance, step_us""",
    ),
)(_run("ts_of_last_over_time(events_gauge[12h])"))


# --- info() ------------------------------------------------------------------
# Synthesized target_info analog: one info row per (instance, step)
# whose region label flips mid-month — info() must pick the LATEST
# info row inside each step's lookback, so the flip propagates on the
# step after _MID and not before.

_MID_US = START_US + 15 * 86_400_000_000


def _info_df(spark, sf_dir):
    pts = counter_points_frame(spark, sf_dir)
    inst = pts.select("instance").distinct()
    spine = inst.crossJoin(
        pts.sparkSession.range(
            START_US, END_US + STEP_US, STEP_US
        ).select(F.col("id").alias("ts_us"))
    )
    parity = F.substring("instance", -1, 1).cast("int") % 2
    early = F.when(parity == 0, "east").otherwise("west")
    late = F.when(parity == 0, "west").otherwise("east")
    return spine.select(
        "instance",
        "ts_us",
        F.when(F.col("ts_us") < _MID_US, early).otherwise(late).alias(
            "region"
        ),
    )


@register(
    "ppql_parsed_info",
    with_ctes(
        COUNTERS_CTE,
        body=f"""SELECT mtype, instance, step_us,
       arg_max(sample, ts_us) AS value,
       CASE WHEN (CASE WHEN step_us < {_MID_US}
                       THEN CAST(substr(instance, -1, 1) AS INTEGER) % 2 = 0
                       ELSE CAST(substr(instance, -1, 1) AS INTEGER) % 2 = 1
                  END)
            THEN 'east' ELSE 'west' END AS region
FROM {_G_FAN} s GROUP BY mtype, instance, step_us""",
    ),
)
def ppql_parsed_info(spark, sf_dir):
    import dataclasses

    src = dataclasses.replace(
        _source(spark, sf_dir),
        info_df=_info_df(spark, sf_dir),
        info_identifying=["instance"],
    )
    return compile_promql("info(events_gauge)", src, PARAMS, spark)


# --- @ on RANGE vectors ------------------------------------------------------
# The window is pinned at the resolved time, evaluated once, and the
# result replicated across every output step (engine.go evaluates the
# pinned matrix identically per step).

register(
    "ppql_parsed_count_at_end",
    with_ctes(
        COUNTERS_CTE,
        f"""pinned AS (
  SELECT mtype, instance, CAST(count(*) AS DOUBLE) AS value
  FROM counters
  WHERE ts_us > {END_US} - {RANGE_US} AND ts_us <= {END_US}
  GROUP BY mtype, instance
)""",
        body=f"""SELECT mtype, instance, step_us, value
FROM pinned CROSS JOIN (SELECT range AS step_us
  FROM range({START_US}, {END_US} + 1, {STEP_US})) t""",
    ),
)(_run("count_over_time(events_gauge[12h] @ end())"))
