"""Extended PromQL surface (SURVEY §2.4): histogram_quantile, offset
modifiers, subqueries, vector matching with group_left,
present_over_time, and the series-count pushdown.

All composed from the shared step machinery; the histogram_quantile
implementation mirrors Prometheus bucketQuantile (public semantics:
cumulative buckets, linear interpolation inside the chosen bucket,
highest finite bucket for the +Inf case).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.rate import rate_family, rate_family_oracle_sql
from ..operators.range_agg import range_aggregate
from ..operators.binop import vector_binop
from ..operators.stepfanout import fanout, fanout_join_sql
from ..signals import COUNTERS_CTE, counter_points_frame, with_ctes
from .registry import END_US, RANGE_US, START_US, STEP_US, register

SERIES = ["mtype", "instance"]
_GAUGE_CTE = "samples AS (SELECT mtype, instance, ts_us, gauge AS sample FROM counters)"
_G_FAN = fanout_join_sql("samples", START_US, END_US, STEP_US, RANGE_US)

# --- histogram_quantile ------------------------------------------------------
# Buckets le ∈ {100, 250, +Inf} over gauge values, per (mtype, step).

_HQ = 0.9
_LE1, _LE2 = 100.0, 250.0

@register(
    "promql_histogram_quantile",
    with_ctes(
        COUNTERS_CTE,
        _GAUGE_CTE,
        f"""b AS (
  SELECT mtype, step_us,
         CAST(count(*) FILTER (WHERE sample <= {_LE1}) AS DOUBLE) AS c1,
         CAST(count(*) FILTER (WHERE sample <= {_LE2}) AS DOUBLE) AS c2,
         CAST(count(*) AS DOUBLE) AS ctot
  FROM {_G_FAN} s GROUP BY mtype, step_us
)""",
        body=f"""SELECT mtype, step_us,
       round(CASE
         WHEN {_HQ} * ctot <= c1 THEN
           {_LE1} * ({_HQ} * ctot) / c1
         WHEN {_HQ} * ctot <= c2 THEN
           {_LE1} + ({_LE2} - {_LE1}) * (({_HQ} * ctot) - c1) / (c2 - c1)
         ELSE {_LE2}
       END, 6) AS value
FROM b WHERE ctot > 0""",
    ),
)
def promql_histogram_quantile(spark, sf_dir):
    pts = counter_points_frame(spark, sf_dir)
    samples = pts.select("mtype", "ts_us", F.col("gauge").alias("sample"))
    fanned = fanout(samples, START_US, END_US, STEP_US, RANGE_US)
    b = fanned.groupBy("mtype", "step_us").agg(
        F.count(F.when(F.col("sample") <= _LE1, 1)).cast("double").alias("c1"),
        F.count(F.when(F.col("sample") <= _LE2, 1)).cast("double").alias("c2"),
        F.count(F.lit(1)).cast("double").alias("ctot"),
    )
    rank = F.lit(_HQ) * F.col("ctot")
    value = (
        F.when(rank <= F.col("c1"), F.lit(_LE1) * rank / F.col("c1"))
        .when(
            rank <= F.col("c2"),
            F.lit(_LE1)
            + (F.lit(_LE2) - F.lit(_LE1))
            * (rank - F.col("c1"))
            / (F.col("c2") - F.col("c1")),
        )
        .otherwise(F.lit(_LE2))
    )
    return b.filter(F.col("ctot") > 0).select(
        "mtype", "step_us", F.round(value, 6).alias("value")
    )


# --- offset modifier ---------------------------------------------------------
# last_over_time(gauge[12h] offset 24h): window (t-offset-range, t-offset]

_OFFSET_US = 24 * 3_600_000_000

@register(
    "promql_offset_last",
    with_ctes(
        COUNTERS_CTE,
        "shifted AS (SELECT mtype, instance, ts_us + {o} AS ts_us, gauge AS sample"
        " FROM counters)".format(o=_OFFSET_US),
        body=f"""SELECT mtype, instance, step_us,
       arg_max(sample, ts_us) AS value
FROM {fanout_join_sql("shifted", START_US, END_US, STEP_US, RANGE_US)} s
GROUP BY mtype, instance, step_us""",
    ),
)
def promql_offset_last(spark, sf_dir):
    pts = counter_points_frame(spark, sf_dir)
    shifted = pts.select(
        "mtype",
        "instance",
        (F.col("ts_us") + F.lit(_OFFSET_US)).alias("ts_us"),
        F.col("gauge").alias("sample"),
    )
    return range_aggregate(
        shifted,
        "last_over_time",
        start_us=START_US,
        end_us=END_US,
        step_us=STEP_US,
        range_us=RANGE_US,
        by=SERIES,
    )


# --- subquery ----------------------------------------------------------------
# max_over_time(rate(counter_mod[12h])[24h:6h]): the inner rate is
# evaluated on the 6h step grid, its step results become samples for
# the outer 24h trailing window.

_SUBQ_RANGE_US = 24 * 3_600_000_000


def _rate_inner_oracle() -> str:
    inner = rate_family_oracle_sql(
        "rate",
        source="(SELECT mtype, instance, ts_us, counter_mod AS v FROM counters)",
        series_sql=SERIES,
        value_col="v",
        start_us=START_US,
        end_us=END_US,
        step_us=STEP_US,
        range_us=RANGE_US,
    )
    idx = inner.rfind("\nSELECT ")
    ctes, final = inner[:idx].rstrip().rstrip(","), inner[idx + 1 :]
    return ctes, final


_R_CTES, _R_FINAL = _rate_inner_oracle()

@register(
    "promql_subquery_max_rate",
    f"""WITH {COUNTERS_CTE},
{_R_CTES},
inner_rate AS (
  SELECT mtype, instance, step_us AS ts_us, round(value, 9) AS sample
  FROM ({_R_FINAL}) r
)
SELECT mtype, instance, step_us, CAST(max(sample) AS DOUBLE) AS value
FROM {fanout_join_sql("inner_rate", START_US, END_US, STEP_US, _SUBQ_RANGE_US)} s
GROUP BY mtype, instance, step_us""",
)
def promql_subquery_max_rate(spark, sf_dir):
    pts = counter_points_frame(spark, sf_dir)
    inner = rate_family(
        pts,
        "rate",
        series=SERIES,
        value_col="counter_mod",
        start_us=START_US,
        end_us=END_US,
        step_us=STEP_US,
        range_us=RANGE_US,
    )
    samples = inner.select(
        "mtype",
        "instance",
        F.col("step_us").alias("ts_us"),
        F.round("value", 9).alias("sample"),
    )
    return range_aggregate(
        samples,
        "max_over_time",
        start_us=START_US,
        end_us=END_US,
        step_us=STEP_US,
        range_us=_SUBQ_RANGE_US,
        by=SERIES,
    )


# --- vector matching: on(mtype) group_left ----------------------------------
# per-instance share of per-type event count:
#   count_over_time by (mtype, instance) / on(mtype) group_left
#   sum(count_over_time) by (mtype)

_CNT_CTE = "csamples AS (SELECT mtype, instance, ts_us, 1.0 AS sample FROM counters)"
_CNT_FAN = fanout_join_sql("csamples", START_US, END_US, STEP_US, RANGE_US)

@register(
    "promql_group_left_ratio",
    with_ctes(
        COUNTERS_CTE,
        _CNT_CTE,
        f"per_inst AS (SELECT mtype, instance, step_us,"
        f" CAST(count(*) AS DOUBLE) AS value FROM {_CNT_FAN} s"
        f" GROUP BY mtype, instance, step_us)",
        "per_type AS (SELECT mtype, step_us, CAST(sum(value) AS DOUBLE) AS value"
        " FROM per_inst GROUP BY mtype, step_us)",
        body="""SELECT i.mtype, i.instance, i.step_us, i.value / t.value AS value
FROM per_inst i JOIN per_type t ON i.mtype = t.mtype AND i.step_us = t.step_us""",
    ),
)
def promql_group_left_ratio(spark, sf_dir):
    pts = counter_points_frame(spark, sf_dir)
    samples = pts.select("mtype", "instance", "ts_us", F.lit(1.0).alias("sample"))
    per_inst = range_aggregate(
        samples,
        "count_over_time",
        start_us=START_US,
        end_us=END_US,
        step_us=STEP_US,
        range_us=RANGE_US,
        by=SERIES,
    )
    from ..operators.vector_agg import vector_aggregate

    per_type = vector_aggregate(per_inst, "sum", by=["mtype"])
    return vector_binop(
        per_inst, per_type, "/", on=["mtype"], group_left_labels=["instance"]
    )


# --- present_over_time + series-count pushdown -------------------------------

@register(
    "promql_present_over_time",
    with_ctes(
        COUNTERS_CTE,
        _GAUGE_CTE,
        body=f"""SELECT DISTINCT mtype, instance, step_us, 1.0 AS value
FROM {_G_FAN} s""",
    ),
)
def promql_present_over_time(spark, sf_dir):
    pts = counter_points_frame(spark, sf_dir)
    samples = pts.select("mtype", "instance", "ts_us", F.col("gauge").alias("sample"))
    fanned = fanout(samples, START_US, END_US, STEP_US, RANGE_US)
    return (
        fanned.select("mtype", "instance", "step_us")
        .distinct()
        .withColumn("value", F.lit(1.0))
    )


# count(...) by (mtype) answered from series presence — the reference
# answers this from the series registry without touching points
# (storagebackend.go:213-265); here the registry is the distinct
# (mtype, instance) set per step.
@register(
    "promql_count_series",
    with_ctes(
        COUNTERS_CTE,
        _GAUGE_CTE,
        f"present AS (SELECT DISTINCT mtype, instance, step_us FROM {_G_FAN} s)",
        body="""SELECT mtype, step_us, CAST(count(*) AS DOUBLE) AS value
FROM present GROUP BY mtype, step_us""",
    ),
)
def promql_count_series(spark, sf_dir):
    pts = counter_points_frame(spark, sf_dir)
    samples = pts.select("mtype", "instance", "ts_us", F.col("gauge").alias("sample"))
    fanned = fanout(samples, START_US, END_US, STEP_US, RANGE_US)
    return (
        fanned.select("mtype", "instance", "step_us")
        .distinct()
        .groupBy("mtype", "step_us")
        .agg(F.count(F.lit(1)).cast("double").alias("value"))
    )
