"""PromQL function tail (round 2): timestamp(), the extended date
family, trig functions, double_exponential_smoothing, sort/sort_desc
and @ start()/end() — all through the full parse → compile path.

Prometheus semantics throughout (functions.go); the reference's
compliance corpus (``dev/local/ch-compliance/promql-test-queries.yml``)
uses ``timestamp()`` five times and lists
``double_exponential_smoothing``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.stepfanout import fanout_join_sql, spine_sql
from ..promql import MetricSource, PromParams, compile_promql
from ..signals import COUNTERS_CTE, counter_points_frame, with_ctes
from .registry import END_US, RANGE_US, START_US, STEP_US, register

PARAMS = PromParams(START_US, END_US, STEP_US, lookback_us=RANGE_US)
METRICS = {
    "events_value_total": "counter_mod",
    "events_counter_total": "counter",
    "events_gauge": "gauge",
    # native-histogram view of the observation stream (engine-path
    # histogram_* functions; operators/histogram.py)
    "events_hist": "gauge",
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
        histograms=frozenset({"events_hist"}),
    )


def _run(q: str, round_digits: int | None = None, select=None):
    def fn(spark, sf_dir):
        out = compile_promql(q, _source(spark, sf_dir), PARAMS, spark)
        if round_digits is not None:
            out = out.withColumn("value", F.round("value", round_digits))
        if select is not None:
            out = out.select(*select)
        return out

    return fn


# timestamp(events_gauge): the ts of the sample the staleness lookback
# picked at each step, in float seconds
register(
    "ppql_parsed_timestamp",
    with_ctes(
        COUNTERS_CTE,
        body=f"""SELECT mtype, instance, step_us,
       round(CAST(max(ts_us) AS DOUBLE) / 1000000.0, 6) AS value
FROM {_G_FAN} s GROUP BY mtype, instance, step_us""",
    ),
)(_run("timestamp(events_gauge)", round_digits=6))


# extended date family over the step spine (pure UTC epoch math)
register(
    "ppql_parsed_year",
    f"""SELECT step_us,
       CAST(year(to_timestamp(step_us // 1000000)) AS DOUBLE) AS value
FROM {spine_sql(START_US, END_US, STEP_US)} t""",
)(_run("year()", select=["step_us", "value"]))


register(
    "ppql_parsed_day_of_year",
    f"""SELECT step_us,
       CAST(dayofyear(to_timestamp(step_us // 1000000)) AS DOUBLE) AS value
FROM {spine_sql(START_US, END_US, STEP_US)} t""",
)(_run("day_of_year()", select=["step_us", "value"]))


register(
    "ppql_parsed_days_in_month",
    f"""SELECT step_us,
       CAST(day(last_day(to_timestamp(step_us // 1000000))) AS DOUBLE) AS value
FROM {spine_sql(START_US, END_US, STEP_US)} t""",
)(_run("days_in_month()", select=["step_us", "value"]))


# trig chain sin → atan → deg over exact integer counts; round 6
# absorbs any last-ulp libm divergence between engines
register(
    "ppql_parsed_trig",
    with_ctes(
        COUNTERS_CTE,
        f"per_series AS (SELECT mtype, instance, step_us,"
        f" CAST(count(*) AS DOUBLE) AS value"
        f" FROM {_G_FAN} s GROUP BY mtype, instance, step_us)",
        body="""SELECT mtype, instance, step_us,
       round(degrees(atan(sin(value))), 6) AS value
FROM per_series""",
    ),
)(_run("deg(atan(sin(count_over_time(events_gauge[12h]))))", round_digits=6))


# double_exponential_smoothing over 12h windows: the same fold
# expressed with list_reduce in DuckDB (list-typed accumulator
# [s1, b]); windows need >= 2 samples.  Factors stay off dyadic
# values — exact .xxxxxx5 results round differently across engines
# (Spark rounds the decimal repr, DuckDB the binary double)
_SF, _TF = 0.4, 0.3
_NS1 = (
    f"{_SF}::DOUBLE*e[1] + (1.0::DOUBLE - {_SF}::DOUBLE)*(acc[1]+acc[2])"
)
register(
    "ppql_parsed_smoothing",
    with_ctes(
        COUNTERS_CTE,
        f"""w AS (
  SELECT mtype, instance, step_us,
         list(sample ORDER BY ts_us) AS vals
  FROM {_G_FAN} s GROUP BY mtype, instance, step_us
)""",
        body=f"""SELECT mtype, instance, step_us,
       round(list_reduce(
         list_concat([[vals[1], vals[2]-vals[1]]],
                     list_transform(vals[2:], x -> [x, 0.0::DOUBLE])),
         (acc, e) -> [{_NS1},
                      {_TF}::DOUBLE*(({_NS1}) - acc[1])
                        + (1.0::DOUBLE - {_TF}::DOUBLE)*acc[2]]
       )[1], 6) AS value
FROM w WHERE len(vals) >= 2""",
    ),
)(_run(f"double_exponential_smoothing(events_gauge[12h], {_SF}, {_TF})", round_digits=6))


# @ end(): instant value pinned to the window end, repeated per step
register(
    "ppql_parsed_at_end",
    with_ctes(
        COUNTERS_CTE,
        f"""pinned AS (
  SELECT mtype, instance, arg_max(gauge, ts_us) AS value
  FROM counters
  WHERE ts_us > {END_US} - {RANGE_US} AND ts_us <= {END_US}
  GROUP BY mtype, instance
)""",
        body=f"""SELECT mtype, instance, step_us, value
FROM pinned CROSS JOIN {spine_sql(START_US, END_US, STEP_US)} t""",
    ),
)(_run("events_gauge @ end()"))


# @ start(): pinned to the window start.  The query window begins
# mid-month so the lookback behind start actually holds samples
# (with the full-month window the gate would be vacuously empty).
_MID_US = START_US + 15 * 86_400_000_000


@register(
    "ppql_parsed_at_start",
    with_ctes(
        COUNTERS_CTE,
        f"""pinned AS (
  SELECT mtype, instance, arg_max(gauge, ts_us) AS value
  FROM counters
  WHERE ts_us > {_MID_US} - {RANGE_US} AND ts_us <= {_MID_US}
  GROUP BY mtype, instance
)""",
        body=f"""SELECT mtype, instance, step_us, value
FROM pinned CROSS JOIN {spine_sql(_MID_US, END_US, STEP_US)} t""",
    ),
)
def ppql_parsed_at_start(spark, sf_dir):
    return compile_promql(
        "events_gauge @ start()",
        _source(spark, sf_dir),
        PromParams(_MID_US, END_US, STEP_US, lookback_us=RANGE_US),
        spark,
    )


# sort_desc ordering is presentation-level (row set unchanged → the
# order-insensitive hash gate still applies; ordering itself is
# asserted in tests/test_promql_fns2.py)
register(
    "ppql_parsed_sort_desc",
    with_ctes(
        COUNTERS_CTE,
        f"per_series AS (SELECT mtype, instance, step_us,"
        f" CAST(count(*) AS DOUBLE) AS value"
        f" FROM {_G_FAN} s GROUP BY mtype, instance, step_us)",
        body="SELECT mtype, instance, step_us, value FROM per_series",
    ),
)(_run("sort_desc(count_over_time(events_gauge[12h]))"))


# mad_over_time (experimental Prometheus fn): median absolute
# deviation per trailing window — median via the shared percentile
# machinery, deviations joined back on the (series, step) key
register(
    "ppql_parsed_mad",
    with_ctes(
        COUNTERS_CTE,
        f"""med AS (
  SELECT mtype, instance, step_us, quantile_cont(sample, 0.5) AS med
  FROM {_G_FAN} s GROUP BY mtype, instance, step_us
)""",
        body=f"""SELECT s.mtype, s.instance, s.step_us,
       round(quantile_cont(abs(s.sample - med.med), 0.5), 6) AS value
FROM {_G_FAN} s JOIN med
  ON med.mtype = s.mtype AND med.instance = s.instance
 AND med.step_us = s.step_us
GROUP BY s.mtype, s.instance, s.step_us""",
    ),
)(_run("mad_over_time(events_gauge[12h])", round_digits=6))


# sort_by_label (experimental): presentation ordering — the driver's
# value gate is order-insensitive, so this certifies the values flow
# through unchanged; the ordering itself is pytest-asserted
register(
    "ppql_parsed_sort_by_label",
    with_ctes(
        COUNTERS_CTE,
        body=f"""SELECT mtype, instance, step_us,
       arg_max(sample, ts_us) AS value
FROM {_G_FAN} s GROUP BY mtype, instance, step_us""",
    ),
)(_run('sort_by_label(events_gauge, "instance")'))


# --- native-histogram functions through the PromQL front-end --------
# events_hist is an exp-histogram-typed metric; the functions decode
# scale-0 buckets per window (operators/histogram.py)

from ..operators.histogram import (  # noqa: E402
    bucket_case_sql as _hb,
    covered_sql as _hcov,
    s1_scaled_case_sql as _hs1,
    s2_scaled_case_sql as _hs2,
)

_HB_CTE = f"""hb AS (
  SELECT mtype, instance, step_us, {_hb("sample")} AS bucket,
         count(*) AS cnt
  FROM {_G_FAN} s
  GROUP BY mtype, instance, step_us, {_hb("sample")}
)"""

register(
    "ppql_parsed_hist_count",
    with_ctes(
        COUNTERS_CTE,
        body=f"""SELECT mtype, instance, step_us,
       CAST(count(*) AS DOUBLE) AS value
FROM {_G_FAN} s GROUP BY mtype, instance, step_us""",
    ),
)(_run("histogram_count(events_hist[12h])"))


register(
    "ppql_parsed_hist_sum",
    with_ctes(
        COUNTERS_CTE,
        body=f"""SELECT mtype, instance, step_us,
       CAST(round(sum(CAST(sample AS DECIMAL(38,9))), 6) AS DOUBLE) AS value
FROM {_G_FAN} s GROUP BY mtype, instance, step_us""",
    ),
)(_run("histogram_sum(events_hist[12h])"))


register(
    "ppql_parsed_hist_stddev",
    with_ctes(
        COUNTERS_CTE,
        _HB_CTE,
        f"""hm AS (SELECT mtype, instance, step_us, cnt,
  {_hs1()} AS m1, {_hs2()} AS m2 FROM hb)""",
        """hs AS (
  SELECT mtype, instance, step_us,
         CAST(sum(cnt * m1) AS BIGINT) AS s1,
         CAST(sum(cnt * m2) AS BIGINT) AS s2,
         CAST(sum(cnt) AS BIGINT) AS n
  FROM hm GROUP BY mtype, instance, step_us
)""",
        f"""ht AS (
  SELECT mtype, instance, step_us,
         CAST(round(sum(CAST(sample AS DECIMAL(38,9))), 6) AS DOUBLE) AS tsum
  FROM {_G_FAN} s GROUP BY mtype, instance, step_us
)""",
        body="""SELECT hs.mtype, hs.instance, hs.step_us,
       sqrt(CAST(s2 AS DOUBLE) / (CAST(n AS DOUBLE) * 8192.0)
         - 2.0 * (tsum / CAST(n AS DOUBLE))
               * (CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * 64.0 * sqrt(2.0)))
         + (tsum / CAST(n AS DOUBLE)) * (tsum / CAST(n AS DOUBLE)))
         AS value
FROM hs JOIN ht ON hs.mtype = ht.mtype AND hs.instance = ht.instance
               AND hs.step_us = ht.step_us""",
    ),
)(_run("histogram_stddev(events_hist[12h])"))


register(
    "ppql_parsed_hist_fraction",
    with_ctes(
        COUNTERS_CTE,
        _HB_CTE,
        body=f"""SELECT mtype, instance, step_us,
       round(sum(cnt * ({_hcov(8.0)})) / sum(cnt)
             - sum(cnt * ({_hcov(0.5)})) / sum(cnt), 6) AS value
FROM hb GROUP BY mtype, instance, step_us""",
    ),
)(_run("histogram_fraction(0.5, 8, events_hist[12h])"))


register(
    "ppql_parsed_hist_quantile_native",
    with_ctes(
        COUNTERS_CTE,
        _HB_CTE,
        """hc AS (
  SELECT mtype, instance, step_us, bucket, cnt,
         sum(cnt) OVER (PARTITION BY mtype, instance, step_us
                        ORDER BY bucket) AS cum,
         sum(cnt) OVER (PARTITION BY mtype, instance, step_us) AS total
  FROM hb
)""",
        body="""SELECT mtype, instance, step_us,
       CAST(pow(2.0, min(bucket)) AS DOUBLE) AS value
FROM hc WHERE cum >= 0.9 * total
GROUP BY mtype, instance, step_us""",
    ),
)(_run("histogram_quantile(0.9, events_hist[12h])"))


# histogram rate: count/sum scale by 1/range, bucket-relative fns are
# invariant — histogram_count(rate(h[12h])) is the per-second
# observation rate
register(
    "ppql_parsed_hist_count_rate",
    with_ctes(
        COUNTERS_CTE,
        body=f"""SELECT mtype, instance, step_us,
       CAST(count(*) AS DOUBLE) / {12 * 3600.0!r} AS value
FROM {_G_FAN} s GROUP BY mtype, instance, step_us""",
    ),
)(_run("histogram_count(rate(events_hist[12h]))"))


register(
    "ppql_parsed_hist_quantile_rate",
    with_ctes(
        COUNTERS_CTE,
        _HB_CTE,
        """hc2 AS (
  SELECT mtype, instance, step_us, bucket, cnt,
         sum(cnt) OVER (PARTITION BY mtype, instance, step_us
                        ORDER BY bucket) AS cum,
         sum(cnt) OVER (PARTITION BY mtype, instance, step_us) AS total
  FROM hb
)""",
        body="""SELECT mtype, instance, step_us,
       CAST(pow(2.0, min(bucket)) AS DOUBLE) AS value
FROM hc2 WHERE cum >= 0.5 * total
GROUP BY mtype, instance, step_us""",
    ),
)(_run("histogram_quantile(0.5, rate(events_hist[12h]))"))


# absent(): 1 at every step where the selector matches nothing, with
# labels from the equality matchers (createLabelsForAbsentFunction)
register(
    "ppql_parsed_absent",
    f"""SELECT CAST(s.range AS BIGINT) AS step_us, 1.0::DOUBLE AS value,
       'no-such-host' AS instance
FROM range({START_US}, {END_US} + 1, {STEP_US}) s""",
)(_run('absent(events_gauge{instance="no-such-host"})'))


# sum-aggregated native histograms (Prometheus native-histogram sum:
# bucket-wise merge of the observation streams), then a histogram_*
# function over the merged state — the grouping IS the merge, no
# second pass (promql/compiler.py _native_hist_sel VectorAgg arm)
register(
    "ppql_parsed_hist_sum_quantile",
    with_ctes(
        COUNTERS_CTE,
        _HB_CTE,
        """hbm AS (
  SELECT mtype, step_us, bucket, sum(cnt) AS cnt
  FROM hb GROUP BY mtype, step_us, bucket
)""",
        """hcm AS (
  SELECT mtype, step_us, bucket,
         sum(cnt) OVER (PARTITION BY mtype, step_us
                        ORDER BY bucket) AS cum,
         sum(cnt) OVER (PARTITION BY mtype, step_us) AS total
  FROM hbm
)""",
        body="""SELECT mtype, step_us,
       CAST(pow(2.0, min(bucket)) AS DOUBLE) AS value
FROM hcm WHERE cum >= 0.9 * total
GROUP BY mtype, step_us""",
    ),
)(_run("histogram_quantile(0.9, sum by (mtype) (rate(events_hist[12h])))"))


register(
    "ppql_parsed_hist_sum_count_rate",
    with_ctes(
        COUNTERS_CTE,
        body=f"""SELECT instance, step_us,
       CAST(count(*) AS DOUBLE) / {12 * 3600.0!r} AS value
FROM {_G_FAN} s GROUP BY instance, step_us""",
    ),
)(_run("histogram_count(sum by (instance) (rate(events_hist[12h])))"))
