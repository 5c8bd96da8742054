"""Exponential-histogram queries (SURVEY §1.1 / §2.4).

The reference stores OTel exponential histograms as native bucket
arrays (``metrics_exp_histograms``) and decodes them into Prometheus
native histograms at query time.  Scale-0 exponential buckets are
powers of two — bucket index e holds values in (2^(e-1), 2^e] — which
lets both engines bucket with exact binary comparisons (a CASE ladder
over exact constants; no libm in the hash-matched path).

Also here: the two-phase prebucketed wide-range aggregation
(range=48h ≫ step=6h → bucket fan-out shrinks 8× vs row fan-out).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.range_agg import range_aggregate_prebucketed
from ..operators.stepfanout import fanout, fanout_join_sql
from ..signals import COUNTERS_CTE, LOGS_CTE, counter_points_frame, logs_frame, with_ctes
from .registry import END_US, RANGE_US, START_US, STEP_US, register

_EXPONENTS = list(range(-6, 10))  # value range ~0.01 .. 490


def _bucket_case_sql(col: str) -> str:
    parts = []
    for e in _EXPONENTS:
        parts.append(f"WHEN {col} <= {float(2.0 ** e)!r} THEN {e}")
    return "CASE " + " ".join(parts) + f" ELSE {_EXPONENTS[-1] + 1} END"


# exponential bucket counts per (mtype, step): the exp-histogram
# ingest explosion (chstorage/columns_metrics.go:181-230) re-expressed
_G_FAN = fanout_join_sql(
    "(SELECT mtype, ts_us, gauge AS sample FROM counters)",
    START_US,
    END_US,
    STEP_US,
    RANGE_US,
)


@register(
    "exp_histogram_buckets",
    with_ctes(
        COUNTERS_CTE,
        body=f"""SELECT mtype, step_us, {_bucket_case_sql("sample")} AS bucket,
       CAST(count(*) AS BIGINT) AS cnt
FROM {_G_FAN} s
GROUP BY mtype, step_us, {_bucket_case_sql("sample")}""",
    ),
)
def exp_histogram_buckets(spark, sf_dir):
    pts = counter_points_frame(spark, sf_dir)
    samples = pts.select("mtype", "ts_us", F.col("gauge").alias("sample"))
    fanned = fanout(samples, START_US, END_US, STEP_US, RANGE_US)
    bucket = F.expr(_bucket_case_sql("sample")).alias("bucket")
    return fanned.groupBy("mtype", "step_us", bucket).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


# p90 upper bound from the exponential buckets (native-histogram
# quantile: first bucket where the cumulative count crosses the rank;
# the scale-0 upper bound 2^bucket is the estimate)
@register(
    "exp_histogram_p90",
    with_ctes(
        COUNTERS_CTE,
        f"""b AS (
  SELECT mtype, step_us, {_bucket_case_sql("sample")} AS bucket,
         count(*) AS cnt
  FROM {_G_FAN} s
  GROUP BY mtype, step_us, {_bucket_case_sql("sample")}
)""",
        """c AS (
  SELECT mtype, step_us, bucket, cnt,
         sum(cnt) OVER (PARTITION BY mtype, step_us ORDER BY bucket) AS cum,
         sum(cnt) OVER (PARTITION BY mtype, step_us) AS total
  FROM b
)""",
        body="""SELECT mtype, step_us,
       CAST(pow(2.0, min(bucket)) AS DOUBLE) AS p90_bound
FROM c WHERE cum >= 0.9 * total
GROUP BY mtype, step_us""",
    ),
)
def exp_histogram_p90(spark, sf_dir):
    from pyspark.sql import Window

    pts = counter_points_frame(spark, sf_dir)
    samples = pts.select("mtype", "ts_us", F.col("gauge").alias("sample"))
    fanned = fanout(samples, START_US, END_US, STEP_US, RANGE_US)
    bucket = F.expr(_bucket_case_sql("sample")).alias("bucket")
    b = fanned.groupBy("mtype", "step_us", bucket).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("mtype", "step_us").orderBy("bucket")
    wt = Window.partitionBy("mtype", "step_us")
    c = b.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "total", F.sum("cnt").over(wt)
    )
    return (
        c.filter(F.col("cum") >= 0.9 * F.col("total"))
        .groupBy("mtype", "step_us")
        .agg(F.pow(F.lit(2.0), F.min("bucket")).cast("double").alias("p90_bound"))
    )


# wide-range two-phase aggregation: count over 48h windows at 6h steps
# via bucket pre-aggregation (8x smaller fan-out input); the oracle
# does the naive row fan-out — results must agree exactly
_WIDE_RANGE_US = 48 * 3_600_000_000

@register(
    "logql_count_over_time_wide",
    with_ctes(
        LOGS_CTE,
        "samples AS (SELECT service, ts_us FROM logs)",
        body=f"""SELECT service, step_us, CAST(count(*) AS DOUBLE) AS value
FROM {fanout_join_sql("samples", START_US, END_US, STEP_US, _WIDE_RANGE_US)} s
GROUP BY service, step_us""",
    ),
)
def logql_count_over_time_wide(spark, sf_dir):
    logs = logs_frame(spark, sf_dir)
    samples = logs.select("service", "ts_us", F.lit(1.0).alias("sample"))
    return range_aggregate_prebucketed(
        samples,
        "count_over_time",
        start_us=START_US,
        end_us=END_US,
        step_us=STEP_US,
        range_us=_WIDE_RANGE_US,
        by=["service"],
    )
