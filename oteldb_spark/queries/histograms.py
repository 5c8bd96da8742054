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


# --- native-histogram function family ---------------------------------------
# histogram_count/sum/avg/stddev/stdvar/fraction over the decoded
# scale-0 exponential buckets (the repo's native-histogram model; the
# reference stores exp-histogram state and decodes at query time,
# chstorage/columns_metrics.go:181-230).  count/sum are the exact
# stored-state fields; stddev/stdvar/fraction are bucket estimates —
# Prometheus places a bucket's mass at the arithmetic bucket midpoint
# (promql/quantile.go histogramStdDev analog).  Scale-0 bounds and
# midpoints are dyadic rationals, exact in doubles on both engines, so
# the estimates hash-match without rounding.

# Prometheus histogramStdDev/StdVar (promql/quantile.go) place each
# bucket's mass at the GEOMETRIC midpoint sqrt(lower·upper) =
# 2^(e-1/2) for scale-0 bucket (2^(e-1), 2^e], and take deviations
# around the TRUE mean sum/count (the stored sum, not a bucket
# estimate).  Scaled moments are exact integers:
#   s1·2^-6/√2 = Σ cnt·val   with s1 = Σ cnt·2^(e+6)
#   s2·2^-13   = Σ cnt·val²  with s2 = Σ cnt·2^(2e+12)
# so the only float ops are a fixed-order final formula — identical
# on both engines.
_S1_SCALED_CASE = "CASE " + " ".join(
    f"WHEN bucket = {e} THEN CAST({2 ** (e + 6)} AS BIGINT)"
    for e in range(-6, 11)
) + " END"

_S2_SCALED_CASE = "CASE " + " ".join(
    f"WHEN bucket = {e} THEN CAST({2 ** (2 * e + 12)} AS BIGINT)"
    for e in range(-6, 11)
) + " END"


def _bucket_frames(spark, sf_dir):
    pts = counter_points_frame(spark, sf_dir)
    samples = pts.select("mtype", "ts_us", F.col("gauge").alias("sample"))
    return fanout(samples, START_US, END_US, STEP_US, RANGE_US)


_HIST_CTES = (
    COUNTERS_CTE,
    f"""fanned AS (SELECT mtype, step_us, sample FROM {_G_FAN} s)""",
    f"""b AS (
  SELECT mtype, step_us, {_bucket_case_sql("sample")} AS bucket,
         count(*) AS cnt
  FROM fanned
  GROUP BY mtype, step_us, {_bucket_case_sql("sample")}
)""",
)


@register(
    "hist_native_count_avg",
    with_ctes(
        *_HIST_CTES,
        body="""SELECT mtype, step_us,
       CAST(count(*) AS DOUBLE) AS h_count,
       CAST(round(sum(CAST(sample AS DECIMAL(38,9))), 6) AS DOUBLE) AS h_sum,
       CAST(round(sum(CAST(sample AS DECIMAL(38,9))), 6) AS DOUBLE)
         / count(*) AS h_avg
FROM fanned GROUP BY mtype, step_us""",
    ),
)
def hist_native_count_avg(spark, sf_dir):
    """histogram_count / histogram_sum / histogram_avg: the exact
    stored count/sum of the histogram state (Prometheus reads these
    fields directly; avg = sum/count).  The sum accumulates in
    DECIMAL so it is exact in any order — a double sum drifts by an
    ulp between engines at larger SFs and flips the rounded digit."""
    fanned = _bucket_frames(spark, sf_dir)
    sum_dec = F.round(F.sum(F.col("sample").cast("decimal(38,9)")), 6).cast(
        "double"
    )
    return fanned.groupBy("mtype", "step_us").agg(
        F.count(F.lit(1)).cast("double").alias("h_count"),
        sum_dec.alias("h_sum"),
        (sum_dec / F.count(F.lit(1))).alias("h_avg"),
    )


@register(
    "hist_native_stdvar",
    with_ctes(
        *_HIST_CTES,
        f"""m AS (SELECT mtype, step_us, cnt,
  {_S1_SCALED_CASE} AS m1, {_S2_SCALED_CASE} AS m2 FROM b)""",
        """s AS (
  SELECT mtype, step_us,
         CAST(sum(cnt * m1) AS BIGINT) AS s1,
         CAST(sum(cnt * m2) AS BIGINT) AS s2,
         CAST(sum(cnt) AS BIGINT) AS n
  FROM m GROUP BY mtype, step_us
)""",
        """tm AS (
  SELECT mtype, step_us,
         CAST(round(sum(CAST(sample AS DECIMAL(38,9))), 6) AS DOUBLE) AS tsum
  FROM fanned GROUP BY mtype, step_us
)""",
        body="""SELECT s.mtype, s.step_us,
       round(CAST(s2 AS DOUBLE) / (CAST(n AS DOUBLE) * 8192.0)
         - 2.0 * (tsum / CAST(n AS DOUBLE))
               * (CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * 64.0 * sqrt(2.0)))
         + (tsum / CAST(n AS DOUBLE)) * (tsum / CAST(n AS DOUBLE)), 6)
         AS h_stdvar,
       round(sqrt(CAST(s2 AS DOUBLE) / (CAST(n AS DOUBLE) * 8192.0)
         - 2.0 * (tsum / CAST(n AS DOUBLE))
               * (CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * 64.0 * sqrt(2.0)))
         + (tsum / CAST(n AS DOUBLE)) * (tsum / CAST(n AS DOUBLE))), 6)
         AS h_stddev
FROM s JOIN tm ON s.mtype = tm.mtype AND s.step_us = tm.step_us""",
    ),
)
def hist_native_stdvar(spark, sf_dir):
    """histogram_stdvar / histogram_stddev per UPSTREAM Prometheus
    (promql/quantile.go histogramStdDev): bucket mass at the GEOMETRIC
    midpoint sqrt(lower·upper) = 2^(e-1/2), deviations around the
    TRUE mean sum/count.  Expanded as Σcnt·val²/n − 2·mean·Σcnt·val/n
    + mean² over exact integer scaled moments, so both engines run the
    same fixed-order float formula."""
    fanned = _bucket_frames(spark, sf_dir)
    b = fanned.groupBy(
        "mtype", "step_us", F.expr(_bucket_case_sql("sample")).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    m = b.withColumn("m1", F.expr(_S1_SCALED_CASE)).withColumn(
        "m2", F.expr(_S2_SCALED_CASE)
    )
    s = m.groupBy("mtype", "step_us").agg(
        F.sum(F.col("cnt") * F.col("m1")).alias("s1"),
        F.sum(F.col("cnt") * F.col("m2")).alias("s2"),
        F.sum("cnt").alias("n"),
    )
    tm = fanned.groupBy("mtype", "step_us").agg(
        F.round(F.sum(F.col("sample").cast("decimal(38,9)")), 6)
        .cast("double")
        .alias("tsum")
    )
    s = s.join(tm, ["mtype", "step_us"])
    nd = F.col("n").cast("double")
    mean = F.col("tsum") / nd
    ex2 = F.col("s2").cast("double") / (nd * F.lit(8192.0))
    ex = F.col("s1").cast("double") / (nd * F.lit(64.0) * F.sqrt(F.lit(2.0)))
    var = ex2 - F.lit(2.0) * mean * ex + mean * mean
    return s.select(
        "mtype",
        "step_us",
        F.round(var, 6).alias("h_stdvar"),
        F.round(F.sqrt(var), 6).alias("h_stddev"),
    )


_FRAC_LO, _FRAC_HI = 0.5, 8.0


def _covered_sql(x: float) -> str:
    # fraction of each scale-0 bucket (lo_e, hi_e] that lies below x,
    # linear interpolation inside the straddling bucket
    lo = "pow(2.0, bucket - 1)"
    hi = "pow(2.0, bucket)"
    return (
        f"CASE WHEN {x!r} >= {hi} THEN 1.0 WHEN {x!r} <= {lo} THEN 0.0 "
        f"ELSE ({x!r} - {lo}) / ({hi} - {lo}) END"
    )


@register(
    "hist_native_fraction",
    with_ctes(
        *_HIST_CTES,
        body=f"""SELECT mtype, step_us,
       round(sum(cnt * ({_covered_sql(_FRAC_HI)}))
             / sum(cnt)
             - sum(cnt * ({_covered_sql(_FRAC_LO)})) / sum(cnt),
             6) AS h_fraction
FROM b GROUP BY mtype, step_us""",
    ),
)
def hist_native_fraction(spark, sf_dir):
    """histogram_fraction(0.5, 8, v): estimated share of observations
    in [lo, hi] — cumulative bucket mass with linear interpolation
    inside the two straddling buckets (Prometheus histogramFraction)."""
    fanned = _bucket_frames(spark, sf_dir)
    b = fanned.groupBy(
        "mtype", "step_us", F.expr(_bucket_case_sql("sample")).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    frac_hi = F.sum(F.col("cnt") * F.expr(_covered_sql(_FRAC_HI))) / F.sum("cnt")
    frac_lo = F.sum(F.col("cnt") * F.expr(_covered_sql(_FRAC_LO))) / F.sum("cnt")
    return b.groupBy("mtype", "step_us").agg(
        F.round(frac_hi - frac_lo, 6).alias("h_fraction")
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


# range ≫ step at REAL dashboard ratio: 24h trailing window / 30s step
# (ratio 2880) over a 2h evaluation span.  Any fan-out formulation —
# row or prebucketed — replicates its input ×2880 here; the sliding
# bucket-merge keeps fanned volume at series × steps (see
# range_aggregate_sliding).  The oracle restates the same two-phase
# decomposition in ANSI SQL (bucket counts + bounded bucket-range
# join) — the naive row fan-out would be a 10^8-row join in DuckDB.
_R2880_STEP_US = 30_000_000  # 30 s
_R2880_RANGE_US = 86_400_000_000  # 24 h
_R2880_RATIO = _R2880_RANGE_US // _R2880_STEP_US  # 2880
_R2880_START_US = START_US + 2 * 86_400_000_000  # day 3: full lookback in-data
_R2880_END_US = _R2880_START_US + 2 * 3_600_000_000  # 2h of steps
_R2880_NSTEPS = (_R2880_END_US - _R2880_START_US) // _R2880_STEP_US  # 240


@register(
    "logql_count_over_time_ratio2880",
    with_ctes(
        LOGS_CTE,
        f"""b AS (
  SELECT service,
         CAST(ceil((ts_us - {_R2880_START_US}) / {_R2880_STEP_US}) AS BIGINT) AS j,
         count(*) AS n
  FROM logs
  WHERE ts_us > {_R2880_START_US - _R2880_RANGE_US} AND ts_us <= {_R2880_END_US}
  GROUP BY 1, 2
)""",
        f"""sp AS (
  SELECT service, k
  FROM (SELECT DISTINCT service FROM b),
       (SELECT range AS k FROM range(0, {_R2880_NSTEPS + 1}, 1))
)""",
        body=f"""SELECT sp.service,
       CAST({_R2880_START_US} + sp.k * {_R2880_STEP_US} AS BIGINT) AS step_us,
       CAST(sum(b.n) AS DOUBLE) AS value
FROM sp JOIN b
  ON b.service = sp.service
 AND b.j BETWEEN sp.k - {_R2880_RATIO - 1} AND sp.k
GROUP BY 1, 2""",
    ),
)
def logql_count_over_time_ratio2880(spark, sf_dir):
    from ..operators.range_agg import range_aggregate_sliding

    # NOT spread, deliberately (r10 A/B): the prebucket partial agg
    # in the one-file scan stage is 1.4 s single-task, but spreading
    # first multiplies the partial-agg exchange by the task count
    # (each of 32 map tasks emits up to the full service x 2880-bucket
    # group cardinality: measured 1.5 -> 3.6 s).  At production file
    # layouts map tasks parallelize AND partition the input, so the
    # partial-agg-in-scan shape is the one that scales.
    logs = logs_frame(spark, sf_dir)
    samples = logs.select("service", "ts_us", F.lit(1.0).alias("sample"))
    return range_aggregate_sliding(
        samples,
        "count_over_time",
        start_us=_R2880_START_US,
        end_us=_R2880_END_US,
        step_us=_R2880_STEP_US,
        range_us=_R2880_RANGE_US,
        by=["service"],
    )
