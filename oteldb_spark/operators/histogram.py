"""Native-histogram decode + function family over scale-0 exponential
buckets.

The reference stores OTel exponential histograms as bucket-array state
and decodes to Prometheus native histograms at query time
(``chstorage/columns_metrics.go:181-230``); here the observation
stream bucketizes at scale 0 — bucket e holds values in
(2^(e-1), 2^e] — with an exact CASE ladder (no libm in gated paths).

Numeric policy (hash-stable vs a DuckDB oracle):
* count is exact; sum accumulates in DECIMAL (exact in any order);
* stddev/stdvar moments use 2^8-scaled INTEGER midpoints so both
  engines sum exact BIGINTs, with one final IEEE divide/subtract;
* fraction/quantile interpolate with dyadic bucket bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXPONENTS = list(range(-6, 10))  # value range ~0.01 .. 490


def bucket_case_sql(col: str) -> str:
    parts = []
    for e in EXPONENTS:
        parts.append(f"WHEN {col} <= {float(2.0 ** e)!r} THEN {e}")
    return "CASE " + " ".join(parts) + f" ELSE {EXPONENTS[-1] + 1} END"


# Prometheus histogramStdDev (promql/quantile.go) places bucket mass
# at the GEOMETRIC midpoint sqrt(lower·upper) = 2^(e-1/2) and takes
# deviations around the TRUE mean sum/count.  Scaled moments are exact
# integers:  Σcnt·val = s1·2^-6/√2 with s1 = Σcnt·2^(e+6);
#            Σcnt·val² = s2·2^-13  with s2 = Σcnt·2^(2e+12).
def s1_scaled_case_sql() -> str:
    return (
        "CASE "
        + " ".join(
            f"WHEN bucket = {e} THEN CAST({2 ** (e + 6)} AS BIGINT)"
            for e in range(EXPONENTS[0], EXPONENTS[-1] + 2)
        )
        + " END"
    )


def s2_scaled_case_sql() -> str:
    return (
        "CASE "
        + " ".join(
            f"WHEN bucket = {e} THEN CAST({2 ** (2 * e + 12)} AS BIGINT)"
            for e in range(EXPONENTS[0], EXPONENTS[-1] + 2)
        )
        + " END"
    )


def covered_sql(x: float) -> str:
    """Share of scale-0 bucket (2^(b-1), 2^b] below ``x`` — linear
    interpolation inside the straddling bucket."""
    lo = "pow(2.0, bucket - 1)"
    hi = "pow(2.0, bucket)"
    return (
        f"CASE WHEN {x!r} >= {hi} THEN 1.0 WHEN {x!r} <= {lo} THEN 0.0 "
        f"ELSE ({x!r} - {lo}) / ({hi} - {lo}) END"
    )


def bucket_counts(
    fanned: DataFrame, keys: list[str], sample_col: str = "sample"
) -> DataFrame:
    """(keys..., bucket, cnt) per step window."""
    bucket = F.expr(bucket_case_sql(sample_col)).alias("bucket")
    return fanned.groupBy(*keys, bucket).agg(F.count(F.lit(1)).alias("cnt"))


def hist_count_sum_avg(
    fanned: DataFrame, keys: list[str], sample_col: str = "sample"
) -> DataFrame:
    """(keys..., h_count, h_sum, h_avg) — the exact stored-state
    fields of the histogram."""
    sum_dec = F.round(
        F.sum(F.col(sample_col).cast("decimal(38,9)")), 6
    ).cast("double")
    return fanned.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("double").alias("h_count"),
        sum_dec.alias("h_sum"),
        (sum_dec / F.count(F.lit(1))).alias("h_avg"),
    )


def hist_stdvar(
    buckets: DataFrame,
    keys: list[str],
    fanned: DataFrame | None = None,
    sample_col: str = "sample",
) -> DataFrame:
    """(keys..., h_stdvar, h_stddev) per UPSTREAM Prometheus
    (promql/quantile.go histogramStdDev): geometric-midpoint bucket
    mass, deviations around the true mean sum/count.  ``fanned``
    supplies the raw samples for the exact stored sum; expanded as
    Σcnt·val²/n − 2·mean·Σcnt·val/n + mean² over exact integer scaled
    moments so both engines run one fixed-order float formula."""
    m = buckets.withColumn("m1", F.expr(s1_scaled_case_sql())).withColumn(
        "m2", F.expr(s2_scaled_case_sql())
    )
    s = m.groupBy(*keys).agg(
        F.sum(F.col("cnt") * F.col("m1")).alias("s1"),
        F.sum(F.col("cnt") * F.col("m2")).alias("s2"),
        F.sum("cnt").alias("n"),
    )
    if fanned is None:
        raise ValueError("hist_stdvar needs the fanned samples for the true sum")
    tm = fanned.groupBy(*keys).agg(
        F.round(F.sum(F.col(sample_col).cast("decimal(38,9)")), 6)
        .cast("double")
        .alias("__tsum")
    )
    s = s.join(tm, keys)
    nd = F.col("n").cast("double")
    mean = F.col("__tsum") / nd
    ex2 = F.col("s2").cast("double") / (nd * F.lit(8192.0))
    ex = F.col("s1").cast("double") / (nd * F.lit(64.0) * F.sqrt(F.lit(2.0)))
    var = ex2 - F.lit(2.0) * mean * ex + mean * mean
    return s.select(
        *keys, var.alias("h_stdvar"), F.sqrt(var).alias("h_stddev")
    )


def hist_fraction(
    buckets: DataFrame, keys: list[str], lo: float, hi: float
) -> DataFrame:
    """(keys..., h_fraction) — estimated share of observations in
    [lo, hi] (Prometheus histogramFraction)."""
    fr_hi = F.sum(F.col("cnt") * F.expr(covered_sql(hi))) / F.sum("cnt")
    fr_lo = F.sum(F.col("cnt") * F.expr(covered_sql(lo))) / F.sum("cnt")
    return buckets.groupBy(*keys).agg(
        F.round(fr_hi - fr_lo, 6).alias("h_fraction")
    )


def hist_quantile(buckets: DataFrame, keys: list[str], q: float) -> DataFrame:
    """(keys..., value) — native-histogram quantile: the upper bound
    2^b of the first bucket whose cumulative count crosses rank
    q·total (exp_histogram_p90 generalized)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy("bucket")
    wt = Window.partitionBy(*keys)
    c = buckets.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "total", F.sum("cnt").over(wt)
    )
    return (
        c.filter(F.col("cum") >= F.lit(q) * F.col("total"))
        .groupBy(*keys)
        .agg(F.pow(F.lit(2.0), F.min("bucket")).cast("double").alias("value"))
    )
