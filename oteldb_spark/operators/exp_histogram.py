"""Arbitrary-scale exponential-histogram decode (reference
``chstorage/querier_metrics.go:1365-1470``, ``columns_metrics.go:
181-230``).

OTel exponential histograms carry bucket COUNT ARRAYS plus a
``scale``: at scale s the bucket with index i covers
``(base^i, base^(i+1)]`` with ``base = 2^(2^-s)`` — real SDKs emit
scale 3..8 by default, so a scale-0-only model silently mis-buckets
production data.  The decode is pure column arithmetic:
``bound(i) = 2^(i * 2^-s)`` via one ``pow`` per exploded bucket —
no UDFs, fully whole-stage-codegen, and the explode fans out only
(series × occupied buckets), not samples.

Quantile/fraction follow the Prometheus native-histogram estimators
(promql/quantile.go): find the straddling bucket by cumulative count,
interpolate linearly inside it.  The zero bucket (|v| ≤
zero_threshold) sorts below every positive bucket.

Two bucket domains: ``explode_exp_buckets``/``exp_histogram_quantile``
serve the positive+zero domain (the common metrics case);
``explode_exp_buckets_signed``/``exp_histogram_quantile_signed``
additionally decode the NEGATIVE bucket array (mirrored bounds
[-base^(i+1), -base^i)) with the zero bucket as a zero-width row, so
one ascending value-space sweep covers the full signed domain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exp_bound(index: Column, scale: Column) -> Column:
    """Lower bound of bucket ``index`` at ``scale``: 2^(index·2^-scale).
    (The bucket covers (bound(i), bound(i+1)].)"""
    return F.pow(F.lit(2.0), index.cast("double") * F.pow(F.lit(2.0), -scale.cast("double")))


def explode_exp_buckets(state: DataFrame, by: list[str]) -> DataFrame:
    """Native-state rows (scale, zero_count, positive_offset,
    positive_counts) → one row per OCCUPIED positive bucket with its
    absolute index and value-space bounds.

    Output: by..., scale, zero_count, idx, cnt, lower, upper.
    """
    e = state.select(
        *by,
        "scale",
        "zero_count",
        F.posexplode("positive_counts").alias("pos", "cnt"),
        F.col("positive_offset").alias("off"),
    ).filter(F.col("cnt") > 0)
    idx = (F.col("off") + F.col("pos")).alias("idx")
    e = e.select(*by, "scale", "zero_count", idx, "cnt")
    return e.select(
        *by,
        "scale",
        "zero_count",
        "idx",
        "cnt",
        exp_bound(F.col("idx"), F.col("scale")).alias("lower"),
        exp_bound(F.col("idx") + 1, F.col("scale")).alias("upper"),
    )


def explode_exp_buckets_signed(state: DataFrame, by: list[str]) -> DataFrame:
    """Native-state rows → one row per occupied bucket of EITHER sign
    plus the zero bucket, with value-space bounds.

    Negative bucket i covers ``[-base^(i+1), -base^i)`` — the mirror
    of the positive bucket — and the zero bucket materializes as a
    zero-width row at 0, so a single ascending sweep over ``lower``
    visits negatives, zero, then positives (how the upstream
    native-histogram iterator orders AllBucketIterator).

    Output: by..., idx (sign-qualified: negatives get -(i+1) so the
    column stays unique per group), cnt, lower, upper.
    """
    pos = (
        state.select(
            *by,
            "scale",
            F.posexplode("positive_counts").alias("pos", "cnt"),
            F.col("positive_offset").alias("off"),
        )
        .filter(F.col("cnt") > 0)
        .select(
            *by,
            (F.col("off") + F.col("pos")).alias("i"),
            "scale",
            "cnt",
        )
        .select(
            *by,
            F.col("i").alias("idx"),
            "cnt",
            exp_bound(F.col("i"), F.col("scale")).alias("lower"),
            exp_bound(F.col("i") + 1, F.col("scale")).alias("upper"),
        )
    )
    neg = (
        state.select(
            *by,
            "scale",
            F.posexplode("negative_counts").alias("pos", "cnt"),
            F.col("negative_offset").alias("off"),
        )
        .filter(F.col("cnt") > 0)
        .select(
            *by,
            (F.col("off") + F.col("pos")).alias("i"),
            "scale",
            "cnt",
        )
        .select(
            *by,
            (-(F.col("i") + 1)).alias("idx"),
            "cnt",
            (-exp_bound(F.col("i") + 1, F.col("scale"))).alias("lower"),
            (-exp_bound(F.col("i"), F.col("scale"))).alias("upper"),
        )
    )
    zero = (
        state.filter(F.col("zero_count") > 0)
        .select(
            *by,
            F.lit(0).alias("idx"),
            F.col("zero_count").alias("cnt"),
            F.lit(0.0).alias("lower"),
            F.lit(0.0).alias("upper"),
        )
        # several state rows per group would double the zero bucket —
        # the caller groups by series identity, one state each, but
        # keep the sum defensive
        .groupBy(*by, "idx", "lower", "upper")
        .agg(F.sum("cnt").alias("cnt"))
        .select(*by, "idx", "cnt", "lower", "upper")
    )
    return pos.unionByName(neg).unionByName(zero)


def exp_histogram_quantile_signed(
    buckets: DataFrame, q: float, by: list[str]
) -> DataFrame:
    """Quantile over the SIGNED bucket set (explode_exp_buckets_signed
    output): one ascending cumulative sweep over value-space bounds;
    ranks landing in the zero-width zero bucket yield exactly 0.0."""
    w = Window.partitionBy(*by).orderBy("lower")
    wt = Window.partitionBy(*by)
    c = buckets.select(
        *by,
        "lower",
        "upper",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wt).alias("total"),
    )
    rank = F.lit(q) * F.col("total")
    straddle = (
        c.filter(F.col("cum") >= rank)
        .groupBy(*by)
        .agg(
            F.min_by(
                F.struct("lower", "upper", "cnt", "cum", "total"),
                F.col("lower"),
            ).alias("s")
        )
    )
    s = F.col("s")
    est = s["lower"] + (s["upper"] - s["lower"]) * (
        (F.lit(q) * s["total"] - (s["cum"] - s["cnt"])) / s["cnt"]
    )
    est = F.greatest(s["lower"], F.least(s["upper"], est))
    return straddle.select(*by, est.alias("value"))


def exp_histogram_quantile(
    buckets: DataFrame, q: float, by: list[str]
) -> DataFrame:
    """Prometheus-style native-histogram quantile over exploded
    buckets: rank = q·total (zero bucket first), straddling bucket by
    cumulative count, linear interpolation inside it.

    Input must be ``explode_exp_buckets`` output; one result row per
    ``by`` group with column ``value``.
    """
    w = Window.partitionBy(*by).orderBy("idx")
    wt = Window.partitionBy(*by)
    c = buckets.select(
        *by,
        "idx",
        "cnt",
        "lower",
        "upper",
        (F.col("zero_count") + F.sum("cnt").over(w)).alias("cum"),
        (F.col("zero_count") + F.sum("cnt").over(wt)).alias("total"),
    )
    rank = F.lit(q) * F.col("total")
    # first bucket whose cumulative count reaches the rank; ranks that
    # land inside the zero bucket yield 0.0 (no positive bucket below)
    straddle = (
        c.filter(F.col("cum") >= rank)
        .groupBy(*by)
        .agg(
            F.min_by(
                F.struct("lower", "upper", "cnt", "cum", "total"), F.col("idx")
            ).alias("s")
        )
    )
    s = F.col("s")
    est = s["lower"] + (s["upper"] - s["lower"]) * (
        (F.lit(q) * s["total"] - (s["cum"] - s["cnt"])) / s["cnt"]
    )
    # clamp into the bucket: a rank below the bucket (swallowed by the
    # zero bucket) keeps the math inside [lower, upper]
    est = F.greatest(s["lower"], F.least(s["upper"], est))
    return straddle.select(*by, est.alias("value"))


def exp_histogram_stdvar_signed(
    buckets: DataFrame, state: DataFrame, by: list[str]
) -> DataFrame:
    """UPSTREAM Prometheus native-histogram stdvar/stddev over signed
    buckets at any scale (promql/functions.go funcHistogramStdDev /
    funcHistogramStdVar): bucket mass sits at the geometric midpoint
    ±sqrt(upper·lower) — exactly 0 for any bucket spanning zero — and
    deviations are taken around the TRUE mean sum/count from the state
    row (zero-bucket counts included in the denominator).

    ``buckets`` is ``explode_exp_buckets_signed`` output; ``state``
    carries the (by..., count, sum) native rows."""
    val = F.when(
        (F.col("lower") <= 0) & (F.col("upper") >= 0), F.lit(0.0)
    ).otherwise(F.signum("upper") * F.sqrt(F.col("upper") * F.col("lower")))
    means = state.select(
        *by,
        (F.col("sum") / F.col("count")).alias("__mean"),
        F.col("count").cast("double").alias("__n"),
    )
    dev = val - F.col("__mean")
    return (
        buckets.join(F.broadcast(means), by)
        .groupBy(*by)
        .agg(
            (F.sum(F.col("cnt") * dev * dev) / F.any_value("__n")).alias(
                "h_stdvar"
            )
        )
        .withColumn("h_stddev", F.sqrt("h_stdvar"))
    )


def exp_histogram_fraction(
    buckets: DataFrame, lo: float, hi: float, by: list[str]
) -> DataFrame:
    """Estimated fraction of observations with value in [lo, hi]
    (histogramFraction): full buckets count whole, the straddling
    buckets contribute linearly."""

    def covered(x: float) -> Column:
        return (
            F.when(F.lit(x) >= F.col("upper"), 1.0)
            .when(F.lit(x) <= F.col("lower"), 0.0)
            .otherwise(
                (F.lit(x) - F.col("lower")) / (F.col("upper") - F.col("lower"))
            )
        )

    g = buckets.groupBy(*by).agg(
        (
            (
                F.sum(F.col("cnt") * covered(hi))
                - F.sum(F.col("cnt") * covered(lo))
            )
            / (F.first("zero_count") + F.sum("cnt"))
        ).alias("value")
    )
    return g
