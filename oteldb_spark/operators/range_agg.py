"""LogQL range aggregations (``*_over_time``) as DataFrame plans.

Reference semantics: ``internal/logql/logqlengine/logqlmetric/range_agg.go:39-198``
and ``aggregator.go:16-149``.  Each operator evaluates a trailing
window ``(t - range, t]`` per step and per label group:

  count_over_time   → count(sample)
  rate              → count / range_seconds      (aggregator.go:70-78)
  bytes_over_time   → sum(bytes)
  bytes_rate        → sum(bytes) / range_seconds
  sum/avg/min/max/stdvar/stddev/quantile_over_time → the obvious agg
  first/last_over_time → value at earliest/latest sample
  absent_over_time  → 1 for steps with NO samples (spine anti-join)

Only steps that contain at least one sample produce output (empty
windows emit nothing — matching the reference's step iterator), except
``absent`` which inverts that.

The plan shape is: fanout (narrow generate) → groupBy(step, labels)
(single shuffle, map-side partial aggregation for free).  All
aggregates run JVM-side in whole-stage codegen — no Python in the hot
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .stepfanout import fanout, step_spine

def range_aggregate(
    samples: DataFrame,
    op: str,
    *,
    start_us: int,
    end_us: int,
    step_us: int,
    range_us: int,
    by: list[str],
    value_col: str = "sample",
    ts_col: str = "ts_us",
    ord_col: str | None = None,
    q: float | None = None,
    spark: SparkSession | None = None,
) -> DataFrame:
    """Evaluate one range aggregation; returns (by..., step_us, value).

    ``ord_col`` is a unique tiebreaker for first/last determinism.
    ``q`` is the quantile for quantile_over_time.
    """
    range_s = range_us / 1_000_000.0
    v = F.col(value_col)

    if op == "absent_over_time":
        assert spark is not None, "absent_over_time needs the SparkSession for the spine"
        spine = step_spine(spark, start_us, end_us, step_us)
        present = (
            fanout(samples, start_us, end_us, step_us, range_us, ts_col)
            .select("step_us")
            .distinct()
        )
        return spine.join(present, "step_us", "left_anti").select(
            "step_us", F.lit(1.0).alias("value")
        )

    fanned = fanout(samples, start_us, end_us, step_us, range_us, ts_col)
    grouped = fanned.groupBy(*by, "step_us")

    order = [F.col(ts_col)] + ([F.col(ord_col)] if ord_col else [])
    aggs = {
        "count_over_time": F.count(F.lit(1)).cast("double"),
        "rate": (F.count(F.lit(1)) / F.lit(range_s)).cast("double"),
        "bytes_over_time": F.sum(v).cast("double"),
        "bytes_rate": (F.sum(v) / F.lit(range_s)).cast("double"),
        "sum_over_time": F.sum(v).cast("double"),
        "avg_over_time": F.avg(v),
        "min_over_time": F.min(v).cast("double"),
        "max_over_time": F.max(v).cast("double"),
        "stdvar_over_time": F.var_pop(v),
        "stddev_over_time": F.stddev_pop(v),
        "first_over_time": F.min_by(v, F.struct(*order)).cast("double"),
        "last_over_time": F.max_by(v, F.struct(*order)).cast("double"),
        # Prometheus experimental ts_of_* family (functions.go
        # funcTsOfMaxOverTime/funcTsOfMinOverTime/funcTsOfLastOverTime):
        # the timestamp (float seconds) of the max/min/last sample in
        # the window; ties resolve to the LATEST occurrence (upstream
        # iterates with >= / <=, so later samples win).  NaN samples
        # sort differently in Spark (largest) than Go (skipped) — the
        # synthetic frames carry no NaNs.
        "ts_of_last_over_time": (F.max(F.col(ts_col)) / F.lit(1e6)).cast("double"),
        "ts_of_max_over_time": (
            F.max_by(F.col(ts_col), F.struct(v, F.col(ts_col))) / F.lit(1e6)
        ).cast("double"),
        "ts_of_min_over_time": (
            F.max_by(F.col(ts_col), F.struct((v * F.lit(-1.0)).alias("nv"), F.col(ts_col)))
            / F.lit(1e6)
        ).cast("double"),
    }
    if op == "quantile_over_time":
        assert q is not None
        if q < 0 or q > 1:
            # Prometheus: out-of-range q → ±Inf per window
            agg = F.max(F.lit(float("-inf") if q < 0 else float("inf")))
        else:
            agg = F.percentile(v, F.lit(q))
    else:
        agg = aggs[op]
    return grouped.agg(agg.alias("value"))


DECOMPOSABLE = {
    "count_over_time": (F.count, F.sum),
    "sum_over_time": (F.sum, F.sum),
    "min_over_time": (F.min, F.min),
    "max_over_time": (F.max, F.max),
    "bytes_over_time": (F.sum, F.sum),
}


def range_aggregate_prebucketed(
    samples: DataFrame,
    op: str,
    *,
    start_us: int,
    end_us: int,
    step_us: int,
    range_us: int,
    by: list[str],
    value_col: str = "sample",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Two-phase range aggregation for decomposable ops when
    range ≫ step: partial-aggregate per (series, step bucket), then
    fan the BUCKETS out — input to the fan-out shrinks from O(points)
    to O(series × buckets).  Mirrors the reference's sampled-points
    offload (querier_metrics.go:745-843)."""
    from .stepfanout import prebucket

    partial_fn, merge_fn = DECOMPOSABLE[op]
    arg = F.lit(1) if op == "count_over_time" else F.col(value_col)
    buckets = prebucket(
        samples,
        start_us,
        step_us,
        by,
        [partial_fn(arg).alias("__partial")],
        ts_col=ts_col,
    )
    # bucket j's first containing step is j; reuse the row fan-out with
    # the bucket's anchor timestamp
    anchored = buckets.withColumn(
        "ts_us", (F.lit(start_us) + F.col("__bucket") * F.lit(step_us)).cast("long")
    )
    fanned = fanout(anchored, start_us, end_us, step_us, range_us, "ts_us")
    return fanned.groupBy(*by, "step_us").agg(
        merge_fn("__partial").cast("double").alias("value")
    )


# --- DuckDB oracle fragments -------------------------------------------------

ORACLE_AGG_SQL = {
    "count_over_time": "CAST(count(*) AS DOUBLE)",
    "rate": "CAST(count(*) AS DOUBLE) / {range_s}",
    "bytes_over_time": "CAST(sum({v}) AS DOUBLE)",
    "bytes_rate": "CAST(sum({v}) AS DOUBLE) / {range_s}",
    "sum_over_time": "CAST(sum({v}) AS DOUBLE)",
    "avg_over_time": "avg({v})",
    "min_over_time": "CAST(min({v}) AS DOUBLE)",
    "max_over_time": "CAST(max({v}) AS DOUBLE)",
    "stdvar_over_time": "var_pop({v})",
    "stddev_over_time": "stddev_pop({v})",
    "quantile_over_time": "quantile_cont({v}, {q})",
    "first_over_time": "CAST(arg_min({v}, {ord}) AS DOUBLE)",
    "last_over_time": "CAST(arg_max({v}, {ord}) AS DOUBLE)",
    # {ord} must be the µs timestamp column for the ts_of_* family
    "ts_of_last_over_time": "CAST(max({ord}) AS DOUBLE) / 1e6",
    "ts_of_max_over_time": (
        "CAST(max({{'v': {v}, 'ts': {ord}}}).ts AS DOUBLE) / 1e6"
    ),
    "ts_of_min_over_time": (
        "CAST(max({{'v': -({v}), 'ts': {ord}}}).ts AS DOUBLE) / 1e6"
    ),
}
