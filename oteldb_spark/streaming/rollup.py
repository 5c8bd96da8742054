"""Streaming pre-aggregation rollups — tumbling-window counts/sums per
series maintained incrementally.

The batch engine's sampled-points offload (prebucketed range aggs)
reads per-step pre-aggregates; this job MAINTAINS those aggregates
from the live stream: watermarked tumbling windows, append-mode output
to a rollup table that ``range_aggregate_prebucketed`` can fan out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_rollup(
    events: DataFrame,
    *,
    keys: list[str],
    value_col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "event_time",
) -> DataFrame:
    """Streaming tumbling-window rollup: (keys..., window_start,
    n, total, vmin, vmax) in append mode once the watermark passes."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*keys, F.window(ts_col, window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("total"),
            F.min(value_col).alias("vmin"),
            F.max(value_col).alias("vmax"),
        )
        .select(*keys, F.col("w.start").alias("window_start"), "n", "total", "vmin", "vmax")
    )


def windowed_hll_registers(
    events: DataFrame,
    *,
    key: str,
    by: list[str],
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "event_time",
) -> DataFrame:
    """Streaming distinct-count sketch maintenance: per tumbling
    window, the HLL register state (by..., window_start, bucket,
    rank).  ``max(rank)`` is monotone so registers merge exactly in
    incremental state — the streaming form of the batch
    ``operators/hll.py`` build; fold with ``hll_estimate`` downstream.
    """
    from ..operators.hll import M, _h60

    h = F.expr(_h60(key))
    w_rem = F.expr(f"{_h60(key)} div {M}")
    rank = (
        F.when(w_rem == 0, F.lit(53))
        .otherwise(F.lit(53) - F.length(F.expr(f"bin({_h60(key)} div {M})")))
        .cast("int")
    )
    return (
        events.withWatermark(ts_col, watermark)
        .withColumn("bucket", (h % M).cast("int"))
        .withColumn("rank", rank)
        .groupBy(*by, F.window(ts_col, window).alias("w"), "bucket")
        .agg(F.max("rank").alias("rank"))
        .select(
            *by, F.col("w.start").alias("window_start"), "bucket", "rank"
        )
    )


def windowed_hdr_buckets(
    events: DataFrame,
    *,
    value_sql: str,
    by: list[str],
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "event_time",
) -> DataFrame:
    """Streaming quantile-sketch maintenance: per tumbling window, the
    HDR bucket state (by..., window_start, bucket, cnt).  Bucket
    counts are plain sums — associative, so incremental state merges
    exactly; the streaming form of ``operators/hdr_sketch.py``, folded
    with ``hdr_quantiles`` downstream."""
    from ..operators.hdr_sketch import _bucket_sql

    _, _, bucket = _bucket_sql("v")
    return (
        events.withWatermark(ts_col, watermark)
        .withColumn("v", F.expr(value_sql).cast("long"))
        .filter(F.col("v") > 0)
        .withColumn("bucket", F.expr(bucket))
        .groupBy(*by, F.window(ts_col, window).alias("w"), "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            *by, F.col("w.start").alias("window_start"), "bucket", "cnt"
        )
    )
