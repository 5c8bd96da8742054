"""Step fan-out — the shared machinery behind every ``*_over_time``.

LogQL/PromQL range queries evaluate a trailing window ``(t - range, t]``
at every step ``t = start + k*step``.  The reference offloads this to
ClickHouse with a fan-out CTE (``chstorage/chsql_stepfanout.go:1-140``);
the idiomatic Spark equivalent maps **each sample row to the bounded
set of steps whose window contains it** via ``explode(sequence(...))``
— never a cross join:

    k_min = ceil((ts - start) / step)         # first step with ts <= t_k
    k_max = ceil((ts + range - start)/step)-1 # last step with t_k < ts+range

Each row is replicated at most ``ceil(range/step)`` times, the join is
embarrassingly parallel (no shuffle — it's a generate), and the
subsequent ``groupBy(step, series)`` aggregation is the only shuffle.
At 100 TB the fan-out factor is the knob: when ``range >> step`` and
the aggregate is decomposable, pre-aggregate per step bucket *before*
fanning out (mirroring the reference's sampled-points offload,
``querier_metrics.go:745-843``) — see ``prebucket``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def fanout(
    samples: DataFrame,
    start_us: int,
    end_us: int,
    step_us: int,
    range_us: int,
    ts_col: str = "ts_us",
) -> DataFrame:
    """Replicate each sample to every step whose trailing window
    ``(step - range, step]`` contains it.  Adds a ``step_us`` column.
    """
    n_steps = (end_us - start_us) // step_us  # steps are start + k*step, k in [0, n]
    ts = F.col(ts_col)
    k_min = F.greatest(
        F.lit(0), F.ceil((ts - F.lit(start_us)) / F.lit(step_us)).cast("long")
    )
    # last k with  start + k*step  <  ts + range   (window is left-open)
    k_max = F.least(
        F.lit(n_steps),
        (F.ceil((ts + F.lit(range_us) - F.lit(start_us)) / F.lit(step_us)) - 1).cast(
            "long"
        ),
    )
    # sequence(a, b) DESCENDS when a > b — samples outside every
    # window (e.g. offset-shifted past the end) must yield no steps
    ks = F.when(k_min <= k_max, F.sequence(k_min, k_max)).otherwise(
        F.array().cast("array<long>")
    )
    out = samples.withColumn("__k", F.explode(ks))
    return out.withColumn(
        "step_us", (F.lit(start_us) + F.col("__k") * F.lit(step_us)).cast("long")
    ).drop("__k")


def step_spine(
    spark: SparkSession, start_us: int, end_us: int, step_us: int
) -> DataFrame:
    """All evaluation steps as a one-column DataFrame (``step_us``).

    Used by ``absent_over_time`` (anti-join) and ``vector()`` literals.
    """
    return spark.range(0, (end_us - start_us) // step_us + 1).select(
        (F.lit(start_us) + F.col("id") * F.lit(step_us)).cast("long").alias("step_us")
    )


def spine_sql(start_us: int, end_us: int, step_us: int) -> str:
    """DuckDB oracle equivalent of ``step_spine`` (inclusive end)."""
    return (
        f"(SELECT range AS step_us FROM range({start_us}, {end_us + 1}, {step_us}))"
    )


def fanout_join_sql(
    source: str,
    start_us: int,
    end_us: int,
    step_us: int,
    range_us: int,
    ts_col: str = "ts_us",
) -> str:
    """DuckDB oracle: spine range-join formulation of the fan-out.

    The oracle favors clarity over scale (sf0.01 inputs); the Spark
    side uses the explode formulation above.  Semantics are identical:
    sample matches step iff  step - range < ts <= step.
    """
    spine = spine_sql(start_us, end_us, step_us)
    return (
        f"(SELECT s.*, t.step_us FROM {source} s JOIN {spine} t"
        f" ON s.{ts_col} > t.step_us - {range_us} AND s.{ts_col} <= t.step_us)"
    )


def prebucket(
    samples: DataFrame,
    start_us: int,
    step_us: int,
    group_cols: list[str],
    aggs: list[Column],
    ts_col: str = "ts_us",
) -> DataFrame:
    """Pre-aggregate samples into step-aligned buckets before fan-out.

    For decomposable aggregates (sum/count/min/max) with range >> step,
    aggregate once per (series, step-bucket) and fan the *buckets* out
    instead of the raw rows — fan-out input shrinks from O(points) to
    O(series × buckets).  Mirrors the reference's sampled-points
    offload (``querier_metrics.go:745-843``).
    """
    # Left-open bucketing: bucket j holds ts in (start+(j-1)*step,
    # start+j*step], i.e. exactly the rows whose first containing step
    # is j — keeps bucket fan-out aligned with the (t-range, t] window.
    bucket = (
        F.ceil((F.col(ts_col) - F.lit(start_us)) / F.lit(step_us))
        .cast("long")
        .alias("__bucket")
    )
    return samples.groupBy(*group_cols, bucket).agg(*aggs)
