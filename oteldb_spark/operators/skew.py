"""Skew-aware aggregation — salting for hot keys.

AQE's skew-join splitting covers joins; for *aggregations* over a
skewed key (one service emitting 50% of all logs, one trace with 10⁶
spans) the classic remedy is two-phase salted aggregation:

    phase 1: groupBy(key, salt) partial aggregate   (spreads the hot key)
    phase 2: groupBy(key) merge of partials

``salted_agg`` implements it for decomposable aggregates.  Spark's
hash aggregation already does map-side partial combine, which handles
most skew; salting matters when the *reduce* side of one key exceeds
an executor (extreme cardinality-1 hot keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERGE = {
    "sum": F.sum,
    "count": F.sum,  # partial counts merge by summing
    "min": F.min,
    "max": F.max,
}
PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(F.lit(1)),
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    op: str,
    n_salts: int = 16,
    out_col: str = "value",
) -> DataFrame:
    """Two-phase aggregation with an explicit salt column."""
    salted = df.withColumn("__salt", (F.rand(seed=7) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        PARTIAL[op](F.col(value_col)).alias("__partial")
    )
    return partial.groupBy(*keys).agg(
        MERGE[op](F.col("__partial")).cast("double").alias(out_col)
    )
