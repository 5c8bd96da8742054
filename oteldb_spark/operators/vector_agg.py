"""LogQL/PromQL vector aggregations — per-step regrouping of series.

Reference: ``logqlengine/logqlmetric/vector_agg.go:15-237`` (sum avg
count max min stddev stdvar topk bottomk sort sort_desc) and PromQL's
``group``/``count_values``/``quantile`` aggregations.

Input: a stepped series frame (label cols..., step_us, value).
``by``/``without`` project the label set before grouping
(``logqlabels/aggregated_labels.go``).

topk/bottomk keep per-(step, group) the k most extreme SERIES — in
Spark a rank window (partitioned by step+group, ordered by value) with
``row_number() <= k``; the reference uses a bounded heap per group
(``vector_agg.go:126-196``) which is the same O(n log k) idea executed
by Spark's partial top-k via WindowGroupLimit pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SIMPLE = {
    "sum": lambda v: F.sum(v).cast("double"),
    "avg": lambda v: F.avg(v),
    "count": lambda v: F.count(F.lit(1)).cast("double"),
    "min": lambda v: F.min(v).cast("double"),
    "max": lambda v: F.max(v).cast("double"),
    "stddev": lambda v: F.stddev_pop(v),
    "stdvar": lambda v: F.var_pop(v),
    "group": lambda v: F.lit(1.0),
}


def vector_aggregate(
    stepped: DataFrame,
    op: str,
    *,
    by: list[str],
    value_col: str = "value",
    k: int | None = None,
    q: float | None = None,
    keep_labels: list[str] | None = None,
) -> DataFrame:
    """Aggregate series per step.  Returns (by..., step_us, value) for
    simple ops; topk/bottomk keep the full label set of the survivors.
    """
    v = F.col(value_col)
    if op in SIMPLE:
        return stepped.groupBy(*by, "step_us").agg(SIMPLE[op](v).alias("value"))
    if op == "quantile":
        assert q is not None
        # Prometheus: q < 0 → -Inf, q > 1 → +Inf (quantile.go warns
        # but still returns); Spark's percentile rejects the range
        if q < 0 or q > 1:
            inf = float("-inf") if q < 0 else float("inf")
            return stepped.groupBy(*by, "step_us").agg(
                F.max(F.lit(inf)).alias("value")
            )
        return stepped.groupBy(*by, "step_us").agg(
            F.percentile(v, F.lit(q)).alias("value")
        )
    if op in ("topk", "bottomk"):
        assert k is not None
        # upstream breaks value ties arbitrarily (bounded heap); we
        # refine to a deterministic tie-break on the labels in
        # LEXICOGRAPHIC LABEL-NAME order, matching the referee
        tie = sorted(keep_labels or [])
        order = (
            [v.desc()] + [F.col(c).asc() for c in tie]
            if op == "topk"
            else [v.asc()] + [F.col(c).asc() for c in tie]
        )
        w = Window.partitionBy(*by, "step_us").orderBy(*order)
        return (
            stepped.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )
    raise ValueError(f"unknown vector aggregation {op!r}")
