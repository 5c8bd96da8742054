"""Skew-machinery gate: salted two-phase aggregation over a
deliberately skewed key (one synthetic hot key absorbing ~50% of all
rows) must equal the plain aggregation — oracle-gated, not just
pytest-tested (``operators/skew.py``; AQE covers skewed JOINS, this
covers skewed AGGREGATION reduce keys).

Values aggregate as integer cents so the sums are order-independent
and exact on both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.skew import salted_agg
from ..tables import load
from .registry import register

_ORACLE = """WITH e AS (
  SELECT CASE WHEN event_id % 2 = 0 THEN 'hot' ELSE event_type END AS k,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events
)
SELECT k, CAST(sum(v) AS DOUBLE) AS sum_cents,
       CAST(count(*) AS DOUBLE) AS n
FROM e GROUP BY k"""


@register("skew_salted_agg", _ORACLE)
def skew_salted_agg(spark, sf_dir):
    e = load(spark, sf_dir, "events").select(
        F.when(F.col("event_id") % 2 == 0, F.lit("hot"))
        .otherwise(F.col("event_type"))
        .alias("k"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    sums = salted_agg(e, ["k"], "v", "sum", out_col="sum_cents")
    counts = salted_agg(e, ["k"], "v", "count", out_col="n")
    return sums.join(counts, ["k"])
