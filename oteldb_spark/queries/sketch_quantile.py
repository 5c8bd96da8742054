"""Driver-gated mergeable quantile sketch (HdrHistogram-style log
buckets — see operators/hdr_sketch.py).  The Spark-native analog of
the reference's ClickHouse quantile-sketch aggregates
(quantileTiming / quantilesDD in its materialized stats views).

Both gates run on lineitem prices in exact integer cents
(``floor(price*100 + 0.5)`` — IEEE double multiply+floor, identical
in Spark and DuckDB, unlike round() whose tie-breaking differs).
"""

from __future__ import annotations

from ..operators.hdr_sketch import (
    _rep_sql,
    hdr_buckets,
    hdr_oracle_ctes,
    hdr_quantiles,
)
from ..tables import load
from .registry import register

from pyspark.sql import functions as F

_CENTS = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"


# Partial sketch state itself: per-flag bucket counts.  The gate pins
# the WHOLE sketch byte-for-byte (every bucket, every count), not a
# summary — the determinism contract that makes shard merges safe.
@register(
    "sketch_hdr_buckets",
    f"""WITH {hdr_oracle_ctes("lineitem", _CENTS, ["l_returnflag"])}
SELECT l_returnflag, CAST(bucket AS BIGINT) AS bucket, cnt FROM bkts""",
)
def sketch_hdr_buckets(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    out = hdr_buckets(li, _CENTS, ["l_returnflag"])
    return out.select(
        "l_returnflag",
        F.col("bucket").cast("long").alias("bucket"),
        F.col("cnt").cast("long").alias("cnt"),
    )


# p50/p95/p99 per return flag, read from sketches built at FINER
# grouping (flag x linestatus) and merged down by count summation —
# the shard-merge path a 1000-executor rollup would take.
@register(
    "sketch_hdr_quantiles",
    f"""WITH {hdr_oracle_ctes("lineitem", _CENTS, ["l_returnflag", "l_linestatus"])},
merged AS (
  SELECT l_returnflag, bucket, sum(cnt) AS cnt
  FROM bkts GROUP BY l_returnflag, bucket
),
cum AS (
  SELECT l_returnflag, bucket,
         sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bucket) AS cum,
         sum(cnt) OVER (PARTITION BY l_returnflag) AS total
  FROM merged
),
hit AS (
  SELECT l_returnflag, p, min(bucket) AS bucket
  FROM cum CROSS JOIN (VALUES (50), (95), (99)) AS q(p)
  WHERE cum >= ((p * total) + 99) // 100
  GROUP BY l_returnflag, p
)
SELECT l_returnflag, CAST(p AS BIGINT) AS p,
       CAST({_rep_sql("bucket")} AS BIGINT) AS value
FROM hit""",
)
def sketch_hdr_quantiles(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    parts = hdr_buckets(li, _CENTS, ["l_returnflag", "l_linestatus"])
    out = hdr_quantiles(parts, ["l_returnflag"], [50, 95, 99])
    return out.select(
        "l_returnflag",
        F.col("p").cast("long").alias("p"),
        F.col("value").cast("long").alias("value"),
    )


# The observability headline for the sketch: per-service latency
# p50/p95/p99 over span durations (already integer micros), read from
# HDR bucket partials — what a 1000-executor span store would serve
# its latency panels from.  Groups merge from per-(service, kind)
# partials to show the rollup path.
def _spans_latency_oracle() -> str:
    from ..operators.hdr_sketch import _bucket_sql, _rep_sql
    from ..signals import SPANS_CTE

    _, _, bucket = _bucket_sql("duration_us")
    return f"""WITH {SPANS_CTE},
bkts AS (
  SELECT service, kind, {bucket} AS bucket, count(*) AS cnt
  FROM spans WHERE duration_us > 0
  GROUP BY service, kind, {bucket}
),
merged AS (
  SELECT service, bucket, sum(cnt) AS cnt FROM bkts
  GROUP BY service, bucket
),
cum AS (
  SELECT service, bucket,
         sum(cnt) OVER (PARTITION BY service ORDER BY bucket) AS cum,
         sum(cnt) OVER (PARTITION BY service) AS total
  FROM merged
),
hit AS (
  SELECT service, p, min(bucket) AS bucket
  FROM cum CROSS JOIN (VALUES (50), (95), (99)) AS q(p)
  WHERE cum >= ((p * total) + 99) // 100
  GROUP BY service, p
)
SELECT service, CAST(p AS BIGINT) AS p,
       CAST({_rep_sql("bucket")} AS BIGINT) AS latency_us
FROM hit"""


@register("spans_latency_hdr", _spans_latency_oracle())
def spans_latency_hdr(spark, sf_dir):
    from ..signals import spans_frame

    spans = spans_frame(spark, sf_dir)
    parts = hdr_buckets(spans, "duration_us", ["service", "kind"])
    out = hdr_quantiles(parts, ["service"], [50, 95, 99])
    return out.select(
        "service",
        F.col("p").cast("long").alias("p"),
        F.col("value").cast("long").alias("latency_us"),
    )
