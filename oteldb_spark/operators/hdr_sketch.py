"""Mergeable quantile sketch — HdrHistogram-style exponent/mantissa
buckets (Gil Tene's HdrHistogram; same log-bucket idea as DDSketch,
Masson et al. VLDB'19), the Spark-native analog of ClickHouse
``quantileTiming``/``quantilesDD`` the reference leans on for latency
percentiles.

Bucketing is ALL-INTEGER so a DuckDB oracle replays the exact bucket
state: for positive int ``v``, exponent ``e = length(bin(v)) - 1``
(floor log2 via the binary-string length — no float log whose last-ulp
rounding could flip a boundary between engines), sub-bucket = the top
``M_BITS+1`` mantissa bits, bucket id ``(e << 6) | sub``.  Bucket ids
are monotone in ``v``, relative error <= 2^-M_BITS ~ 3%.

Scale shape: bucket counts build map-side — groupBy(by..., bucket) is
one shuffle of at most |groups| * n_buckets rows regardless of input
size; merging shards/partials/groups is a plain count sum, which is
what makes the log-bucket family THE 100 TB percentile structure.
The quantile walk is a window over the tiny merged bucket table; the
rank target ``ceil(p/100 * total)`` is computed in exact integer
arithmetic (``(p*total + 99) div 100``), so no float compare can
wobble the selected bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

M_BITS = 5  # sub-bucket mantissa bits -> 32..63 sub-buckets, ~3% rel. error

# the bucket id packs sub into the low 6 bits ((e << 6) | sub); sub
# reaches 2^(M_BITS+1) - 1, so the packing breaks silently past 5
assert M_BITS <= 5, "bucket packing allots 6 bits to the sub-bucket"


def _bucket_sql(v: str) -> tuple[str, str, str]:
    """(e, sub, bucket) integer expressions — valid in BOTH Spark SQL
    and DuckDB (bin(), >>, <<, div-free)."""
    e = f"(length(bin({v})) - 1)"
    s = f"(CASE WHEN {e} > {M_BITS} THEN {e} - {M_BITS} ELSE 0 END)"
    sub = f"(({v}) >> {s})"
    return e, sub, f"(({e} << 6) | {sub})"


def _rep_sql(bucket: str) -> str:
    """Representative (midpoint) value of a bucket id — exact ints."""
    e = f"({bucket} >> 6)"
    sub = f"({bucket} & 63)"
    s = f"(CASE WHEN {e} > {M_BITS} THEN {e} - {M_BITS} ELSE 0 END)"
    return (
        f"(({sub} << {s}) + (CASE WHEN {s} > 0 THEN (1 << ({s} - 1)) ELSE 0 END))"
    )


def hdr_buckets(df: DataFrame, value_sql: str, by: list[str]) -> DataFrame:
    """(by..., bucket, cnt): mergeable partial sketch.

    ``value_sql`` must produce a positive BIGINT (rows with v <= 0 or
    NULL are dropped, mirroring HdrHistogram's positive domain).
    """
    _, _, bucket = _bucket_sql("v")
    rows = df.select(
        *by, F.expr(value_sql).cast("long").alias("v")
    ).filter(F.col("v") > 0)
    return (
        rows.withColumn("bucket", F.expr(bucket))
        .groupBy(*by, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hdr_quantiles(
    buckets: DataFrame, by: list[str], percents: list[int]
) -> DataFrame:
    """Fold (possibly pre-grouped) bucket counts down to ``by`` and
    read off each integer percentile's representative value.

    The input may carry FINER grouping than ``by`` (e.g. per-shard
    sketches): counts merge by summation before the walk — the whole
    point of the structure.
    """
    merged = buckets.groupBy(*by, "bucket").agg(F.sum("cnt").alias("cnt"))
    w_cum = (
        Window.partitionBy(*by).orderBy("bucket")
        if by
        else Window.orderBy("bucket")
    )
    w_all = Window.partitionBy(*by) if by else Window.partitionBy()
    cum = merged.withColumn(
        "cum", F.sum("cnt").over(w_cum.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("total", F.sum("cnt").over(w_all))
    rep = _rep_sql("bucket")
    out = None
    for p in percents:
        # exact integer rank target: ceil(p*total/100)
        sel = (
            cum.filter(F.col("cum") >= F.expr(f"(({p} * total) + 99) div 100"))
            .groupBy(*by)
            .agg(F.min("bucket").alias("bucket"))
            .withColumn("p", F.lit(p))
            .withColumn("value", F.expr(rep))
            .select(*by, "p", "value")
        )
        out = sel if out is None else out.unionByName(sel)
    return out


def hdr_oracle_ctes(source: str, value_sql: str, by_sql: list[str]) -> str:
    """DuckDB CTEs replaying the bucket build: ``vals`` -> ``bkts``."""
    _, _, bucket = _bucket_sql("v")
    by = ", ".join(by_sql)
    by_sel = f"{by}, " if by else ""
    return f"""vals AS (
  SELECT {by_sel}CAST({value_sql} AS BIGINT) AS v FROM {source}
  WHERE CAST({value_sql} AS BIGINT) > 0
),
bkts AS (
  SELECT {by_sel}{bucket} AS bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM vals GROUP BY {by_sel}{bucket}
)"""
