"""HDR quantile sketch: bucketing exactness + merge associativity.

The 100 TB contract is that per-shard partial sketches merged in ANY
grouping give the same quantiles as one global build — that property,
not the bucket math, is what a rollup tree leans on.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from oteldb_spark.operators.hdr_sketch import (
    M_BITS,
    hdr_buckets,
    hdr_quantiles,
)


def test_bucket_is_floor_log2_exact(spark):
    # exponent from length(bin(v)) must equal floor(log2 v) for awkward
    # values (powers of two, one-off-boundaries, large ints)
    vals = [1, 2, 3, 4, 7, 8, 9, 31, 32, 33, 63, 64, 65, 2**40 - 1, 2**40, 2**40 + 1]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = hdr_buckets(df, "v", []).select("bucket").collect()
    got_es = sorted({r.bucket >> 6 for r in rows})
    want_es = sorted({int(math.floor(math.log2(v))) for v in vals})
    assert got_es == want_es


def test_bucket_rep_relative_error(spark):
    # every value's bucket representative is within 2^-M_BITS relative
    vals = [(v,) for v in range(1, 5000, 7)]
    df = spark.createDataFrame(vals, "v long")
    from oteldb_spark.operators.hdr_sketch import _rep_sql

    rows = (
        hdr_buckets(df.withColumn("orig", F.col("v")), "v", ["orig"])
        .withColumn("rep", F.expr(_rep_sql("bucket")))
        .collect()
    )
    for r in rows:
        assert abs(r.rep - r.orig) <= max(1, r.orig * 2.0**-M_BITS), r


def test_merge_associativity(spark):
    # partials built per (k % 5) shard, merged down, must equal the
    # single global build's quantiles
    vals = [((i * 2654435761) % 100000 + 1, i % 5) for i in range(2000)]
    df = spark.createDataFrame(vals, "v long, shard int")
    direct = hdr_quantiles(hdr_buckets(df, "v", []), [], [50, 95, 99])
    sharded = hdr_quantiles(hdr_buckets(df, "v", ["shard"]), [], [50, 95, 99])
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, sharded.collect())
    )
