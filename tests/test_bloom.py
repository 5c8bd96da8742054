"""Bloom filter operator: no false negatives, bounded bitmap, FP
behavior deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F

from oteldb_spark.operators.bloom import (
    K_HASH,
    N_WORDS,
    bloom_build,
    bloom_contains,
)


def test_no_false_negatives(spark):
    # every inserted key MUST pass membership — the one hard Bloom law
    keys = spark.createDataFrame(
        [(f"key-{i}",) for i in range(500)], "k string"
    )
    bitmap = bloom_build(keys, "k")
    assert len(bitmap) == N_WORDS
    n = keys.filter(bloom_contains(bitmap, "k")).count()
    assert n == 500


def test_false_positive_rate_sane(spark):
    # disjoint probe set: FP rate at this load must stay far below 1
    # (2 hashes, 1000 keys in 2^16 bits -> expected ~0.09% FPs)
    keys = spark.createDataFrame(
        [(f"in-{i}",) for i in range(1000)], "k string"
    )
    bitmap = bloom_build(keys, "k")
    probes = spark.createDataFrame(
        [(f"out-{i}",) for i in range(2000)], "k string"
    )
    fp = probes.filter(bloom_contains(bitmap, "k")).count()
    assert fp < 40, f"false-positive rate off the rails: {fp}/2000"


def test_build_is_deterministic(spark):
    # same keys, any partitioning -> identical bitmap (bit_or is
    # associative/commutative); K_HASH positions per key
    keys = spark.createDataFrame([(f"k{i}",) for i in range(64)], "k string")
    b1 = bloom_build(keys.repartition(7), "k")
    b2 = bloom_build(keys.coalesce(1), "k")
    assert b1 == b2
    assert sum(bin(w & ((1 << 64) - 1)).count("1") for w in b1) <= 64 * K_HASH
