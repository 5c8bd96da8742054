"""pin/release_pins/repin lifecycle: weak registration must not keep
DataFrames (or their session) alive, while live pins still release and
revive correctly."""

from __future__ import annotations

import gc

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from oteldb_spark.operators import pin as pinmod
from oteldb_spark.operators.pin import pin, release_pins, repin


def _cached(df) -> bool:
    lvl = df.storageLevel
    return lvl.useMemory or lvl.useDisk


def test_release_pins_unpersists_live_frames(spark):
    release_pins()  # drain anything earlier tests left behind
    df = pin(spark.range(100).withColumn("v", F.col("id") * 2))
    df.count()
    assert _cached(df)
    n = release_pins()
    assert n >= 1
    assert not _cached(df)
    assert pinmod._LIVE_PINS == []


def test_collected_wrapper_does_not_block_release(spark):
    """A pinned wrapper that was GC'd before release must not error the
    release pass or be retained by the registry (weakref semantics) —
    the paired catalog.clearCache() sweeps its JVM blocks."""
    release_pins()
    df = pin(spark.range(50).withColumn("v", F.col("id") + 1))
    df.count()
    ref = pinmod._LIVE_PINS[-1]
    del df
    gc.collect()
    assert ref() is None, "weakref should not keep the wrapper alive"
    release_pins()  # must not raise on the dead ref
    spark.catalog.clearCache()
    assert pinmod._LIVE_PINS == []


def test_release_sweep_opt_out_preserves_user_cache(spark):
    """sweep_dead=False: a dead pinned wrapper must NOT trigger the
    session-wide clearCache — an embedding caller's own cached frames
    survive the release (the repo's harness callers keep the default
    sweep)."""
    release_pins()
    user_df = spark.range(64).withColumn("v", F.col("id") * 3).cache()
    user_df.count()
    try:
        df = pin(spark.range(32).withColumn("v", F.col("id") + 7))
        df.count()
        del df
        gc.collect()
        release_pins(sweep_dead=False)
        assert _cached(user_df), "opt-out release wiped unrelated cache"
    finally:
        user_df.unpersist(blocking=True)
        spark.catalog.clearCache()  # drop the dead pin's JVM blocks


def test_repin_revives_after_release(spark):
    release_pins()
    df = pin(spark.range(10).withColumn("v", F.lit(1)), small=True)
    df.count()
    release_pins()
    assert not _cached(df)
    out = repin(df, small=True)
    assert _cached(out)
    assert out.storageLevel == StorageLevel.MEMORY_AND_DISK
    release_pins()
