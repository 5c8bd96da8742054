"""Lineage pinning for plans whose expensive stage feeds multiple
branches (dedup signatures, shingle joins).

``pin(df)`` marks the shared stage to compute once.  The default is
``persist(StorageLevel.DISK_ONLY)``: recomputable from lineage after
a lost executor (what a real cluster wants), and — measured on
local[32] — *more* stable than ``localCheckpoint``, whose block
replication/cleanup intermittently stalled repeat runs by 10-20s.
``SPARK_GRAFT_PIN=local`` opts into ``localCheckpoint`` (true lineage
truncation); a path value (``SPARK_GRAFT_PIN=<hdfs dir>``) uses a
reliable checkpoint that survives driver restarts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# Live pins, so a long-lived session (the engine facade, bench.py) can
# release cached blocks between queries instead of accumulating them in
# the CacheManager until the session dies.  persist() entries are keyed
# by logical plan JVM-side, not by this wrapper, so GC of the wrapper
# does NOT reclaim the blocks — an explicit release hook is required.
_LIVE_PINS: list[DataFrame] = []


def release_pins() -> int:
    """Unpersist every pin issued since the last release; returns the
    number released.  No-op for localCheckpoint / reliable-checkpoint
    modes (nothing held in the block-manager cache to drop)."""
    n = len(_LIVE_PINS)
    for df in _LIVE_PINS:
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped
    _LIVE_PINS.clear()
    return n


def pin(df: DataFrame, *, small: bool = False) -> DataFrame:
    """``small=True`` marks a frame known to be output-sized (partial
    aggregates, spine tables) rather than data-sized: those persist
    MEMORY_AND_DISK, since re-reading them from disk every branch costs
    more than the few MB of executor memory they occupy.  Data-sized
    pins stay DISK_ONLY — at 100 TB an in-memory pin of a shingle or
    signature table would evict the working set."""
    mode = os.environ.get("SPARK_GRAFT_PIN", "disk")
    if mode == "local":
        return df.localCheckpoint(eager=False)
    if mode == "disk":
        from pyspark.storagelevel import StorageLevel

        out = df.persist(
            StorageLevel.MEMORY_AND_DISK if small else StorageLevel.DISK_ONLY
        )
        _LIVE_PINS.append(out)
        return out
    # a path: reliable checkpoint directory
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        sc.setCheckpointDir(mode)
    return df.checkpoint(eager=False)
