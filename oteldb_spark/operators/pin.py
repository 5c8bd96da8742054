"""Lineage pinning for plans whose expensive stage feeds multiple
branches (dedup signatures, shingle joins).

``pin(df)`` truncates lineage so the shared stage computes once.
Local mode uses ``localCheckpoint`` (block-manager copy, cheapest);
its blocks are lost on executor failure, so cluster deployments set
``SPARK_GRAFT_PIN=disk`` to pin via ``persist(DISK_ONLY)`` instead —
recomputable from lineage after a lost executor, spilled off-heap.
A reliable-checkpoint dir (``SPARK_GRAFT_PIN=<hdfs path>``) survives
even driver restarts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def pin(df: DataFrame) -> DataFrame:
    mode = os.environ.get("SPARK_GRAFT_PIN", "local")
    if mode == "local":
        return df.localCheckpoint(eager=False)
    if mode == "disk":
        from pyspark.storagelevel import StorageLevel

        return df.persist(StorageLevel.DISK_ONLY)
    # a path: reliable checkpoint directory
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        sc.setCheckpointDir(mode)
    return df.checkpoint(eager=False)
