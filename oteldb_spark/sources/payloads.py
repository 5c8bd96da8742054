"""Local wire-payload lists → JVM-backed DataFrames.

``spark.createDataFrame([(b,), ...], "payload binary")`` on a plain
Python list builds a pickled Python-RDD scan: the first stage of every
consumer job spins up a Python worker per slice just to unpickle the
payload bytes back into the JVM, and the ``repartition`` previously
used to bound the slice count added an Exchange on top.  For a gate
whose real work is ONE decode ``mapInPandas``, that is a second
Python-boundary stage plus a shuffle for free.

The Arrow path (``_create_from_pandas_with_arrow``) ships the payloads
to the JVM once, on the driver, as Arrow record batches; the executor
scan is then pure JVM (no Python worker, no pickle) and partitioning
is one Arrow batch per partition.  Pinning the batch size to one row
while the frame is built gives exactly one partition per payload, so
the decode ``mapInPandas`` gets payload-count parallelism (bounded by
cores at execution) with zero Exchanges.

This replaces the r12 ``repartition(max(1, min(len(payloads), 8)))``
pattern, which also hard-capped decode parallelism at 8 partitions
(ADVICE r12) — here the partition count is ``len(payloads)``, which
scales with the work instead of a literal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_BATCH_KEY = "spark.sql.execution.arrow.maxRecordsPerBatch"


def payload_frame(spark: SparkSession, payloads: list[bytes]) -> DataFrame:
    """One-column ``payload binary`` DataFrame with one JVM-backed
    partition per payload and no Python-RDD scan stage."""
    import pandas as pd

    if not payloads:
        return spark.createDataFrame([], "payload binary")
    old = spark.conf.get(_BATCH_KEY)
    # one row per Arrow batch -> one partition per payload; the conf is
    # only read while createDataFrame serializes driver-side, and is
    # restored before anything else can plan against it
    spark.conf.set(_BATCH_KEY, "1")
    try:
        return spark.createDataFrame(
            pd.DataFrame({"payload": [bytes(p) for p in payloads]}),
            schema="payload binary",
        )
    finally:
        spark.conf.set(_BATCH_KEY, old)
