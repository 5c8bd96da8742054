"""Testdata table loaders.

The driver materializes TPC-H-ish tables plus ``events`` (a generic
timestamped stream), ``documents`` and ``embeddings`` at
``/root/testdata/sf*/<name>.parquet`` (TESTDATA.md).  All query
builders take an ``sf_dir`` so the same code runs at any scale factor.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(
    spark: SparkSession, sf_dir: str, name: str, *, spread: bool = False
) -> DataFrame:
    # nanosAsLong must be set BEFORE the first read: a timestamp[ns]
    # parquet column otherwise throws PARQUET_TYPE_ILLEGAL during
    # schema inference (so a read-then-retry never runs).  The session
    # factory sets it at build time; set it here too so externally
    # created sessions behave identically.  Harmless for µs files.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # Internal contract: events.ts is a ns-epoch LongType (the
        # reference keeps ns longs as the source of truth too, SURVEY
        # §1.4).  The driver has shipped the column both as
        # timestamp[ns] (arrives as bigint ns under nanosAsLong) and as
        # timestamp[us]; normalize whatever arrives to ns longs here so
        # every downstream plan sees one type.  Session tz is UTC, so
        # a naive parquet timestamp converts exactly like DuckDB's
        # epoch_ns(ts) on the oracle side.
        ts_type = dict(df.dtypes)["ts"]
        if ts_type.startswith("timestamp"):
            from pyspark.sql import functions as F

            df = df.withColumn(
                "ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000
            )
    if spread:
        # Caller declares heavy PER-ROW compute downstream (gram
        # explodes, md5 sketches, 64-dim dot products); small scale
        # factors arrive as a single parquet file → one scan partition
        # → one core does all of it.  Spread whenever the scan is
        # narrower than the cluster: at production scale the file
        # layout already yields thousands of splits and this is a
        # no-op, so no shuffle is added where the data is already
        # parallel.  (An earlier `< min(par, 8)` threshold left
        # 8-split scans UNSPREAD on 32 cores — the r10 scaling curve
        # caught logql_ip_filter jumping to exponent 1.67 at the ×16
        # synthetic point purely from the parse stage running 8-way;
        # spreading restored the measured-linear curve.)  Off by
        # default — map-only gates (pii_redact, text_quality) keep
        # their zero-exchange plans.
        par = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < par:
            df = df.repartition(par)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
