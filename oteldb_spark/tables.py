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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is a nanosecond parquet timestamp; read it as a
        # LongType ns epoch (the reference keeps ns longs as the source
        # of truth too, SURVEY §1.4).  Set per-session: the driver may
        # hand us a session built without this flag.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
