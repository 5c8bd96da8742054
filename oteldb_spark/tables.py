"""Testdata table loaders.

The driver materializes TPC-H-ish tables plus ``events`` (a generic
timestamped stream), ``documents`` and ``embeddings`` at
``/root/testdata/sf*/<name>.parquet`` (TESTDATA.md).  All query
builders take an ``sf_dir`` so the same code runs at any scale factor.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .memo import SessionMemo

_LOAD_MEMO = SessionMemo()

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
    # memoize the BASE frame per (session, dir, table): every
    # spark.read.parquet call runs a one-task footer/schema-inference
    # job (~100-300ms, visible as a leading serial stage in the
    # parallelism audit of every gate), and the registry calls load()
    # hundreds of times per sweep.  DataFrames are immutable plans, so
    # sharing the object is safe; `spread` stays per-call on top.
    memo_key = (sf_dir, name)
    hit = _LOAD_MEMO.get(spark, memo_key)
    if hit is not None:
        return _spread(spark, hit) if spread else hit
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
    _LOAD_MEMO.set(spark, memo_key, df)
    return _spread(spark, df) if spread else df


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Repartition a narrow scan to cluster width.

    Caller declares heavy PER-ROW compute downstream (gram explodes,
    md5 sketches, 64-dim dot products); small scale factors arrive as
    a single parquet file → one scan partition → one core does all of
    it.  Spread whenever the scan is narrower than the cluster: at
    production scale the file layout already yields thousands of
    splits and this is a no-op, so no shuffle is added where the data
    is already parallel.  (An earlier ``< min(par, 8)`` threshold left
    8-split scans UNSPREAD on 32 cores — the r10 scaling curve caught
    logql_ip_filter jumping to exponent 1.67 at the ×16 synthetic
    point purely from the parse stage running 8-way; spreading
    restored the measured-linear curve.)  Off by default — map-only
    gates (pii_redact, text_quality) keep their zero-exchange
    plans."""
    par = spark.sparkContext.defaultParallelism
    if _scan_splits(spark, df) < par:
        df = df.repartition(par)
    return df


def _scan_splits(spark: SparkSession, df: DataFrame) -> int:
    """Estimate the scan's split count from FILE METADATA
    (inputFiles + sizes vs maxPartitionBytes) — the same bin-packing
    Spark's FilePartition planner does, minus openCost rounding.

    Why not ``df.rdd.getNumPartitions()``: under AQE, materializing
    the final plan for ``.rdd`` EXECUTES the query's leading stages —
    every spread gate was paying an extra serial one-task scan job
    just to ask how parallel the scan would be (caught by the r11
    parallelism audit: logql_json_parser ran 2 one-task stages where
    the plan has 1)."""
    try:
        files = df.inputFiles()
        raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        digits = "".join(c for c in raw if c.isdigit())
        max_bytes = int(digits) if digits else 134217728
        if raw.lower().endswith(("m", "mb")):
            max_bytes *= 1024 * 1024
        elif raw.lower().endswith(("k", "kb")):
            max_bytes *= 1024
        elif raw.lower().endswith(("g", "gb")):
            max_bytes *= 1024 * 1024 * 1024
        n = 0
        for f in files:
            p = f[5:] if f.startswith("file:") else f
            try:
                sz = os.stat(p).st_size
            except OSError:
                sz = 0
            n += max(1, -(-sz // max_bytes))
        return max(1, n)
    except Exception:
        # metadata probe failed (exotic source): fall back to the
        # plan-materializing probe rather than mis-sizing the spread
        return df.rdd.getNumPartitions()


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
