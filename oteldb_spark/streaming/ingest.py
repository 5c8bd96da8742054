"""Structured Streaming ingest — OTLP JSONL → partitioned log store,
plus the series-registry upsert and the TTL retention job.

The reference ingests via collector pipeline → batched columnar
INSERTs (``inserter_logs.go``); the Spark-native equivalent is a
file/Kafka stream → flatten → append to a date-partitioned columnar
table.  The layout mirrors the MergeTree design (SURVEY §1.2):

  PARTITION BY date  ≈  PARTITION BY toYYYYMMDD(timestamp)
  sortWithinPartitions(severity, service, ts)  ≈  ORDER BY key
  TTL  ≈  retention job dropping aged partitions

The series registry (AggregatingMergeTree in the reference) is a
``foreachBatch`` merge: per-batch aggregate, union with the current
registry, re-aggregate, atomically replace.  On Delta Lake this
becomes a single MERGE INTO; plain parquet needs the
union-reaggregate-swap."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.otlp import OTLP_LOGS_SCHEMA, flatten_otlp_logs


def stream_logs_from_json(
    spark: SparkSession,
    input_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """OTLP JSONL files → flattened, date-partitioned log table."""
    raw = (
        spark.readStream.schema(OTLP_LOGS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .json(input_dir)
    )
    flat = flatten_otlp_logs(raw)
    writer = (
        flat.writeStream.format("parquet")
        .option("path", table_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("date")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def stream_logs_from_pb(
    spark: SparkSession,
    input_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """OTLP PROTOBUF request files → the same flattened,
    date-partitioned log table (the reference's primary wire format,
    otelreceiver/receiver.go:47-90).  ``binaryFile`` streams each
    request body; the wire decode runs executor-side
    (sources/otlp_pb.py) and feeds the SAME flattener as the JSON
    path — the two encodings converge before the first write."""
    from ..sources.otlp_pb import pb_logs

    raw = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, length long,"
            " content binary"
        )
        .option("pathGlobFilter", "*.binpb")
        .option("maxFilesPerTrigger", 64)
        .load(input_dir)
    )
    flat = pb_logs(raw.select(F.col("content").alias("payload")))
    writer = (
        flat.writeStream.format("parquet")
        .option("path", table_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("date")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def stream_spans_from_pb(
    spark: SparkSession,
    input_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """OTLP protobuf ExportTraceServiceRequest files → flattened,
    date-partitioned span table (the trace half of the reference's
    primary wire path, otelreceiver/receiver.go:60-68; consumer →
    tracestorage rows).  Same executor-side wire decode and flattener
    as the batch path."""
    from ..sources.otlp_pb import pb_spans

    raw = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, length long,"
            " content binary"
        )
        .option("pathGlobFilter", "*.binpb")
        .option("maxFilesPerTrigger", 64)
        .load(input_dir)
    )
    flat = pb_spans(raw.select(F.col("content").alias("payload")))
    writer = (
        flat.writeStream.format("parquet")
        .option("path", table_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("date")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def stream_points_from_pb(
    spark: SparkSession,
    input_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """OTLP protobuf ExportMetricsServiceRequest files → flattened,
    date-partitioned points table (sum/gauge pass-through plus the
    histogram/summary explosion, inserter_metrics.go)."""
    from ..sources.otlp_pb import pb_metrics

    raw = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, length long,"
            " content binary"
        )
        .option("pathGlobFilter", "*.binpb")
        .option("maxFilesPerTrigger", 64)
        .load(input_dir)
    )
    flat = pb_metrics(
        raw.select(F.col("content").alias("payload"))
    ).withColumn(
        "date",
        F.to_date(F.timestamp_micros(F.expr("ts_ns div 1000"))),
    )
    writer = (
        flat.writeStream.format("parquet")
        .option("path", table_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("date")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def stream_dedup_exact(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: drop records whose key columns repeat
    within the watermark horizon.

    The scale property that matters: ``dropDuplicatesWithinWatermark``
    keeps per-key state only until the event-time watermark passes, so
    state is bounded by (arrival rate × watermark), not by stream
    history — the streaming analog of the batch hash-groupBy dedup
    (queries/pipeline.py).  Keys should be content fingerprints
    (md5 of normalized text), not raw bodies, to keep state rows
    small."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def merge_upsert(
    spark: SparkSession,
    batch: DataFrame,
    table_dir: str,
    key_col: str,
    reagg,
    n_buckets: int = 64,
) -> list[int]:
    """Partition-pruned MERGE INTO for a plain-parquet table: the
    table is hash-partitioned on ``pmod(xxhash64(key), n_buckets)``
    and only the bucket partitions that contain batch keys are read,
    re-aggregated, and swapped — untouched buckets are never opened.

    ``reagg(df)`` must group by ``key_col`` and return one merged row
    per key.  Returns the list of rewritten bucket ids.

    At registry scale (billions of series, small per-batch key sets)
    this turns the whole-table rewrite into O(touched buckets) I/O —
    the same pruning a Delta/Iceberg MERGE gets from file-level stats.
    Per-bucket directory swaps are not atomic as a set, which is fine
    under the single-writer foreachBatch contract."""
    bucket = F.pmod(F.xxhash64(key_col), F.lit(n_buckets)).cast("int")
    # two actions below (touched-bucket collect, merged write): persist
    # so an un-persisted upstream batch is not recomputed per action
    # (measured by accumulator: 2 of the 3 per-batch decode re-runs in
    # the e2e ingest sink came from exactly these two actions)
    b = batch.withColumn("__bucket", bucket).persist()
    try:
        touched = sorted(
            r["__bucket"] for r in b.select("__bucket").distinct().collect()
        )
        merged = b
        if os.path.isdir(table_dir) and any(
            e.startswith("__bucket=") for e in os.listdir(table_dir)
        ):
            existing = spark.read.parquet(table_dir).filter(
                F.col("__bucket").isin([int(t) for t in touched])
            )
            merged = b.unionByName(existing)
        out = reagg(merged.drop("__bucket")).withColumn("__bucket", bucket)
        tmp = table_dir.rstrip("/") + ".tmp"
        out.write.mode("overwrite").partitionBy("__bucket").parquet(tmp)
    finally:
        b.unpersist(blocking=False)
    os.makedirs(table_dir, exist_ok=True)
    for k in touched:
        src = os.path.join(tmp, f"__bucket={k}")
        dst = os.path.join(table_dir, f"__bucket={k}")
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        if os.path.isdir(src):
            os.rename(src, dst)
    shutil.rmtree(tmp)
    return touched


def upsert_series_registry(
    spark: SparkSession, batch: DataFrame, registry_dir: str
) -> None:
    """Merge a batch of (series_hash, name, labels, ts_ns) into the
    registry: min(first_seen), max(last_seen), any(name/labels).

    The reference's AggregatingMergeTree folds these continuously at
    insert; here each batch goes through ``merge_upsert`` so only the
    hash buckets the batch touches are rewritten."""
    agg = batch.groupBy("series_hash").agg(
        F.min("ts_ns").alias("first_seen_ns"),
        F.max("ts_ns").alias("last_seen_ns"),
        F.first("name").alias("name"),
        F.first("labels").alias("labels"),
    )

    def reagg(df: DataFrame) -> DataFrame:
        return df.groupBy("series_hash").agg(
            F.min("first_seen_ns").alias("first_seen_ns"),
            F.max("last_seen_ns").alias("last_seen_ns"),
            F.first("name").alias("name"),
            F.first("labels").alias("labels"),
        )

    merge_upsert(spark, agg, registry_dir, "series_hash", reagg)


def retention_sweep(table_dir: str, keep_days: int, now_date: str) -> list[str]:
    """Drop date partitions older than ``keep_days`` before
    ``now_date`` (YYYY-MM-DD).  Mirrors the reference's 3-day TTL
    (docs/architecture.md:13)."""
    import datetime as dt

    cutoff = dt.date.fromisoformat(now_date) - dt.timedelta(days=keep_days)
    dropped = []
    if not os.path.isdir(table_dir):
        return dropped
    for entry in os.listdir(table_dir):
        if not entry.startswith("date="):
            continue
        try:
            d = dt.date.fromisoformat(entry.split("=", 1)[1])
        except ValueError:
            continue
        if d < cutoff:
            shutil.rmtree(os.path.join(table_dir, entry))
            dropped.append(entry)
    return dropped
