"""Streaming windowed rollup e2e vs batch groupBy."""

from __future__ import annotations

from pyspark.sql import functions as F

from oteldb_spark.streaming.rollup import windowed_rollup
from oteldb_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_windowed_rollup_matches_batch(spark, tmp_path):
    events = load(spark, SF, "events").select("ts", "event_type", "value")
    src = str(tmp_path / "in")
    events.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src).withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )
    rolled = windowed_rollup(
        stream, keys=["event_type"], value_col="value", window="6 hours"
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        rolled.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out_dir)

    # batch reference over the same tumbling grid; append mode only
    # emits windows fully behind the watermark (max event time - 2h)
    batch = (
        events.withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
        .groupBy("event_type", F.window("event_time", "6 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("event_type", F.col("w.start").alias("window_start"), "n", F.col("w.end").alias("window_end"))
    )
    max_ts = events.agg(F.max(F.timestamp_micros(F.expr("ts div 1000")))).collect()[0][0]
    import datetime

    wm = max_ts - datetime.timedelta(hours=2)
    closed = batch.filter(F.col("window_end") <= wm)

    ref = {(r.event_type, r.window_start): r.n for r in closed.collect()}
    res = {(r.event_type, r.window_start): r.n for r in got.collect()}
    assert res == ref
    assert len(res) > 100


def test_streaming_hll_registers_match_batch(spark, tmp_path):
    """The streamed register state per window must equal the batch
    HLL build over the same rows — max(rank) merges exactly, so
    incremental maintenance loses nothing."""
    from oteldb_spark.operators.hll import hll_registers
    from oteldb_spark.streaming.rollup import windowed_hll_registers

    events = load(spark, SF, "events").select("ts", "event_type", "user_id")
    src = str(tmp_path / "hin")
    events.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src).withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )
    regs = windowed_hll_registers(
        stream, key="user_id", by=["event_type"], window="7 days",
        watermark="1 hour",
    )
    out_dir, ckpt = str(tmp_path / "hout"), str(tmp_path / "hckpt")
    q = (
        regs.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out_dir)
    assert got.count() > 0

    # batch reference restricted to the closed windows the stream
    # emitted (append mode withholds windows above the watermark)
    closed = [r["window_start"] for r in got.select("window_start").distinct().collect()]
    ev = events.withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    ).withColumn("w", F.window("event_time", "7 days"))
    ref_rows = set()
    for r in (
        hll_registers(
            ev.withColumn("window_start", F.col("w.start"))
            .filter(F.col("window_start").isin(closed)),
            "user_id",
            ["event_type", "window_start"],
        ).collect()
    ):
        ref_rows.add((r["event_type"], r["window_start"], r["bucket"], r["rank"]))
    got_rows = {
        (r["event_type"], r["window_start"], r["bucket"], r["rank"])
        for r in got.collect()
    }
    assert got_rows == ref_rows
