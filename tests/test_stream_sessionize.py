"""Streaming sessionization e2e: events parquet → stream →
applyInPandasWithState → closed sessions; cross-checked against the
batch sessionization query."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from oteldb_spark.streaming.sessionize import stream_sessionize
from oteldb_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_stream_sessionize_matches_batch(spark, tmp_path):
    # stage the events as a file stream source (one file = one batch)
    events = load(spark, SF, "events").select("ts", "user_id", "value")
    src = str(tmp_path / "stream_in")
    events.coalesce(1).write.parquet(src)

    stream = (
        spark.readStream.schema(events.schema).parquet(src)
    )
    out_dir = str(tmp_path / "sessions_out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        stream_sessionize(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out_dir)

    # batch reference: same gap logic via window functions; a session
    # is CLOSED in the stream when its gap timeout fell behind the
    # final watermark (max event time − 1h); later sessions stay open
    from pyspark.sql import Window

    GAP_US = 30 * 60 * 1_000_000
    base = events.select(
        "user_id", F.expr("ts div 1000").alias("ts_us"), "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        base.withColumn(
            "brk",
            F.when(F.col("ts_us") - F.lag("ts_us").over(w) > GAP_US, 1).otherwise(0),
        )
        .withColumn("session_id", F.sum("brk").over(cum))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.min("ts_us") / 1000).cast("long").alias("session_start_ms"),
            (F.max("ts_us") / 1000).cast("long").alias("session_end_ms"),
        )
    )
    max_ms = base.agg((F.max("ts_us") / 1000).cast("long")).collect()[0][0]
    watermark_ms = max_ms - 3_600_000
    gap_ms = GAP_US // 1000
    closed_ref = sess.filter(F.col("session_end_ms") + gap_ms < watermark_ms)

    ref = {
        (r.user_id, r.session_start_ms): r.n_events for r in closed_ref.collect()
    }
    out = {
        (r.user_id, r.session_start_ms): r.n_events for r in got.collect()
    }
    assert out == ref
    assert len(out) > 0
