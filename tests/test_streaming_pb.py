"""Structured Streaming over OTLP PROTOBUF files: wire decode on the
executors, same flattener and table layout as the JSON path, resumable
checkpoint."""

from __future__ import annotations

from pyspark.sql import functions as F

from oteldb_spark.sources import otlp_pb as pb
from oteldb_spark.streaming.ingest import stream_logs_from_pb

EPOCH_NS = 1_704_067_200 * 10**9


def _payload(day: int, n: int) -> bytes:
    recs = [
        pb.enc_log_record(
            time_ns=EPOCH_NS + day * 86_400 * 10**9 + i * 10**9,
            severity_number=9 if i % 2 else 17,
            severity_text="INFO" if i % 2 else "ERROR",
            body=f'{{"msg": "event {i}"}}',
            attrs={"http.method": "GET"},
            trace_id=i.to_bytes(16, "big"),
            span_id=i.to_bytes(8, "big"),
        )
        for i in range(n)
    ]
    return pb.enc_logs_request({"service.name": "svc-a"}, recs)


def test_stream_logs_from_pb(spark, tmp_path):
    indir = str(tmp_path / "in")
    table = str(tmp_path / "logs")
    ckpt = str(tmp_path / "ckpt")
    import os

    os.makedirs(indir)
    for day in range(3):
        with open(f"{indir}/d{day}.binpb", "wb") as f:
            f.write(_payload(day, 20))
    stream_logs_from_pb(spark, indir, table, ckpt)
    df = spark.read.parquet(table)
    assert df.count() == 60
    errs = df.filter(
        (F.col("date") == "2024-01-02") & (F.col("severity_text") == "ERROR")
    ).count()
    assert errs == 10
    assert df.filter(F.col("service_name") == "svc-a").count() == 60
    # incremental resume from checkpoint
    with open(f"{indir}/d9.binpb", "wb") as f:
        f.write(_payload(9, 5))
    stream_logs_from_pb(spark, indir, table, ckpt)
    assert spark.read.parquet(table).count() == 65
