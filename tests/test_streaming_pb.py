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


def _span_payload(day: int, n: int) -> bytes:
    base = EPOCH_NS + day * 86_400 * 10**9
    spans = [
        pb.enc_span(
            trace_id=(day * 1000 + i // 4).to_bytes(16, "big"),
            span_id=i.to_bytes(8, "big"),
            parent_span_id=b"" if i % 4 == 0 else (i - i % 4).to_bytes(8, "big"),
            name=f"op-{i % 3}",
            kind=2 if i % 4 == 0 else 3,
            start_ns=base + i * 10**6,
            end_ns=base + i * 10**6 + 5 * 10**6,
            status_code=2 if i % 5 == 0 else 0,
        )
        for i in range(n)
    ]
    return pb.enc_traces_request({"service.name": "svc-t"}, spans)


def test_stream_spans_from_pb(spark, tmp_path):
    from oteldb_spark.streaming.ingest import stream_spans_from_pb

    indir = str(tmp_path / "in")
    table = str(tmp_path / "spans")
    ckpt = str(tmp_path / "ckpt")
    import os

    os.makedirs(indir)
    for day in range(2):
        with open(f"{indir}/t{day}.binpb", "wb") as f:
            f.write(_span_payload(day, 16))
    stream_spans_from_pb(spark, indir, table, ckpt)
    df = spark.read.parquet(table)
    assert df.count() == 32
    assert df.filter(F.col("service_name") == "svc-t").count() == 32
    d2 = df.filter(F.col("date") == "2024-01-02")
    assert d2.count() == 16
    assert d2.filter(F.col("duration_ns") == 5 * 10**6).count() == 16
    # parent linkage survived the wire round-trip
    roots = df.filter(F.col("parent_span_id").isNull()).count()
    assert roots == 8
    # checkpoint resume
    with open(f"{indir}/t7.binpb", "wb") as f:
        f.write(_span_payload(7, 4))
    stream_spans_from_pb(spark, indir, table, ckpt)
    assert spark.read.parquet(table).count() == 36


def test_stream_points_from_pb(spark, tmp_path):
    from oteldb_spark.streaming.ingest import stream_points_from_pb

    indir = str(tmp_path / "in")
    table = str(tmp_path / "points")
    ckpt = str(tmp_path / "ckpt")
    import os

    os.makedirs(indir)
    for day in range(2):
        points = [
            pb.enc_number_point(
                time_ns=EPOCH_NS + day * 86_400 * 10**9 + i * 10**9,
                value=float(i),
                attrs={"instance": f"host-{i % 2}"},
            )
            for i in range(10)
        ]
        m = pb.enc_gauge_metric("cpu_usage", "1", points)
        with open(f"{indir}/m{day}.binpb", "wb") as f:
            f.write(pb.enc_metrics_request({"service.name": "svc-m"}, [m]))
    stream_points_from_pb(spark, indir, table, ckpt)
    df = spark.read.parquet(table)
    assert df.count() == 20
    assert df.filter(F.col("name") == "cpu_usage").count() == 20
    assert df.filter(F.col("date") == "2024-01-01").count() == 10
    assert (
        df.filter(F.col("labels").getItem("instance") == "host-1").count() == 10
    )
    # series hash is stable per (name, labels) identity
    assert df.select("series_hash").distinct().count() == 2
