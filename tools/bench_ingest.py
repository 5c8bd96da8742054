"""Prometheus remote-write ingest throughput — the BASELINE.md row
(`~144,300 points/s sustained`, dev/local/ch-bench/README.md:60-76)
measured on this engine's decode path.

Synthesizes vmagent-shaped WriteRequests (snappy + protobuf), spreads
them over the cluster, and times `prw_points` (mapInPandas decode →
rows).  Usage: python tools/bench_ingest.py [n_payloads] [series_per]
[samples_per].  Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from oteldb_spark.session import get_spark  # noqa: E402
from oteldb_spark.sources import prw  # noqa: E402


def _bench_otlp(spark, n_payloads: int, series_per: int, samples_per: int):
    """Same shape through the OTLP protobuf wire path (the reference's
    PRIMARY ingest): ExportMetricsServiceRequest payloads with
    series_per gauge metrics × samples_per points, decoded by
    pb_metrics (wire walk → JSON → from_json flattener)."""
    from oteldb_spark.sources import otlp_pb as pb

    base_ns = 1_704_067_200_000_000_000
    payloads = []
    for p in range(n_payloads):
        metrics = []
        for s in range(series_per):
            points = [
                pb.enc_number_point(
                    time_ns=base_ns + i * 15_000_000_000,
                    value=float(s + i),
                    attrs={"cpu": str(s % 8), "instance": f"host-{p % 16}"},
                )
                for i in range(samples_per)
            ]
            metrics.append(
                pb.enc_gauge_metric(f"node_metric_{s}", "1", points)
            )
        payloads.append(
            (pb.enc_metrics_request({"service.name": "node"}, metrics),)
        )
    df = spark.createDataFrame(payloads, "payload binary").repartition(
        spark.sparkContext.defaultParallelism
    )
    df = df.persist()
    df.count()
    total = n_payloads * series_per * samples_per
    pb.pb_metrics(df.limit(8)).count()  # warm Python workers
    t0 = time.time()
    n = pb.pb_metrics(df).count()
    dt = time.time() - t0
    assert n == total, (n, total)
    print(
        json.dumps(
            {
                "metric": "otlp_pb_ingest_points_per_sec",
                "value": round(n / dt),
                "unit": "points/s",
                "points": n,
                "seconds": round(dt, 3),
                "payloads": n_payloads,
            }
        )
    )


def measure_prw(
    spark, n_payloads: int = 256, series_per: int = 100, samples_per: int = 20
) -> dict:
    """Synthesize vmagent-shaped WriteRequests, time the distributed
    decode, return the throughput record (reused by bench.py so every
    BENCH_rN.json carries the ingest envelope next to query latency)."""
    base_ms = 1_704_067_200_000
    payloads = []
    for p in range(n_payloads):
        series = []
        for s in range(series_per):
            labels = {
                "__name__": f"node_metric_{s % 37}_total",
                "instance": f"host-{p % 16}",
                "job": "node_exporter",
                "cpu": str(s % 8),
            }
            samples = [
                (float(s + i), base_ms + i * 15_000)
                for i in range(samples_per)
            ]
            series.append(prw.encode_time_series(labels, samples))
        payloads.append((prw.encode_write_request(series),))

    df = spark.createDataFrame(payloads, "payload binary").repartition(
        spark.sparkContext.defaultParallelism
    )
    df = df.persist()
    df.count()  # materialize payloads before timing the decode

    total_points = n_payloads * series_per * samples_per
    # warm the Python workers
    prw.prw_points(df.limit(8)).count()
    t0 = time.time()
    n = prw.prw_points(df).count()
    dt = time.time() - t0
    df.unpersist(blocking=False)
    assert n == total_points, (n, total_points)
    return {
        "metric": "prw_ingest_points_per_sec",
        "value": round(n / dt),
        "unit": "points/s",
        "points": n,
        "seconds": round(dt, 3),
        "payloads": n_payloads,
    }


def main() -> None:
    n_payloads = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    series_per = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    samples_per = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    mode = sys.argv[4] if len(sys.argv) > 4 else "prw"

    spark = get_spark("bench-ingest")
    if mode == "otlp":
        _bench_otlp(spark, n_payloads, series_per, samples_per)
        return
    print(json.dumps(measure_prw(spark, n_payloads, series_per, samples_per)))


if __name__ == "__main__":
    main()
