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


def main() -> None:
    n_payloads = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    series_per = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    samples_per = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    spark = get_spark("bench-ingest")
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
    assert n == total_points, (n, total_points)
    print(
        json.dumps(
            {
                "metric": "prw_ingest_points_per_sec",
                "value": round(n / dt),
                "unit": "points/s",
                "points": n,
                "seconds": round(dt, 3),
                "payloads": n_payloads,
            }
        )
    )


if __name__ == "__main__":
    main()
