"""Prometheus remote-write ingest gates.

Fixture payloads are built deterministically from the events table
(one WriteRequest per event_type, two series each — a ``_total``
cumulative-sum name and a ``_seconds`` gauge name), encoded with the
test-only protobuf/snappy encoders, and decoded by the real ingest
path (``sources/prw.py::prw_points`` — executor-side ``mapInPandas``).
The DuckDB oracle recreates the expected rows straight from the events
table, so the gate round-trips encode → snappy → wire decode → suffix
typing against SQL-visible ground truth.

Reference: ``prometheusremotewritereceiver/receiver.go:113``
(ServeHTTP → DecodeRequest), ``prometheusremotewrite/prw_to_metrics.go:32``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources import prw
from ..tables import load
from .registry import register

_LIMIT = 400


def _fixture_payloads(spark, sf_dir) -> list[bytes]:
    # bounded fixture construction (≤ _LIMIT rows) — the ingest path
    # itself never collects; payload bytes are decoded on executors
    rows = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") < _LIMIT)
        .select("event_id", "ts", "event_type", "value")
        .collect()
    )
    by_type: dict[str, list[tuple[float, int]]] = {}
    for r in sorted(rows, key=lambda r: r.event_id):
        # ts is an ns epoch (nanosAsLong) → remote-write ms
        by_type.setdefault(r.event_type, []).append((r.value, r.ts // 1_000_000))
    payloads = []
    for etype in sorted(by_type):
        samples = by_type[etype]
        series = [
            prw.encode_time_series(
                {"__name__": "app_events_value_total", "service": etype},
                samples,
            ),
            prw.encode_time_series(
                {"__name__": "app_latency_seconds", "service": etype},
                samples,
            ),
        ]
        payloads.append(prw.encode_write_request(series))
    return payloads


def _payload_df(spark, sf_dir):
    from ..sources.payloads import payload_frame

    # Arrow-built local frame: one JVM partition per payload, no
    # Python-pickle scan and no repartition Exchange (see
    # sources/payloads.py for the r12→r13 shape change)
    return payload_frame(spark, _fixture_payloads(spark, sf_dir))


_POINTS_ORACLE_BODY = f"""WITH e AS (
  SELECT event_type AS service,
         CAST(epoch_us(ts) // 1000 AS BIGINT) AS ts_ms, value
  FROM events WHERE event_id < {_LIMIT}
)
SELECT 'app_events_value_total' AS name, 'sum' AS mtype, '' AS unit,
       service, ts_ms, value
FROM e
UNION ALL
SELECT 'app_latency_seconds' AS name, 'gauge' AS mtype, 'seconds' AS unit,
       service, ts_ms, value
FROM e"""


# decoded points: every sample lands with the right name/type/unit,
# labels, ms timestamp and exact double value
@register("prw_ingest_points", _POINTS_ORACLE_BODY)
def prw_ingest_points(spark, sf_dir):
    pts = prw.prw_points(_payload_df(spark, sf_dir))
    return pts.select(
        "name",
        "mtype",
        "unit",
        F.col("labels")["service"].alias("service"),
        "ts_ms",
        "value",
    )


# series registry view over the same ingest: one row per decoded
# series with point count, time bounds and value checksum
@register(
    "prw_ingest_series",
    f"""WITH pts AS ({_POINTS_ORACLE_BODY})
SELECT name, service, CAST(count(*) AS BIGINT) AS n_points,
       min(ts_ms) AS min_ts, max(ts_ms) AS max_ts,
       round(sum(value), 6) AS value_sum
FROM pts GROUP BY name, service""",
)
def prw_ingest_series(spark, sf_dir):
    pts = prw_ingest_points(spark, sf_dir)
    return pts.groupBy("name", "service").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.min("ts_ms").alias("min_ts"),
        F.max("ts_ms").alias("max_ts"),
        F.round(F.sum("value"), 6).alias("value_sum"),
    )
