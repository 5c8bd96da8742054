"""Metric-ingest explosion gates: explicit-bucket histograms and
summaries through the OTLP inserter to Prometheus-compatible series.

The fixture is built entirely inside Spark: events are aggregated to
per-(service, 6h-step) histogram / summary datapoints, serialized to
OTLP/JSON payload strings with ``to_json`` (one payload per point —
the shape a collector batch would POST), then parsed and exploded by
the real ingest path (``sources/otlp.py::flatten_otlp_metrics``).  No
driver-side materialization anywhere.

The quantile gate goes end-to-end: the exploded ``_bucket`` series
(with their string ``le`` labels) feed the PromQL
``histogram_quantile`` operator, and DuckDB recomputes the same
bucketQuantile from the raw events.

Reference: ``chstorage/inserter_metrics.go:221`` (addHistogramPoints),
``:472`` (addSummaryPoints), suffixes ``schema_metrics.go:12-27``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..promql.compiler import histogram_quantile
from ..sources.otlp import OTLP_METRICS_SCHEMA, flatten_otlp_metrics
from ..tables import load
from .registry import END_US, STEP_US, register

_BOUNDS = [25.0, 100.0, 250.0]
_Q = 0.9


def _attr(key: str, value):
    return F.struct(
        F.lit(key).alias("key"),
        F.struct(value.alias("stringValue")).alias("value"),
    )


def _payload(metric_struct) -> F.Column:
    return F.to_json(
        F.struct(
            F.array(
                F.struct(
                    F.struct(
                        F.array().cast("array<struct<key:string,value:struct<stringValue:string>>>").alias("attributes")
                    ).alias("resource"),
                    F.array(
                        F.struct(F.array(metric_struct).alias("metrics"))
                    ).alias("scopeMetrics"),
                )
            ).alias("resourceMetrics")
        )
    )


def _hist_payloads(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    ts_us = F.expr("ts div 1000")
    g = (
        ev.select("event_type", "value", (ts_us / STEP_US).cast("long").alias("idx"))
        .groupBy("event_type", "idx")
        .agg(
            *[
                F.count(F.when(F.col("value") <= b, 1)).alias(f"cle{i}")
                for i, b in enumerate(_BOUNDS)
            ],
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value").alias("vsum"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
    )
    # cumulative → per-bucket counts (OTLP carries raw counts with a
    # trailing overflow bucket; the inserter re-accumulates them)
    bucket_counts = F.array(
        F.col("cle0").cast("string"),
        (F.col("cle1") - F.col("cle0")).cast("string"),
        (F.col("cle2") - F.col("cle1")).cast("string"),
        (F.col("cnt") - F.col("cle2")).cast("string"),
    )
    dp = F.struct(
        ((F.col("idx") + 1) * STEP_US * 1000).cast("string").alias("timeUnixNano"),
        F.col("cnt").cast("string").alias("count"),
        F.col("vsum").alias("sum"),
        F.col("vmin").alias("min"),
        F.col("vmax").alias("max"),
        bucket_counts.alias("bucketCounts"),
        F.array(*[F.lit(b) for b in _BOUNDS]).alias("explicitBounds"),
        F.array(_attr("service", F.col("event_type"))).alias("attributes"),
    )
    metric = F.struct(
        F.lit("app_latency").alias("name"),
        F.lit("ms").alias("unit"),
        F.struct(
            F.lit(2).cast("long").alias("aggregationTemporality"),
            F.array(dp).alias("dataPoints"),
        ).alias("histogram"),
    )
    return g.select(_payload(metric).alias("payload"))


def _ingested(spark, sf_dir, payloads):
    # flatten_otlp_metrics unions ~8 suffix branches (plain + the
    # histogram/summary explosions), and each branch chain would
    # re-run the data-scale events aggregation that BUILT the payload
    # frame.  The frame is output-sized (one row per (service, step)),
    # so pin it small — measured 3.5 s -> <1 s warm at sf0.1.
    from ..operators.pin import pin

    payloads = pin(payloads, small=True)
    raw = payloads.select(
        F.from_json("payload", OTLP_METRICS_SCHEMA).alias("r")
    ).select("r.*")
    return flatten_otlp_metrics(raw)


_RANK = f"({_Q} * ctot)"
_B = _BOUNDS


@register(
    "otlp_hist_ingest_quantile",
    f"""WITH h AS (
  SELECT event_type AS service, epoch_us(ts) // {STEP_US} AS idx,
         CAST(count(*) FILTER (WHERE value <= {_B[0]}) AS DOUBLE) AS b1,
         CAST(count(*) FILTER (WHERE value <= {_B[1]}) AS DOUBLE) AS b2,
         CAST(count(*) FILTER (WHERE value <= {_B[2]}) AS DOUBLE) AS b3,
         CAST(count(*) AS DOUBLE) AS ctot
  FROM events GROUP BY 1, 2
)
SELECT service, CAST((idx + 1) * {STEP_US} AS BIGINT) AS step_us,
       round(CASE
         WHEN b1 >= {_RANK} THEN
           0.0 + ({_B[0]} - 0.0) * ({_RANK} - 0.0) / (b1 - 0.0)
         WHEN b2 >= {_RANK} THEN
           {_B[0]} + ({_B[1]} - {_B[0]}) * ({_RANK} - b1) / (b2 - b1)
         WHEN b3 >= {_RANK} THEN
           {_B[1]} + ({_B[2]} - {_B[1]}) * ({_RANK} - b2) / (b3 - b2)
         ELSE {_B[2]}
       END, 6) AS value
FROM h""",
)
def otlp_hist_ingest_quantile(spark, sf_dir):
    """Exploded _bucket series (string le labels) → histogram_quantile."""
    pts = _ingested(spark, sf_dir, _hist_payloads(spark, sf_dir))
    buckets = pts.filter(F.col("mapping") == "histogram_bucket").select(
        F.col("labels")["service"].alias("service"),
        F.expr("ts_ns div 1000").alias("step_us"),
        F.col("labels")["le"].alias("le"),
        "value",
    )
    out = histogram_quantile(buckets, _Q, le_col="le")
    return out.select("service", "step_us", F.round("value", 6).alias("value"))


# the full suffix fan-out of one histogram point: _bucket rows carry
# cumulative counts + le labels, _count/_sum/_min/_max drop the unit
@register(
    "otlp_hist_ingest_series",
    f"""WITH h AS (
  SELECT event_type AS service, epoch_us(ts) // {STEP_US} AS idx,
         CAST(count(*) FILTER (WHERE value <= {_B[0]}) AS DOUBLE) AS b1,
         CAST(count(*) FILTER (WHERE value <= {_B[1]}) AS DOUBLE) AS b2,
         CAST(count(*) FILTER (WHERE value <= {_B[2]}) AS DOUBLE) AS b3,
         CAST(count(*) AS DOUBLE) AS ctot,
         round(sum(value), 6) AS vsum,
         min(value) AS vmin, max(value) AS vmax
  FROM events GROUP BY 1, 2
),
s AS (SELECT service, CAST((idx + 1) * {STEP_US} AS BIGINT) AS step_us,
             b1, b2, b3, ctot, vsum, vmin, vmax FROM h)
SELECT 'app_latency_bucket' AS name, 'ms' AS unit, service, step_us,
       '25' AS le, b1 AS value FROM s
UNION ALL SELECT 'app_latency_bucket', 'ms', service, step_us, '100', b2 FROM s
UNION ALL SELECT 'app_latency_bucket', 'ms', service, step_us, '250', b3 FROM s
UNION ALL SELECT 'app_latency_bucket', 'ms', service, step_us, '+Inf', ctot FROM s
UNION ALL SELECT 'app_latency_count', '', service, step_us, NULL, ctot FROM s
UNION ALL SELECT 'app_latency_sum', '', service, step_us, NULL, vsum FROM s
UNION ALL SELECT 'app_latency_min', '', service, step_us, NULL, vmin FROM s
UNION ALL SELECT 'app_latency_max', '', service, step_us, NULL, vmax FROM s""",
)
def otlp_hist_ingest_series(spark, sf_dir):
    pts = _ingested(spark, sf_dir, _hist_payloads(spark, sf_dir))
    return pts.select(
        "name",
        "unit",
        F.col("labels")["service"].alias("service"),
        F.expr("ts_ns div 1000").alias("step_us"),
        F.col("labels")["le"].alias("le"),
        F.round("value", 6).alias("value"),
    )


def _summary_payloads(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("value").alias("vsum"),
        F.round(F.avg("value"), 6).alias("q50"),
        F.max("value").alias("q90"),
    )
    qv = F.array(
        F.struct(F.lit(0.5).alias("quantile"), F.col("q50").alias("value")),
        F.struct(F.lit(0.9).alias("quantile"), F.col("q90").alias("value")),
    )
    dp = F.struct(
        F.lit(str(END_US * 1000)).alias("timeUnixNano"),
        F.col("cnt").cast("string").alias("count"),
        F.col("vsum").alias("sum"),
        qv.alias("quantileValues"),
        F.array(_attr("service", F.col("event_type"))).alias("attributes"),
    )
    metric = F.struct(
        F.lit("rpc_latency").alias("name"),
        F.lit("ms").alias("unit"),
        F.struct(F.array(dp).alias("dataPoints")).alias("summary"),
    )
    return g.select(_payload(metric).alias("payload"))


@register(
    "otlp_summary_ingest",
    f"""WITH g AS (
  SELECT event_type AS service, CAST(count(*) AS DOUBLE) AS cnt,
         round(sum(value), 6) AS vsum,
         round(avg(value), 6) AS q50, max(value) AS q90
  FROM events GROUP BY 1
)
SELECT 'rpc_latency_count' AS name, '' AS unit, 'summary_count' AS mapping,
       service, NULL AS quantile, cnt AS value FROM g
UNION ALL SELECT 'rpc_latency_sum', '', 'summary_sum', service, NULL, vsum FROM g
UNION ALL SELECT 'rpc_latency', 'ms', 'summary_quantile', service, '0.5', q50 FROM g
UNION ALL SELECT 'rpc_latency', 'ms', 'summary_quantile', service, '0.9', q90 FROM g""",
)
def otlp_summary_ingest(spark, sf_dir):
    pts = _ingested(spark, sf_dir, _summary_payloads(spark, sf_dir))
    return pts.select(
        "name",
        "unit",
        "mapping",
        F.col("labels")["service"].alias("service"),
        F.col("labels")["quantile"].alias("quantile"),
        F.round("value", 6).alias("value"),
    )
