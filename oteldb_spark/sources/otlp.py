"""OTLP/JSON flatteners — resource→scope→record explosion.

Mirrors the reference's consumers (``internal/logstorage/consumer.go``,
``tracestorage/consumer.go``: plog/ptrace → row models) for the OTLP
JSON encoding (public OTLP spec shapes).  Pure DataFrame transforms:
``explode`` down the resource/scope/record nesting, attribute KV
arrays → map<string,string>, ns timestamps kept as longs (SURVEY §1.4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ATTR_VALUE = T.StructType(
    [
        T.StructField("stringValue", T.StringType()),
        T.StructField("intValue", T.StringType()),
        T.StructField("doubleValue", T.DoubleType()),
        T.StructField("boolValue", T.BooleanType()),
    ]
)
_ATTR = T.StructType(
    [T.StructField("key", T.StringType()), T.StructField("value", _ATTR_VALUE)]
)

LOG_RECORD = T.StructType(
    [
        T.StructField("timeUnixNano", T.StringType()),
        T.StructField("observedTimeUnixNano", T.StringType()),
        T.StructField("severityText", T.StringType()),
        T.StructField("severityNumber", T.LongType()),
        T.StructField("traceId", T.StringType()),
        T.StructField("spanId", T.StringType()),
        T.StructField("body", T.StructType([T.StructField("stringValue", T.StringType())])),
        T.StructField("attributes", T.ArrayType(_ATTR)),
    ]
)

OTLP_LOGS_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceLogs",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "resource",
                            T.StructType(
                                [T.StructField("attributes", T.ArrayType(_ATTR))]
                            ),
                        ),
                        T.StructField(
                            "scopeLogs",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "scope",
                                            T.StructType(
                                                [
                                                    T.StructField("name", T.StringType()),
                                                    T.StructField(
                                                        "version", T.StringType()
                                                    ),
                                                ]
                                            ),
                                        ),
                                        T.StructField(
                                            "logRecords", T.ArrayType(LOG_RECORD)
                                        ),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def _attrs_to_map(attrs: Column) -> Column:
    """OTLP KV array → map<string,string> (typed values stringified,
    mirroring otelstorage.Attrs label semantics)."""
    return F.map_from_entries(
        F.transform(
            F.coalesce(attrs, F.array()),
            lambda a: F.struct(
                a["key"].alias("key"),
                F.coalesce(
                    a["value"]["stringValue"],
                    a["value"]["intValue"],
                    a["value"]["doubleValue"].cast("string"),
                    a["value"]["boolValue"].cast("string"),
                ).alias("value"),
            ),
        )
    )


def flatten_otlp_logs(raw: DataFrame) -> DataFrame:
    """OTLP/JSON ExportLogsServiceRequest rows → flat log records.

    Output schema mirrors logparser.Record: ts ns, severity, body,
    attrs/resource_attrs maps, materialized service columns with the
    ``unknown_service`` default (logstorage/schema.go:12-22).
    """
    rl = raw.select(F.explode("resourceLogs").alias("rl"))
    sl = rl.select(
        _attrs_to_map(F.col("rl.resource.attributes")).alias("resource_attrs"),
        F.explode("rl.scopeLogs").alias("sl"),
    )
    rec = sl.select(
        "resource_attrs",
        F.col("sl.scope.name").alias("scope_name"),
        F.col("sl.scope.version").alias("scope_version"),
        F.explode("sl.logRecords").alias("r"),
    )
    return rec.select(
        F.col("r.timeUnixNano").cast("long").alias("timestamp_ns"),
        F.coalesce(
            F.col("r.observedTimeUnixNano").cast("long"),
            F.col("r.timeUnixNano").cast("long"),
        ).alias("observed_ns"),
        F.col("r.severityText").alias("severity_text"),
        F.col("r.severityNumber").alias("severity_number"),
        F.col("r.traceId").alias("trace_id"),
        F.col("r.spanId").alias("span_id"),
        F.col("r.body.stringValue").alias("body"),
        _attrs_to_map(F.col("r.attributes")).alias("attrs"),
        "resource_attrs",
        "scope_name",
        "scope_version",
        F.coalesce(
            F.col("resource_attrs").getItem("service.name"),
            F.lit("unknown_service"),
        ).alias("service_name"),
        F.coalesce(
            F.col("resource_attrs").getItem("service.namespace"), F.lit("")
        ).alias("service_namespace"),
        F.to_date(
            F.timestamp_micros(F.expr("CAST(r.timeUnixNano AS LONG) div 1000"))
        ).alias("date"),
    )


SPAN_RECORD = T.StructType(
    [
        T.StructField("traceId", T.StringType()),
        T.StructField("spanId", T.StringType()),
        T.StructField("parentSpanId", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("kind", T.LongType()),
        T.StructField("startTimeUnixNano", T.StringType()),
        T.StructField("endTimeUnixNano", T.StringType()),
        T.StructField("attributes", T.ArrayType(_ATTR)),
        T.StructField(
            "status",
            T.StructType(
                [
                    T.StructField("code", T.LongType()),
                    T.StructField("message", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "events",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("timeUnixNano", T.StringType()),
                        T.StructField("name", T.StringType()),
                        T.StructField("attributes", T.ArrayType(_ATTR)),
                    ]
                )
            ),
        ),
    ]
)

OTLP_TRACES_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceSpans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "resource",
                            T.StructType(
                                [T.StructField("attributes", T.ArrayType(_ATTR))]
                            ),
                        ),
                        T.StructField(
                            "scopeSpans",
                            T.ArrayType(
                                T.StructType(
                                    [T.StructField("spans", T.ArrayType(SPAN_RECORD))]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def flatten_otlp_spans(raw: DataFrame) -> DataFrame:
    """OTLP/JSON ExportTraceServiceRequest → span rows (mirrors
    tracestorage/consumer.go), with the materialized duration column
    the reference computes in ClickHouse (columns_traces.go:277-279).
    """
    rs = raw.select(F.explode("resourceSpans").alias("rs"))
    ss = rs.select(
        _attrs_to_map(F.col("rs.resource.attributes")).alias("resource_attrs"),
        F.explode("rs.scopeSpans").alias("ss"),
    )
    sp = ss.select("resource_attrs", F.explode("ss.spans").alias("s"))
    start = F.col("s.startTimeUnixNano").cast("long")
    end = F.col("s.endTimeUnixNano").cast("long")
    return sp.select(
        F.col("s.traceId").alias("trace_id"),
        F.col("s.spanId").alias("span_id"),
        F.col("s.parentSpanId").alias("parent_span_id"),
        F.col("s.name").alias("name"),
        F.col("s.kind").alias("kind"),
        start.alias("start_ns"),
        end.alias("end_ns"),
        (end - start).alias("duration_ns"),
        F.col("s.status.code").alias("status_code"),
        F.col("s.status.message").alias("status_message"),
        _attrs_to_map(F.col("s.attributes")).alias("attrs"),
        # span events in the engine's events_col shape
        # (traceql/compiler.py: array<struct<name, ts_us, attrs>>)
        F.transform(
            F.col("s.events"),
            lambda e: F.struct(
                e["name"].alias("name"),
                (e["timeUnixNano"].cast("long") / 1000)
                .cast("long")
                .alias("ts_us"),
                _attrs_to_map(e["attributes"]).alias("attrs"),
            ),
        ).alias("events"),
        "resource_attrs",
        F.coalesce(
            F.col("resource_attrs").getItem("service.name"),
            F.lit("unknown_service"),
        ).alias("service_name"),
        F.to_date(
            F.timestamp_micros(F.expr("CAST(s.startTimeUnixNano AS LONG) div 1000"))
        ).alias("date"),
    )


OTLP_EXEMPLAR = T.StructType(
    [
        T.StructField("timeUnixNano", T.StringType()),
        T.StructField("asDouble", T.DoubleType()),
        T.StructField("asInt", T.StringType()),
        T.StructField("traceId", T.StringType()),
        T.StructField("spanId", T.StringType()),
        T.StructField("filteredAttributes", T.ArrayType(_ATTR)),
    ]
)

METRIC_POINT = T.StructType(
    [
        T.StructField("timeUnixNano", T.StringType()),
        T.StructField("asDouble", T.DoubleType()),
        T.StructField("asInt", T.StringType()),
        T.StructField("attributes", T.ArrayType(_ATTR)),
        T.StructField("exemplars", T.ArrayType(OTLP_EXEMPLAR)),
    ]
)

HISTOGRAM_POINT = T.StructType(
    [
        T.StructField("timeUnixNano", T.StringType()),
        T.StructField("count", T.StringType()),
        T.StructField("sum", T.DoubleType()),
        T.StructField("min", T.DoubleType()),
        T.StructField("max", T.DoubleType()),
        T.StructField("bucketCounts", T.ArrayType(T.StringType())),
        T.StructField("explicitBounds", T.ArrayType(T.DoubleType())),
        T.StructField("attributes", T.ArrayType(_ATTR)),
    ]
)

SUMMARY_POINT = T.StructType(
    [
        T.StructField("timeUnixNano", T.StringType()),
        T.StructField("count", T.StringType()),
        T.StructField("sum", T.DoubleType()),
        T.StructField(
            "quantileValues",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("quantile", T.DoubleType()),
                        T.StructField("value", T.DoubleType()),
                    ]
                )
            ),
        ),
        T.StructField("attributes", T.ArrayType(_ATTR)),
    ]
)

EXP_BUCKETS = T.StructType(
    [
        T.StructField("offset", T.LongType()),
        T.StructField("bucketCounts", T.ArrayType(T.StringType())),
    ]
)

EXP_HISTOGRAM_POINT = T.StructType(
    [
        T.StructField("timeUnixNano", T.StringType()),
        T.StructField("count", T.StringType()),
        T.StructField("sum", T.DoubleType()),
        T.StructField("scale", T.LongType()),
        T.StructField("zeroCount", T.StringType()),
        T.StructField("positive", EXP_BUCKETS),
        T.StructField("negative", EXP_BUCKETS),
        T.StructField("attributes", T.ArrayType(_ATTR)),
    ]
)

_METRIC = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("unit", T.StringType()),
        T.StructField(
            "sum",
            T.StructType(
                [
                    T.StructField("dataPoints", T.ArrayType(METRIC_POINT)),
                    T.StructField("isMonotonic", T.BooleanType()),
                ]
            ),
        ),
        T.StructField(
            "gauge",
            T.StructType([T.StructField("dataPoints", T.ArrayType(METRIC_POINT))]),
        ),
        T.StructField(
            "histogram",
            T.StructType(
                [
                    T.StructField("aggregationTemporality", T.LongType()),
                    T.StructField("dataPoints", T.ArrayType(HISTOGRAM_POINT)),
                ]
            ),
        ),
        T.StructField(
            "summary",
            T.StructType(
                [T.StructField("dataPoints", T.ArrayType(SUMMARY_POINT))]
            ),
        ),
        T.StructField(
            "exponentialHistogram",
            T.StructType(
                [
                    T.StructField("aggregationTemporality", T.LongType()),
                    T.StructField(
                        "dataPoints", T.ArrayType(EXP_HISTOGRAM_POINT)
                    ),
                ]
            ),
        ),
    ]
)

OTLP_METRICS_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceMetrics",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "resource",
                            T.StructType(
                                [T.StructField("attributes", T.ArrayType(_ATTR))]
                            ),
                        ),
                        T.StructField(
                            "scopeMetrics",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "metrics", T.ArrayType(_METRIC)
                                        )
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def _fmt_bound(c: Column) -> Column:
    """Float → label string like Go's FormatFloat(v, 'f', -1, 64):
    integral bounds render without a fractional part ("100", not
    "100.0").  Extreme magnitudes that Spark would render in E
    notation don't occur as bucket bounds in practice."""
    return F.when(c == F.floor(c), c.cast("decimal(20,0)").cast("string")).otherwise(
        c.cast("string")
    )


def _metric_frame(raw: DataFrame) -> DataFrame:
    rm = raw.select(F.explode("resourceMetrics").alias("rm"))
    sm = rm.select(
        _attrs_to_map(F.col("rm.resource.attributes")).alias("resource_attrs"),
        F.explode("rm.scopeMetrics").alias("sm"),
    )
    return sm.select("resource_attrs", F.explode("sm.metrics").alias("m"))


_POINT_COLS = [
    "name",
    "unit",
    "is_monotonic",
    "labels",
    "resource_attrs",
    "ts_ns",
    "value",
    "mapping",
]


def flatten_otlp_metrics(raw: DataFrame) -> DataFrame:
    """OTLP/JSON metrics → flat point rows with the canonical series
    hash (mirrors chstorage/inserter_metrics.go).

    Sum/gauge points pass through (``mapping`` = '').  Explicit-bucket
    histograms and summaries are exploded into Prometheus-compatible
    series the way the reference maps them (inserter_metrics.go:221
    addHistogramPoints, :472 addSummaryPoints; suffix scheme
    schema_metrics.go:12-27):

    * histogram → ``_sum``/``_min``/``_max`` (when set), ``_count``,
      and per-bound ``_bucket`` series carrying a cumulative count and
      an ``le`` label, plus the ``le="+Inf"`` bucket equal to the
      datapoint count (trailing overflow counts folded in).
    * summary → ``_count``, ``_sum``, and per-quantile series under
      the original name with a ``quantile`` label.
    """
    m = _metric_frame(raw)
    pts = m.filter(
        F.col("m.sum").isNotNull() | F.col("m.gauge").isNotNull()
    ).select(
        "resource_attrs",
        F.col("m.name").alias("name"),
        F.col("m.unit").alias("unit"),
        F.coalesce(F.col("m.sum.isMonotonic"), F.lit(False)).alias("is_monotonic"),
        F.explode(
            F.coalesce(F.col("m.sum.dataPoints"), F.col("m.gauge.dataPoints"))
        ).alias("p"),
    )
    plain = pts.select(
        "name",
        "unit",
        "is_monotonic",
        _attrs_to_map(F.col("p.attributes")).alias("labels"),
        "resource_attrs",
        F.col("p.timeUnixNano").cast("long").alias("ts_ns"),
        F.coalesce(F.col("p.asDouble"), F.col("p.asInt").cast("double")).alias(
            "value"
        ),
        F.lit("").alias("mapping"),
    )
    out = plain.unionByName(explode_histogram_points(m)).unionByName(
        explode_summary_points(m)
    )
    return out.withColumn("series_hash", series_key(F.col("name"), F.col("labels")))


def flatten_otlp_exemplars(raw: DataFrame) -> DataFrame:
    """OTLP metric exemplars → rows for the exemplars table
    (chstorage/schema.go:19, inserter_metrics.go exemplar columns):
    one row per exemplar with the owning series name/labels, the
    exemplar value/ts and the trace/span promotion."""
    m = _metric_frame(raw)
    pts = m.filter(
        F.col("m.sum").isNotNull() | F.col("m.gauge").isNotNull()
    ).select(
        "resource_attrs",
        F.col("m.name").alias("name"),
        F.explode(
            F.coalesce(F.col("m.sum.dataPoints"), F.col("m.gauge.dataPoints"))
        ).alias("p"),
    )
    e = pts.select(
        "name",
        _attrs_to_map(F.col("p.attributes")).alias("labels"),
        "resource_attrs",
        F.explode(F.coalesce(F.col("p.exemplars"), F.array())).alias("ex"),
    )
    return e.select(
        "name",
        "labels",
        "resource_attrs",
        F.col("ex.timeUnixNano").cast("long").alias("ts_ns"),
        F.coalesce(
            F.col("ex.asDouble"), F.col("ex.asInt").cast("double")
        ).alias("value"),
        F.coalesce(F.col("ex.traceId"), F.lit("")).alias("trace_id"),
        F.coalesce(F.col("ex.spanId"), F.lit("")).alias("span_id"),
        _attrs_to_map(F.col("ex.filteredAttributes")).alias("filtered_attrs"),
    )


def flatten_otlp_exp_histograms(raw: DataFrame) -> DataFrame:
    """OTLP exponential-histogram datapoints → native-state rows (the
    reference keeps these as bucket arrays in their own table,
    ``metrics_exp_histograms``, chstorage/columns_metrics.go:181-230 —
    decode to value space happens at query time, at ANY scale)."""
    h = _metric_frame(raw).filter(
        F.col("m.exponentialHistogram").isNotNull()
    ).select(
        "resource_attrs",
        F.col("m.name").alias("name"),
        F.col("m.unit").alias("unit"),
        F.explode("m.exponentialHistogram.dataPoints").alias("p"),
    )
    longs = lambda c: F.transform(  # noqa: E731
        F.coalesce(c, F.array()), lambda x: x.cast("long")
    )
    return h.select(
        "name",
        "unit",
        _attrs_to_map(F.col("p.attributes")).alias("labels"),
        "resource_attrs",
        F.col("p.timeUnixNano").cast("long").alias("ts_ns"),
        F.col("p.count").cast("long").alias("count"),
        F.col("p.sum").alias("sum"),
        F.col("p.scale").cast("int").alias("scale"),
        F.coalesce(F.col("p.zeroCount").cast("long"), F.lit(0)).alias(
            "zero_count"
        ),
        F.coalesce(F.col("p.positive.offset"), F.lit(0))
        .cast("int")
        .alias("positive_offset"),
        longs(F.col("p.positive.bucketCounts")).alias("positive_counts"),
        F.coalesce(F.col("p.negative.offset"), F.lit(0))
        .cast("int")
        .alias("negative_offset"),
        longs(F.col("p.negative.bucketCounts")).alias("negative_counts"),
    )


def explode_histogram_points(m: DataFrame) -> DataFrame:
    """Histogram datapoints → mapped ``_bucket``/``_count``/``_sum``/
    ``_min``/``_max`` series rows (one per suffix/bound)."""
    h = m.filter(F.col("m.histogram").isNotNull()).select(
        "resource_attrs",
        F.col("m.name").alias("base"),
        F.col("m.unit").alias("unit"),
        F.explode("m.histogram.dataPoints").alias("p"),
    )
    counts = F.transform(F.col("p.bucketCounts"), lambda c: c.cast("long"))
    total = F.aggregate(counts, F.lit(0).cast("long"), lambda a, x: a + x)
    h = h.select(
        "resource_attrs",
        "base",
        "unit",
        _attrs_to_map(F.col("p.attributes")).alias("labels"),
        F.col("p.timeUnixNano").cast("long").alias("ts_ns"),
        F.col("p.count").cast("double").alias("count"),
        F.col("p.sum").alias("sum"),
        F.col("p.min").alias("min"),
        F.col("p.max").alias("max"),
        counts.alias("counts"),
        F.col("p.explicitBounds").alias("bounds"),
        total.cast("double").alias("total"),
    )

    def scalar(suffix: str, value: Column, mapping: str) -> DataFrame:
        # sum/min/max/count series drop the unit, like the reference
        return h.filter(value.isNotNull()).select(
            F.concat(F.col("base"), F.lit(suffix)).alias("name"),
            F.lit("").alias("unit"),
            F.lit(False).alias("is_monotonic"),
            "labels",
            "resource_attrs",
            "ts_ns",
            value.alias("value"),
            F.lit(mapping).alias("mapping"),
        )

    scalars = (
        scalar("_sum", F.col("sum"), "histogram_sum")
        .unionByName(scalar("_min", F.col("min"), "histogram_min"))
        .unionByName(scalar("_max", F.col("max"), "histogram_max"))
        .unionByName(scalar("_count", F.col("count"), "histogram_count"))
    )
    # finite buckets: cumulative count at bound i = Σ counts[..i]
    finite = h.select(
        "*", F.posexplode(F.col("bounds")).alias("i", "bound")
    ).select(
        F.concat(F.col("base"), F.lit("_bucket")).alias("name"),
        F.col("unit"),
        F.lit(False).alias("is_monotonic"),
        F.map_concat(
            "labels", F.create_map(F.lit("le"), _fmt_bound(F.col("bound")))
        ).alias("labels"),
        "resource_attrs",
        "ts_ns",
        F.aggregate(
            F.slice(F.col("counts"), F.lit(1), F.col("i") + 1),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )
        .cast("double")
        .alias("value"),
        F.lit("histogram_bucket").alias("mapping"),
    )
    # +Inf bucket = all counts including the trailing overflow bucket,
    # so it always equals the datapoint count (Prometheus convention)
    inf = h.select(
        F.concat(F.col("base"), F.lit("_bucket")).alias("name"),
        F.col("unit"),
        F.lit(False).alias("is_monotonic"),
        F.map_concat(
            "labels", F.create_map(F.lit("le"), F.lit("+Inf"))
        ).alias("labels"),
        "resource_attrs",
        "ts_ns",
        F.col("total").alias("value"),
        F.lit("histogram_bucket").alias("mapping"),
    )
    return scalars.unionByName(finite).unionByName(inf)


def explode_summary_points(m: DataFrame) -> DataFrame:
    """Summary datapoints → ``_count``/``_sum`` series plus
    per-quantile series under the original name."""
    s = m.filter(F.col("m.summary").isNotNull()).select(
        "resource_attrs",
        F.col("m.name").alias("base"),
        F.col("m.unit").alias("unit"),
        F.explode("m.summary.dataPoints").alias("p"),
    ).select(
        "resource_attrs",
        "base",
        "unit",
        _attrs_to_map(F.col("p.attributes")).alias("labels"),
        F.col("p.timeUnixNano").cast("long").alias("ts_ns"),
        F.col("p.count").cast("double").alias("count"),
        F.col("p.sum").alias("sum"),
        F.col("p.quantileValues").alias("qv"),
    )

    def scalar(suffix: str, value: Column, mapping: str) -> DataFrame:
        return s.filter(value.isNotNull()).select(
            F.concat(F.col("base"), F.lit(suffix)).alias("name"),
            F.lit("").alias("unit"),
            F.lit(False).alias("is_monotonic"),
            "labels",
            "resource_attrs",
            "ts_ns",
            value.alias("value"),
            F.lit(mapping).alias("mapping"),
        )

    scalars = scalar("_count", F.col("count"), "summary_count").unionByName(
        scalar("_sum", F.col("sum"), "summary_sum")
    )
    quantiles = s.select(
        "*", F.explode(F.col("qv")).alias("q")
    ).select(
        F.col("base").alias("name"),
        F.col("unit"),
        F.lit(False).alias("is_monotonic"),
        F.map_concat(
            "labels",
            F.create_map(F.lit("quantile"), _fmt_bound(F.col("q.quantile"))),
        ).alias("labels"),
        "resource_attrs",
        "ts_ns",
        F.col("q.value").alias("value"),
        F.lit("summary_quantile").alias("mapping"),
    )
    return scalars.unionByName(quantiles)


def series_key(name: Column, labels: Column) -> Column:
    """Canonical series hash: metric name + sorted label map entries →
    md5 (the reference xxh3-128-hashes sorted attr maps,
    otelstorage/hash.go:15-25; md5 here — stable, portable)."""
    canon = F.concat_ws(
        ";",
        name,
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.map_entries(labels)),
                lambda e: F.concat_ws("=", e["key"], e["value"]),
            ),
        ),
    )
    return F.md5(canon)
