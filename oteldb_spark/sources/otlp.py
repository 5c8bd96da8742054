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
            F.timestamp_micros((F.col("r.timeUnixNano").cast("long") / 1000).cast("long"))
        ).alias("date"),
    )


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
