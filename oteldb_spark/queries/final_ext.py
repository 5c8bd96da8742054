"""Final SURVEY §2 items: exemplars, TraceQL metrics (served here,
501 in the reference), Loki pattern mining."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.range_agg import range_aggregate
from ..operators.stepfanout import fanout_join_sql
from ..signals import (
    COUNTERS_CTE,
    LOGS_CTE,
    SPANS_CTE,
    counter_points_frame,
    logs_frame,
    spans_frame,
    with_ctes,
)
from .registry import END_US, RANGE_S, RANGE_US, START_US, STEP_US, register


# exemplars: error-type points carry a trace reference
# (metrics_exemplars table, querier_metrics_exemplars.go) — select
# exemplars for a selector in a time range
@register(
    "promql_exemplars",
    with_ctes(
        COUNTERS_CTE,
        body=f"""SELECT mtype, instance, ts_us, gauge AS value,
       printf('%032x', event_id) AS trace_id
FROM counters
WHERE mtype = 'error' AND ts_us BETWEEN {START_US} AND {END_US}
  AND event_id % 10 = 0""",
    ),
)
def promql_exemplars(spark, sf_dir):
    pts = counter_points_frame(spark, sf_dir)
    return (
        pts.filter(
            (F.col("mtype") == "error")
            & F.col("ts_us").between(START_US, END_US)
            & (F.col("event_id") % 10 == 0)
        )
        .select(
            "mtype",
            "instance",
            "ts_us",
            F.col("gauge").alias("value"),
            F.format_string("%032x", F.col("event_id")).alias("trace_id"),
        )
    )


# TraceQL metrics: rate of matching spans per step — parsed-but-501 in
# the reference (tempohandler.go:89-120); served here by reusing the
# shared step machinery over span start times.  Spans live on the
# TPC-H date axis (1995-2001), so this query evaluates 1996 at weekly
# steps with 28-day windows.
_SPAN_START_US = 820_454_400_000_000  # 1996-01-01
_SPAN_END_US = _SPAN_START_US + 364 * 86_400_000_000
_SPAN_STEP_US = 7 * 86_400_000_000
_SPAN_RANGE_US = 28 * 86_400_000_000
_SPAN_RANGE_S = _SPAN_RANGE_US / 1e6

_SPAN_SAMPLES = (
    "samples AS (SELECT service, start_us AS ts_us FROM spans WHERE status_code = 2)"
)


@register(
    "tql_metrics_rate",
    with_ctes(
        SPANS_CTE,
        _SPAN_SAMPLES,
        body=f"""SELECT service, step_us,
       CAST(count(*) AS DOUBLE) / {_SPAN_RANGE_S!r} AS value
FROM {fanout_join_sql("samples", _SPAN_START_US, _SPAN_END_US, _SPAN_STEP_US, _SPAN_RANGE_US)} s
GROUP BY service, step_us""",
    ),
)
def tql_metrics_rate(spark, sf_dir):
    spans = spans_frame(spark, sf_dir)
    samples = spans.filter(F.col("status_code") == 2).select(
        "service", F.col("start_us").alias("ts_us"), F.lit(1.0).alias("sample")
    )
    return range_aggregate(
        samples,
        "rate",
        start_us=_SPAN_START_US,
        end_us=_SPAN_END_US,
        step_us=_SPAN_STEP_US,
        range_us=_SPAN_RANGE_US,
        by=["service"],
    )


# Loki patterns endpoint: template mining — numbers → <_> wildcards,
# count occurrences per detected pattern (lokihandler patterns); runs
# over the logfmt view so distinct templates exist per event type
@register(
    "logql_patterns",
    None,  # oracle attached below (needs the logfmt CTE)
)
def logql_patterns(spark, sf_dir):
    from .logql_parsers import _logfmt_frame

    df = _logfmt_frame(spark, sf_dir)
    return df.groupBy(
        F.regexp_replace("body", "[0-9]+(\\.[0-9]+)?", "<_>").alias("pattern")
    ).agg(F.count(F.lit(1)).cast("long").alias("occurrences"))


# Loki detected_fields: fields parsed out of the log bodies with an
# inferred type and cardinality (lokihandler detected_fields)
@register(
    "logql_detected_fields",
    None,  # oracle attached below (needs the logfmt CTE)
)
def logql_detected_fields(spark, sf_dir):
    from .logql_parsers import _logfmt_frame
    from ..functions.parsers import logfmt_map

    df = _logfmt_frame(spark, sf_dir)
    m = logfmt_map("body")
    parts = []
    for field, ftype in [
        ("evt", "string"),
        ("user", "int"),
        ("took", "duration"),
        ("sz", "bytes"),
        ("ip", "ip"),
    ]:
        parts.append(
            df.select(m.getItem(field).alias("v")).agg(
                F.lit(field).alias("field"),
                F.lit(ftype).alias("ftype"),
                F.countDistinct("v").cast("long").alias("cardinality"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _detected_fields_oracle() -> str:
    from .logql_parsers import _LOGFMT_CTE

    unions = []
    for field, ftype, rx in [
        ("evt", "string", "evt=([a-z]+)"),
        ("user", "int", "user=([0-9]+)"),
        ("took", "duration", "took=([0-9.]+ms)"),
        ("sz", "bytes", "sz=([0-9]+KB)"),
        ("ip", "ip", "ip=([0-9.]+)$"),
    ]:
        unions.append(
            f"SELECT '{field}' AS field, '{ftype}' AS ftype,\n"
            f"       CAST(count(DISTINCT regexp_extract(body, '{rx}', 1)) AS BIGINT)"
            f" AS cardinality FROM logfmt_logs"
        )
    return with_ctes(LOGS_CTE, _LOGFMT_CTE, body="\nUNION ALL\n".join(unions))


def _patterns_oracle() -> str:
    from .logql_parsers import _LOGFMT_CTE

    return with_ctes(
        LOGS_CTE,
        _LOGFMT_CTE,
        body="""SELECT regexp_replace(body, '[0-9]+(\\.[0-9]+)?', '<_>', 'g')
         AS pattern,
       CAST(count(*) AS BIGINT) AS occurrences
FROM logfmt_logs GROUP BY 1""",
    )


from .registry import ORACLES  # noqa: E402

ORACLES["logql_patterns"] = _patterns_oracle()
ORACLES["logql_detected_fields"] = _detected_fields_oracle()
