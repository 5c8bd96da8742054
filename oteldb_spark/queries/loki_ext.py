"""Loki secondary-endpoint gates: index/volume_range and
detected_field/{field}/values, both running through the LogQLEngine
facade (lokihandler.go:62-113, 445-556) rather than hand-built plans.
"""

from __future__ import annotations

from ..engine import LogQLEngine
from ..logql import LogSource
from ..operators.stepfanout import fanout_join_sql
from ..signals import LOGS_CTE, logs_frame, with_ctes
from .registry import END_US, START_US, STEP_US, register

_LBL = {"service": "service", "env": "env", "level": "level"}


def _engine(spark, sf_dir) -> LogQLEngine:
    return LogQLEngine(
        source=LogSource(df=logs_frame(spark, sf_dir), label_cols=dict(_LBL)),
        spark=spark,
    )


# volume_range: the reference synthesizes
#   sum by (target_labels) (count_over_time({sel}[end-start]))
# and evaluates it at the single instant `end`
# (lokihandler.go:494-556: evalVolumeQuery sets Start=End).
_VOL_RANGE_US = END_US - START_US
_VOL_FAN = fanout_join_sql("samples", END_US, END_US, STEP_US, _VOL_RANGE_US)


@register(
    "logql_volume_range",
    with_ctes(
        LOGS_CTE,
        "samples AS (SELECT service, level, ts_us FROM logs WHERE env = 'prod')",
        body=f"""SELECT level, service, step_us, CAST(count(*) AS DOUBLE) AS value
FROM {_VOL_FAN} s GROUP BY service, level, step_us""",
    ),
)
def logql_volume_range(spark, sf_dir):
    return _engine(spark, sf_dir).volume_frame(
        '{env="prod"}',
        START_US,
        END_US,
        STEP_US,
        target_labels=["service", "level"],
    )


# detected_field/{field}/values: distinct values of a body-parsed
# field under a selector + time range (lokihandler.go:62-113; the
# ref's LabelValues over materialized_fields in logstorage).
@register(
    "logql_detected_field_values",
    None,  # oracle attached below (needs the logfmt CTE)
)
def logql_detected_field_values(spark, sf_dir):
    from .logql_parsers import _logfmt_frame

    eng = LogQLEngine(
        source=LogSource(
            df=_logfmt_frame(spark, sf_dir),
            label_cols={"service": "service", "level": "level"},
        ),
        spark=spark,
    )
    return eng.detected_field_values_frame(
        "evt", '{level="INFO"}', START_US, END_US, parser="logfmt"
    )


def _dfv_oracle() -> str:
    from .logql_parsers import _LOGFMT_CTE

    return with_ctes(
        LOGS_CTE,
        _LOGFMT_CTE,
        body=f"""SELECT DISTINCT regexp_extract(body, 'evt=([^ ]+)', 1) AS value
FROM logfmt_logs
WHERE level = 'INFO' AND ts_us BETWEEN {START_US} AND {END_US}""",
    )


from .registry import ORACLES  # noqa: E402

ORACLES["logql_detected_field_values"] = _dfv_oracle()


# __error__ labels: parse failures become labels instead of dropped
# rows (logqlengine pipeline error model) — a fifth of the bodies are
# doctored to non-JSON and must group under JSONParserErr
@register(
    "logql_error_labels",
    with_ctes(
        LOGS_CTE,
        f"""doct AS (
  SELECT ts_us,
         CASE WHEN user_id % 5 = 0 THEN 'plain text line' ELSE body END
           AS body,
         CASE WHEN user_id % 5 = 0 THEN 'JSONParserErr' ELSE '' END
           AS err
  FROM logs WHERE env = 'prod'
)""",
        body=f"""SELECT err AS __error__, step_us,
       CAST(count(*) AS DOUBLE) AS value
FROM {fanout_join_sql("doct", START_US, END_US, STEP_US, 6 * 3_600_000_000)} s
GROUP BY err, step_us""",
    ),
)
def logql_error_labels(spark, sf_dir):
    from pyspark.sql import functions as F

    from ..logql import EvalParams, compile_logql

    logs = logs_frame(spark, sf_dir)
    doctored = logs.withColumn(
        "body",
        F.when(F.col("user_id") % 5 == 0, F.lit("plain text line")).otherwise(
            F.col("body")
        ),
    )
    src = LogSource(df=doctored, label_cols=dict(_LBL), error_labels=True)
    out = compile_logql(
        'sum by (__error__) (count_over_time({env="prod"} | json kv="k" [6h]))',
        src,
        EvalParams(START_US, END_US, STEP_US),
        spark,
    )
    return out.withColumn(
        "__error__", F.coalesce(F.col("__error__"), F.lit(""))
    )


# ingest deduction round-trip (logparser/deduce.go): bodies rebuilt
# as raw JSON lines with free-text levels (word / lower / single
# letter) and integer timestamps in rotating resolutions; the
# enrichment must recover the severity number and the ns timestamp
# up to the resolution truncation
@register(
    "logql_deduce_enrich",
    with_ctes(
        LOGS_CTE,
        """raw AS (
  SELECT event_id, severity_number, ts_us * 1000 AS ts_ns,
         CASE event_id % 3
           WHEN 0 THEN level
           WHEN 1 THEN lower(level)
           ELSE lower(substr(level, 1, 1)) END AS lvl_text,
         CASE event_id % 4
           WHEN 0 THEN ts_ns
           WHEN 1 THEN ts_ns // 1000
           WHEN 2 THEN ts_ns // 1000000
           ELSE ts_ns // 1000000000 END AS ts_raw,
         CASE event_id % 4
           WHEN 0 THEN 1 WHEN 1 THEN 1000
           WHEN 2 THEN 1000000 ELSE 1000000000 END AS unit
  FROM logs
)""",
        body="""SELECT event_id,
       CAST(severity_number AS INT) AS deduced_severity,
       CAST(ts_raw * unit AS BIGINT) AS deduced_ts_ns
FROM raw""",
    ),
)
def logql_deduce_enrich(spark, sf_dir):
    from pyspark.sql import functions as F

    from ..sources.deduce import enrich_json_lines

    # spread: the per-row deduce parse (regex severity + resolution
    # sniffing) otherwise runs inside the one-file scan stage
    # (r10 noop-sink audit: 2.9 s single-task)
    logs = logs_frame(spark, sf_dir, spread=True)
    lvl = (
        F.when(F.col("event_id") % 3 == 0, F.col("level"))
        .when(F.col("event_id") % 3 == 1, F.lower(F.col("level")))
        .otherwise(F.lower(F.substring(F.col("level"), 1, 1)))
    )
    # ns base from ts_us: DuckDB reads the ns parquet timestamp
    # truncated to µs, so both sides start from the µs value
    ns = (F.col("ts_us") * 1000).alias("ns")
    ts_raw = (
        F.when(F.col("event_id") % 4 == 0, ns)
        .when(F.col("event_id") % 4 == 1, F.expr("ts_us * 1000 div 1000"))
        .when(F.col("event_id") % 4 == 2, F.expr("ts_us * 1000 div 1000000"))
        .otherwise(F.expr("ts_us * 1000 div 1000000000"))
    )
    raw = logs.select(
        "event_id",
        F.concat(
            F.lit('{"level": "'),
            lvl,
            F.lit('", "ts": '),
            ts_raw.cast("string"),
            F.lit("}"),
        ).alias("body"),
    )
    out = enrich_json_lines(raw)
    return out.select(
        "event_id",
        F.col("deduced_severity"),
        F.col("deduced_ts_ns").cast("long").alias("deduced_ts_ns"),
    )


# collector line-format parsers (logparser/klog.go,
# zap_development.go): events rebuilt as alternating klog / zap-dev
# raw lines; the auto-detecting parser must recover timestamp (µs),
# severity and origin for every line
@register(
    "logql_lineformat_parse",
    with_ctes(
        LOGS_CTE,
        """built AS (
  SELECT event_id, severity_number, ts_us, service,
         CASE WHEN event_id % 2 = 0
           THEN CASE severity_number WHEN 17 THEN 'E' WHEN 9 THEN 'I'
                     ELSE 'D' END
                || strftime(make_timestamp(ts_us), '%m%d %H:%M:%S.%f')
                || ' ' || CAST(event_id % 100000 AS VARCHAR)
                || ' ' || service || '.go:42] event body'
           ELSE strftime(make_timestamp(ts_us), '%Y-%m-%dT%H:%M:%S.%g')
                || 'Z' || chr(9)
                || CASE severity_number WHEN 17 THEN 'ERROR'
                        WHEN 9 THEN 'INFO' ELSE 'DEBUG' END
                || chr(9) || service || chr(9) || 'event body'
         END AS line
  FROM logs
)""",
    body="""SELECT event_id,
       CASE WHEN event_id % 2 = 0 THEN ts_us
            ELSE ts_us // 1000 * 1000 END AS p_ts_us,
       CAST(severity_number AS INT) AS p_sev,
       CASE WHEN event_id % 2 = 0 THEN service || '.go:42' ELSE service END
         AS p_origin
FROM built""",
    ),
)
def logql_lineformat_parse(spark, sf_dir):
    from pyspark.sql import functions as F

    from ..sources.lineformats import parse_lines

    # spread: the auto-detecting klog/zap parse is the heaviest
    # per-row expression in the registry (r10 noop-sink audit: 5.3 s
    # single-task inside the one-file scan)
    logs = logs_frame(spark, sf_dir, spread=True)
    sev_letter = (
        F.when(F.col("severity_number") == 17, F.lit("E"))
        .when(F.col("severity_number") == 9, F.lit("I"))
        .otherwise(F.lit("D"))
    )
    sev_word = (
        F.when(F.col("severity_number") == 17, F.lit("ERROR"))
        .when(F.col("severity_number") == 9, F.lit("INFO"))
        .otherwise(F.lit("DEBUG"))
    )
    ts = F.timestamp_micros(F.col("ts_us"))
    klog_line = F.concat(
        sev_letter,
        F.date_format(ts, "MMdd HH:mm:ss."),
        F.lpad((F.col("ts_us") % 1_000_000).cast("string"), 6, "0"),
        F.lit(" "),
        (F.col("event_id") % 100_000).cast("string"),
        F.lit(" "),
        F.col("service"),
        F.lit(".go:42] event body"),
    )
    zap_line = F.concat(
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss."),
        F.lpad(((F.col("ts_us") % 1_000_000) / 1000).cast("int").cast("string"), 3, "0"),
        F.lit("Z\t"),
        sev_word,
        F.lit("\t"),
        F.col("service"),
        F.lit("\tevent body"),
    )
    built = logs.select(
        "event_id",
        F.when(F.col("event_id") % 2 == 0, klog_line)
        .otherwise(zap_line)
        .alias("body"),
    )
    # barrier: three struct-field mentions below would otherwise each
    # re-run the full two-format parse (and project-collapse drags
    # them below the spread repartition into the one-file scan)
    out = parse_lines(built, year=2024, barrier=True)
    return out.select(
        "event_id",
        F.col("parsed.ts_us").alias("p_ts_us"),
        F.col("parsed.severity_number").alias("p_sev"),
        F.col("parsed.origin").alias("p_origin"),
    )


# docker daemon multiplexed-stream decode (dockerlog/daemonlog.go):
# fixture streams built from events (stdout for normal events, stderr
# for errors), decoded by the real executor-side frame walker
_DOCKER_LIMIT = 400


@register(
    "logql_docker_stream",
    with_ctes(
        LOGS_CTE,
        body=f"""SELECT event_id,
       CAST(ts_us AS BIGINT) AS ts_us,
       CASE WHEN event_type = 'error' THEN 'stderr' ELSE 'stdout' END
         AS stream,
       'evt ' || CAST(event_id AS VARCHAR) AS body
FROM logs WHERE event_id < {_DOCKER_LIMIT}""",
    ),
)
def logql_docker_stream(spark, sf_dir):
    from pyspark.sql import functions as F

    from ..sources.dockerlog import docker_stream_rows, encode_docker_stream

    rows = (
        logs_frame(spark, sf_dir)
        .filter(F.col("event_id") < _DOCKER_LIMIT)
        .select("event_id", "ts_us", "event_type")
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: r.event_id):
        typ = 2 if r.event_type == "error" else 1
        by_type.setdefault(r.event_type, []).append(
            (typ, r.ts_us * 1000, f"evt {r.event_id}")
        )
    from ..sources.payloads import payload_frame

    # Arrow-built local frame: one JVM partition per payload, no
    # Python-pickle scan (this was the one unsliced payload DF left
    # after r12 — VERDICT r12 Wrong #4)
    pdf = payload_frame(
        spark, [encode_docker_stream(by_type[t]) for t in sorted(by_type)]
    )
    out = docker_stream_rows(pdf)
    return out.select(
        F.regexp_extract("body", r"evt (\d+)", 1).cast("long").alias(
            "event_id"
        ),
        "ts_us",
        "stream",
        "body",
    )


# ---------------------------------------------------------- token bloom

# tokenbf_v1 skip-index analog (SURVEY §1.2; ref chsql/token.go
# hasToken prefilters): per stream partition (service) a bloom of the
# tokens it contains — here the user-id tokens, two md5-derived bit
# positions in a 1024-bit domain.  A line-filter probe consults the
# bloom FIRST and scans only partitions whose bloom can contain the
# token; false positives cost a scan, never correctness.  The bit
# sets are deterministic, so the oracle replays the prefilter
# decision exactly.
_BLOOM_BITS = 1024
_BLOOM_PROBES = [17, 42, 999]


def _bloom_bit_sql(expr: str, salt: int) -> str:
    return (
        f"CAST('0x' || substr(md5('{salt}_' || {expr}), 1, 15) AS BIGINT)"
        f" % {_BLOOM_BITS}"
    )


@register(
    "logql_token_bloom_prefilter",
    f"""WITH {LOGS_CTE},
bloom AS (
  SELECT service, h.s AS s, {_bloom_bit_sql('user_id', 0).replace("'0_'", "h.s || '_'")} AS bit
  FROM logs, (SELECT unnest([0, 1]) AS s) h
  GROUP BY service, h.s, bit
),
probes AS (SELECT unnest({_BLOOM_PROBES}) AS probe),
probe_bits AS (
  SELECT probe, h.s AS s, {_bloom_bit_sql('probe', 0).replace("'0_'", "h.s || '_'")} AS bit
  FROM probes, (SELECT unnest([0, 1]) AS s) h
)
SELECT pb.probe, b.service
FROM probe_bits pb JOIN bloom b ON b.s = pb.s AND b.bit = pb.bit
GROUP BY pb.probe, b.service
HAVING count(*) = 2""",
)
def logql_token_bloom_prefilter(spark, sf_dir):
    from pyspark.sql import functions as F

    logs = logs_frame(spark, sf_dir)

    def bit(salt_col, expr_col):
        return (
            F.expr(
                f"cast(conv(substr(md5(concat({salt_col}, '_', {expr_col})),"
                " 1, 15), 16, 10) as bigint)"
            )
            % _BLOOM_BITS
        )

    salts = F.explode(F.array(F.lit(0), F.lit(1))).alias("s")
    # dedup (service, user_id) BEFORE hashing: the bloom bit is a pure
    # function of (salt, token), so hashing after the distinct does the
    # md5 work on the pair cardinality (≤ services × users, 12k here)
    # instead of the row count (200k salted rows), and does it parallel
    # above the exchange instead of inside the one-file scan stage
    # (r9 parallelism audit: 846 ms single-task)
    bloom = (
        logs.select("service", "user_id")
        .distinct()
        .select("service", "user_id", salts)
        .select("service", "s", bit("s", "user_id").alias("bit"))
        .distinct()
    )
    probes = (
        spark.createDataFrame([(p,) for p in _BLOOM_PROBES], "probe long")
        .select("probe", salts)
        .select("probe", "s", bit("s", "probe").alias("bit"))
    )
    return (
        bloom.join(F.broadcast(probes), ["s", "bit"])
        .groupBy("probe", "service")
        .agg(F.count(F.lit(1)).alias("nbits"))
        .filter(F.col("nbits") == 2)
        .select("probe", "service")
    )


# detected_labels: stream-label cardinalities under a selector
# (lokihandler.go:165-212; chstorage querier_logs.go:247-340 scans
# only the deduplicated resource maps — the record-attr long tail is
# detected_fields' domain).  Empty values don't count (absent attr).
@register(
    "logql_detected_labels_selector",
    with_ctes(
        LOGS_CTE,
        f"""m AS (SELECT * FROM logs
  WHERE env = 'prod' AND ts_us BETWEEN {START_US} AND {END_US})""",
        """u AS (
  SELECT 'env' AS label, env AS value FROM m
  UNION ALL SELECT 'level', level FROM m
  UNION ALL SELECT 'service', service FROM m
)""",
        body="""SELECT label, count(DISTINCT value) AS cardinality
FROM u WHERE value IS NOT NULL AND value <> ''
GROUP BY label""",
    ),
)
def logql_detected_labels(spark, sf_dir):
    return _engine(spark, sf_dir).detected_labels_frame(
        '{env="prod"}', START_US, END_US
    )
