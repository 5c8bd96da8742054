"""LogQL parser/format pipeline stages (SURVEY §2.2) — logfmt,
pattern, regexp, unpack, line_format, decolorize, and the typed label
filters (duration / bytes / IP).

The testdata bodies are JSON, so each query synthesizes the stage's
input shape (logfmt line, ANSI-colored line, packed JSON, duration/
bytes/IP labels) from event columns — identically in Spark and in the
DuckDB oracle — then exercises the REAL parser implementation on the
Spark side (functions/parsers.py, functions/templates.py).  The oracle
re-derives the expected output with plain SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.parsers import (
    barrier_cols,
    decolorize,
    ip_in_cidr,
    logfmt_map,
    parse_bytes,
    parse_duration_seconds,
    pattern_extract,
)
from ..functions.templates import compile_template
from ..signals import LOGS_CTE, logs_frame, with_ctes
from .registry import register

# logfmt line synthesized from event columns; `k` is the JSON body key
_K = "CAST(json_extract_string(body, '$.k') AS BIGINT)"
_LOGFMT_CTE = f"""logfmt_logs AS (
  SELECT event_id, ts_us, service, level, user_id, value,
         'evt=' || event_type || ' user=' || user_id || ' took=' || value ||
         'ms sz=' || {_K} || 'KB ip=10.' || (user_id // 100) || '.' ||
         ((user_id // 10) % 10) || '.' || (user_id % 10) AS body
  FROM logs
)"""


def _logfmt_frame(spark, sf_dir):
    # spread: every consumer runs the full logfmt tokenizer per row —
    # a one-file scan pins that regex work to one core at gate scale
    logs = logs_frame(spark, sf_dir, spread=True)
    k = F.get_json_object("body", "$.k").cast("long")
    body = F.concat(
        F.lit("evt="),
        F.col("event_type"),
        F.lit(" user="),
        F.col("user_id").cast("string"),
        F.lit(" took="),
        F.col("value").cast("string"),
        F.lit("ms sz="),
        k.cast("string"),
        F.lit("KB ip=10."),
        (F.col("user_id") / 100).cast("long").cast("string"),
        F.lit("."),
        ((F.col("user_id") / 10).cast("long") % 10).cast("string"),
        F.lit("."),
        (F.col("user_id") % 10).cast("string"),
    )
    return logs.select(
        "event_id", "ts_us", "service", "level", "user_id", "value", body.alias("body")
    )


# {} | logfmt | took > 200ms — logfmt parser + duration label filter
@register(
    "logql_logfmt_parser",
    with_ctes(
        LOGS_CTE,
        _LOGFMT_CTE,
        body="""SELECT event_id,
       CAST(regexp_extract(body, 'user=([0-9]+)', 1) AS BIGINT) AS user,
       CAST(regexp_extract(body, 'took=([0-9.]+)ms', 1) AS DOUBLE) * 0.001
         AS took_s
FROM logfmt_logs
WHERE CAST(regexp_extract(body, 'took=([0-9.]+)ms', 1) AS DOUBLE) * 0.001 > 0.2""",
    ),
)
def logql_logfmt_parser(spark, sf_dir):
    df = _logfmt_frame(spark, sf_dir)
    # barrier the MAP itself: both labels derive from one parse
    df = barrier_cols(df, {"__m": logfmt_map("body")})
    return (
        df.withColumn("user", F.col("__m")["user"].cast("long"))
        .withColumn("took_s", parse_duration_seconds(F.col("__m")["took"]))
        .filter(F.col("took_s") > 0.2)
        .select("event_id", "user", "took_s")
    )


# {} |> pattern — pattern parser `evt=<evt> user=<user> took=<_> sz=<_> ip=<ip>`
@register(
    "logql_pattern_parser",
    with_ctes(
        LOGS_CTE,
        _LOGFMT_CTE,
        body="""SELECT event_id,
       regexp_extract(body, '^evt=(.*?) user=', 1) AS evt,
       regexp_extract(body, ' user=(.*?) took=', 1) AS user,
       regexp_extract(body, ' ip=(.*)$', 1) AS ip
FROM logfmt_logs
WHERE regexp_extract(body, '^evt=(.*?) user=', 1) = 'purchase'""",
    ),
)
def logql_pattern_parser(spark, sf_dir):
    from ..functions.parsers import barrier_cols

    df = _logfmt_frame(spark, sf_dir)
    caps = pattern_extract(
        F.col("body"), "evt=<evt> user=<user> took=<_> sz=<_> ip=<ip>"
    )
    # barrier: the evt capture feeds the FILTER, which Catalyst would
    # otherwise push below _logfmt_frame's spread back into the
    # one-file scan stage (649ms single-task in PARALLELISM_r10's
    # audit) — a filter cannot cross the barrier's Generate
    return (
        barrier_cols(
            df, {"evt": caps["evt"], "user": caps["user"], "ip": caps["ip"]}
        )
        .filter(F.col("evt") == "purchase")
        .select("event_id", "evt", "user", "ip")
    )


# {} | regexp `"k": (?P<knum>[0-9]+)` — regexp parser with capture group
@register(
    "logql_regexp_parser",
    with_ctes(
        LOGS_CTE,
        body="""SELECT event_id, service,
       CAST(regexp_extract(body, '"k": ([0-9]+)', 1) AS BIGINT) AS knum
FROM logs WHERE CAST(regexp_extract(body, '"k": ([0-9]+)', 1) AS BIGINT) % 7 = 0""",
    ),
)
def logql_regexp_parser(spark, sf_dir):
    logs = logs_frame(spark, sf_dir)
    knum = F.regexp_extract("body", r'"k": ([0-9]+)', 1).cast("long")
    return (
        logs.withColumn("knum", knum)
        .filter(F.col("knum") % 7 == 0)
        .select("event_id", "service", "knum")
    )


# {} | line_format "{{.service}}/{{.level}} u={{.user}} {{.evt | ToUpper}}"
@register(
    "logql_line_format",
    with_ctes(
        LOGS_CTE,
        body="""SELECT event_id,
       service || '/' || level || ' u=' || user_id || ' ' || upper(event_type)
         AS line
FROM logs WHERE level = 'ERROR'""",
    ),
)
def logql_line_format(spark, sf_dir):
    from ..functions.parsers import barrier_cols

    # spread + barrier: the template projection collapses into the
    # one-file scan stage otherwise (1.3s single-task in
    # PARALLELISM_r10's audit); the cheap level filter still pushes to
    # the scan, only the per-row formatting runs above the spread
    logs = logs_frame(spark, sf_dir, spread=True).filter(
        F.col("level") == "ERROR"
    )
    line = compile_template(
        "{{.service}}/{{.level}} u={{.user}} {{.evt | ToUpper}}",
        {
            "service": F.col("service"),
            "level": F.col("level"),
            "user": F.col("user_id"),
            "evt": F.col("event_type"),
        },
    )
    return barrier_cols(logs, {"line": line}).select("event_id", "line")


# {} | logfmt | sz >= 50KB — bytes label filter (comparator.go bytes)
@register(
    "logql_bytes_filter",
    with_ctes(
        LOGS_CTE,
        _LOGFMT_CTE,
        body="""SELECT event_id,
       CAST(regexp_extract(body, 'sz=([0-9]+)KB', 1) AS DOUBLE) * 1000.0
         AS sz_bytes
FROM logfmt_logs
WHERE CAST(regexp_extract(body, 'sz=([0-9]+)KB', 1) AS DOUBLE) * 1000.0 >= 50000""",
    ),
)
def logql_bytes_filter(spark, sf_dir):
    df = _logfmt_frame(spark, sf_dir)
    # barrier: one logfmt parse per row, kept ABOVE the spread
    # repartition (pushdown would otherwise sink the parse into the
    # one-file scan stage and run it single-threaded, then the
    # projection would re-parse)
    df = barrier_cols(df, {"sz_bytes": parse_bytes(logfmt_map("body")["sz"])})
    return df.filter(F.col("sz_bytes") >= 50000).select("event_id", "sz_bytes")


# {} | logfmt | addr = ip("10.1.0.0/16") — IP CIDR label filter
@register(
    "logql_ip_filter",
    with_ctes(
        LOGS_CTE,
        _LOGFMT_CTE,
        body="""SELECT event_id, regexp_extract(body, 'ip=([0-9.]+)$', 1) AS addr
FROM logfmt_logs
WHERE starts_with(regexp_extract(body, 'ip=([0-9.]+)$', 1), '10.1.')""",
    ),
)
def logql_ip_filter(spark, sf_dir):
    df = _logfmt_frame(spark, sf_dir)
    df = barrier_cols(df, {"addr": logfmt_map("body")["ip"]})
    return df.filter(ip_in_cidr(F.col("addr"), "10.1.0.0/16")).select(
        "event_id", "addr"
    )


# {} | decolorize — strip ANSI codes from a colored line
@register(
    "logql_decolorize",
    with_ctes(
        LOGS_CTE,
        body="""SELECT event_id,
       regexp_replace(chr(27) || '[31m' || level || chr(27) || '[0m ' || body,
                      '\\x1b\\[[0-9;]*m', '', 'g') AS clean
FROM logs WHERE level = 'ERROR'""",
    ),
)
def logql_decolorize(spark, sf_dir):
    logs = logs_frame(spark, sf_dir).filter(F.col("level") == "ERROR")
    colored = F.concat(
        F.expr("chr(27)"),
        F.lit("[31m"),
        F.col("level"),
        F.expr("chr(27)"),
        F.lit("[0m "),
        F.col("body"),
    )
    return logs.select("event_id", decolorize(colored).alias("clean"))


# full parse→compile path over a logfmt body: {} | logfmt took, user
# | took > 300ms — exercises the parser-driven logfmt stage + typed
# duration label filter end to end
@register(
    "lql_parsed_logfmt",
    with_ctes(
        LOGS_CTE,
        _LOGFMT_CTE,
        body="""SELECT ts_us, body,
       regexp_extract(body, 'took=([0-9.]+ms)', 1) AS took,
       regexp_extract(body, 'user=([0-9]+)', 1) AS user
FROM logfmt_logs
WHERE CAST(regexp_extract(body, 'took=([0-9.]+)ms', 1) AS DOUBLE) * 0.001 > 0.3""",
    ),
)
def lql_parsed_logfmt(spark, sf_dir):
    from ..logql import EvalParams, LogSource, compile_logql
    from .registry import END_US, START_US, STEP_US

    src = LogSource(df=_logfmt_frame(spark, sf_dir), label_cols={})
    return compile_logql(
        "{} | logfmt took, user | took > 300ms",
        src,
        EvalParams(START_US, END_US, STEP_US),
        spark,
    )


# {} | unpack — promtail packed JSON: extract _entry as the line plus
# packed labels (unpack.go)
@register(
    "logql_unpack",
    with_ctes(
        LOGS_CTE,
        body="""SELECT event_id,
       json_extract_string('{"_entry":"evt ' || event_type || '","lvl":"' ||
                           level || '"}', '$._entry') AS line,
       json_extract_string('{"_entry":"evt ' || event_type || '","lvl":"' ||
                           level || '"}', '$.lvl') AS lvl
FROM logs WHERE event_type = 'signup'""",
    ),
)
def logql_unpack(spark, sf_dir):
    logs = logs_frame(spark, sf_dir).filter(F.col("event_type") == "signup")
    packed = F.concat(
        F.lit('{"_entry":"evt '),
        F.col("event_type"),
        F.lit('","lvl":"'),
        F.col("level"),
        F.lit('"}'),
    )
    return logs.select(
        "event_id",
        F.get_json_object(packed, "$._entry").alias("line"),
        F.get_json_object(packed, "$.lvl").alias("lvl"),
    )


# quoted logfmt values: `msg="evt \"page_view\" ok" user=.. took=..ms`
# — go-logfmt unquotes and unescapes (logfmt.go via go-logfmt/logfmt);
# rows where user_id % 23 = 0 lose the closing quote and must parse
# to NULL (decoder error discards the scanned map, logfmt.go:51-61)
_QFMT_CTE = r"""qfmt AS (
  SELECT event_id, ts_us, service, env, level, user_id, value,
         'msg="evt \"' || event_type || '\" ok' ||
         CASE WHEN user_id % 23 = 0 THEN '' ELSE '"' END ||
         ' user=' || user_id || ' took=' || value || 'ms' AS body
  FROM logs
)"""


def _quoted_frame(spark, sf_dir):
    # spread: same rationale as _logfmt_frame — the quoted-value
    # tokenizer is per-row-heavy on a one-file scan
    logs = logs_frame(spark, sf_dir, spread=True)
    body = F.concat(
        F.lit('msg="evt \\"'),
        F.col("event_type"),
        F.lit('\\" ok'),
        F.when(F.col("user_id") % 23 == 0, F.lit("")).otherwise(F.lit('"')),
        F.lit(" user="),
        F.col("user_id").cast("string"),
        F.lit(" took="),
        F.col("value").cast("string"),
        F.lit("ms"),
    )
    return logs.select(
        "event_id", "ts_us", "service", "env", "level", "user_id",
        "value", body.alias("body"),
    )


# {} | logfmt msg, took — quoted-value extraction with unescaping;
# malformed lines (unterminated quote) yield NULL labels
@register(
    "logql_logfmt_quoted",
    with_ctes(
        LOGS_CTE,
        _QFMT_CTE,
        body=r"""SELECT event_id,
       regexp_replace(regexp_extract(body, 'msg="((?:[^"\\]|\\.)*)"', 1),
                      '\\(.)', '\1', 'g') AS msg,
       CAST(regexp_extract(body, 'took=([0-9.]+)ms', 1) AS DOUBLE) * 0.001
         AS took_s
FROM qfmt
WHERE user_id % 23 <> 0
  AND regexp_replace(regexp_extract(body, 'msg="((?:[^"\\]|\\.)*)"', 1),
                     '\\(.)', '\1', 'g') LIKE '%"purchase"%'""",
    ),
)
def logql_logfmt_quoted(spark, sf_dir):
    from ..functions.parsers import logfmt_error

    df = _quoted_frame(spark, sf_dir)
    bad = logfmt_error("body")
    # barrier: msg is mentioned by the filter AND the projection, and
    # pushdown would drag the whole tokenizer into the scan stage
    df = barrier_cols(df, {"__qm": F.when(~bad, logfmt_map("body"))})
    return (
        df.withColumn("msg", F.col("__qm").getItem("msg"))
        .withColumn(
            "took_s", parse_duration_seconds(F.col("__qm").getItem("took"))
        )
        .filter(F.col("msg").contains('"purchase"'))
        .select("event_id", "msg", "took_s")
    )


def _logfmt_error_oracle() -> str:
    from ..operators.stepfanout import fanout_join_sql
    from .registry import END_US, START_US, STEP_US

    fan = fanout_join_sql("doct", START_US, END_US, STEP_US, 6 * 3_600_000_000)
    return with_ctes(
        LOGS_CTE,
        _QFMT_CTE,
        """doct AS (
  SELECT ts_us,
         CASE WHEN user_id % 23 = 0 THEN 'logfmt parsing error' ELSE '' END
           AS err
  FROM qfmt WHERE env = 'prod'
)""",
        body=f"""SELECT err AS __error__, step_us,
       CAST(count(*) AS DOUBLE) AS value
FROM {fan} s
GROUP BY err, step_us""",
    )


# sum by (__error__) (count_over_time({env="prod"} | logfmt msg [6h]))
# — decoder failures surface as __error__="logfmt parsing error"
# through the engine path (logfmt.go:58-60 SetError)
@register("logql_logfmt_error", _logfmt_error_oracle())
def logql_logfmt_error(spark, sf_dir):
    from ..logql import EvalParams, LogSource, compile_logql

    df = _quoted_frame(spark, sf_dir)
    src = LogSource(
        df=df,
        label_cols={"service": "service", "env": "env", "level": "level"},
        error_labels=True,
    )
    from .registry import END_US, START_US, STEP_US

    out = compile_logql(
        'sum by (__error__) (count_over_time({env="prod"} | logfmt msg [6h]))',
        src,
        EvalParams(START_US, END_US, STEP_US),
        spark,
    )
    return out.withColumn(
        "__error__", F.coalesce(F.col("__error__"), F.lit(""))
    )
