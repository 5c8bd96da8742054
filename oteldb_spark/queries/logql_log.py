"""LogQL log-pipeline queries (SURVEY §2.2) bound to the testdata.

Each query is a LogQL pipeline re-expressed as a DataFrame plan over
the logs view (signals.logs_frame).  Filters are plain Column
predicates so Catalyst pushes them into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..signals import LOGS_CTE, logs_frame, with_ctes
from .registry import register

LOG_COLS = ["event_id", "ts_us", "body", "level", "service", "env"]
_SEL = "SELECT event_id, ts_us, body, level, service, env FROM logs"


# {service="svc-1", env="prod"} — stream selector (conjunctive matchers)
@register(
    "logql_selector",
    with_ctes(LOGS_CTE, body=f"{_SEL} WHERE service = 'svc-1' AND env = 'prod'"),
)
def logql_selector(spark, sf_dir):
    logs = logs_frame(spark, sf_dir)
    return logs.filter((F.col("service") == "svc-1") & (F.col("env") == "prod")).select(
        *LOG_COLS
    )


# {env="prod"} |= `"k": 7` — line filter (contains)
@register(
    "logql_line_filter_contains",
    with_ctes(
        LOGS_CTE,
        body=f"{_SEL} WHERE env = 'prod' AND body LIKE '%\"k\": 7%'",
    ),
)
def logql_line_filter_contains(spark, sf_dir):
    logs = logs_frame(spark, sf_dir)
    return logs.filter(
        (F.col("env") == "prod") & F.col("body").contains('"k": 7')
    ).select(*LOG_COLS)


# {env="prod"} != `"k": 1` |= `` negated line filter
@register(
    "logql_line_filter_neg",
    with_ctes(
        LOGS_CTE,
        body=f"{_SEL} WHERE env = 'prod' AND body NOT LIKE '%\"k\": 1%'",
    ),
)
def logql_line_filter_neg(spark, sf_dir):
    logs = logs_frame(spark, sf_dir)
    return logs.filter(
        (F.col("env") == "prod") & ~F.col("body").contains('"k": 1')
    ).select(*LOG_COLS)


# {service=~"svc-[0-3]"} |~ `"k": 1[0-9]` — regex matcher + regex line filter
@register(
    "logql_line_filter_regex",
    with_ctes(
        LOGS_CTE,
        body=f"""{_SEL}
 WHERE regexp_matches(service, 'svc-[0-3]') AND regexp_matches(body, '"k": 1[0-9]')""",
    ),
)
def logql_line_filter_regex(spark, sf_dir):
    logs = logs_frame(spark, sf_dir)
    return logs.filter(
        F.col("service").rlike("svc-[0-3]") & F.col("body").rlike('"k": 1[0-9]')
    ).select(*LOG_COLS)


# {} | json | k >= 50 — json parser stage + typed label filter
@register(
    "logql_json_parser",
    with_ctes(
        LOGS_CTE,
        body="""SELECT event_id, ts_us, service, level,
       CAST(json_extract_string(body, '$.k') AS BIGINT) AS k
  FROM logs
 WHERE CAST(json_extract_string(body, '$.k') AS BIGINT) >= 50""",
    ),
)
def logql_json_parser(spark, sf_dir):
    from ..functions.parsers import barrier_cols

    # spread + barrier: the JSON extraction is mentioned by the filter
    # AND the projection, and as a plain expression Catalyst would both
    # inline it twice and push it below the repartition into the
    # one-file scan stage (815ms single-task in PARALLELISM_r10's
    # audit); the barrier keeps ONE parse per row above the spread
    logs = logs_frame(spark, sf_dir, spread=True)
    k = F.get_json_object("body", "$.k").cast("long")
    return (
        barrier_cols(logs, {"k": k})
        .filter(F.col("k") >= 50)
        .select("event_id", "ts_us", "service", "level", "k")
    )


# {} | label_format — rename/derive labels (label_format.go)
@register(
    "logql_label_format",
    with_ctes(
        LOGS_CTE,
        body="""SELECT event_id, ts_us, service AS svc,
       level || '/' || env AS level_env FROM logs WHERE level = 'ERROR'""",
    ),
)
def logql_label_format(spark, sf_dir):
    logs = logs_frame(spark, sf_dir)
    return (
        logs.filter(F.col("level") == "ERROR")
        .withColumnRenamed("service", "svc")
        .withColumn("level_env", F.concat_ws("/", "level", "env"))
        .select("event_id", "ts_us", "svc", "level_env")
    )


# {} | distinct service, level — distinct stage (distinct.go:47)
@register(
    "logql_distinct_labels",
    with_ctes(LOGS_CTE, body="SELECT DISTINCT service, level FROM logs"),
)
def logql_distinct_labels(spark, sf_dir):
    return logs_frame(spark, sf_dir).select("service", "level").distinct()


# backward query with limit — sorted by ts desc, limit 100
# (querier_logs_query.go:87-108; ts values are unique so the set is
# deterministic)
@register(
    "logql_backward_limit",
    with_ctes(
        LOGS_CTE,
        body=f"{_SEL} WHERE service = 'svc-2' ORDER BY ts_us DESC LIMIT 100",
    ),
)
def logql_backward_limit(spark, sf_dir):
    logs = logs_frame(spark, sf_dir)
    return (
        logs.filter(F.col("service") == "svc-2")
        .orderBy(F.col("ts_us").desc())
        .limit(100)
        .select(*LOG_COLS)
    )


# severity filter — label filter on a numeric intrinsic
@register(
    "logql_severity_filter",
    with_ctes(
        LOGS_CTE,
        body=f"{_SEL} WHERE severity_number >= 9 AND env = 'staging'",
    ),
)
def logql_severity_filter(spark, sf_dir):
    logs = logs_frame(spark, sf_dir)
    return logs.filter(
        (F.col("severity_number") >= 9) & (F.col("env") == "staging")
    ).select(*LOG_COLS)
