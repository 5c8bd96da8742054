"""Log-LISTING halves of the Loki facade (VERDICT r11 Missing #1).

The metric halves of ``GET /loki/api/v1/query_range`` / ``query`` are
gated in ``facade_gates.py``; these two drive the SAME engine entry
points with LOG expressions — selector → line filter → json parser →
label filter, plus the direction + limit semantics the HTTP layer
forwards (lokihandler.go:365-407 both branches of query_range,
:331-357 instant; engine_log_query.go:46-49 instant lookback).
Registered in a separate module imported LAST so the registry tail
stays append-only (driver protocol: static prefix).
"""

from __future__ import annotations

from ..signals import LOGS_CTE, logs_frame, with_ctes
from .registry import END_US, RANGE_US, START_US, STEP_US, register


def _log_engine(spark, sf_dir, **kw):
    from ..engine import LogQLEngine
    from ..logql import LogSource

    return LogQLEngine(
        source=LogSource(
            df=logs_frame(spark, sf_dir),
            label_cols={
                "service": "service",
                "env": "env",
                "level": "level",
                "value": "value",
            },
            body_col="body",
            ts_col="ts_us",
        ),
        **kw,
    )


# GET /loki/api/v1/query_range with a LOG expression — the OTHER half
# of the same endpoint (lokihandler.go:365-407 passes Direction+Limit
# into EvalParams; engine_log_query.go groups the surviving entries
# into streams): {env="prod", service="svc-3"} |= `"k": ` | json k="k"
# | k >= 50, direction=backward, limit=100 → the NEWEST 100 matching
# entries as (ts_us, body, labels…, k).  ts values are unique in the
# fixture, so the backward-limited set is deterministic.
@register(
    "logql_facade_log_range",
    with_ctes(
        LOGS_CTE,
        body=f"""SELECT * FROM (
  SELECT ts_us, body, service, env, level, value,
         json_extract_string(body, '$.k') AS k
  FROM logs
  WHERE env = 'prod' AND service = 'svc-3'
    AND body LIKE '%"k": %'
    AND ts_us >= {START_US} AND ts_us < {END_US}
    AND TRY_CAST(json_extract_string(body, '$.k') AS DOUBLE) >= 50
) ORDER BY ts_us DESC LIMIT 100""",
    ),
)
def logql_facade_log_range(spark, sf_dir):
    eng = _log_engine(spark, sf_dir)
    return eng.query_range_frame(
        '{env="prod", service="svc-3"} |= `"k": ` | json k="k" | k >= 50',
        START_US,
        END_US,
        STEP_US,
        limit=100,
        direction="backward",
    )


# GET /loki/api/v1/query with a LOG expression (lokihandler.go:331-357:
# Start=End=ts; engine_log_query.go:46-49 widens Start by the instant
# lookback) — forward direction this time, so the OLDEST 10 entries of
# the lookback window survive the limit (15 candidates at sf0.01, 225
# at sf0.1 — the limit binds).
@register(
    "logql_facade_log_instant",
    with_ctes(
        LOGS_CTE,
        body=f"""SELECT * FROM (
  SELECT ts_us, body, service, env, level, value,
         json_extract_string(body, '$.k') AS k
  FROM logs
  WHERE env = 'staging'
    AND ts_us >= {END_US - RANGE_US} AND ts_us < {END_US}
    AND TRY_CAST(json_extract_string(body, '$.k') AS DOUBLE) < 40
) ORDER BY ts_us ASC LIMIT 10""",
    ),
)
def logql_facade_log_instant(spark, sf_dir):
    eng = _log_engine(spark, sf_dir, instant_log_lookback_us=RANGE_US)
    return eng.query_instant_frame(
        '{env="staging"} | json k="k" | k < 40',
        END_US,
        limit=10,
        direction="forward",
    )
