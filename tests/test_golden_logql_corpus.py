"""Reference golden-bench LogQL corpus, replicated exactly.

The reference checks in a deterministic 9-stream × 5400-record corpus
with EXACT expected entry/sample counts per query
(``storagebackend/goldenbench_logql_test.go:38-106`` corpus spec,
``:287-375`` the 13 golden cases).  Replaying the identical corpus
through this engine and asserting the identical counts anchors LogQL
semantics to recorded reference outputs.

Two reference conventions replicated here rather than in the engine:

* log cases evaluate backward with a limit — counts assert
  ``min(total, limit)``;
* metric ranges extend the end to the NEXT step boundary past ``end``
  (``logqlengine/engine_metric_query.go:73`` ``End.Truncate(Step) +
  Step``), so a 540s window at 30s step yields 20 points (0..570s) —
  that is what makes the recorded 115/100 sample counts come out.

The record attributes carry dotted OTel keys (``http.method``), so the
``| http_method="GET"`` case also exercises the sanitization surface
end-to-end the way the reference's storage does
(``otelstorage/attrs.go:11-41``).
"""

from __future__ import annotations

import pytest

from oteldb_spark.logql import EvalParams, LogSource, compile_logql

SERVICES = 8
PER_ROUND = 600
PARTS = 8  # +1 head round ⇒ 9 rounds total
ROUNDS = PARTS + 1
NEEDLE_ROUND = 3
NEEDLE_EVERY = 150
START_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z, µs
SPACING_US = 100_000  # 100ms
NEEDLE = "needle deadbeef marker"

LEVELS = ["TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL"]
METHODS = ["GET", "POST", "PUT", "HEAD", "DELETE", "PATCH"]
STATUSES = [200, 201, 204, 400, 404, 500]
REGIONS = ["eu-west-1", "us-east-1", "us-west-2", "ap-south-1"]

END_US = START_US + ROUNDS * PER_ROUND * SPACING_US  # +540s
STEP_US = 30_000_000
# reference convention: one step boundary PAST end
METRIC_END_US = (END_US // STEP_US) * STEP_US + STEP_US


def _streams():
    out = []
    for s in range(SERVICES):
        out.append((f"svc-{s}", "prod" if s < SERVICES // 2 else "staging", False))
    out.append(("logfmt", "prod", True))
    return out


def _corpus_rows():
    rows = []
    for service, env, is_logfmt in _streams():
        for rnd in range(ROUNDS):
            for i in range(PER_ROUND):
                level = LEVELS[i % 6]
                method = METHODS[i % 6]
                status = STATUSES[i % 6]
                region = REGIONS[i % 4]
                note = (
                    NEEDLE
                    if rnd == NEEDLE_ROUND
                    and service == "svc-0"
                    and i % NEEDLE_EVERY == 0
                    else "ok"
                )
                if is_logfmt:
                    body = (
                        f"level={level} method={method} status={status} "
                        f'client_ip=10.0.0.{i % 256} duration_ms={i % 97} note="{note}"'
                    )
                else:
                    body = (
                        f'{{"level":"{level}","method":"{method}","status":{status},'
                        f'"client_ip":"10.0.0.{i % 256}","duration_ms":{i % 97},'
                        f'"note":"{note}"}}'
                    )
                ts_us = START_US + (rnd * PER_ROUND + i) * SPACING_US
                rows.append(
                    (
                        ts_us,
                        body,
                        service,
                        env,
                        level,
                        {
                            "http.method": method,
                            "http.status_code": str(status),
                            "region": region,
                        },
                    )
                )
    return rows


@pytest.fixture(scope="module")
def golden_logs(spark):
    df = spark.createDataFrame(
        _corpus_rows(),
        "ts_us long, body string, service string, env string, level string,"
        " attrs map<string,string>",
    ).cache()
    df.count()
    return LogSource(
        df=df,
        label_cols={
            "service_name": "service",
            "env": "env",
            "level": "level",
        },
        attrs_map_col="attrs",
    )


# goldenbench_logql_test.go:287-375 — (query, limit, exact count)
LOG_CASES = [
    ("full_scan", '{service_name=~".+"}', 0, (SERVICES + 1) * PER_ROUND * ROUNDS),
    ("select_service", '{service_name="svc-0"}', 1000, 1000),
    ("select_multi_stream", '{env="prod"}', 1000, 1000),
    ("select_regexp", '{service_name=~"svc-[0-3]"}', 1000, 1000),
    ("line_filter", '{service_name="svc-0"} |= `"method":"GET"`', 1000, 900),
    (
        "line_filter_negated",
        '{service_name="svc-0"} != `"method":"GET"`',
        1000,
        1000,
    ),
    ("label_filter", '{service_name="svc-0"} | http_method="GET"', 1000, 900),
    ("json_parser", '{service_name="svc-0"} | json | status>=400', 1000, 1000),
    ("logfmt_parser", '{service_name="logfmt"} | logfmt | status>=400', 1000, 1000),
    ("needle", '{env="prod"} |= `' + NEEDLE + "`", 1000, 4),
    ("limit_backward", '{env="prod"}', 100, 100),
]


@pytest.mark.parametrize(
    "name,query,limit,want", LOG_CASES, ids=[c[0] for c in LOG_CASES]
)
def test_golden_log_counts(spark, golden_logs, name, query, limit, want):
    out = compile_logql(
        query, golden_logs, EvalParams(START_US, END_US, STEP_US), spark
    )
    total = out.count()
    got = min(total, limit) if limit else total
    assert got == want, f"{name}: {got} != {want}"


METRIC_CASES = [
    (
        "metric_count_by_level",
        "sum by (level) (count_over_time({env=\"prod\"}[1m]))",
        115,
    ),
    (
        "metric_rate_by_service",
        "sum by (service_name) (rate({env=\"prod\"}[1m]))",
        100,
    ),
]


@pytest.mark.parametrize(
    "name,query,want", METRIC_CASES, ids=[c[0] for c in METRIC_CASES]
)
def test_golden_metric_sample_counts(spark, golden_logs, name, query, want):
    out = compile_logql(
        query,
        golden_logs,
        EvalParams(START_US, METRIC_END_US, STEP_US),
        spark,
    )
    assert out.count() == want, name
