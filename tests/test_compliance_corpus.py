"""Compliance-style corpus: a broad set of query strings in each
language must parse (and, where marked, compile).  Mirrors the
reference's compliance-tester strategy (98 LogQL / 119 PromQL specs
diffed against real engines) at the parse/compile level.
"""

from __future__ import annotations

import pytest

from oteldb_spark.logql import parse as lql_parse
from oteldb_spark.promql import parse as pql_parse
from oteldb_spark.traceql import parse as tql_parse

LOGQL = [
    '{job="a"}',
    '{job="a", env!="dev", svc=~"s.*", x!~"y"}',
    '{service.name="dotted"}',
    '{job="a"} |= "text" != "other"',
    '{job="a"} |~ "re.*" !~ "nre"',
    '{job="a"} |> "pat <_> tern"',
    '{job="a"} | json',
    '{job="a"} | json k="a.b", v',
    '{job="a"} | logfmt took, user',
    '{job="a"} | regexp "(?P<code>[0-9]+)"',
    '{job="a"} | pattern "<ip> - <user>"',
    '{job="a"} | unpack',
    '{job="a"} | decolorize',
    '{job="a"} | line_format "{{.user}} did {{.evt}}"',
    '{job="a"} | label_format dst=src',
    '{job="a"} | drop k, v',
    '{job="a"} | keep k',
    '{job="a"} | distinct user',
    '{job="a"} | code >= 400',
    '{job="a"} | took > 1.5s',
    '{job="a"} | sz >= 10MB',
    '{job="a"} | addr = ip("10.0.0.0/8")',
    '{job="a"} | (x > 1 and y < 2) or z == 3',
    'count_over_time({job="a"}[5m])',
    'rate({job="a"}[1m])',
    'bytes_rate({job="a"}[1m])',
    'sum_over_time({job="a"} | unwrap bytes(sz) [5m])',
    'avg_over_time({job="a"} | unwrap duration(took) [5m]) by (svc)',
    'quantile_over_time(0.99, {job="a"} | unwrap v [1h])',
    'first_over_time({job="a"} | unwrap v [5m])',
    'absent_over_time({job="a"}[5m])',
    'count_over_time({job="a"}[5m] offset 1h)',
    'sum by (svc) (rate({job="a"}[5m]))',
    'max without (pod) (count_over_time({job="a"}[5m]))',
    'topk(5, sum by (s) (rate({a="b"}[5m])))',
    'bottomk(3, count_over_time({a="b"}[5m]))',
    'sum(rate({a="b"}[5m])) / sum(rate({c="d"}[5m]))',
    'sum(rate({a="b"}[5m])) > bool 10',
    'sum(rate({a="b"}[5m])) and sum(rate({c="d"}[5m]))',
    'sum(rate({a="b"}[5m])) unless sum(rate({c="d"}[5m]))',
    'label_replace(rate({a="b"}[5m]), "d", "$1", "s", "(.*)")',
    'sum by (i) (rate({a="b"}[1m])) / on (i) group_left sum(rate({a="b"}[1m]))',
    '2 * sum(rate({a="b"}[5m])) + 1',
]

PROMQL = [
    "up",
    'up{job="api"}',
    '{__name__="up", env="prod"}',
    "http_requests_total[5m]",
    "up offset 5m",
    "rate(http_requests_total[5m])",
    "increase(x[1h])",
    "irate(x[1m])",
    "delta(gauge[10m])",
    "idelta(gauge[1m])",
    "avg_over_time(x[5m])",
    "quantile_over_time(0.9, x[1h])",
    "present_over_time(x[5m])",
    "absent_over_time(x[5m])",
    "max_over_time(rate(x[5m])[30m:5m])",
    "sum(rate(x[5m]))",
    "sum by (job) (rate(x[5m]))",
    "sum without (cpu) (rate(x[5m]))",
    "topk(3, avg_over_time(x[30m]))",
    "quantile(0.5, x)",
    'count_values("v", x)',
    "histogram_quantile(0.9, sum by (le) (rate(b[5m])))",
    "abs(x) + ceil(y)",
    "clamp(x, 0, 100)",
    "round(x, 10)",
    "sqrt(x)",
    "x / on (instance) group_left y",
    "x unless on (job) y",
    "x > bool 0",
    'label_replace(x, "d", "$1", "s", "(.+)")',
    'label_join(x, "d", "-", "a", "b")',
    "resets(c[1h])",
    "changes(g[1h])",
    "deriv(g[1h])",
    "predict_linear(g[1h], 3600)",
    "absent(up)",
    "up @ 1704067200",
    "hour()",
    "time()",
    'count_values("v", x)',
]

TRACEQL = [
    "{ }",
    '{ span.http.status_code = 500 }',
    '{ resource.service.name = "api" && duration > 100ms }',
    "{ status = error }",
    "{ kind = server }",
    '{ name =~ "GET.*" }',
    "{ duration > 1s || duration < 1ms }",
    '{ span.retries > 3 }',
    '{ } | count() > 5',
    "{ } | max(duration) > 2s",
    "{ } | avg(duration) >= 100ms",
    '{ status = error } | select(span.service, duration)',
    '{ name = "a" } > { name = "b" }',
    '{ name = "a" } >> { name = "b" }',
    '{ name = "a" } ~ { name = "b" }',
    '{ name = "a" } && { name = "b" }',
    '{ name = "a" } || { name = "b" }',
]


@pytest.mark.parametrize("q", LOGQL)
def test_logql_corpus_parses(q):
    assert lql_parse(q) is not None


@pytest.mark.parametrize("q", PROMQL)
def test_promql_corpus_parses(q):
    assert pql_parse(q) is not None


@pytest.mark.parametrize("q", TRACEQL)
def test_traceql_corpus_parses(q):
    assert tql_parse(q) is not None
