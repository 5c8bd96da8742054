"""Go-template function surface for line_format/label_format.

Mirrors logqlengine/template.go:33-170: each case renders one template
against a one-row frame and asserts the Go-semantics output string.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oteldb_spark.functions.templates import compile_template

ROW = {
    "svc": "Auth-API",
    "msg": "  error: connection refused  ",
    "n": "42",
    "f": "2.5",
    "path": "/api/v1/users?id=7",
    "empty": "",
}


def render(spark, template: str, extra: dict | None = None) -> str:
    df = spark.createDataFrame([ROW])
    fields = {k: F.col(k) for k in ROW}
    if extra:
        fields.update(extra)
    return df.select(
        compile_template(template, fields).alias("out")
    ).head()["out"]


CASES = [
    # deprecated Loki set
    ("{{ .svc | ToLower }}", "auth-api"),
    ("{{ .svc | ToUpper }}", "AUTH-API"),
    ("{{ .msg | TrimSpace }}", "error: connection refused"),
    ('{{ Trim .svc "Ai" }}', "uth-API"),
    ('{{ TrimLeft .svc "uA" }}', "th-API"),
    ('{{ TrimRight .svc "IP" }}', "Auth-A"),
    ('{{ TrimPrefix .svc "Auth-" }}', "API"),
    ('{{ TrimSuffix .svc "-API" }}', "Auth"),
    ('{{ regexReplaceAll "c.n" .msg "X" }}', "  error: Xnection refused  "),
    ('{{ regexReplaceAll "(er)ror" .msg "${1}" }}', "  er: connection refused  "),
    ('{{ regexReplaceAllLiteral "c.n" .msg "$1" }}', "  error: $1nection refused  "),
    ('{{ count "e" .msg }}', "4"),
    ("{{ .path | urlencode }}", "%2Fapi%2Fv1%2Fusers%3Fid%3D7"),
    ('{{ urldecode "a%20b" }}', "a b"),
    ('{{ bytes "2KB" }}', "2000.0"),
    ('{{ duration "1m30s" }}', "90.0"),
    ("{{ alignLeft 4 .svc }}", "Auth"),
    ("{{ alignLeft 10 .n }}", "42        "),
    ("{{ alignRight 3 .svc }}", "API"),
    ("{{ alignRight 4 .n }}", "  42"),
    # sprig subset
    ('{{ b64enc "hi" }}', "aGk="),
    ('{{ b64dec "aGk=" }}', "hi"),
    ("{{ .svc | lower }}", "auth-api"),
    ("{{ .svc | upper }}", "AUTH-API"),
    ('{{ title "hello wORld" }}', "Hello WORld"),
    ("{{ .svc | trunc 4 }}", "Auth"),
    ("{{ .svc | trunc -3 }}", "API"),
    ("{{ substr 0 4 .svc }}", "Auth"),
    ("{{ substr 5 8 .svc }}", "API"),
    ('{{ contains "API" .svc }}', "true"),
    ('{{ hasPrefix "Auth" .svc }}', "true"),
    ('{{ hasSuffix "Auth" .svc }}', "false"),
    ('{{ indent 2 "a" }}', "  a"),
    ('{{ replace "-" "/" .svc }}', "Auth/API"),
    ('{{ repeat 3 "ab" }}', "ababab"),
    ("{{ .msg | trim }}", "error: connection refused"),
    ('{{ trimAll "- " .svc }}', "Auth-API"),
    ('{{ trimPrefix "Auth-" .svc }}', "API"),
    ('{{ trimSuffix "-API" .svc }}', "Auth"),
    ("{{ .n | int }}", "42"),
    ("{{ .f | float64 }}", "2.5"),
    ("{{ add .n 8 }}", "50"),
    ("{{ sub .n 2 }}", "40"),
    ("{{ mul .n 2 3 }}", "252"),
    ("{{ div 45 7 }}", "6"),
    ("{{ mod 45 7 }}", "3"),
    ("{{ addf .f 0.25 }}", "2.75"),
    ("{{ mulf .f 2 }}", "5.0"),
    ("{{ max 3 9 4 }}", "9"),
    ("{{ min 3 9 4 }}", "3"),
    ("{{ maxf 2.5 2.75 }}", "2.75"),
    ("{{ ceil 2.1 }}", "3.0"),
    ("{{ floor 2.9 }}", "2.0"),
    ("{{ round 2.567 2 }}", "2.57"),
    ('{{ default "none" .empty }}', "none"),
    ('{{ default "none" .svc }}', "Auth-API"),
    # text/template builtins
    ('{{ printf "%s=%d" .svc .n }}', "Auth-API=42"),
    ('{{ printf "%05d" .n }}', "00042"),
    ('{{ printf "%.1f" .f }}', "2.5"),
    ("{{ len .svc }}", "8"),
    # pipelines + literal mixing
    ("a-{{ .svc | lower | trunc 4 }}-z", "a-auth-z"),
    ('{{ add (len .svc) 1 }}', "9"),
    ("{{ .missing }}", ""),
]


@pytest.mark.parametrize("template,expected", CASES, ids=[c[0] for c in CASES])
def test_template_case(spark, template, expected):
    assert render(spark, template) == expected


def test_timestamp_functions(spark):
    extra = {"__timestamp__": F.timestamp_micros(F.lit(1700000000_000_000))}
    assert (
        render(spark, '{{ date "2006-01-02 15:04:05" __timestamp__ }}', extra)
        == "2023-11-14 22:13:20"
    )
    assert render(spark, "{{ unixEpoch __timestamp__ }}", extra) == "1700000000"
    assert (
        render(spark, "{{ unixEpochMillis __timestamp__ }}", extra)
        == "1700000000000"
    )
    assert (
        render(spark, "{{ unixEpochNanos __timestamp__ }}", extra)
        == "1700000000000000000"
    )
    assert (
        render(spark, '{{ unixToTime "1700000000" | date "2006-01-02" }}')
        == "2023-11-14"
    )
    assert (
        render(
            spark,
            '{{ toDate "2006-01-02" "2023-11-14" | unixEpoch }}',
        )
        == "1699920000"
    )


def test_unsupported_raises(spark):
    with pytest.raises(ValueError):
        render(spark, "{{ fromJson .svc }}")
    with pytest.raises(ValueError):
        render(spark, "{{ .svc | trunc .n }}")  # non-literal count
