"""LogQL parser unit tests — table-driven parse-shape cases, mirroring
the reference's parser test strategy (``internal/logql/parser_test.go``).
"""

from __future__ import annotations

import pytest

from oteldb_spark.logql import ast, parse
from oteldb_spark.logql.lexer import duration_to_us


def test_selector():
    q = parse('{a="b", c=~"re.*", d!="x", e!~"y"}')
    assert isinstance(q, ast.LogQuery)
    assert [(m.name, m.op, m.value) for m in q.selector.matchers] == [
        ("a", "=", "b"),
        ("c", "=~", "re.*"),
        ("d", "!=", "x"),
        ("e", "!~", "y"),
    ]


def test_dotted_label():
    q = parse('{service.name="x"}')
    assert q.selector.matchers[0].name == "service.name"


def test_line_filters():
    q = parse('{a="b"} |= "x" != "y" |~ "re" !~ "nre" |> "p<_>q"')
    kinds = [(s.op, s.value) for s in q.stages]
    assert kinds == [
        ("|=", "x"),
        ("!=", "y"),
        ("|~", "re"),
        ("!~", "nre"),
        ("|>", "p<_>q"),
    ]


def test_pipeline_stages():
    q = parse(
        '{a="b"} | json k="k" | logfmt took, user | regexp "(?P<n>[0-9]+)"'
        ' | pattern "<evt> <_>" | line_format "{{.k}}" | label_format x=k'
        " | drop k | distinct user | decolorize"
    )
    kinds = [type(s).__name__ for s in q.stages]
    assert kinds == [
        "ParserStage",
        "ParserStage",
        "ParserStage",
        "ParserStage",
        "LineFormat",
        "LabelFormat",
        "DropKeep",
        "Distinct",
        "ParserStage",
    ]
    assert q.stages[0].exprs == {"k": "k"}
    assert q.stages[1].exprs == {"took": "took", "user": "user"}


def test_label_filter_types():
    q = parse('{a="b"} | dur > 10s | sz >= 1KiB | n == 5 | s = "lit" | addr = ip("10.0.0.0/8")')
    preds = [s.node for s in q.stages]
    assert [p.vtype for p in preds] == ["duration", "bytes", "number", "string", "ip"]


def test_label_filter_boolean_tree():
    q = parse('{a="b"} | (x > 1 and y < 2) or z == 3')
    node = q.stages[0].node
    assert node[0] == "or"
    assert node[1][0] == "and"


def test_range_agg_shapes():
    e = parse('rate({a="b"}[5m])')
    assert isinstance(e, ast.RangeAgg)
    assert e.op == "rate" and e.range_us == 300_000_000

    e = parse('quantile_over_time(0.99, {a="b"} | unwrap v [1h]) by (svc)')
    assert e.op == "quantile_over_time" and e.q == 0.99
    assert e.query.unwrap.label == "v"
    assert e.grouping.labels == ["svc"]

    e = parse('count_over_time({a="b"}[5m] offset 1h)')
    assert e.offset_us == 3_600_000_000


def test_unwrap_conversion():
    e = parse('sum_over_time({a="b"} | unwrap duration(took) [5m])')
    assert e.query.unwrap.label == "took"
    assert e.query.unwrap.conv == "duration"


def test_vector_agg_and_binop_precedence():
    e = parse('sum by (x) (rate({a="b"}[5m])) / sum(rate({a="b"}[5m])) + 1')
    # '+' binds looser than '/'
    assert isinstance(e, ast.BinOp) and e.op == "+"
    assert isinstance(e.lhs, ast.BinOp) and e.lhs.op == "/"
    assert isinstance(e.rhs, ast.Literal)


def test_topk():
    e = parse('topk(3, sum by (s) (count_over_time({a="b"}[5m])))')
    assert e.op == "topk" and e.k == 3


def test_vector_matching_modifiers():
    e = parse(
        'sum by (i) (rate({a="b"}[1m])) / on (i) group_left'
        ' sum(rate({a="b"}[1m]))'
    )
    assert e.on == ["i"] and e.group_left == []


def test_bool_mode():
    e = parse('sum(rate({a="b"}[1m])) > bool 5')
    assert e.bool_mode is True


def test_label_replace():
    e = parse('label_replace(rate({a="b"}[1m]), "dst", "$1", "src", "s-(.*)")')
    assert isinstance(e, ast.LabelReplace)
    assert (e.dst, e.replacement, e.src, e.regex) == ("dst", "$1", "src", "s-(.*)")


def test_duration_lexing():
    assert duration_to_us("1h30m") == 5_400_000_000
    assert duration_to_us("1.5s") == 1_500_000
    assert duration_to_us("100ms") == 100_000


def test_errors():
    with pytest.raises(SyntaxError):
        parse('{a=}')
    with pytest.raises(SyntaxError):
        parse('rate({a="b"})')  # missing range
    with pytest.raises(SyntaxError):
        parse('{a="b"} | badstage x')
