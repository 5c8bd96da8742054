"""LogQL AST — mirrors the reference's node shapes
(``internal/logql/log_expr.go``, ``pipeline.go``, ``metric_expr.go``,
``range_expr.go``) without the Go interface machinery.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# --- selector & pipeline -----------------------------------------------------


@dataclass
class LabelMatcher:
    name: str
    op: str  # = != =~ !~
    value: str


@dataclass
class Selector:
    matchers: list[LabelMatcher]


@dataclass
class LineFilter:
    op: str  # |= != |~ !~ |> !>
    value: str
    # `or`-chained alternatives (pipeline.go:38): |= "a" or "b"
    alts: list[str] = field(default_factory=list)
    # ip("...") patterns for |= ip(...) / != ip(...) line filters
    # (lexerql ip tokens; any IP in the line matching any pattern)
    ips: list[str] = field(default_factory=list)


@dataclass
class ParserStage:
    kind: str  # json logfmt regexp pattern unpack decolorize
    param: str | None = None
    # for json with expressions: {label: json_path}
    exprs: dict[str, str] = field(default_factory=dict)


@dataclass
class LabelPredicate:
    """leaf: label <op> literal, typed by the literal (string / number /
    duration / bytes / ip)."""

    label: str
    op: str  # = == != =~ !~ > >= < <=
    value: str
    vtype: str  # string number duration bytes ip


@dataclass
class LabelFilter:
    """boolean tree of predicates (and/or)."""

    node: object  # LabelPredicate | tuple["and"|"or", LabelFilter, LabelFilter]


@dataclass
class LineFormat:
    template: str


@dataclass
class LabelFormat:
    # list of (dst, src_label_or_template, is_template)
    actions: list[tuple[str, str, bool]]


@dataclass
class DropKeep:
    kind: str  # drop | keep
    labels: list[str]


@dataclass
class Distinct:
    labels: list[str]


@dataclass
class Unwrap:
    label: str
    conv: str | None = None  # bytes | duration | duration_seconds


@dataclass
class LogQuery:
    selector: Selector
    stages: list[object] = field(default_factory=list)
    unwrap: Unwrap | None = None


# --- metric layer ------------------------------------------------------------


@dataclass
class Grouping:
    labels: list[str]
    without: bool = False


@dataclass
class RangeAgg:
    op: str  # count_over_time rate bytes_over_time ... quantile_over_time
    query: LogQuery
    range_us: int
    offset_us: int = 0
    q: float | None = None
    grouping: Grouping | None = None


@dataclass
class VectorAgg:
    op: str  # sum avg count min max stddev stdvar topk bottomk sort sort_desc
    expr: object
    grouping: Grouping | None = None
    k: int | None = None
    q: float | None = None


@dataclass
class BinOp:
    op: str
    lhs: object
    rhs: object
    bool_mode: bool = False
    on: list[str] | None = None
    ignoring: list[str] | None = None
    group_left: list[str] | None = None
    group_right: list[str] | None = None


@dataclass
class Literal:
    value: float


@dataclass
class LabelReplace:
    expr: object
    dst: str
    replacement: str
    src: str
    regex: str
