"""TraceQL parser — spanset pipelines with structural operators and
scalar filters (grammar shapes per ``internal/traceql/parser*.go``).

  query       := spanset_expr ( '|' scalar_filter | '|' select )*
  spanset_expr:= spanset ( ('&&'|'||'|'>'|'>>'|'~') spanset )*
  spanset     := '{' field_expr? '}'
  field_expr  := standard precedence over comparisons/&&/||/arith
  primary     := span.attr | resource.attr | intrinsic | literal
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..logql.lexer import Token, duration_to_us, lex

INTRINSICS = {
    "duration",
    "name",
    "status",
    "statusMessage",
    "kind",
    "childCount",
    "rootName",
    "rootServiceName",
    "traceDuration",
    # nested-set coords (attribute.go:60-65; reserved by the reference,
    # computed here — at ingest or per query)
    "nestedSetLeft",
    "nestedSetRight",
    "nestedSetParent",
}

STATUS_VALUES = {"error": 2, "ok": 1, "unset": 0}
KIND_VALUES = {
    "unspecified": 0,
    "internal": 1,
    "server": 2,
    "client": 3,
    "producer": 4,
    "consumer": 5,
}


@dataclass
class Attr:
    scope: str  # span | resource | intrinsic | unscoped
    name: str


@dataclass
class Lit:
    value: object  # float | str
    kind: str  # number | string | duration | status | kind


@dataclass
class FieldOp:
    op: str
    lhs: object
    rhs: object | None = None  # None for unary !


@dataclass
class Spanset:
    expr: object | None  # field expression or None for {}


@dataclass
class Structural:
    op: str  # && || > >> ~
    lhs: object
    rhs: object


@dataclass
class ScalarFilter:
    agg: str  # count max min avg sum
    attr: Attr | None
    op: str
    value: float


# --- scalar EXPRESSION filters (parser_pipeline.go scalar grammar):
# | sum(.x) / count() = avg(.x), | 200 = min(.x), | (min(.x)+min(.x))/2 = 200
@dataclass
class SAgg:
    fn: str  # count max min avg sum
    attr: "Attr | None"


@dataclass
class SNum:
    value: float


@dataclass
class SBin:
    op: str  # + - * /
    lhs: object
    rhs: object


@dataclass
class ScalarExprFilter:
    lhs: object
    op: str  # = != > >= < <=
    rhs: object


@dataclass
class Select:
    attrs: list[Attr]


@dataclass
class Group:
    # | by(<field expr>) — spansets split per group value
    # (traceql/parser_pipeline.go:316 parseGroupOperation; the
    # reference engine does not execute it, pipeline.go:78)
    by: object


@dataclass
class Coalesce:
    # | coalesce() — merge a trace's spansets back into one
    pass


@dataclass
class MetricFn:
    # trailing metrics stage (Tempo metrics queries; the reference
    # returns 501 for all of these, parser_metrics_expr.go):
    #   | rate() | count_over_time() | min/max/avg/sum_over_time(attr)
    #   | quantile_over_time(attr, q)        [ by (attrs...) ]
    name: str
    attr: object | None = None
    q: float | None = None
    by: list[object] = field(default_factory=list)


METRIC_FNS = {
    "rate",
    "count_over_time",
    "min_over_time",
    "max_over_time",
    "avg_over_time",
    "sum_over_time",
    "quantile_over_time",
    "histogram_over_time",
}


@dataclass
class TopK:
    # second-stage | topk(n) / bottomk(n): keep only the n series with
    # the highest/lowest value per step (traceql/op.go:398-419
    # MetricsStageOp + metrics_expr.go:123-129 TopKOperation —
    # parse-only in the reference)
    op: str  # "topk" | "bottomk"
    limit: int


@dataclass
class MetricsFilter:
    # second-stage | > 0.5 — drops series points not matching
    # (metrics_expr.go:131-135)
    op: str
    value: float


@dataclass
class MetricsScalarOp:
    # second-stage | * 2 — constant arithmetic on every point
    # (metrics_expr.go:137-145)
    op: str
    value: float


@dataclass
class Compare:
    # compare({selection}, topN[, start, end]) — selection-vs-baseline
    # attribute series (metrics_expr.go:66-95 CompareOperation;
    # parse-only in the reference)
    filter: object  # Spanset
    top_n: int = 10
    start_ns: int = 0
    end_ns: int = 0


@dataclass
class TraceQuery:
    root: object
    stages: list[object] = field(default_factory=list)


_PREC = [{"||"}, {"&&"}, {"=", "!=", "=~", "!~", ">", ">=", "<", "<="}, {"+", "-"}, {"*", "/", "%"}]


class Parser:
    def __init__(self, text: str):
        self.toks = lex(text)
        self.i = 0

    def peek(self, ahead: int = 0) -> Token:
        return self.toks[min(self.i + ahead, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[min(self.i, len(self.toks) - 1)]
        if t.kind == "eof":
            raise SyntaxError("TraceQL: unexpected end of input")
        self.i += 1
        return t

    def accept(self, text: str) -> bool:
        if self.peek().text == text:
            self.i += 1
            return True
        return False

    def expect(self, text: str) -> Token:
        t = self.next()
        if t.text != text:
            raise SyntaxError(f"TraceQL: expected {text!r}, got {t.text!r} at {t.pos}")
        return t

    def parse(self) -> TraceQuery:
        root = self.parse_structural()
        q = TraceQuery(root)
        while self.accept("|"):
            q.stages.append(self.parse_stage())
        if self.peek().kind != "eof":
            t = self.peek()
            raise SyntaxError(f"TraceQL: trailing input {t.text!r} at {t.pos}")
        return q

    def parse_structural(self):
        # full reference op set incl. parent/ancestor and negations
        # (traceql/op.go:218-239; the reference engine evaluates only
        # && || > >> ~, spanset_op.go:89-102 — the rest run here)
        lhs = self.parse_spanset()
        while self.peek().text in (
            "&&", "||", ">", ">>", "~", "<", "<<", "!>", "!~", "&",
        ):
            t = self.next()
            op = t.text
            # `!>>` lexes as `!>` + `>`; the union ops `&> &>> &< &<<
            # &~` lex as `&` + relation: paste adjacent tokens
            if (
                op == "!>"
                and self.peek().text == ">"
                and self.peek().pos == t.pos + 2
            ):
                self.next()
                op = "!>>"
            elif op == "&":
                nxt = self.peek()
                if nxt.text not in (">", ">>", "<", "<<", "~") or (
                    nxt.pos != t.pos + 1
                ):
                    raise SyntaxError(
                        f"TraceQL: bad operator '&{nxt.text}' at {t.pos}"
                    )
                self.next()
                op = "&" + nxt.text
            rhs = self.parse_spanset()
            lhs = Structural(op, lhs, rhs)
        return lhs

    def parse_spanset(self) -> Spanset:
        self.expect("{")
        if self.accept("}"):
            return Spanset(None)
        e = self.parse_field(0)
        self.expect("}")
        return Spanset(e)

    def parse_field(self, prec: int):
        if prec >= len(_PREC):
            return self.parse_field_unary()
        lhs = self.parse_field(prec + 1)
        while self.peek().text in _PREC[prec]:
            op = self.next().text
            rhs = self.parse_field(prec + 1)
            lhs = FieldOp(op, lhs, rhs)
        return lhs

    def parse_field_unary(self):
        if self.accept("!"):
            return FieldOp("!", self.parse_field_unary())
        if self.accept("-"):
            inner = self.parse_field_unary()
            return FieldOp("neg", inner)
        return self.parse_primary()

    def parse_primary(self):
        t = self.peek()
        if t.text == "(":
            self.next()
            e = self.parse_field(0)
            self.expect(")")
            return e
        if t.kind == "string":
            self.next()
            return Lit(t.unquote(), "string")
        if t.kind == "number":
            self.next()
            return Lit(float(t.text), "number")
        if t.kind == "duration":
            self.next()
            return Lit(duration_to_us(t.text), "duration")
        if t.kind == "ident":
            name = self.next().text
            if name in ("span", "resource", "instrumentation", "event", "link", "parent"):
                # scoped intrinsics: span:id, span:parentID, event:name,
                # event:timeSinceStart, link:traceID, link:spanID,
                # instrumentation:name/version (attribute.go:38-84)
                if self.accept(":"):
                    return Attr("intrinsic", f"{name}:{self.next().text}")
                self.expect(".")
                return Attr(name, self._dotted())
            if name == "trace" and self.accept(":"):
                return Attr("intrinsic", f"trace:{self.next().text}")
            if name == "status" and self.peek().text in ("=", "!="):
                return Attr("intrinsic", "status")
            if name in INTRINSICS:
                return Attr("intrinsic", name)
            if name in STATUS_VALUES:
                return Lit(float(STATUS_VALUES[name]), "status")
            if name in KIND_VALUES:
                return Lit(float(KIND_VALUES[name]), "kind")
            # unscoped attribute
            return Attr("unscoped", name)
        if t.text == ".":
            self.next()
            return Attr("unscoped", self._dotted())
        raise SyntaxError(f"TraceQL: unexpected {t.text!r} at {t.pos}")

    def _dotted(self) -> str:
        parts = [self.next().text]
        while self.accept("."):
            parts.append(self.next().text)
        return ".".join(parts)

    def parse_stage(self):
        t = self.next()
        if t.text in ("topk", "bottomk"):
            self.expect("(")
            n = int(float(self.next().text))
            self.expect(")")
            return TopK(t.text, n)
        if t.text == "compare":
            self.expect("(")
            filt = self.parse_spanset()
            top_n, start_ns, end_ns = 10, 0, 0
            if self.accept(","):
                top_n = int(float(self.next().text))
            if self.accept(","):
                start_ns = int(float(self.next().text))
                self.expect(",")
                end_ns = int(float(self.next().text))
            self.expect(")")
            return Compare(filt, top_n, start_ns, end_ns)
        if t.text in (">", ">=", "<", "<=", "=", "!="):
            v = self.next()
            value = (
                duration_to_us(v.text) if v.kind == "duration" else float(v.text)
            )
            return MetricsFilter(t.text, value)
        if t.text in ("+", "-", "*", "/"):
            return MetricsScalarOp(t.text, float(self.next().text))
        if t.text == "select":
            self.expect("(")
            attrs = []
            while not self.accept(")"):
                a = self.parse_primary()
                attrs.append(a)
                self.accept(",")
            return Select(attrs)
        if t.text in METRIC_FNS and self.peek().text == "(":
            self.expect("(")
            attr = None
            q = None
            if self.peek().text != ")":
                attr = self.parse_primary()
                if self.accept(","):
                    q = float(self.next().text)
            self.expect(")")
            by: list[object] = []
            if self.accept("by"):
                self.expect("(")
                while not self.accept(")"):
                    by.append(self.parse_primary())
                    self.accept(",")
            return MetricFn(t.text, attr, q, by)
        if t.text == "by":
            self.expect("(")
            e = self.parse_field(0)
            self.expect(")")
            return Group(e)
        if t.text == "coalesce":
            self.expect("(")
            self.expect(")")
            return Coalesce()
        if t.text in ("count", "max", "min", "avg", "sum") or t.text == "(" or t.kind in ("number", "duration"):
            self.i -= 1  # re-read the token inside the scalar grammar
            lhs = self._scalar_expr()
            op = self.next().text
            if op not in (">", ">=", "<", "<=", "=", "!="):
                raise SyntaxError(f"TraceQL: bad scalar filter op {op!r}")
            rhs = self._scalar_expr()
            # keep the historical simple shape on the historical node
            if (
                isinstance(lhs, SAgg)
                and isinstance(rhs, SNum)
            ):
                return ScalarFilter(lhs.fn, lhs.attr, op, rhs.value)
            return ScalarExprFilter(lhs, op, rhs)
        raise SyntaxError(f"TraceQL: unknown pipeline stage {t.text!r}")

    def _scalar_expr(self):
        """Additive precedence over scalar terms (aggregate calls,
        numbers/durations, parenthesized subexpressions)."""
        node = self._scalar_term()
        while self.peek().text in ("+", "-"):
            op = self.next().text
            node = SBin(op, node, self._scalar_term())
        return node

    def _scalar_term(self):
        node = self._scalar_primary()
        while self.peek().text in ("*", "/"):
            op = self.next().text
            node = SBin(op, node, self._scalar_primary())
        return node

    def _scalar_primary(self):
        t = self.next()
        if t.text == "(":
            e = self._scalar_expr()
            self.expect(")")
            return e
        if t.text in ("count", "max", "min", "avg", "sum"):
            self.expect("(")
            attr = None
            if self.peek().text != ")":
                attr = self.parse_primary()
            self.expect(")")
            return SAgg(t.text, attr)
        if t.kind == "duration":
            return SNum(float(duration_to_us(t.text)))
        if t.kind == "number":
            return SNum(float(t.text))
        raise SyntaxError(f"TraceQL: bad scalar term {t.text!r}")


def parse(text: str) -> TraceQuery:
    return Parser(text).parse()
