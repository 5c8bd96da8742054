"""LogQL recursive-descent parser (mirrors the grammar shapes of
``internal/logql/parser*.go``: log queries with pipelines, metric
expressions with range/vector aggregation, binary operations with
precedence, grouping modifiers).
"""

from __future__ import annotations

from . import ast
from .lexer import Token, duration_to_us, lex

RANGE_OPS = {
    "count_over_time",
    "rate",
    "rate_counter",
    "bytes_over_time",
    "bytes_rate",
    "sum_over_time",
    "avg_over_time",
    "min_over_time",
    "max_over_time",
    "stdvar_over_time",
    "stddev_over_time",
    "quantile_over_time",
    "first_over_time",
    "last_over_time",
    "absent_over_time",
}
VECTOR_OPS = {
    "sum",
    "avg",
    "count",
    "min",
    "max",
    "stddev",
    "stdvar",
    "topk",
    "bottomk",
    "sort",
    "sort_desc",
}
PARSER_STAGES = {"json", "logfmt", "unpack", "decolorize", "drop", "keep", "distinct"}

# binary operator precedence (low → high), matching PromQL/LogQL
_PREC = [
    {"or"},
    {"and", "unless"},
    {"==", "!=", ">", ">=", "<", "<="},
    {"+", "-"},
    {"*", "/", "%"},
    {"^"},
]


class Parser:
    def __init__(self, text: str):
        self.toks = lex(text)
        self.i = 0

    # -- token helpers --------------------------------------------------------
    def peek(self, ahead: int = 0) -> Token:
        return self.toks[min(self.i + ahead, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[min(self.i, len(self.toks) - 1)]
        if t.kind == "eof":
            raise SyntaxError("LogQL: unexpected end of input")
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
            raise SyntaxError(f"LogQL: expected {text!r}, got {t.text!r} at {t.pos}")
        return t

    # -- entry ----------------------------------------------------------------
    def parse(self):
        expr = self.parse_expr()
        if self.peek().kind != "eof":
            t = self.peek()
            raise SyntaxError(f"LogQL: trailing input {t.text!r} at {t.pos}")
        return expr

    def parse_expr(self, prec: int = 0):
        if prec >= len(_PREC):
            return self.parse_unary()
        lhs = self.parse_expr(prec + 1)
        while self.peek().text in _PREC[prec]:
            op = self.next().text
            bool_mode = False
            on = ignoring = gl = gr = None
            if self.accept("bool"):
                bool_mode = True
            if self.peek().text in ("on", "ignoring"):
                which = self.next().text
                labels = self._label_list()
                if which == "on":
                    on = labels
                else:
                    ignoring = labels
                if self.peek().text in ("group_left", "group_right"):
                    side = self.next().text
                    extra = (
                        self._label_list() if self.peek().text == "(" else []
                    )
                    if side == "group_left":
                        gl = extra
                    else:
                        gr = extra
            rhs = self.parse_expr(prec + 1)
            lhs = ast.BinOp(
                op, lhs, rhs, bool_mode=bool_mode, on=on, ignoring=ignoring,
                group_left=gl, group_right=gr,
            )
        return lhs

    def parse_unary(self):
        t = self.peek()
        if t.text == "(":
            self.next()
            e = self.parse_expr()
            self.expect(")")
            return e
        if t.kind == "number":
            self.next()
            return ast.Literal(float(t.text))
        if t.text == "-" and self.peek(1).kind == "number":
            self.next()
            return ast.Literal(-float(self.next().text))
        if t.text == "{":
            return self.parse_log_query()
        if t.kind == "ident":
            if t.text in RANGE_OPS:
                return self.parse_range_agg()
            if t.text in VECTOR_OPS:
                return self.parse_vector_agg()
            if t.text == "label_replace":
                return self.parse_label_replace()
            if t.text == "vector":
                self.next()
                self.expect("(")
                v = float(self.next().text)
                self.expect(")")
                return ast.Literal(v)
        raise SyntaxError(f"LogQL: unexpected {t.text!r} at {t.pos}")

    # -- log query ------------------------------------------------------------
    def parse_log_query(self) -> ast.LogQuery:
        sel = self.parse_selector()
        q = ast.LogQuery(selector=sel)
        while True:
            t = self.peek()
            if t.text in ("|=", "|~", "!~", "!=", "|>", "!>"):
                self.next()
                if (
                    t.text in ("|=", "!=")
                    and self.peek().text == "ip"
                    and self.peek(1).text == "("
                ):
                    lf = ast.LineFilter(t.text, "", ips=[self._ip_arg()])
                    while (
                        self.peek().text == "or" and self.peek(1).text == "ip"
                    ):
                        self.next()
                        lf.ips.append(self._ip_arg())
                else:
                    lf = ast.LineFilter(t.text, self.next().unquote())
                    while (
                        self.peek().text == "or"
                        and self.peek(1).kind == "string"
                    ):
                        self.next()
                        lf.alts.append(self.next().unquote())
                q.stages.append(lf)
            elif t.text == "|":
                self.next()
                q.stages.append(self.parse_stage(q))
            else:
                break
        return q

    def _ip_arg(self) -> str:
        self.expect("ip")
        self.expect("(")
        val = self.next().unquote()
        self.expect(")")
        return val

    def parse_selector(self) -> ast.Selector:
        self.expect("{")
        matchers = []
        while not self.accept("}"):
            name = self._label_name()
            op = self.next().text
            if op not in ("=", "!=", "=~", "!~"):
                raise SyntaxError(f"LogQL: bad matcher op {op!r}")
            val = self.next().unquote()
            matchers.append(ast.LabelMatcher(name, op, val))
            self.accept(",")
        return ast.Selector(matchers)

    def _label_name(self) -> str:
        t = self.next()
        if t.kind == "string":
            # Prometheus-style quoted label name — the oteldb
            # extension exercised by its e2e suite
            # (integration/lokie2e/common_test.go: {"http.method"="GET"})
            return t.unquote()
        parts = [t.text]
        while self.peek().text == "." and self.peek(1).kind == "ident":
            self.next()
            parts.append(self.next().text)
        return ".".join(parts)

    def parse_stage(self, q: ast.LogQuery):
        t = self.next()
        if t.text in ("json", "logfmt"):
            exprs: dict[str, str] = {}
            while self.peek().kind == "ident":
                lbl = self.next().text
                if self.accept("="):
                    exprs[lbl] = self.next().unquote()
                else:
                    exprs[lbl] = lbl
                self.accept(",")
            return ast.ParserStage(t.text, exprs=exprs)
        if t.text in ("unpack", "decolorize"):
            return ast.ParserStage(t.text)
        if t.text in ("regexp", "pattern"):
            return ast.ParserStage(t.text, param=self.next().unquote())
        if t.text == "line_format":
            return ast.LineFormat(self.next().unquote())
        if t.text == "label_format":
            actions = []
            while True:
                dst = self.next().text
                self.expect("=")
                v = self.peek()
                if v.kind == "string":
                    actions.append((dst, self.next().unquote(), True))
                else:
                    actions.append((dst, self.next().text, False))
                if not self.accept(","):
                    break
            return ast.LabelFormat(actions)
        if t.text in ("drop", "keep"):
            labels = [self.next().text]
            while self.accept(","):
                labels.append(self.next().text)
            return ast.DropKeep(t.text, labels)
        if t.text == "distinct":
            labels = [self.next().text]
            while self.accept(","):
                labels.append(self.next().text)
            return ast.Distinct(labels)
        if t.text == "unwrap":
            conv = None
            lbl = self.next().text
            if lbl in ("bytes", "duration", "duration_seconds") and self.accept("("):
                conv = lbl
                lbl = self.next().text
                self.expect(")")
            q.unwrap = ast.Unwrap(lbl, conv)
            return ast.ParserStage("noop")
        # label filter expression
        self.i -= 1
        return self.parse_label_filter()

    def parse_label_filter(self) -> ast.LabelFilter:
        node = self._label_filter_or()
        return ast.LabelFilter(node)

    def _label_filter_or(self):
        lhs = self._label_filter_and()
        while self.peek().text == "or":
            self.next()
            lhs = ("or", lhs, self._label_filter_and())
        return lhs

    _CMP_OPS = ("=", "==", "!=", "=~", "!~", ">", ">=", "<", "<=")

    def _label_filter_and(self):
        lhs = self._label_filter_atom()
        while True:
            if self.peek().text in ("and", ","):
                self.next()
            elif (
                # space-separated predicates are an implicit `and`
                # (logql grammar: `| a > 1 b < 2`)
                self.peek().kind == "ident"
                and self.peek(1).text in self._CMP_OPS
            ):
                pass
            else:
                break
            lhs = ("and", lhs, self._label_filter_atom())
        return lhs

    def _label_filter_atom(self):
        if self.accept("("):
            inner = self._label_filter_or()
            self.expect(")")
            return inner
        label = self._label_name()
        op = self.next().text
        if op not in ("=", "==", "!=", "=~", "!~", ">", ">=", "<", "<="):
            raise SyntaxError(f"LogQL: bad label-filter op {op!r}")
        v = self.next()
        if v.kind == "string":
            vtype = "string"
            value = v.unquote()
        elif v.kind == "duration":
            vtype, value = "duration", v.text
        elif v.kind == "bytes":
            vtype, value = "bytes", v.text
        elif v.kind == "number":
            vtype, value = "number", v.text
        elif v.text == "ip":
            self.expect("(")
            vtype, value = "ip", self.next().unquote()
            self.expect(")")
        else:
            raise SyntaxError(f"LogQL: bad label-filter value {v.text!r}")
        return ast.LabelPredicate(label, op, value, vtype)

    # -- metric layer ---------------------------------------------------------
    def _label_list(self) -> list[str]:
        self.expect("(")
        labels = []
        while not self.accept(")"):
            labels.append(self.next().text)
            self.accept(",")
        return labels

    def _grouping(self) -> ast.Grouping | None:
        if self.peek().text in ("by", "without"):
            without = self.next().text == "without"
            return ast.Grouping(self._label_list(), without=without)
        return None

    def parse_range_agg(self) -> ast.RangeAgg:
        op = self.next().text
        grouping = self._grouping()
        self.expect("(")
        q = None
        if op == "quantile_over_time":
            q = float(self.next().text)
            self.expect(",")
        logq = self.parse_log_query()
        # [range]
        self.expect("[")
        rng = duration_to_us(self.next().text)
        self.expect("]")
        offset = 0
        if self.accept("offset"):
            offset = duration_to_us(self.next().text)
        self.expect(")")
        if grouping is None:
            grouping = self._grouping()
        return ast.RangeAgg(op, logq, rng, offset, q=q, grouping=grouping)

    def parse_vector_agg(self) -> ast.VectorAgg:
        op = self.next().text
        grouping = self._grouping()
        self.expect("(")
        k = q = None
        if op in ("topk", "bottomk"):
            k = int(float(self.next().text))
            self.expect(",")
        inner = self.parse_expr()
        self.expect(")")
        if grouping is None:
            grouping = self._grouping()
        return ast.VectorAgg(op, inner, grouping=grouping, k=k, q=q)

    def parse_label_replace(self) -> ast.LabelReplace:
        self.expect("label_replace")
        self.expect("(")
        expr = self.parse_expr()
        self.expect(",")
        dst = self.next().unquote()
        self.expect(",")
        repl = self.next().unquote()
        self.expect(",")
        src = self.next().unquote()
        self.expect(",")
        regex = self.next().unquote()
        self.expect(")")
        return ast.LabelReplace(expr, dst, repl, src, regex)


def parse(text: str):
    return Parser(text).parse()
