"""PromQL recursive-descent parser (Prometheus grammar shapes:
vector selectors with names, range/subquery brackets, offset, function
calls, aggregation operators with by/without, binary operators with
vector-matching modifiers).
"""

from __future__ import annotations

from ..logql.lexer import Token, duration_to_us, lex
from . import ast

AGG_OPS = {
    "sum",
    "avg",
    "min",
    "max",
    "count",
    "group",
    "stddev",
    "stdvar",
    "topk",
    "bottomk",
    "quantile",
    "count_values",
}

FUNCS = {
    "rate",
    "increase",
    "delta",
    "irate",
    "idelta",
    "avg_over_time",
    "min_over_time",
    "max_over_time",
    "sum_over_time",
    "count_over_time",
    "stddev_over_time",
    "stdvar_over_time",
    "quantile_over_time",
    "last_over_time",
    "first_over_time",
    "present_over_time",
    "absent_over_time",
    "ts_of_last_over_time",
    "ts_of_max_over_time",
    "ts_of_min_over_time",
    "info",
    "histogram_count",
    "histogram_sum",
    "histogram_avg",
    "histogram_stddev",
    "histogram_stdvar",
    "histogram_fraction",
    "mad_over_time",
    "sort_by_label",
    "sort_by_label_desc",
    "histogram_quantile",
    "abs",
    "ceil",
    "floor",
    "exp",
    "ln",
    "log2",
    "log10",
    "sqrt",
    "round",
    "clamp",
    "clamp_min",
    "clamp_max",
    "scalar",
    "vector",
    "label_replace",
    "label_join",
    "sgn",
    "resets",
    "changes",
    "deriv",
    "predict_linear",
    "absent",
    "time",
    "hour",
    "minute",
    "day_of_week",
    "day_of_month",
    "day_of_year",
    "month",
    "year",
    "days_in_month",
    "timestamp",
    "sort",
    "sort_desc",
    "pi",
    "sin",
    "cos",
    "tan",
    "asin",
    "acos",
    "atan",
    "sinh",
    "cosh",
    "tanh",
    "asinh",
    "acosh",
    "atanh",
    "deg",
    "rad",
    "double_exponential_smoothing",
}

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

    def peek(self, ahead: int = 0) -> Token:
        return self.toks[min(self.i + ahead, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[min(self.i, len(self.toks) - 1)]
        if t.kind == "eof":
            raise SyntaxError("PromQL: unexpected end of input")
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
            raise SyntaxError(f"PromQL: expected {text!r}, got {t.text!r} at {t.pos}")
        return t

    def parse(self):
        e = self.parse_expr()
        if self.peek().kind != "eof":
            t = self.peek()
            raise SyntaxError(f"PromQL: trailing input {t.text!r} at {t.pos}")
        return e

    def parse_expr(self, prec: int = 0):
        if prec >= len(_PREC):
            return self.parse_postfix()
        lhs = self.parse_expr(prec + 1)
        while self.peek().text in _PREC[prec]:
            op = self.next().text
            bool_mode = self.accept("bool")
            on = ignoring = gl = gr = None
            if self.peek().text in ("on", "ignoring"):
                which = self.next().text
                labels = self._label_list()
                if which == "on":
                    on = labels
                else:
                    ignoring = labels
                if self.peek().text in ("group_left", "group_right"):
                    side = self.next().text
                    extra = self._label_list() if self.peek().text == "(" else []
                    if side == "group_left":
                        gl = extra
                    else:
                        gr = extra
            rhs = self.parse_expr(prec + 1)
            lhs = ast.BinOp(
                op,
                lhs,
                rhs,
                bool_mode=bool_mode,
                on=on,
                ignoring=ignoring,
                group_left=gl,
                group_right=gr,
            )
        return lhs

    def parse_postfix(self):
        e = self.parse_atom()
        # range / subquery brackets and offset may follow any vector
        while True:
            if self.peek().text == "[":
                self.next()
                rng = duration_to_us(self.next().text)
                if self.accept(":"):
                    step = None
                    if self.peek().text != "]":
                        step = duration_to_us(self.next().text)
                    if not isinstance(e, ast.VectorSelector):
                        e = _wrap_subquery(e, rng, step)
                        self.expect("]")
                        continue
                    e.range_us = rng
                    e.subquery_step_us = step
                else:
                    if not isinstance(e, ast.VectorSelector):
                        raise SyntaxError("PromQL: range on non-selector")
                    e.range_us = rng
                self.expect("]")
            elif self.accept("offset"):
                # negative offsets look forward (promql/parser.go
                # allows `offset -5m` since Prometheus 2.26)
                sign = 1
                if self.accept("-"):
                    sign = -1
                elif self.accept("+"):
                    pass
                off = sign * duration_to_us(self.next().text)
                if isinstance(e, ast.VectorSelector):
                    e.offset_us = off
                elif isinstance(e, ast.FuncCall) and e.name == "__subquery__":
                    e.offset_us = off  # type: ignore[attr-defined]
                else:
                    raise SyntaxError("PromQL: offset on non-selector")
            elif self.accept("@"):
                if self.peek().text in ("start", "end"):
                    # @ start() / @ end(): pinned to the query window
                    # bounds, resolved against params at compile time
                    which = self.next().text
                    self.expect("(")
                    self.expect(")")
                    if not isinstance(e, ast.VectorSelector):
                        raise SyntaxError("PromQL: @ on non-selector")
                    e.at_us = which  # sentinel
                else:
                    at = float(self.next().text)  # unix seconds
                    if isinstance(e, ast.VectorSelector):
                        e.at_us = int(at * 1e6)
                    else:
                        raise SyntaxError("PromQL: @ on non-selector")
            else:
                return e

    def parse_atom(self):
        t = self.peek()
        if t.text == "(":
            self.next()
            e = self.parse_expr()
            self.expect(")")
            return e
        if t.kind == "number":
            self.next()
            return ast.Literal(t.number())
        if t.text in ("-", "+"):
            # unary +/- binds tighter than binary ops except ^
            # (promql/parser.go: -1^2 is -(1^2)); -vector ≡ 0 - vector
            sign = self.next().text
            operand = self.parse_expr(len(_PREC) - 1)
            if sign == "+":
                return operand
            if isinstance(operand, ast.Literal):
                return ast.Literal(-operand.value)
            return ast.BinOp("-", ast.Literal(0.0), operand)
        if t.text == "{":
            return self.parse_selector(None)
        if t.kind == "ident":
            name = t.text
            if name in ("Inf", "inf", "NaN", "nan") and self.peek(1).text != "{":
                self.next()
                return ast.Literal(float(name.lower()))
            if name in AGG_OPS and self.peek(1).text in ("(", "by", "without"):
                return self.parse_agg()
            if name in FUNCS and self.peek(1).text == "(":
                return self.parse_func()
            # metric name selector
            self.next()
            if self.peek().text == "{":
                return self.parse_selector(name)
            return ast.VectorSelector(name)
        raise SyntaxError(f"PromQL: unexpected {t.text!r} at {t.pos}")

    def parse_selector(self, name: str | None) -> ast.VectorSelector:
        self.expect("{")
        matchers = []
        while not self.accept("}"):
            lt = self.next()
            # Prometheus quoted label names ({"handler"="x"} — UTF-8
            # label syntax; the reference's e2e suite uses it)
            lname = lt.unquote() if lt.kind == "string" else lt.text
            op = self.next().text
            if op not in ("=", "!=", "=~", "!~"):
                raise SyntaxError(f"PromQL: bad matcher op {op!r}")
            val = self.next().unquote()
            if lname == "__name__" and op == "=":
                name = val
            else:
                matchers.append(ast.LabelMatcher(lname, op, val))
            self.accept(",")
        return ast.VectorSelector(name, matchers)

    def _label_list(self) -> list[str]:
        self.expect("(")
        labels = []
        while not self.accept(")"):
            labels.append(self.next().text)
            self.accept(",")
        return labels

    def parse_agg(self) -> ast.VectorAgg:
        op = self.next().text
        grouping = None
        if self.peek().text in ("by", "without"):
            without = self.next().text == "without"
            grouping = ast.Grouping(self._label_list(), without=without)
        self.expect("(")
        k = q = None
        if op in ("topk", "bottomk"):
            sign = -1 if self.accept("-") else 1
            k = sign * int(float(self.next().text))
            self.expect(",")
        elif op in ("quantile", "count_values"):
            if op == "quantile":
                sign = -1.0 if self.accept("-") else 1.0
                q = sign * self.next().number()
            else:
                q = self.next().unquote()
            self.expect(",")
        inner = self.parse_expr()
        self.expect(")")
        if grouping is None and self.peek().text in ("by", "without"):
            without = self.next().text == "without"
            grouping = ast.Grouping(self._label_list(), without=without)
        return ast.VectorAgg(op, inner, grouping=grouping, k=k, q=q)

    def parse_func(self) -> object:
        name = self.next().text
        self.expect("(")
        args: list[object] = []
        while not self.accept(")"):
            t = self.peek()
            if t.kind == "string":
                args.append(self.next().unquote())
            else:
                args.append(self.parse_expr())
            self.accept(",")
        if name == "label_replace":
            return ast.LabelReplace(args[0], args[1], args[2], args[3], args[4])
        return ast.FuncCall(name, args)


def _wrap_subquery(e, rng: int, step: int | None):
    fc = ast.FuncCall("__subquery__", [e])
    fc.range_us = rng  # type: ignore[attr-defined]
    fc.step_us = step  # type: ignore[attr-defined]
    fc.offset_us = 0  # type: ignore[attr-defined]
    return fc


def parse(text: str):
    return Parser(text).parse()
