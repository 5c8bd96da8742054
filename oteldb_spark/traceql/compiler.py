"""TraceQL → DataFrame compiler.

Span filters become Column predicates over the span table; structural
operators become per-trace self-joins; scalar filters become trace
aggregates.  Dynamic typing follows the reference: a type-mismatched
comparison yields null → the span is dropped (TypeAttribute
semantics, ``traceql/op.go:96-114``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.structural import child_join, descendants
from . import parser as P


@dataclass
class SpanSource:
    """Span table adapter.  ``attr_cols`` maps attribute names (as
    written in queries, e.g. ``service.name`` or ``http.route``) to
    columns; intrinsics map onto the standard span schema columns."""

    df: DataFrame
    attr_cols: dict[str, str]
    duration_col: str = "duration_us"  # µs (intrinsic `duration`)
    name_col: str = "name"
    status_col: str = "status_code"
    kind_col: str = "kind"
    trace_col: str = "trace_id"
    span_col: str = "span_id"
    parent_col: str = "parent_span_id"
    start_col: str = "start_us"
    attrs_map_col: str | None = None


def _attr_col(src: SpanSource, a: P.Attr) -> Column:
    if a.scope == "intrinsic":
        intr = {
            "duration": F.col(src.duration_col),
            "name": F.col(src.name_col),
            "status": F.col(src.status_col),
            "kind": F.col(src.kind_col),
        }
        if a.name in intr:
            return intr[a.name]
        raise KeyError(f"TraceQL: intrinsic {a.name} needs trace context")
    key = a.name
    if key in src.attr_cols:
        return F.col(src.attr_cols[key])
    if a.scope in ("span", "resource") and f"{a.scope}.{key}" in src.attr_cols:
        return F.col(src.attr_cols[f"{a.scope}.{key}"])
    if src.attrs_map_col is not None:
        return F.col(src.attrs_map_col).getItem(key)
    raise KeyError(f"TraceQL: unknown attribute {a.scope}.{key}")


def _field_col(src: SpanSource, e) -> Column:
    if isinstance(e, P.Lit):
        if e.kind == "duration":
            return F.lit(float(e.value))  # µs, matches duration intrinsic
        return F.lit(e.value)
    if isinstance(e, P.Attr):
        return _attr_col(src, e)
    if isinstance(e, P.FieldOp):
        if e.op == "!":
            return ~_field_col(src, e.lhs)
        if e.op == "neg":
            return -_field_col(src, e.lhs)
        a = _field_col(src, e.lhs)
        b = _field_col(src, e.rhs)
        ops = {
            "=": lambda: a == b,
            "!=": lambda: a != b,
            "=~": lambda: a.rlike(_lit_str(e.rhs)),
            "!~": lambda: ~a.rlike(_lit_str(e.rhs)),
            ">": lambda: a > b,
            ">=": lambda: a >= b,
            "<": lambda: a < b,
            "<=": lambda: a <= b,
            "&&": lambda: a & b,
            "||": lambda: a | b,
            "+": lambda: a + b,
            "-": lambda: a - b,
            "*": lambda: a * b,
            "/": lambda: a / b,
            "%": lambda: a % b,
        }
        return ops[e.op]()
    raise SyntaxError(f"TraceQL: bad field expr {e!r}")


def _lit_str(e) -> str:
    if isinstance(e, P.Lit) and e.kind == "string":
        return e.value
    raise SyntaxError("TraceQL: regex operand must be a string literal")


def _spanset_pred(src: SpanSource, s: P.Spanset) -> Column:
    if s.expr is None:
        return F.lit(True)
    return _field_col(src, s.expr)


def compile_traceql(query, source: SpanSource) -> DataFrame:
    """Compile a TraceQL query to the DataFrame of matching spans."""
    if isinstance(query, str):
        query = P.parse(query)

    spans = source.df
    out = _compile_structural(query.root, source)

    for stage in query.stages:
        if isinstance(stage, P.ScalarFilter):
            if stage.agg == "count":
                agg = F.count(F.lit(1)).cast("double")
            else:
                col = (
                    _field_col(src=source, e=stage.attr)
                    if stage.attr is not None
                    else F.col(source.duration_col)
                )
                agg = {
                    "max": F.max,
                    "min": F.min,
                    "avg": F.avg,
                    "sum": F.sum,
                }[stage.agg](col).cast("double")
            per_trace = out.groupBy(source.trace_col).agg(agg.alias("__agg"))
            cmp = {
                "=": F.col("__agg") == stage.value,
                "!=": F.col("__agg") != stage.value,
                ">": F.col("__agg") > stage.value,
                ">=": F.col("__agg") >= stage.value,
                "<": F.col("__agg") < stage.value,
                "<=": F.col("__agg") <= stage.value,
            }[stage.op]
            keep = per_trace.filter(cmp).select(source.trace_col)
            out = out.join(keep, source.trace_col, "left_semi")
        elif isinstance(stage, P.Select):
            cols = [source.trace_col, source.span_col] + [
                _attr_col(source, a).alias(a.name.replace(".", "_"))
                for a in stage.attrs
            ]
            out = out.select(*cols)
        else:
            raise SyntaxError(f"TraceQL: unsupported stage {stage!r}")
    return out


def _compile_structural(node, source: SpanSource) -> DataFrame:
    spans = source.df
    if isinstance(node, P.Spanset):
        return spans.filter(_spanset_pred(source, node))
    if isinstance(node, P.Structural):
        if node.op in ("&&", "||"):
            lhs = _compile_structural(node.lhs, source)
            rhs = _compile_structural(node.rhs, source)
            lt = lhs.select(source.trace_col).distinct()
            rt = rhs.select(source.trace_col).distinct()
            if node.op == "&&":
                # same-trace intersection: spans from both sides in
                # traces where both matched (spanset_op.go:42-66)
                both = lt.join(rt, source.trace_col, "left_semi")
                u = lhs.unionByName(rhs).dropDuplicates(
                    [source.trace_col, source.span_col]
                )
                return u.join(both, source.trace_col, "left_semi")
            return lhs.unionByName(rhs).dropDuplicates(
                [source.trace_col, source.span_col]
            )
        # structural child/descendant/sibling: rhs spans related to lhs
        lp = _node_pred(node.lhs, source)
        rp = _node_pred(node.rhs, source)
        if node.op == ">":
            return child_join(spans, lp, rp)
        if node.op == ">>":
            return descendants(spans, lp, rp)
        if node.op == "~":
            a = spans.filter(lp).select(
                F.col(source.trace_col).alias("__tid"),
                F.col(source.parent_col).alias("__pid"),
                F.col(source.span_col).alias("__sid"),
            )
            b = spans.filter(rp)
            return (
                b.join(
                    a,
                    (b[source.trace_col] == F.col("__tid"))
                    & (b[source.parent_col].eqNullSafe(F.col("__pid")))
                    & (b[source.span_col] != F.col("__sid")),
                )
                .drop("__tid", "__pid", "__sid")
                .dropDuplicates([source.trace_col, source.span_col])
            )
        raise SyntaxError(f"TraceQL: unsupported structural op {node.op}")
    raise SyntaxError(f"TraceQL: bad node {node!r}")


def _node_pred(node, source: SpanSource) -> Column:
    if isinstance(node, P.Spanset):
        return _spanset_pred(source, node)
    raise SyntaxError("TraceQL: nested structural chains need parentheses")
