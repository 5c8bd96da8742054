"""PromQL AST nodes (selector/call shapes mirror the Prometheus
grammar; aggregation/binop nodes are shared with the LogQL AST)."""

from __future__ import annotations

from dataclasses import dataclass, field

from ..logql.ast import (  # noqa: F401  (re-exported shared nodes)
    BinOp,
    Grouping,
    LabelMatcher,
    LabelReplace,
    Literal,
    VectorAgg,
)


@dataclass
class VectorSelector:
    name: str | None
    matchers: list[LabelMatcher] = field(default_factory=list)
    range_us: int | None = None  # set for range selectors  v[5m]
    offset_us: int = 0
    # subquery: v[range:step]
    subquery_step_us: int | None = None
    # @ modifier: pin evaluation to a fixed time (µs)
    at_us: int | None = None


@dataclass
class FuncCall:
    name: str
    args: list[object] = field(default_factory=list)
