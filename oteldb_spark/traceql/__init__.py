"""TraceQL front-end: parser + DataFrame compiler.

Mirrors ``internal/traceql`` (parser/AST with static typing) +
``traceqlengine`` (processor tree), compiled to span-table DataFrame
plans: span filters are Column predicates, structural operators are
per-trace self-joins (operators/structural.py), spanset scalar
filters are trace-level aggregates.
"""

from .parser import parse  # noqa: F401
from .compiler import (  # noqa: F401
    SpanSource,
    compile_traceql,
    compile_traceql_metrics,
)
