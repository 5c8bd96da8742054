"""LogQL front-end: lexer → AST → DataFrame compiler.

Mirrors the reference's split (``internal/logql`` parser/AST +
``internal/logql/logqlengine`` evaluator) but the "engine" half is
gone: the compiler emits a Spark DataFrame plan directly and Catalyst
does the optimizer passes the reference hand-rolls
(``engine_optimizer.go`` → predicate pushdown, ``limit_pushdown.go``
→ LimitPushDown, ...).
"""

from .parser import parse  # noqa: F401
from .compiler import LogSource, EvalParams, compile_logql  # noqa: F401
