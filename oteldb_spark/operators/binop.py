"""Vector binary operations — arithmetic / comparison / set ops.

Reference: ``logqlengine/logqlmetric/bin_op.go:13-256`` (per-step hash
join on identical label sets) and PromQL vector matching incl.
``on()/ignoring()`` and ``group_left/group_right`` (which the LogQL
engine parses but rejects, ``bin_op.go:17-19`` — we support them,
matching the PromQL engine the reference delegates to).

Spark mapping: a join on (step_us + matching labels).  ``and`` is a
left-semi join, ``unless`` left-anti, ``or`` a full-outer coalesce
preferring the left side.  Small sides should be broadcast — Catalyst
/ AQE decides from stats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ARITH = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": lambda a, b: a / b,
    "%": lambda a, b: a % b,
    "^": lambda a, b: F.pow(a, b),
}
CMP = {
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
}


def vector_binop(
    left: DataFrame,
    right: DataFrame,
    op: str,
    *,
    on: list[str],
    value_col: str = "value",
    bool_mode: bool = False,
    group_left_labels: list[str] | None = None,
) -> DataFrame:
    """Join two stepped series frames on (step_us, *on) and combine.

    ``group_left_labels``: extra left-side labels carried through a
    many-to-one match (PromQL ``group_left``).
    """
    keys = ["step_us", *on]
    lv = F.col(f"l.{value_col}")
    rv = F.col(f"r.{value_col}")
    carry = [F.col(f"l.{c}").alias(c) for c in (group_left_labels or [])]
    keep = [F.col(f"l.{k}").alias(k) for k in keys]

    l = left.alias("l")
    r = right.alias("r")
    cond = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in keys]

    if op in ("and",):
        return left.join(right.select(*keys).distinct(), keys, "left_semi")
    if op in ("unless",):
        return left.join(right.select(*keys).distinct(), keys, "left_anti")
    if op in ("or",):
        rn = right.join(left.select(*keys).distinct(), keys, "left_anti")
        return left.unionByName(rn)

    if op in ARITH:
        value = ARITH[op](lv, rv)
        return l.join(r, cond, "inner").select(*keep, *carry, value.alias("value"))
    if op in CMP:
        pred = CMP[op](lv, rv)
        if bool_mode:
            value = F.when(pred, F.lit(1.0)).otherwise(F.lit(0.0))
            return l.join(r, cond, "inner").select(*keep, *carry, value.alias("value"))
        # filter semantics: keep left sample where predicate holds
        return (
            l.join(r, cond, "inner")
            .filter(pred)
            .select(*keep, *carry, lv.alias("value"))
        )
    raise ValueError(f"unknown binop {op!r}")


def scalar_binop(df: DataFrame, op: str, scalar: float, *, value_col: str = "value",
                 scalar_on_left: bool = False, bool_mode: bool = False) -> DataFrame:
    v = F.col(value_col)
    s = F.lit(scalar)
    a, b = (s, v) if scalar_on_left else (v, s)
    if op in ARITH:
        return df.withColumn(value_col, ARITH[op](a, b))
    if op in CMP:
        if bool_mode:
            return df.withColumn(
                value_col,
                F.when(CMP[op](a, b), F.lit(1.0)).otherwise(F.lit(0.0)),
            )
        return df.filter(CMP[op](a, b))
    raise ValueError(f"unknown binop {op!r}")
