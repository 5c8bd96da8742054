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

Prometheus cardinality contract (promql/engine.go VectorBinop): the
"one" side of a match group must be unique per signature — one-to-one
requires both sides unique, ``group_left`` requires the right side
unique.  A violation is a query error ("found duplicate series for the
match group"), not a silent many-to-many join.  Enforced here with a
window count over the join keys folded into the value expression via
``assert_true`` (stays lazy, adds no extra shuffle: the window
partitions on the same keys the join hashes on).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_INF = float("inf")
_NAN = float("nan")


def _p_div(a: Column, b: Column) -> Column:
    """IEEE float division (Prometheus): x/0 = ±Inf, 0/0 = NaN —
    where Spark SQL double division yields NULL."""
    return (
        F.when(
            b == 0,
            F.when((a == 0) | F.isnan(a), F.lit(_NAN)).otherwise(
                F.signum(a) * F.lit(_INF)
            ),
        )
        .otherwise(a / b)
    )


def _p_mod(a: Column, b: Column) -> Column:
    """Go math.Mod: x % 0 = NaN (Spark yields NULL)."""
    return F.when(b == 0, F.lit(_NAN)).otherwise(a % b)


ARITH = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": _p_div,
    "%": _p_mod,
    "^": lambda a, b: F.pow(a, b),
    "atan2": lambda a, b: F.atan2(a, b),
}
CMP = {
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
}

_DUP_MSG = "found duplicate series for the match group on the {} side"


def _with_pad(df: DataFrame, keys: list[str]) -> DataFrame:
    """Add ""-valued columns for join keys the frame doesn't carry
    (Prometheus: absent label == "")."""
    for k in keys:
        if k not in df.columns:
            df = df.withColumn(k, F.lit(""))
    return df


def _uniq_cnt(df: DataFrame, keys: list[str], col: str) -> DataFrame:
    w = Window.partitionBy(*[F.col(k) for k in keys])
    return df.withColumn(col, F.count(F.lit(1)).over(w))


def _guard(value: Column, checks: list[Column]) -> Column:
    """Fold uniqueness assertions into the value expression so
    Catalyst cannot prune them: assert_true returns NULL when the
    predicate holds and raises otherwise."""
    for chk in checks:
        value = value + F.coalesce(chk.cast("double"), F.lit(0.0))
    return value


def vector_binop(
    left: DataFrame,
    right: DataFrame,
    op: str,
    *,
    on: list[str],
    value_col: str = "value",
    bool_mode: bool = False,
    group_left_labels: list[str] | None = None,
    include_right: list[str] | None = None,
    check_unique: bool = True,
    reverse: bool = False,
) -> DataFrame:
    """Join two stepped series frames on (step_us, *on) and combine.

    ``group_left_labels``: extra left-side labels carried through a
    many-to-one match (PromQL ``group_left``); when set, only the
    right side must be unique per match group.  ``include_right``:
    labels copied from the right ("one") side into the result
    (``group_left(lbl)``).  One-to-one (no carry): result labels are
    the join keys and BOTH sides must be unique per group.
    """
    keys = ["step_us", *on]
    left = _with_pad(left, on)
    right = _with_pad(right, on)

    if op in ("and",):
        return left.join(right.select(*keys).distinct(), keys, "left_semi")
    if op in ("unless",):
        return left.join(right.select(*keys).distinct(), keys, "left_anti")
    if op in ("or",):
        rn = right.join(left.select(*keys).distinct(), keys, "left_anti")
        cols = left.columns
        rn = _with_pad(rn, [c for c in cols if c not in rn.columns]).select(*cols)
        lf = _with_pad(left, [c for c in rn.columns if c not in left.columns])
        return lf.unionByName(rn, allowMissingColumns=True)

    many = group_left_labels is not None
    checks = []
    if check_unique:
        right = _uniq_cnt(right, keys, "_r_cnt")
        checks.append(
            F.assert_true(
                F.col("r._r_cnt") == 1, F.lit(_DUP_MSG.format("right"))
            )
        )
        if not many:
            left = _uniq_cnt(left, keys, "_l_cnt")
            checks.append(
                F.assert_true(
                    F.col("l._l_cnt") == 1, F.lit(_DUP_MSG.format("left"))
                )
            )

    llabels = [
        c for c in left.columns
        if c not in ("step_us", value_col, "_l_cnt", "_r_cnt")
    ]
    lv = F.col(f"l.{value_col}")
    rv = F.col(f"r.{value_col}")
    if reverse:
        # frames were swapped to put the "many" side on the left
        # (group_right); restore the written operand order
        lv, rv = rv, lv
    carry = [F.col(f"l.{c}").alias(c) for c in (group_left_labels or [])]
    include = [F.col(f"r.{c}").alias(c) for c in (include_right or [])
               if c in right.columns]
    keep = [F.col(f"l.{k}").alias(k) for k in keys]

    l = left.alias("l")
    r = right.alias("r")
    cond = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in keys]

    if op in ARITH:
        value = _guard(ARITH[op](lv, rv), checks)
        return l.join(r, cond, "inner").select(*keep, *carry, *include,
                                               value.alias("value"))
    if op in CMP:
        pred = CMP[op](lv, rv)
        if bool_mode:
            value = _guard(
                F.when(pred, F.lit(1.0)).otherwise(F.lit(0.0)), checks
            )
            return l.join(r, cond, "inner").select(*keep, *carry, *include,
                                                   value.alias("value"))
        # filter semantics: keep the LEFT sample (all its labels)
        # where the predicate holds (promql: returnBool==false)
        keep_all = [F.col("l.step_us").alias("step_us")] + [
            F.col(f"l.{c}").alias(c) for c in llabels
        ]
        return (
            l.join(r, cond, "inner")
            .filter(pred)
            .select(*keep_all, _guard(lv, checks).alias("value"))
        )
    raise ValueError(f"unknown binop {op!r}")


def scalar_binop(df: DataFrame, op: str, scalar: float, *, value_col: str = "value",
                 scalar_on_left: bool = False, bool_mode: bool = False) -> DataFrame:
    v = F.col(value_col)
    s = F.lit(float(scalar))
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


def scalar_frame_binop(
    vec: DataFrame,
    scal: DataFrame,
    op: str,
    *,
    value_col: str = "value",
    scalar_on_left: bool = False,
    bool_mode: bool = False,
) -> DataFrame:
    """Vector ⊗ dynamic scalar (a per-step scalar frame like ``time()``
    or a parenthesised literal expression): broadcast-join the scalar
    side on step_us and apply scalar-binop semantics — the VECTOR
    side's labels survive (Prometheus vector/scalar matching)."""
    s = F.broadcast(scal.select("step_us", F.col(value_col).alias("_scalar")))
    j = vec.join(s, "step_us")
    v = F.col(value_col)
    sc = F.col("_scalar")
    a, b = (sc, v) if scalar_on_left else (v, sc)
    if op in ARITH:
        return j.withColumn(value_col, ARITH[op](a, b)).drop("_scalar")
    if op in CMP:
        if bool_mode:
            return j.withColumn(
                value_col,
                F.when(CMP[op](a, b), F.lit(1.0)).otherwise(F.lit(0.0)),
            ).drop("_scalar")
        return j.filter(CMP[op](a, b)).drop("_scalar")
    raise ValueError(f"unknown binop {op!r}")
