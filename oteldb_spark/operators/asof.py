"""As-of join — match each left row to the latest right row at or
before its timestamp, per key.

The naive formulation is a range join (``l.ts >= r.ts`` plus a
max-per-left reduction) whose candidate space is quadratic per key.
The scale-correct Spark shape is union-tag + one window: tag both
inputs, union them, and take ``last(value, ignorenulls=True)`` over
``(key) ORDER BY (ts, side)`` — one shuffle on the key, linear work,
the same trick the step engine uses for staleness lookback.  DuckDB
has the operator natively (``ASOF JOIN``), which the gate uses as
the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For every ``left`` row: the ``value_cols`` of the latest
    ``right`` row with ``right.ts <= left.ts`` for the same ``on``
    key (nulls when none precedes).  Both inputs need ``ts_col``.

    Equal timestamps match (the right row sorts before the left at
    the same instant), mirroring DuckDB's ``ASOF JOIN ... >=``.
    """
    out_vals = [c + suffix for c in value_cols]
    # All value_cols travel in ONE struct that is non-null for every
    # right row (even when individual values are NULL): last(...,
    # ignorenulls) then always picks the single latest right ROW, so
    # the output never mixes values from different right rows and a
    # genuine NULL in the latest row survives instead of resurrecting
    # a stale older value (DuckDB ASOF JOIN semantics, our oracle).
    vals_type = (
        "struct<"
        + ",".join(
            f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols
        )
        + ">"
    )
    l_tag = left.select(
        *on,
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(vals_type).alias("_vals"),
        F.struct(*left.columns).alias("_row"),
    )
    r_tag = right.select(
        *on,
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_vals"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}"
                                 for f in left.schema.fields) + ">"
        ).alias("_row"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tag.unionByName(r_tag).select(
        "_side",
        "_row",
        F.last("_vals", ignorenulls=True).over(w).alias("_vals"),
    )
    return filled.filter(F.col("_side") == 1).select(
        *[F.col(f"_row.{c}").alias(c) for c in left.columns],
        *[F.col(f"_vals.{c}").alias(v) for c, v in zip(value_cols, out_vals)],
    )
