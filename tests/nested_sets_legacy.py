"""TEST-ONLY legacy nested-set encoder — quadratic, never a query route.

This is the window-function encoder that lived in
``operators/structural.py`` through round 8.  Its subtree-max step is a
per-trace all-pairs self-join (``array_position(b_path, a.span_id)``),
i.e. quadratic in spans-per-trace — fine on fixtures, wrong at scale.
It survives ONLY as an independent implementation for triangulating the
linear DFS routes in the property tests (the executing routes are
``operators.structural.trace_coords`` and the stored/streamed coords).

Convention note: this encoder keeps the LEGACY preorder-max numbering
(left = 1-based DFS preorder, right = max left in subtree) — the
descendant RELATION it induces (``a.left < d.left <= a.right``) is what
tests compare, never raw coordinates.  The exposed intrinsics follow
Tempo's classic enter/exit numbering since round 9 (see
``operators/structural.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oteldb_spark.operators.structural import (
    HARD_CAP,
    StructuralDepthError,
    _materialize,
)


def nested_sets(spans: DataFrame, max_depth: int | None = None) -> DataFrame:
    """Compute LEGACY nested-set (left, right) numbers per span.

    Strategy: derive each span's root-path by iterative parent joins
    (depth-bounded), sort spans in DFS order per trace via the path,
    then: left = DFS row index; right = max left of the subtree.
    Descendant(a, b) ⇔ a.ns_left < b.ns_left ≤ a.ns_right.
    """
    from pyspark.sql import Window

    # root-path as an array of span_ids, built by joining ancestors
    cur = spans.select(
        "trace_id",
        "span_id",
        "parent_span_id",
        F.array("span_id").alias("path"),
        F.col("parent_span_id").alias("cursor"),
    )
    for rounds in range(HARD_CAP + 1):
        if rounds == HARD_CAP:
            raise StructuralDepthError(
                f"nested_sets: root paths not complete after {HARD_CAP} rounds "
                "(cyclic or pathologically deep parent_span_id chain)"
            )
        nxt = (
            cur.alias("c")
            .join(
                spans.select(
                    F.col("trace_id").alias("a_tid"),
                    F.col("span_id").alias("a_sid"),
                    F.col("parent_span_id").alias("a_pid"),
                ),
                (F.col("c.trace_id") == F.col("a_tid"))
                & (F.col("c.cursor") == F.col("a_sid")),
                "left",
            )
            .select(
                "trace_id",
                "span_id",
                "parent_span_id",
                F.when(
                    F.col("a_sid").isNotNull(),
                    F.concat(F.array(F.col("a_sid")), F.col("path")),
                )
                .otherwise(F.col("path"))
                .alias("path"),
                F.col("a_pid").alias("cursor"),
            )
        )
        cur = _materialize(nxt)
        if cur.filter(F.col("cursor").isNotNull()).isEmpty():
            break
    w = Window.partitionBy("trace_id").orderBy("path")
    dfs = cur.withColumn("ns_left", F.row_number().over(w))
    # right = max ns_left among spans whose path has this span as prefix
    me = dfs.select("trace_id", "span_id", "parent_span_id", "path", "ns_left")
    sub = (
        me.alias("a")
        .join(
            me.select(
                F.col("trace_id").alias("b_tid"),
                F.col("path").alias("b_path"),
                F.col("ns_left").alias("b_left"),
            ),
            (F.col("a.trace_id") == F.col("b_tid"))
            & F.expr("array_position(b_path, a.span_id) > 0"),
        )
        .groupBy(
            F.col("a.trace_id").alias("r_tid"), F.col("a.span_id").alias("r_sid")
        )
        .agg(F.max("b_left").alias("ns_right"))
    )
    return (
        me.join(
            sub,
            (me.trace_id == sub.r_tid) & (me.span_id == sub.r_sid),
        )
        .select("trace_id", "span_id", "parent_span_id", "ns_left", "ns_right")
    )
