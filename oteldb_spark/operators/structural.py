"""TraceQL structural operators as distributed joins.

The reference evaluates ``>`` ``>>`` ``~`` by walking parent chains
per trace in memory (``traceql/traceqlengine/spanset_op.go:40-233``).
Spark-native strategies:

* child ``>`` / sibling ``~``: one self-join on
  (trace_id, parent_span_id ↔ span_id) — shuffle on trace_id.
* descendant ``>>``: iterative frontier join (bounded by max tree
  depth), or — the scale path — a **nested-set encoding** computed
  once at ingest: descendant(a, d) ⇔ a.left < d.left ∧ d.right <
  a.right, turning the recursion into a range predicate.  The
  reference schema reserves nestedSetLeft/Right intrinsics
  (``traceql/attribute.go:60-65``) without computing them; we do.

``nested_sets`` computes the encoding with two window functions over
a DFS ordering (no recursion for trees materialized with a
``depth``/path; for parent-pointer-only input use ``descendants``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Frontier loops iterate to FIXPOINT (frontier empty), not to a fixed
# round count: a depth bound would silently drop spans deeper than the
# bound from >> / << results (real traces routinely exceed 8 levels).
# Termination is guaranteed for any input because each round's frontier
# is anti-joined against everything already covered — the covered set
# grows monotonically within a finite node universe.  HARD_CAP only
# guards pathological inputs (corrupt parent pointers forming chains
# longer than any real trace); hitting it raises instead of truncating.
HARD_CAP = 256


def _materialize(df: DataFrame) -> DataFrame:
    """Truncate the loop state's LINEAGE, not just cache its rows.

    The per-round set is referenced twice downstream (next frontier +
    covered union), so without truncation the logical plan doubles per
    round and driver-side ANALYSIS time grows exponentially with depth
    — persist/cache alone does not help, because cache matching
    happens after the full plan is analyzed.  Checkpointing replaces
    the plan with the materialized RDD; loop state is tiny (ids only),
    so the materialization cost is negligible.

    Mode-aware like :func:`oteldb_spark.operators.pin.pin` (same env
    var): ``SPARK_GRAFT_PIN=<dir>`` uses a RELIABLE checkpoint — on a
    real cluster with dynamic allocation, a lost executor mid-traversal
    would kill a ``>>`` query under ``localCheckpoint`` because its
    blocks are not recomputable.  ``local``/``disk``/unset keep
    ``localCheckpoint`` (the local-mode default): ``pin``'s DISK_ONLY
    persist is not a substitute here because the loop requires plan
    truncation, which persist does not provide."""
    import os

    mode = os.environ.get("SPARK_GRAFT_PIN", "local")
    if mode in ("local", "disk"):
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        sc.setCheckpointDir(mode)
    return df.checkpoint(eager=True)


class StructuralDepthError(RuntimeError):
    """Raised when a structural traversal exceeds HARD_CAP rounds
    rather than silently returning a truncated result."""


def child_join(spans: DataFrame, parent_pred, child_pred) -> DataFrame:
    """Spans matching ``child_pred`` whose direct parent matches
    ``parent_pred`` (TraceQL ``{parent} > {child}``)."""
    p = spans.filter(parent_pred).select(
        F.col("trace_id").alias("p_trace_id"), F.col("span_id").alias("p_span_id")
    )
    c = spans.filter(child_pred)
    return c.join(
        p,
        (c.trace_id == p.p_trace_id) & (c.parent_span_id == p.p_span_id),
        "left_semi",
    )


def descendants(
    spans: DataFrame, ancestor_pred, descendant_pred, max_depth: int | None = None
) -> DataFrame:
    """Spans matching ``descendant_pred`` with ANY ancestor matching
    ``ancestor_pred`` (TraceQL ``{anc} >> {desc}``).

    Iterative frontier expansion to fixpoint: frontier holds the
    (trace_id, span_id) discovered last round; each round joins the
    frontier to its children and keeps only never-seen spans.  Rounds
    = tree depth, each a hash join on (trace_id, parent_span_id) —
    the loop is driver-side control flow only; data never leaves the
    cluster.  ``max_depth`` is accepted for backwards compatibility
    and ignored: traversal always runs until the frontier drains
    (raising :class:`StructuralDepthError` past ``HARD_CAP``).
    """
    edges = spans.select("trace_id", "span_id", "parent_span_id")
    frontier = spans.filter(ancestor_pred).select("trace_id", "span_id").distinct()
    covered = None
    for rounds in range(HARD_CAP + 1):
        if rounds == HARD_CAP:
            raise StructuralDepthError(
                f"descendants: frontier not drained after {HARD_CAP} rounds "
                "(cyclic or pathologically deep parent_span_id chain)"
            )
        children = (
            edges.alias("e")
            .join(
                frontier.alias("f"),
                (F.col("e.trace_id") == F.col("f.trace_id"))
                & (F.col("e.parent_span_id") == F.col("f.span_id")),
            )
            .select(F.col("e.trace_id").alias("trace_id"), F.col("e.span_id").alias("span_id"))
            .distinct()
        )
        if covered is None:
            new = children
        else:
            new = children.join(covered, ["trace_id", "span_id"], "left_anti")
        new = _materialize(new)
        if new.isEmpty():
            break
        covered = new if covered is None else covered.unionByName(new)
        frontier = new
    if covered is None:
        return spans.filter(descendant_pred).limit(0)
    return spans.filter(descendant_pred).join(
        covered, ["trace_id", "span_id"], "left_semi"
    )


def parent_join(spans: DataFrame, child_pred, parent_pred) -> DataFrame:
    """Spans matching ``parent_pred`` with a DIRECT child matching
    ``child_pred`` (TraceQL ``{child} < {parent}``; the reference
    parses ``<`` but does not evaluate it, spanset_op.go:89-102)."""
    c = spans.filter(child_pred).select(
        F.col("trace_id").alias("c_trace_id"),
        F.col("parent_span_id").alias("c_parent_id"),
    )
    p = spans.filter(parent_pred)
    return p.join(
        c,
        (p.trace_id == c.c_trace_id) & (p.span_id == c.c_parent_id),
        "left_semi",
    )


def ancestors_of(
    spans: DataFrame, descendant_pred, ancestor_pred, max_depth: int | None = None
) -> DataFrame:
    """Spans matching ``ancestor_pred`` with ANY descendant matching
    ``descendant_pred`` (TraceQL ``{desc} << {anc}``) — the upward
    mirror of ``descendants``: the frontier climbs parent pointers to
    fixpoint, each round one hash join on (trace_id, span_id).
    ``max_depth`` is accepted for backwards compatibility and ignored
    (see :func:`descendants`)."""
    edges = spans.select("trace_id", "span_id", "parent_span_id")
    frontier = (
        spans.filter(descendant_pred)
        .select("trace_id", F.col("parent_span_id").alias("span_id"))
        .distinct()
    )
    covered = frontier
    for rounds in range(HARD_CAP + 1):
        if rounds == HARD_CAP:
            raise StructuralDepthError(
                f"ancestors_of: frontier not drained after {HARD_CAP} rounds "
                "(cyclic or pathologically deep parent_span_id chain)"
            )
        parents = (
            edges.alias("e")
            .join(
                frontier.alias("f"),
                (F.col("e.trace_id") == F.col("f.trace_id"))
                & (F.col("e.span_id") == F.col("f.span_id")),
            )
            .select(
                F.col("e.trace_id").alias("trace_id"),
                F.col("e.parent_span_id").alias("span_id"),
            )
            .distinct()
        )
        new = _materialize(
            parents.join(covered, ["trace_id", "span_id"], "left_anti")
        )
        if new.isEmpty():
            break
        covered = covered.unionByName(new)
        frontier = new
    return spans.filter(ancestor_pred).join(
        covered, ["trace_id", "span_id"], "left_semi"
    )


def nested_sets(spans: DataFrame, max_depth: int | None = None) -> DataFrame:
    """Compute nested-set (left, right) numbers per span.

    Strategy: derive each span's root-path by iterative parent joins
    (depth-bounded), sort spans in DFS order per trace via the path,
    then: left = DFS row index ×2 spacing; right = max left of the
    subtree.  For query-time use, descendant(a, b) ⇔
    a.ns_left < b.ns_left ≤ a.ns_right.
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
