"""nested_sets encoding: descendant predicate must agree with the
iterative frontier join on a multi-level tree."""

from __future__ import annotations

from pyspark.sql import functions as F

from nested_sets_legacy import nested_sets

from oteldb_spark.operators.structural import ancestors_of, descendants


def _tree(spark):
    # trace 1: 1 -> 2 -> 3 -> 4 and 1 -> 5 (depth 4)
    rows = [
        (1, 1, None),
        (1, 2, 1),
        (1, 3, 2),
        (1, 4, 3),
        (1, 5, 1),
        # trace 2: flat
        (2, 1, None),
        (2, 2, 1),
    ]
    return spark.createDataFrame(
        rows, "trace_id long, span_id long, parent_span_id long"
    ).withColumn("tag", F.col("span_id"))


def test_nested_sets_descendant_equivalence(spark):
    spans = _tree(spark)
    ns = nested_sets(spans).collect()
    by_id = {(r.trace_id, r.span_id): (r.ns_left, r.ns_right) for r in ns}
    # root subtree covers everything in its trace
    l1, r1 = by_id[(1, 1)]
    for sid in (2, 3, 4, 5):
        ls, _ = by_id[(1, sid)]
        assert l1 < ls <= r1
    # span 5's subtree is only itself
    l5, r5 = by_id[(1, 5)]
    assert l5 == r5
    # cross-trace isolation: trace 2 numbering independent
    assert (2, 1) in by_id

    # frontier-join descendants of span 2 in trace 1 = {3, 4}
    desc = descendants(
        spans,
        (F.col("span_id") == 2) & (F.col("trace_id") == 1),
        F.lit(True),
    )
    got = {(r.trace_id, r.span_id) for r in desc.collect()}
    assert got == {(1, 3), (1, 4)}
    # nested-set predicate gives the same answer
    l2, r2 = by_id[(1, 2)]
    ns_desc = {
        (t, s)
        for (t, s), (l, r) in by_id.items()
        if t == 1 and l2 < l <= r2 and (t, s) != (1, 2)
    }
    assert ns_desc == got


def _deep_chain(spark, depth: int):
    # trace 1: a single chain 1 -> 2 -> ... -> depth
    rows = [(1, 1, None)] + [(1, i, i - 1) for i in range(2, depth + 1)]
    return spark.createDataFrame(
        rows, "trace_id long, span_id long, parent_span_id long"
    )


def test_descendants_deep_chain_no_truncation(spark):
    """A 12-level chain must fully resolve on BOTH routes: {root} >>
    {leaf} returns the leaf (the old depth-8 default silently dropped
    it), and the nested-set route must agree with the frontier loop."""
    depth = 12
    spans = _deep_chain(spark, depth)
    for route in ("frontier", "nested"):
        desc = descendants(
            spans, F.col("span_id") == 1, F.col("span_id") == depth, route=route
        )
        assert {r.span_id for r in desc.collect()} == {depth}, route
        # and the upward mirror: {leaf} << {root} returns the root
        anc = ancestors_of(
            spans, F.col("span_id") == depth, F.col("span_id") == 1, route=route
        )
        assert {r.span_id for r in anc.collect()} == {1}, route


def test_descendants_deep_chain_reliable_checkpoint(spark, tmp_path, monkeypatch):
    """SPARK_GRAFT_PIN=<dir> routes the traversal's per-round
    materialization through a RELIABLE checkpoint (recoverable after
    executor loss on a real cluster) — same 12-level chain must fully
    resolve, and checkpoint files must actually land in the dir."""
    ckpt = tmp_path / "ckpt"
    monkeypatch.setenv("SPARK_GRAFT_PIN", str(ckpt))
    sc = spark.sparkContext
    prev = sc.getCheckpointDir()
    try:
        depth = 12
        spans = _deep_chain(spark, depth)
        desc = descendants(
            spans, F.col("span_id") == 1, F.col("span_id") == depth,
            route="frontier",  # the route whose loop state checkpoints
        )
        assert {r.span_id for r in desc.collect()} == {depth}
        import os

        assert any(
            files for _, _, files in os.walk(str(ckpt))
        ), "no checkpoint files written under SPARK_GRAFT_PIN dir"
    finally:
        if prev is not None:
            sc.setCheckpointDir(prev)


def test_routes_agree_on_random_forest(spark):
    """Property parity: nested-set and frontier routes return the same
    span sets for >> and << over a random multi-trace forest with
    orphan parents (pointers to absent spans) mixed in."""
    import random

    rng = random.Random(7)
    rows = []
    for tid in range(1, 6):
        n = rng.randrange(5, 30)
        for sid in range(1, n + 1):
            if sid == 1 or rng.random() < 0.1:
                pid = None
            elif rng.random() < 0.1:
                pid = 9999  # orphan: parent id absent from the trace
            else:
                pid = rng.randrange(1, sid)
            rows.append((tid, sid, pid))
    spans = spark.createDataFrame(
        rows, "trace_id long, span_id long, parent_span_id long"
    )
    anc_pred = F.col("span_id") % 3 == 1
    desc_pred = F.col("span_id") % 2 == 0
    for fn, a, b in (
        (descendants, anc_pred, desc_pred),
        (ancestors_of, desc_pred, anc_pred),
    ):
        got = {
            route: {
                (r.trace_id, r.span_id)
                for r in fn(spans, a, b, route=route).collect()
            }
            for route in ("nested", "frontier")
        }
        assert got["nested"] == got["frontier"], fn.__name__


def test_nested_sets_deep_chain(spark):
    depth = 12
    spans = _deep_chain(spark, depth)
    ns = nested_sets(spans).collect()
    assert len(ns) == depth
    by_id = {r.span_id: (r.ns_left, r.ns_right) for r in ns}
    # root subtree must cover the leaf
    l1, r1 = by_id[1]
    ld, _ = by_id[depth]
    assert l1 < ld <= r1


def test_trace_coords_parent_values(spark):
    """with_parent=True emits ns_parent = parent's ns_left (−1 for
    roots), per-trace Tempo enter/exit numbering (1..2n; leaf ⇔
    right = left + 1) — the stored-intrinsics contract."""
    from oteldb_spark.operators.structural import trace_coords

    got = {
        (r.trace_id, r.span_id): (r.ns_left, r.ns_right, r.ns_parent)
        for r in trace_coords(_tree(spark), with_parent=True).collect()
    }
    # trace 1 DFS: enter 1,2,3,4; exit 4(5); exit 3(6); exit 2(7);
    # enter 5(8); exit 5(9); exit 1(10)
    assert got[(1, 1)] == (1, 10, -1)
    assert got[(1, 2)] == (2, 7, 1)
    assert got[(1, 3)] == (3, 6, 2)
    assert got[(1, 4)] == (4, 5, 3)
    assert got[(1, 5)] == (8, 9, 1)
    assert got[(2, 1)] == (1, 4, -1)
    assert got[(2, 2)] == (2, 3, 1)
    # leaf idiom under Tempo numbering
    for key in ((1, 4), (1, 5), (2, 2)):
        l, r, _ = got[key]
        assert r == l + 1


def test_stored_route_agrees_on_random_forest(spark):
    """descendants_stored over ingest-materialized coords returns the
    same span set as both query-time routes."""
    import random

    from oteldb_spark.operators.structural import (
        ancestors_stored,
        descendants_stored,
        trace_coords,
    )

    rng = random.Random(11)
    rows = []
    for tid in range(1, 6):
        n = rng.randrange(5, 30)
        for sid in range(1, n + 1):
            if sid == 1 or rng.random() < 0.1:
                pid = None
            else:
                pid = rng.randrange(1, sid)
            rows.append((tid, sid, pid))
    spans = spark.createDataFrame(
        rows, "trace_id long, span_id long, parent_span_id long"
    )
    stored = spans.join(
        trace_coords(spans, with_parent=True), ["trace_id", "span_id"]
    )
    anc_pred = F.col("span_id") % 3 == 1
    desc_pred = F.col("span_id") % 2 == 0
    want_desc = {
        (r.trace_id, r.span_id)
        for r in descendants(spans, anc_pred, desc_pred).collect()
    }
    got_desc = {
        (r.trace_id, r.span_id)
        for r in descendants_stored(stored, anc_pred, desc_pred).collect()
    }
    assert got_desc == want_desc
    want_anc = {
        (r.trace_id, r.span_id)
        for r in ancestors_of(spans, desc_pred, anc_pred).collect()
    }
    got_anc = {
        (r.trace_id, r.span_id)
        for r in ancestors_stored(stored, desc_pred, anc_pred).collect()
    }
    assert got_anc == want_anc


def test_routes_documented_cycle_semantics(spark):
    """Cyclic parent pointers (corrupt input only): the routes DIVERGE
    as documented in descendants() — the frontier loop walks the whole
    cycle (every member reachable from any member, including the start
    span itself), while the nested route breaks the cycle at its
    smallest span_id, so members 'before' the break are not
    descendants of members 'after' it.  This test PINS both behaviors
    so a change to either is a deliberate decision."""
    rows = [(1, 1, 3), (1, 2, 1), (1, 3, 2)]  # 1 -> 2 -> 3 -> 1
    spans = spark.createDataFrame(
        rows, "trace_id long, span_id long, parent_span_id long"
    )
    anc = F.col("span_id") == 2
    everything = F.lit(True)
    nested = {
        r.span_id
        for r in descendants(spans, anc, everything, route="nested").collect()
    }
    frontier = {
        r.span_id
        for r in descendants(
            spans, anc, everything, route="frontier"
        ).collect()
    }
    # nested: DFS from the break point 1 gives 1(1,3) 2(2,3) 3(3,3);
    # descendants of 2 = spans with 2 < left <= 3 = {3}
    assert nested == {3}
    # frontier: the cycle walk covers every member, including span 2
    assert frontier == {1, 2, 3}


def test_shared_store_versioned_rebuild(spark, tmp_path):
    """advisor r11 (medium): rebuilding the shared coords store must
    not delete the adopted files in place.  Each build lands in a
    versioned subdirectory; the sidecar meta pointer swaps atomically;
    the immediate predecessor's files SURVIVE the rebuild (a live
    session may be mid-query over them) and only older generations are
    pruned.  Also covers the mtime_ns fingerprint (advisor r11 low): a
    same-size rewrite must invalidate."""
    import json
    import os
    import time

    from oteldb_spark.operators.structural import (
        _COORDS_MEMO,
        _warehouse_local_path,
        stored_coords_spans,
    )

    src = str(tmp_path / "spans.parquet")
    rows = [(1, 1, None), (1, 2, 1), (1, 3, 2), (1, 4, 1)]

    def write_src():
        spark.createDataFrame(
            rows, "trace_id long, span_id long, parent_span_id long"
        ).coalesce(1).write.mode("overwrite").parquet(src)

    def build():
        spans = spark.read.parquet(src)
        out = stored_coords_spans(spans, "vrebuild-test")
        # memo hits would mask the rebuild path: clear between builds
        from oteldb_spark.operators.structural import _plan_identity

        _COORDS_MEMO.set(
            spark,
            ("coords_store", "vrebuild-test", _plan_identity(spans)),
            None,
        )
        return out

    write_src()
    wh = _warehouse_local_path(spark)
    assert wh is not None
    out1 = build()
    assert {"ns_left", "ns_right", "ns_parent"} <= set(out1.columns)
    metas = [
        f
        for f in os.listdir(wh)
        if f.startswith(".coords_store_vrebuild_test") and f.endswith(
            ".meta.json"
        )
    ]
    assert len(metas) == 1
    meta_path = os.path.join(wh, metas[0])
    with open(meta_path) as fh:
        v1 = json.load(fh)["version"]
    root = meta_path[len(os.path.join(wh, ".")):][: -len(".meta.json")]
    root = os.path.join(wh, root)
    assert os.path.isdir(os.path.join(root, v1))

    # same-size rewrite within (possibly) the same second: mtime_ns
    # must flip the fingerprint and force a rebuild
    time.sleep(0.01)
    write_src()
    out2 = build()
    with open(meta_path) as fh:
        v2 = json.load(fh)["version"]
    assert v2 != v1
    # predecessor survives the swap; new version is live
    assert os.path.isdir(os.path.join(root, v1))
    assert os.path.isdir(os.path.join(root, v2))
    assert out2.count() == 4

    # third build prunes the oldest generation, keeps v2 + v3
    time.sleep(0.01)
    write_src()
    build()
    with open(meta_path) as fh:
        v3 = json.load(fh)["version"]
    assert not os.path.isdir(os.path.join(root, v1))
    assert os.path.isdir(os.path.join(root, v2))
    assert os.path.isdir(os.path.join(root, v3))

    # unchanged source: a fresh (memo-cleared) call ADOPTS v3, no new
    # version
    out4 = build()
    with open(meta_path) as fh:
        assert json.load(fh)["version"] == v3
    assert out4.count() == 4

    # hygiene
    import shutil

    for t in spark.catalog.listTables():
        if t.name.startswith("coords_store_vrebuild_test"):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")
    shutil.rmtree(root, ignore_errors=True)
    os.unlink(meta_path)


def test_build_lock_steal_is_atomic(spark, tmp_path):
    """advisor r11 (medium): the stale-lock steal renames the lock
    aside before removing it, so a second stealer can never unlink the
    first stealer's fresh lock.  Simulate the exact interleaving: a
    dead-pid lock, one acquirer steals and creates; a racer whose
    rename loses must NOT end up holding the lock too."""
    import os

    from oteldb_spark.operators.structural import _acquire_build_lock

    wh_lock = None
    # a lock owned by a pid that cannot be alive (kernel pid_max
    # default 4M; use a pid from a freshly-spawned-and-exited child to
    # be robust)
    import subprocess

    child = subprocess.Popen(["true"])
    child.wait()
    dead_pid = child.pid
    from oteldb_spark.operators.structural import _warehouse_local_path

    wh = _warehouse_local_path(spark)
    lock = os.path.join(wh, ".locksteal_test.lock")
    with open(lock, "w") as fh:
        fh.write(str(dead_pid))
    got = _acquire_build_lock(spark, "locksteal_test")
    assert got == lock and os.path.exists(lock)
    with open(lock) as fh:
        assert int(fh.read()) == os.getpid()
    # second acquirer sees a LIVE owner (us): must refuse, not steal
    assert _acquire_build_lock(spark, "locksteal_test") is None
    with open(lock) as fh:
        assert int(fh.read()) == os.getpid()
    os.unlink(lock)
    assert wh_lock is None


def test_stored_coords_promotion(spark):
    """coords_key self-promotes the table into the bucketed coords
    store: the first structural query writes spans+coords once, later
    calls (any predicate, either direction) read the same table back
    and take the stored range-semi-join route — matching the per-query
    nested route value-for-value with zero query-time Python — and a
    DIFFERENT spans frame under the same key gets its own table
    (advisor r10: the memo key folds in the plan hash)."""
    from oteldb_spark.operators.structural import (
        _COORDS_MEMO,
        ancestors_of,
        descendants,
        stored_coords_spans,
    )

    rows = [
        (1, 1, None), (1, 2, 1), (1, 3, 2), (1, 4, 1),
        (2, 1, None), (2, 2, 1),
    ]
    spans = spark.createDataFrame(
        rows, "trace_id long, span_id long, parent_span_id long"
    )
    key = "memo-test"
    t1 = stored_coords_spans(spans, key)
    t2 = stored_coords_spans(spans, key)
    # same (key, plan): one table, written once
    assert t1.semanticHash() == t2.semanticHash()
    assert {"ns_left", "ns_right", "ns_parent"} <= set(t1.columns)
    anc = F.col("span_id") == 1
    deep = F.col("span_id") >= 3
    routed = descendants(spans, anc, deep, coords_key=key)
    got = {(r.trace_id, r.span_id) for r in routed.collect()}
    want = {
        (r.trace_id, r.span_id)
        for r in descendants(spans, anc, deep).collect()
    }
    assert got == want == {(1, 3), (1, 4)}
    # the routed result must not leak coords columns the input lacked
    assert set(routed.columns) == set(spans.columns)
    # the stored route has no query-time Python stage
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "InPandas" not in plan
    # << through the store agrees with the per-query route too
    got_a = {
        (r.trace_id, r.span_id)
        for r in ancestors_of(spans, deep, anc, coords_key=key).collect()
    }
    want_a = {
        (r.trace_id, r.span_id)
        for r in ancestors_of(spans, deep, anc).collect()
    }
    assert got_a == want_a == {(1, 1)}
    # advisor r10: same key, different spans content -> different
    # store, correct (not stale) answers
    spans_b = spark.createDataFrame(
        [(7, 1, None), (7, 2, 1), (7, 3, 2)],
        "trace_id long, span_id long, parent_span_id long",
    )
    got_b = {
        (r.trace_id, r.span_id)
        for r in descendants(spans_b, anc, deep, coords_key=key).collect()
    }
    assert got_b == {(7, 3)}
    # hygiene: drop the per-process tables this test created
    from oteldb_spark.operators.structural import _plan_identity

    for spans_df in (spans, spans_b):
        pid_key = _plan_identity(spans_df)
        _COORDS_MEMO.set(spark, ("coords_store", key, pid_key), None)
    import os

    for t in spark.catalog.listTables():
        if t.name.startswith("coords_store_memo_test_") and t.name.endswith(
            f"_p{os.getpid()}"
        ):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")
