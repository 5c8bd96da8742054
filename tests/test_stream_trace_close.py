"""Streaming trace-close coords: the stateful operator emits nested-set
coords exactly when a trace goes quiet past the gap, and the DFS helper
matches trace_coords' contract on forests and cycle remnants."""

from __future__ import annotations

from oteldb_spark.streaming.trace_close import GAP_MS, _coords, stream_trace_coords


def test_coords_helper_matches_contract():
    # forest: 1 -> {2 -> 4, 3}; orphan parent 9 makes 5 a root
    sids = [1, 2, 3, 4, 5]
    pids = [None, 1, 1, 2, 9]
    got = {s: (l, r, p) for s, l, r, p in _coords(sids, pids)}
    assert got == {
        1: (1, 4, -1),
        2: (2, 3, 1),
        4: (3, 3, 2),
        3: (4, 4, 1),
        5: (5, 5, -1),
    }
    # pure cycle 1 -> 2 -> 3 -> 1: break at smallest id
    got = {s: (l, r, p) for s, l, r, p in _coords([1, 2, 3], [3, 1, 2])}
    assert got == {1: (1, 3, -1), 2: (2, 3, 1), 3: (3, 3, 2)}


def test_stream_emits_only_closed_traces(spark, tmp_path):
    import pandas  # noqa: F401
    from pyspark.sql import functions as F

    base = 1_700_000_000_000_000  # µs
    rows = [
        # trace 1: old, quiet well past the gap -> closes
        (1, 1, None, base),
        (1, 2, 1, base + 1_000_000),
        (1, 3, 1, base + 2_000_000),
        # trace 2: its last span is RECENT (within gap of stream max)
        # -> stays open
        (2, 1, None, base),
        (2, 2, 1, base + (GAP_MS + 4 * 3_600_000) * 1000),
    ]
    df = spark.createDataFrame(
        rows,
        "trace_id long, span_id long, parent_span_id long, start_us long",
    )
    src, out, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    df.coalesce(2).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        stream_trace_coords(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.trace_id, r.span_id): (r.ns_left, r.ns_right, r.ns_parent)
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        (1, 1): (1, 3, -1),
        (1, 2): (2, 2, 1),
        (1, 3): (3, 3, 1),
    }


def test_three_coords_implementations_agree_on_random_forests(spark):
    """One contract, three independent implementations: the batch
    pandas DFS (operators.structural.trace_coords), the streaming
    close helper (trace_close._coords), and the fuzz referee's
    numbering (traceql_referee._nested_coords) must produce identical
    (left, right, parent) for random forests with orphan parents,
    self-loops, and cycle remnants mixed in."""
    import random

    from oteldb_spark.operators.structural import trace_coords
    from oteldb_spark.traceql_referee import TraceQLReferee

    rng = random.Random(29)
    rows = []
    for tid in range(1, 9):
        n = rng.randrange(3, 24)
        for sid in range(1, n + 1):
            roll = rng.random()
            if sid == 1 or roll < 0.12:
                pid = None
            elif roll < 0.2:
                pid = 999  # orphan parent
            elif roll < 0.24:
                pid = sid  # self-loop -> root
            elif roll < 0.3 and sid > 2:
                pid = sid + 1 if sid < n else sid - 1  # forward/cycle-ish
            else:
                pid = rng.randrange(1, sid)
            rows.append((tid, sid, pid))
    spans = spark.createDataFrame(
        rows, "trace_id long, span_id long, parent_span_id long"
    )
    batch = {
        (r.trace_id, r.span_id): (r.ns_left, r.ns_right, r.ns_parent)
        for r in trace_coords(spans, with_parent=True).collect()
    }
    # streaming helper, per trace
    from oteldb_spark.streaming.trace_close import _coords

    stream_res = {}
    by_tid: dict = {}
    for tid, sid, pid in rows:
        by_tid.setdefault(tid, ([], []))
        by_tid[tid][0].append(sid)
        by_tid[tid][1].append(pid)
    for tid, (sids, pids) in by_tid.items():
        for s, l, r, p in _coords(sids, pids):
            stream_res[(tid, s)] = (l, r, p)
    # fuzz referee
    referee = TraceQLReferee(
        [
            {"trace_id": t, "span_id": s, "parent_span_id": p}
            for t, s, p in rows
        ],
        {},
    )
    ref_res = {}
    for tid in by_tid:
        for sid, lrp in referee._nested_coords(tid).items():
            ref_res[(tid, sid)] = lrp
    assert batch == stream_res == ref_res
