"""Streaming trace-close detection + nested-set coords emission.

The streaming counterpart of ingest-time coords
(``sources/bucketed.write_bucketed_spans(with_coords=True)``): spans
stream in unordered per trace; a trace CLOSES when no span arrives
within ``GAP_MS`` of its latest span (event-time timeout against the
watermark — the same close rule a streaming span store uses to decide
a trace is assembled).  On close, the trace's nested-set coords are
computed from the accumulated parent pointers — the identical DFS
contract as ``operators.structural.trace_coords`` (1-based per-trace
preorder, span_id-ordered roots/children, parent-missing ⇒ root,
cycle break at smallest id, ns_parent = numbering parent's left or
−1) — and emitted as one row per span.

State per trace is the edge list (span_id, parent_span_id encoded
−1-for-null) plus the latest event time: kilobytes per open trace,
dropped at close.  Late spans for an already-closed trace are dropped
(the batch compaction path re-derives coords if a store ever needs to
reopen a trace).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# quiet period that closes a trace.  The synthetic span forest spreads
# a trace over <= ~4 months of event time (children ship within 121
# days of the root order date), so 150 days never splits a trace.
GAP_MS = 150 * 86_400_000

OUTPUT_SCHEMA = (
    "trace_id long, span_id long, ns_left long, ns_right long, ns_parent long"
)
STATE_SCHEMA = "sids array<long>, pids array<long>, last_ms long"


def _coords(sids: list, pids: list) -> list:
    """Nested-set numbering of one trace — same contract as
    trace_coords' per-trace DFS; returns [(sid, left, right, parent)]."""
    idset = set()
    kids: dict = {}
    parent_known: dict = {}
    order = sorted(range(len(sids)), key=lambda i: sids[i])
    seen: set = set()
    roots = []
    for i in order:
        s = sids[i]
        if s in seen:
            continue
        seen.add(s)
        idset.add(s)
    for i in order:
        s, p = sids[i], pids[i]
        if s in parent_known:
            continue
        parent_known[s] = True
        if p is None or p == s or p not in idset:
            roots.append(s)
        else:
            kids.setdefault(p, []).append(s)
    left: dict = {}
    right: dict = {}
    par: dict = {}
    visited: set = set()
    counter = 0

    def walk(starts):
        nonlocal counter
        stack = [(r, False, None) for r in reversed(starts)]
        while stack:
            node, done, pr = stack.pop()
            if done:
                right[node] = max(
                    [left[node]]
                    + [right[c] for c in kids.get(node, ()) if c in right]
                )
                continue
            if node in visited:
                continue
            visited.add(node)
            counter += 1
            left[node] = counter
            par[node] = pr
            stack.append((node, True, pr))
            for c in reversed(kids.get(node, ())):
                if c not in visited:
                    stack.append((c, False, node))

    walk(roots)
    remaining = sorted(s for s in seen if s not in visited)
    while remaining:
        walk([remaining[0]])
        remaining = sorted(s for s in seen if s not in visited)
    return [
        (s, left[s], right[s], -1 if par[s] is None else left[par[s]])
        for s in sorted(seen)
    ]


def _trace_close_fn(key, pdf_iter, state: GroupState):
    (trace_id,) = key
    if state.hasTimedOut:
        sids, pids, _last = state.get
        state.remove()
        rows = _coords(
            [int(s) for s in sids],
            [None if p is None or p < 0 else int(p) for p in pids],
        )
        yield pd.DataFrame(
            {
                "trace_id": [trace_id] * len(rows),
                "span_id": [r[0] for r in rows],
                "ns_left": [r[1] for r in rows],
                "ns_right": [r[2] for r in rows],
                "ns_parent": [r[3] for r in rows],
            }
        )
        return
    batch = pd.concat(list(pdf_iter))
    if state.exists:
        sids, pids, last_ms = state.get
        sids, pids = list(sids), list(pids)
    else:
        sids, pids, last_ms = [], [], None
    for s, p, t in zip(batch["span_id"], batch["parent_span_id"], batch["ts_ms"]):
        sids.append(int(s))
        pids.append(-1 if pd.isna(p) else int(p))
        t = int(t)
        last_ms = t if last_ms is None else max(last_ms, t)
    state.update((sids, pids, last_ms))
    state.setTimeoutTimestamp(last_ms + GAP_MS)


def stream_trace_coords(spans: DataFrame) -> DataFrame:
    """spans stream (trace_id, span_id, parent_span_id, start_us µs) →
    per-span nested-set coords of CLOSED traces."""
    with_ts = spans.withColumn(
        "ts_ms", F.expr("start_us div 1000")
    ).withColumn("event_time", F.timestamp_millis(F.col("ts_ms")))
    watermarked = with_ts.withWatermark("event_time", "1 hour")
    return watermarked.groupBy("trace_id").applyInPandasWithState(
        _trace_close_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
