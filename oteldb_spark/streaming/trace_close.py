"""Streaming trace-close detection + nested-set coords emission.

The streaming counterpart of ingest-time coords
(``sources/bucketed.write_bucketed_spans(with_coords=True)``): spans
stream in unordered per trace; a trace CLOSES when no span arrives
within ``gap_ms`` of its latest span (event-time timeout against the
watermark — the same close rule a streaming span store uses to decide
a trace is assembled).  On close, the trace's nested-set coords are
computed from the accumulated parent pointers — the identical DFS
contract as ``operators.structural.trace_coords`` (Tempo enter/exit
numbering, 1..2n per trace, span_id-ordered roots/children,
parent-missing ⇒ root, cycle break at smallest id, ns_parent =
numbering parent's left or −1) — and emitted as one row per span.

State per trace is the edge list (span_id, parent_span_id encoded
−1-for-null) plus the latest event time: kilobytes per open trace.
On close the edge list is dropped and replaced by a tombstone
remembering the close boundary (``last_ms``) plus the span_ids ALREADY
EMITTED for this trace.  Spans arriving at a tombstone are classified
by EVENT time: ts ≤ last_ms + gap is a LATE arrival for the
already-emitted trace — DROPPED, never re-emitted; ts beyond the
closed window is a genuinely new burst and re-opens the trace as an
independent partial emission (split semantics — each burst's numbering
is internally consistent; the batch compaction path reconciles if a
store needs one tree).  The emitted set rides through the re-open, so
a re-opened burst NEVER re-emits a span_id the stream already emitted
— at-least-once re-deliveries arriving more than a gap late
participate in the new burst's numbering but their own rows are
suppressed, preserving downstream (trace_id, span_id) key uniqueness
(advisor r10).  State stays bounded: the emitted set is ≤ one long per
span of the trace and lives only while the tombstone lives.  The
tombstone itself expires one gap after the watermark passes it,
freeing the state slot (including the emitted memory); a span arriving
after expiry re-opens as a brand-new trace and CAN re-emit — that
residual duplicate window is the bounded-state tradeoff of any
streaming assembler, and the store sink closes it independently with a
run-scoped Bloom over appended trace ids
(``queries/stream_coords.merge_coords_batch``).  Pinned by
tests/test_stream_trace_close.py::test_late_span_after_close_dropped,
::test_short_gap_splits_trace and ::test_reopen_never_reemits.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Default quiet period that closes a trace: a real deployment assembles
# a trace after seconds-to-minutes of silence.  The synthetic testdata
# forest spreads one trace over months of event time, so its gates pass
# a fixture-tuned value at the call site (queries/stream_coords.py
# FIXTURE_GAP_MS) — the retention window is ALWAYS the caller's choice,
# never inherited silently from the fixture.
DEFAULT_GAP_MS = 30_000

OUTPUT_SCHEMA = (
    "trace_id long, span_id long, ns_left long, ns_right long, ns_parent long"
)
STATE_SCHEMA = (
    "sids array<long>, pids array<long>, last_ms long, emitted array<long>"
)


def _coords(sids: list, pids: list) -> list:
    """Nested-set numbering of one trace — same contract as
    trace_coords' per-trace DFS (Tempo enter/exit numbering);
    returns [(sid, left, right, parent)]."""
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
                # enter/exit numbering: right ticks the counter on exit
                counter += 1
                right[node] = counter
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


def _make_close_fn(gap_ms: int):
    def _trace_close_fn(key, pdf_iter, state: GroupState):
        (trace_id,) = key
        if state.hasTimedOut:
            sids, pids, last_ms, emitted = state.get
            if not list(sids):
                # the post-close tombstone went quiet for another gap:
                # free the state slot (and its emitted-id memory)
                state.remove()
                return
            rows = _coords(
                [int(s) for s in sids],
                [None if p is None or p < 0 else int(p) for p in pids],
            )
            # suppress span_ids this trace already emitted in an
            # earlier burst: a >gap-late re-delivery re-opened the
            # trace and joined the new numbering, but re-emitting it
            # would break the store's (trace_id, span_id) uniqueness
            emitted_set = set(int(e) for e in emitted)
            fresh_rows = [r for r in rows if r[0] not in emitted_set]
            emitted_set.update(r[0] for r in rows)
            # replace the edge list with a tombstone (empty edges +
            # emitted ids) so late spans inside the next gap window
            # are recognized as post-close and dropped instead of
            # re-opening the trace
            state.update(([], [], last_ms, sorted(emitted_set)))
            state.setTimeoutTimestamp(
                max(state.getCurrentWatermarkMs(), last_ms) + gap_ms
            )
            if fresh_rows:
                yield pd.DataFrame(
                    {
                        "trace_id": [trace_id] * len(fresh_rows),
                        "span_id": [r[0] for r in fresh_rows],
                        "ns_left": [r[1] for r in fresh_rows],
                        "ns_right": [r[2] for r in fresh_rows],
                        "ns_parent": [r[3] for r in fresh_rows],
                    }
                )
            return
        batch = pd.concat(list(pdf_iter))
        emitted = []
        if state.exists:
            sids, pids, last_ms, emitted = state.get
            sids, pids, emitted = list(sids), list(pids), list(emitted)
            if not sids:
                # tombstone: this trace already closed and emitted.
                # Classify arrivals by EVENT time against the closed
                # window: spans at or inside last_ms + gap are LATE
                # arrivals for the emitted trace — dropped, never
                # re-emitted; spans beyond it are a genuinely NEW
                # burst, which re-opens the trace as an independent
                # partial emission (documented split semantics) —
                # carrying the emitted set so the new burst's close
                # can suppress re-deliveries of already-emitted spans.
                fresh = batch[batch["ts_ms"] > last_ms + gap_ms]
                if fresh.empty:
                    # keep the tombstone alive one more gap past the
                    # watermark (the update must stay above it)
                    state.update(([], [], last_ms, emitted))
                    state.setTimeoutTimestamp(
                        state.getCurrentWatermarkMs() + gap_ms
                    )
                    return
                batch = fresh
                sids, pids, last_ms = [], [], None
        else:
            sids, pids, last_ms = [], [], None
        for s, p, t in zip(batch["span_id"], batch["parent_span_id"], batch["ts_ms"]):
            sids.append(int(s))
            pids.append(-1 if pd.isna(p) else int(p))
            t = int(t)
            last_ms = t if last_ms is None else max(last_ms, t)
        state.update((sids, pids, last_ms, emitted))
        state.setTimeoutTimestamp(last_ms + gap_ms)

    return _trace_close_fn


def stream_trace_coords(
    spans: DataFrame, gap_ms: int = DEFAULT_GAP_MS
) -> DataFrame:
    """spans stream (trace_id, span_id, parent_span_id, start_us µs) →
    per-span nested-set coords of CLOSED traces.

    ``gap_ms`` is the quiet period that closes a trace AND the
    post-close tombstone retention (state lives ≤ 2×gap_ms of event
    time per trace) — always set it to the deployment's assembly
    window; the testdata gates pass a fixture-tuned value."""
    with_ts = spans.withColumn(
        "ts_ms", F.expr("start_us div 1000")
    ).withColumn("event_time", F.timestamp_millis(F.col("ts_ms")))
    watermarked = with_ts.withWatermark("event_time", "1 hour")
    return watermarked.groupBy("trace_id").applyInPandasWithState(
        _make_close_fn(gap_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
