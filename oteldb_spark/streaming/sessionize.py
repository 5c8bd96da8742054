"""Stateful streaming sessionization — ``applyInPandasWithState``.

The streaming counterpart of queries/sessions.py: events stream in per
user; a session closes when no event arrives within the gap (event-time
timeout against the watermark).  Emits one row per closed session.

This is the custom-stateful-operator pattern the build brief calls
for: state is a small per-key dict (session start / last ts / count /
value sum), batches arrive as pandas DataFrames, and the timeout path
flushes sessions whose gap expired.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GAP_MS = 30 * 60 * 1000

OUTPUT_SCHEMA = (
    "user_id long, session_start_ms long, session_end_ms long,"
    " n_events long, total_value double"
)
STATE_SCHEMA = "start_ms long, last_ms long, n long, total double"


def _sessionize_fn(key, pdf_iter, state: GroupState):
    (user_id,) = key
    if state.hasTimedOut:
        start_ms, last_ms, n, total = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start_ms": [start_ms],
                "session_end_ms": [last_ms],
                "n_events": [n],
                "total_value": [total],
            }
        )
        return

    rows = pd.concat(list(pdf_iter)).sort_values("ts_ms")
    closed = []
    if state.exists:
        start_ms, last_ms, n, total = state.get
    else:
        start_ms, last_ms, n, total = None, None, 0, 0.0
    for t, v in zip(rows["ts_ms"], rows["value"]):
        t = int(t)
        if last_ms is not None and t - last_ms > GAP_MS:
            closed.append((start_ms, last_ms, n, total))
            start_ms, n, total = t, 0, 0.0
        if start_ms is None:
            start_ms = t
        last_ms = t
        n += 1
        total += float(v)
    state.update((start_ms, last_ms, n, total))
    state.setTimeoutTimestamp(last_ms + GAP_MS)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start_ms": [c[0] for c in closed],
                "session_end_ms": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
                "total_value": [c[3] for c in closed],
            }
        )


def stream_sessionize(events: DataFrame) -> DataFrame:
    """events stream (ts timestamp-like ns long, user_id, value) →
    closed-session stream."""
    with_ts = events.withColumn(
        "ts_ms", F.expr("ts div 1000000")
    ).withColumn("event_time", F.timestamp_millis(F.col("ts_ms")))
    watermarked = with_ts.withWatermark("event_time", "1 hour")
    return watermarked.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
