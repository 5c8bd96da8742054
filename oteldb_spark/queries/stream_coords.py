"""Streaming trace-close coords gate: the Structured-Streaming
counterpart of the ingest-time nested-set materialization.

Spans stream in per trace; the stateful operator
(``streaming/trace_close.py``) closes a trace when no span arrives
within the gap (event-time timeout against the watermark) and emits
the trace's nested-set coords.  The oracle mirrors BOTH halves in
SQL: the close rule (latest span + gap strictly before the final
watermark = max event ms − 1h delay, the same arithmetic as the
sessionize gate) and the coordinate values (the synthetic forest is
two-level, so the DFS restates as window functions — root left=1
right=n parent=−1, k-th child by span_id left=right=k+1 parent=1).
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from ..scratch import scratch_dir
from ..signals import SPANS_CTE, spans_frame
from ..streaming.trace_close import GAP_MS, stream_trace_coords
from .registry import register

_TID_CAP = 4000  # bounded per-trace state groups for the gate


@register(
    "stream_trace_coords_closed",
    f"""WITH {SPANS_CTE},
sp AS (
  SELECT trace_id, span_id, parent_span_id, start_us
  FROM spans WHERE trace_id < {_TID_CAP}
),
lastt AS (
  SELECT trace_id, max(start_us // 1000) AS last_ms FROM sp GROUP BY 1
),
mx AS (SELECT max(start_us // 1000) AS m FROM sp),
closed AS (
  SELECT trace_id FROM lastt CROSS JOIN mx
  WHERE last_ms + {GAP_MS} < m - 3600000
),
n AS (SELECT trace_id, CAST(count(*) AS BIGINT) AS n_spans
      FROM sp GROUP BY trace_id)
SELECT s.trace_id, s.span_id,
       CASE WHEN s.parent_span_id IS NULL THEN CAST(1 AS BIGINT)
            ELSE 1 + row_number() OVER (
              PARTITION BY s.trace_id, (s.parent_span_id IS NULL)
              ORDER BY s.span_id) END AS ns_left,
       CASE WHEN s.parent_span_id IS NULL THEN n.n_spans
            ELSE 1 + row_number() OVER (
              PARTITION BY s.trace_id, (s.parent_span_id IS NULL)
              ORDER BY s.span_id) END AS ns_right,
       CASE WHEN s.parent_span_id IS NULL THEN CAST(-1 AS BIGINT)
            ELSE CAST(1 AS BIGINT) END AS ns_parent
FROM sp s JOIN closed USING (trace_id) JOIN n USING (trace_id)""",
)
def stream_trace_coords_closed(spark, sf_dir):
    from .streaming_gates import _run_to_parquet

    spans = (
        spans_frame(spark, sf_dir)
        .filter(F.col("trace_id") < _TID_CAP)
        .select("trace_id", "span_id", "parent_span_id", "start_us")
    )
    work = scratch_dir(prefix="tcoord_gate_")
    try:
        src, out_dir, ckpt = f"{work}/in", f"{work}/out", f"{work}/ckpt"
        spans.coalesce(2).write.parquet(src)
        stream = spark.readStream.schema(spans.schema).parquet(src)
        _run_to_parquet(spark, stream_trace_coords(stream), out_dir, ckpt)
        rows = spark.read.parquet(out_dir).collect()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "trace_id long, span_id long, ns_left long, ns_right long,"
        " ns_parent long",
    )
