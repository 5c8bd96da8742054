"""Driver-gated STREAMING queries — run synchronously (availableNow
trigger over a staged file source) so the driver's DuckDB oracle can
value-match a Structured Streaming pipeline end-to-end, not just a
rows-only smoke check.
"""

from __future__ import annotations

import shutil
from contextlib import contextmanager

from pyspark.sql import functions as F

from ..operators.dedup import MINHASH_ORACLE_CTES
from ..tables import load
from ..scratch import scratch_dir
from .registry import register


@contextmanager
def _bounded_shuffle(spark, n: int = 8):
    """Pin shuffle partitions for the streaming run: the state-store
    partition count binds to spark.sql.shuffle.partitions at the first
    run of a checkpoint, and a 200-partition default session would
    spread a few thousand state rows over 200 stores per stateful op.

    Sized to the FIXTURE's state volume, not the cluster: every state
    store instance pays a fixed checkpoint/commit/maintenance cost per
    micro-batch (a stream-stream join keeps FOUR stores per
    partition), and at a few thousand state rows that fixed cost
    dominates — measured at sf0.1, the interval-join gate runs 14.7 s
    at n=32 vs 5.2 s at n=8 with identical output.  A production
    deployment sizes n to state volume per the usual rule (state
    partition ≈ executor-memory-sized), exactly like shuffle
    partitions for batch."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)



def _run_to_parquet(
    spark, out_stream, out_dir: str, ckpt: str, n_state: int = 8
) -> None:
    """``n_state``: state/shuffle partition count for this run — keep
    the 8 default where per-store fixed cost dominates; raise it for
    stateful ops whose per-group PYTHON work is the bottleneck (the
    trace-close DFS gates run 32: their cost is parallelism-bound)."""
    with _bounded_shuffle(spark, n_state):
        q = (
            out_stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


# Streaming MinHash-LSH near-dup candidates == the batch LSH pairs:
# the stream computes per-row signatures (bit-identical construction),
# routes through band-bucket state, and emits (earlier, later, agree)
# pairs; ordering matches doc_id because event times are doc_id-ordered.
@register(
    "stream_neardup_pairs",
    f"""WITH {MINHASH_ORACLE_CTES}
SELECT c.doc_a, c.doc_b,
       CAST(count(CASE WHEN sa.sig = sb.sig THEN 1 END) AS BIGINT) AS agree
FROM cand c
JOIN sigs sa ON sa.doc = c.doc_a
JOIN sigs sb ON sb.doc = c.doc_b AND sb.i = sa.i
GROUP BY c.doc_a, c.doc_b
HAVING count(CASE WHEN sa.sig = sb.sig THEN 1 END) >= 4""",
)
def stream_neardup_pairs(spark, sf_dir):
    from ..streaming.neardup import stream_near_dup_pairs

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        (1_700_000_000_000 + F.col("doc_id") * 1000).alias("ts_ms"),
    )
    work = scratch_dir(prefix="neardup_gate_")
    try:
        src = f"{work}/in"
        out_dir = f"{work}/out"
        ckpt = f"{work}/ckpt"
        # 8 source files: the per-row signature stage (shingle+md5+K
        # affine mins) runs in the file-scan stage of the stream — one
        # file pinned it to one core (measured 4.4 s single-threaded
        # vs 0.6 s across the session's cores).  Arrival-order
        # determinism is unaffected: availableNow delivers all files
        # in one batch and the stateful fn sorts each group by ts_ms.
        docs.repartition(8).write.parquet(src)
        stream = spark.readStream.schema(docs.schema).parquet(src)
        _run_to_parquet(
            spark, stream_near_dup_pairs(stream, threshold=4), out_dir, ckpt
        )
        pairs = (
            spark.read.parquet(out_dir)
            .select("doc_a", "doc_b", F.col("agree").cast("long").alias("agree"))
            .distinct()
        )
        # materialize before the temp dir disappears
        rows = pairs.collect()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, "doc_a long, doc_b long, agree long")


# Streaming tumbling-window rollup == the batch hourly aggregate over
# the finalized windows (append mode emits a window once the final
# watermark — max event time − 2h — passes its end).
@register(
    "stream_windowed_rollup",
    """WITH e AS (
  SELECT event_type, epoch_us(ts) AS ts_us, value FROM events
), mx AS (SELECT max(ts_us) AS m FROM e)
SELECT event_type,
       CAST(ws / 1000 AS BIGINT) AS window_start_ms,
       CAST(n AS BIGINT) AS n,
       CAST(total AS DOUBLE) AS total,
       vmin, vmax
FROM (
  SELECT event_type,
         (ts_us // 3600000000) * 3600000000 AS ws,
         count(*) AS n,
         sum(CAST(value AS DECIMAL(18,2))) AS total,
         min(value) AS vmin,
         max(value) AS vmax
  FROM e GROUP BY 1, 2
) JOIN mx ON ws + 3600000000 <= m - 7200000000""",
)
def stream_windowed_rollup(spark, sf_dir):
    from ..streaming.rollup import windowed_rollup

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("value"),
        F.timestamp_micros(F.expr("ts div 1000")).alias("event_time"),
    )
    work = scratch_dir(prefix="rollup_gate_")
    try:
        src = f"{work}/in"
        out_dir = f"{work}/out"
        ckpt = f"{work}/ckpt"
        ev.coalesce(2).write.parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        _run_to_parquet(
            spark,
            windowed_rollup(
                stream,
                keys=["event_type"],
                value_col="value",
                window="1 hour",
                watermark="2 hours",
            ),
            out_dir,
            ckpt,
        )
        out = spark.read.parquet(out_dir).select(
            "event_type",
            F.unix_millis(F.col("window_start")).alias("window_start_ms"),
            F.col("n").cast("long").alias("n"),
            F.col("total").cast("double").alias("total"),
            F.col("vmin").cast("double").alias("vmin"),
            F.col("vmax").cast("double").alias("vmax"),
        )
        rows = out.collect()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "event_type string, window_start_ms long, n long, total double,"
        " vmin double, vmax double",
    )


# Streaming sessionization == the batch gap-window derivation, closed
# sessions only.  A session closes two ways: a SUCCESSOR event of the
# same user arrives past the gap (emitted immediately, regardless of
# watermark — every non-final session), or the event-time timeout
# fires, which requires the final watermark (max event − 1h) to
# STRICTLY exceed last_event + gap (probed with an exactly-aligned
# fixture: equality does not fire).
@register(
    "stream_sessionize_closed",
    """WITH e AS (
  SELECT user_id, epoch_us(ts) // 1000 AS ts_ms, value FROM events
), w AS (
  SELECT *, CASE WHEN ts_ms - lag(ts_ms) OVER (
      PARTITION BY user_id ORDER BY ts_ms) > 1800000 THEN 1 ELSE 0 END AS brk
  FROM e
), s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts_ms
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM w
), g AS (
  SELECT user_id, sid,
         min(ts_ms) AS session_start_ms,
         max(ts_ms) AS session_end_ms,
         count(*) AS n_events,
         sum(CAST(value AS DECIMAL(18,2))) AS total
  FROM s GROUP BY 1, 2
), gm AS (SELECT user_id, max(sid) AS max_sid FROM g GROUP BY user_id),
mx AS (SELECT max(epoch_us(ts) // 1000) AS m FROM events)
SELECT g.user_id, session_start_ms, session_end_ms,
       CAST(n_events AS BIGINT) AS n_events,
       round(CAST(total AS DOUBLE), 6) AS total_value
FROM g JOIN gm ON g.user_id = gm.user_id CROSS JOIN mx
WHERE g.sid < gm.max_sid
   OR session_end_ms + 1800000 < m - 3600000""",
)
def stream_sessionize_closed(spark, sf_dir):
    from ..streaming.sessionize import stream_sessionize

    ev = load(spark, sf_dir, "events").select("ts", "user_id", "value")
    # size state partitions to VOLUME (the rule every other streaming
    # gate follows): per-store fixed cost argues for few partitions at
    # fixture scale, but past ~200k events the per-group Python work
    # dominates and 8 stores serialize it — the r10 scaling curve read
    # exponent 1.22 because n_state stayed 8 while the x4/x16 synthetic
    # axes quadrupled the state volume
    n_ev = ev.count()
    n_state = min(32, max(8, n_ev // 25_000))
    work = scratch_dir(prefix="sess_gate_")
    try:
        src = f"{work}/in"
        out_dir = f"{work}/out"
        ckpt = f"{work}/ckpt"
        ev.coalesce(max(2, n_state // 4)).write.parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        _run_to_parquet(
            spark, stream_sessionize(stream), out_dir, ckpt, n_state=n_state
        )
        out = spark.read.parquet(out_dir).select(
            "user_id",
            "session_start_ms",
            "session_end_ms",
            F.col("n_events").cast("long").alias("n_events"),
            F.round("total_value", 6).alias("total_value"),
        )
        rows = out.collect()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "user_id long, session_start_ms long, session_end_ms long,"
        " n_events long, total_value double",
    )


# Streaming windowed HLL register maintenance == the batch register
# build per finalized hourly window (same md5→rank math, max-merge is
# exact in incremental state; inclusive end <= watermark boundary as
# for the rollup gate).
def _hll_window_oracle() -> str:
    from ..operators.hll import M, _ALPHA, _HASH_BITS  # noqa: F401

    h = "CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT)"
    return f"""WITH e AS (
  SELECT event_type, user_id,
         (epoch_us(ts) // 3600000000) * 3600000000 AS ws,
         epoch_us(ts) AS ts_us
  FROM events
), mx AS (SELECT max(ts_us) AS m FROM e)
SELECT event_type,
       CAST(ws / 1000 AS BIGINT) AS window_start_ms,
       CAST({h} % {M} AS INT) AS bucket,
       CAST(max(CASE WHEN {h} // {M} = 0 THEN 53
                ELSE 53 - length(bin({h} // {M})) END) AS INT) AS rank
FROM e CROSS JOIN mx
WHERE ws + 3600000000 <= m - 7200000000
GROUP BY event_type, ws, {h} % {M}"""


@register("stream_hll_windowed", _hll_window_oracle())
def stream_hll_windowed(spark, sf_dir):
    from ..streaming.rollup import windowed_hll_registers

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.timestamp_micros(F.expr("ts div 1000")).alias("event_time"),
    )
    work = scratch_dir(prefix="hll_gate_")
    try:
        src = f"{work}/in"
        out_dir = f"{work}/out"
        ckpt = f"{work}/ckpt"
        ev.coalesce(2).write.parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        _run_to_parquet(
            spark,
            windowed_hll_registers(
                stream,
                key="user_id",
                by=["event_type"],
                window="1 hour",
                watermark="2 hours",
            ),
            out_dir,
            ckpt,
        )
        out = spark.read.parquet(out_dir).select(
            "event_type",
            F.unix_millis(F.col("window_start")).alias("window_start_ms"),
            F.col("bucket").cast("int").alias("bucket"),
            F.col("rank").cast("int").alias("rank"),
        )
        rows = out.collect()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "event_type string, window_start_ms long, bucket int, rank int",
    )


def _hdr_window_oracle() -> str:
    from ..operators.hdr_sketch import _bucket_sql

    _, _, bucket = _bucket_sql("v")
    return f"""WITH e AS (
  SELECT event_type,
         CAST(floor(value * 1000) AS BIGINT) AS v,
         (epoch_us(ts) // 3600000000) * 3600000000 AS ws,
         epoch_us(ts) AS ts_us
  FROM events
), mx AS (SELECT max(ts_us) AS m FROM e)
SELECT event_type,
       CAST(ws / 1000 AS BIGINT) AS window_start_ms,
       CAST({bucket} AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS cnt
FROM e CROSS JOIN mx
WHERE v > 0 AND ws + 3600000000 <= m - 7200000000
GROUP BY event_type, ws, {bucket}"""


# Streaming quantile-sketch maintenance: tumbling-window HDR bucket
# counts (the mergeable partial state of sketch_hdr_buckets) kept
# incrementally under a watermark — counts sum, so state merges are
# exact and the closed-window output replays the batch oracle.
@register("stream_hdr_windowed", _hdr_window_oracle())
def stream_hdr_windowed(spark, sf_dir):
    from ..streaming.rollup import windowed_hdr_buckets

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.timestamp_micros(F.expr("ts div 1000")).alias("event_time"),
    )
    work = scratch_dir(prefix="hdr_gate_")
    try:
        src = f"{work}/in"
        out_dir = f"{work}/out"
        ckpt = f"{work}/ckpt"
        ev.coalesce(2).write.parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        _run_to_parquet(
            spark,
            windowed_hdr_buckets(
                stream,
                value_sql="floor(value * 1000)",
                by=["event_type"],
                window="1 hour",
                watermark="2 hours",
            ),
            out_dir,
            ckpt,
        )
        out = spark.read.parquet(out_dir).select(
            "event_type",
            F.unix_millis(F.col("window_start")).alias("window_start_ms"),
            F.col("bucket").cast("long").alias("bucket"),
            F.col("cnt").cast("long").alias("cnt"),
        )
        rows = out.collect()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "event_type string, window_start_ms long, bucket long, cnt long",
    )


# Stream-stream event-time interval join: live trace assembly — root
# spans (orders) correlate with child spans (lineitems) of the same
# trace landing within 60 days of the root, both sides watermarked so
# join state is bounded by the event-time window, not the stream
# length.  Inner-join append emits each match exactly once; the batch
# oracle is the identical equi+range join.
@register(
    "stream_span_interval_join",
    """SELECT o_orderkey AS trace_id,
       CAST(l_linenumber AS BIGINT) AS line_no,
       epoch_us(o_orderdate) AS root_start_us,
       epoch_us(l_shipdate) AS child_start_us,
       epoch_us(l_shipdate) - epoch_us(o_orderdate) AS lag_us
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate
  AND l_shipdate <= o_orderdate + INTERVAL 60 DAY""",
)
def stream_span_interval_join(spark, sf_dir):
    roots = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("trace_id"),
        F.col("o_orderdate").cast("timestamp").alias("root_ts"),
    )
    children = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("c_trace_id"),
        F.col("l_linenumber").cast("long").alias("line_no"),
        F.col("l_shipdate").cast("timestamp").alias("child_ts"),
    )
    # volume-sized state partitions (same rule as the sessionize gate;
    # a stream-stream join keeps FOUR stores per partition, so the
    # per-store fixed cost argues harder for few partitions at fixture
    # scale — but past ~1M join-input rows the per-row state work
    # serializes on 8 stores and the x64 axis trends super-linear)
    n_rows = children.count()
    n_state = min(32, max(8, n_rows // 250_000))
    work = scratch_dir(prefix="ssj_gate_")
    try:
        rdir, cdir = f"{work}/roots", f"{work}/children"
        out_dir, ckpt = f"{work}/out", f"{work}/ckpt"
        roots.coalesce(max(2, n_state // 4)).write.parquet(rdir)
        children.coalesce(max(2, n_state // 4)).write.parquet(cdir)
        rs = (
            spark.readStream.schema(roots.schema)
            .parquet(rdir)
            .withWatermark("root_ts", "30 days")
        )
        cs = (
            spark.readStream.schema(children.schema)
            .parquet(cdir)
            .withWatermark("child_ts", "30 days")
        )
        joined = rs.join(
            cs,
            F.expr(
                "trace_id = c_trace_id"
                " AND child_ts >= root_ts"
                " AND child_ts <= root_ts + interval 60 days"
            ),
        ).select(
            "trace_id",
            "line_no",
            F.unix_micros("root_ts").alias("root_start_us"),
            F.unix_micros("child_ts").alias("child_start_us"),
            (F.unix_micros("child_ts") - F.unix_micros("root_ts")).alias(
                "lag_us"
            ),
        )
        _run_to_parquet(spark, joined, out_dir, ckpt, n_state=n_state)
        rows = spark.read.parquet(out_dir).collect()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "trace_id long, line_no long, root_start_us long,"
        " child_start_us long, lag_us long",
    )
