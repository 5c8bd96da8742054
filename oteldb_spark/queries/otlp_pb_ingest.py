"""OTLP protobuf wire-ingest gates.

Fixture Export*ServiceRequest payloads are built deterministically
from the events table (bounded collect, ≤400 rows), encoded with the
test-only protobuf encoders, and decoded by the REAL ingest path
(``sources/otlp_pb.py`` — executor-side wire walk → OTLP/JSON →
the shared ``from_json`` flatteners).  The DuckDB oracle recreates the
expected rows straight from the events table, so each gate round-trips
encode → wire decode → flatten against SQL-visible ground truth.

Reference: ``internal/otelreceiver/receiver.go:47-90`` (OTLP protobuf
is the reference's primary ingest), consumers
``logstorage/consumer.go``, ``tracestorage/consumer.go``,
``chstorage/inserter_metrics.go``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..memo import SessionMemo
from ..sources import otlp_pb as pb
from ..tables import load
from .registry import register

_LIMIT = 400
_SPANS_PER_TRACE = 8


_ROWS_MEMO = SessionMemo()


def _rows(spark, sf_dir):
    # All five pb-ingest gates build their wire payloads from this
    # same 400-row slice; the scan that feeds it decodes the wide
    # `props` column of a one-split parquet file serially (~2-3 s at
    # sf0.1), so collect once per (session, sf) — the result is a
    # tiny driver-side list.  Weak session key (SessionMemo): an
    # ``id(spark)`` key can collide when a stopped session's address
    # is reused by a new one.
    hit = _ROWS_MEMO.get(spark, sf_dir)
    if hit is None:
        hit = _rows_duckdb(sf_dir)
        if hit is None:
            rows = (
                load(spark, sf_dir, "events")
                .filter(F.col("event_id") < _LIMIT)
                .select(
                    "event_id", "ts", "user_id", "event_type", "value", "props"
                )
                .collect()
            )
            hit = sorted(rows, key=lambda r: r.event_id)
        _ROWS_MEMO.set(spark, sf_dir, hit)
    return hit


def _rows_duckdb(sf_dir):
    """Driver-side read of the 400-row fixture slice.

    The Spark path spends two one-task stages (~0.8 s warm, the top
    PARALLELISM_r10 entry) decompressing the one-split events file to
    collect 400 rows the ENCODER needs on the driver anyway; a local
    DuckDB scan of the same parquet gets them in ~30 ms with zero
    cluster work.  ``epoch_ns(ts)`` matches ``tables.load``'s ns-long
    contract whether the file ships ts as timestamp[ns] or
    timestamp[us].  Returns None (→ Spark fallback) if duckdb is
    unavailable."""
    try:
        import duckdb
    except Exception:
        return None
    from collections import namedtuple

    Row = namedtuple(
        "FixtureRow", "event_id ts user_id event_type value props"
    )
    con = duckdb.connect()
    try:
        path = f"{sf_dir}/events.parquet"
        (ts_type,) = con.execute(
            f"SELECT typeof(ts) FROM read_parquet('{path}') LIMIT 1"
        ).fetchone()
        ts_expr = "ts" if "INT" in ts_type.upper() else "epoch_ns(ts)"
        got = con.execute(
            f"SELECT event_id, {ts_expr} AS ts, user_id, event_type,"
            " value, props"
            f" FROM read_parquet('{path}')"
            f" WHERE event_id < {_LIMIT} ORDER BY event_id"
        ).fetchall()
    except Exception:
        return None
    finally:
        con.close()
    return [Row(*r) for r in got]


def _by_type(rows):
    out: dict[str, list] = {}
    for r in rows:
        out.setdefault(r.event_type, []).append(r)
    return out


def _payload_df(spark, payloads):
    # Arrow-built local frame: one JVM-backed partition per payload,
    # no Python-pickle scan stage and no repartition Exchange (r12's
    # repartition(min(n, 8)) shape paid BOTH: the pickled-list scan
    # spun a Python worker per slice before the decode mapInPandas
    # ever ran).  Real deployments feed the decoder from a stream/file
    # source with data-sized partitions.
    from ..sources.payloads import payload_frame

    return payload_frame(spark, payloads)


# --- logs --------------------------------------------------------------------


def _logs_payloads(spark, sf_dir) -> list[bytes]:
    payloads = []
    for etype, rs in sorted(_by_type(_rows(spark, sf_dir)).items()):
        recs = [
            pb.enc_log_record(
                time_ns=r.ts,  # events.ts arrives as ns long (tables.load)
                severity_number=17 if etype == "error" else 9,
                severity_text="ERROR" if etype == "error" else "INFO",
                body=r.props,
                attrs={"user": str(r.user_id)},
                trace_id=int(r.event_id).to_bytes(16, "big"),
                span_id=int(r.event_id).to_bytes(8, "big"),
            )
            for r in rs
        ]
        payloads.append(
            pb.enc_logs_request(
                {"service.name": f"svc-{etype}", "service.namespace": "prod"},
                recs,
            )
        )
    return payloads


_LOGS_ORACLE = f"""SELECT
  epoch_ns(ts) AS timestamp_ns,
  CASE WHEN event_type = 'error' THEN 'ERROR' ELSE 'INFO' END AS severity_text,
  CAST(CASE WHEN event_type = 'error' THEN 17 ELSE 9 END AS BIGINT)
    AS severity_number,
  printf('%032x', event_id) AS trace_id,
  printf('%016x', event_id) AS span_id,
  props AS body,
  CAST(user_id AS VARCHAR) AS user,
  'svc-' || event_type AS service_name,
  'prod' AS service_namespace
FROM events WHERE event_id < {_LIMIT}"""


@register("otlp_pb_ingest_logs", _LOGS_ORACLE)
def otlp_pb_ingest_logs(spark, sf_dir):
    flat = pb.pb_logs(_payload_df(spark, _logs_payloads(spark, sf_dir)))
    return flat.select(
        "timestamp_ns",
        "severity_text",
        "severity_number",
        "trace_id",
        "span_id",
        "body",
        F.col("attrs")["user"].alias("user"),
        "service_name",
        "service_namespace",
    )


# --- metric points -----------------------------------------------------------


def _points_payloads(spark, sf_dir) -> list[bytes]:
    payloads = []
    for etype, rs in sorted(_by_type(_rows(spark, sf_dir)).items()):
        total_pts = [
            pb.enc_number_point(
                time_ns=r.ts, value=r.value, attrs={"user": str(r.user_id)}
            )
            for r in rs
        ]
        gauge_pts = [
            pb.enc_number_point(
                time_ns=r.ts, value=int(r.event_id), as_int=True
            )
            for r in rs
        ]
        payloads.append(
            pb.enc_metrics_request(
                {"service.name": f"svc-{etype}"},
                [
                    pb.enc_sum_metric("app_events_value_total", "1", total_pts),
                    pb.enc_gauge_metric("app_queue_depth", "", gauge_pts),
                ],
            )
        )
    return payloads


_POINTS_ORACLE = f"""WITH e AS (
  SELECT *, 'svc-' || event_type AS service FROM events
  WHERE event_id < {_LIMIT}
)
SELECT 'app_events_value_total' AS name, '1' AS unit, TRUE AS is_monotonic,
       service, epoch_ns(ts) AS ts_ns, value
FROM e
UNION ALL
SELECT 'app_queue_depth' AS name, '' AS unit, FALSE AS is_monotonic,
       service, epoch_ns(ts) AS ts_ns, CAST(event_id AS DOUBLE) AS value
FROM e"""


@register("otlp_pb_ingest_points", _POINTS_ORACLE)
def otlp_pb_ingest_points(spark, sf_dir):
    flat = pb.pb_metrics(_payload_df(spark, _points_payloads(spark, sf_dir)))
    return flat.filter(F.col("mapping") == "").select(
        "name",
        "unit",
        "is_monotonic",
        F.col("resource_attrs")["service.name"].alias("service"),
        "ts_ns",
        "value",
    )


# --- exemplars ---------------------------------------------------------------


def _exemplar_payloads(spark, sf_dir) -> list[bytes]:
    payloads = []
    for etype, rs in sorted(_by_type(_rows(spark, sf_dir)).items()):
        pts = [
            pb.enc_number_point(
                time_ns=r.ts,
                value=r.value,
                exemplars=[
                    pb.enc_exemplar(
                        time_ns=r.ts,
                        value=r.value,
                        trace_id=int(r.event_id).to_bytes(16, "big"),
                        span_id=int(r.event_id).to_bytes(8, "big"),
                        attrs={"user": str(r.user_id)},
                    )
                ],
            )
            for r in rs
        ]
        payloads.append(
            pb.enc_metrics_request(
                {"service.name": f"svc-{etype}"},
                [pb.enc_sum_metric("app_events_value_total", "1", pts)],
            )
        )
    return payloads


_EXEMPLAR_ORACLE = f"""SELECT
  'app_events_value_total' AS name,
  'svc-' || event_type AS service,
  epoch_ns(ts) AS ts_ns, value,
  printf('%032x', event_id) AS trace_id,
  printf('%016x', event_id) AS span_id,
  CAST(user_id AS VARCHAR) AS user
FROM events WHERE event_id < {_LIMIT}"""


@register("otlp_pb_ingest_exemplars", _EXEMPLAR_ORACLE)
def otlp_pb_ingest_exemplars(spark, sf_dir):
    flat = pb.pb_exemplars(_payload_df(spark, _exemplar_payloads(spark, sf_dir)))
    return flat.select(
        "name",
        F.col("resource_attrs")["service.name"].alias("service"),
        "ts_ns",
        "value",
        "trace_id",
        "span_id",
        F.col("filtered_attrs")["user"].alias("user"),
    )


# --- spans -------------------------------------------------------------------


def _span_payloads(spark, sf_dir) -> list[bytes]:
    rows = _rows(spark, sf_dir)
    by_trace: dict[int, list] = {}
    for r in rows:
        by_trace.setdefault(int(r.event_id) // _SPANS_PER_TRACE, []).append(r)
    payloads = []
    for tid, rs in sorted(by_trace.items()):
        spans = []
        for r in rs:
            eid = int(r.event_id)
            is_root = eid % _SPANS_PER_TRACE == 0
            spans.append(
                pb.enc_span(
                    trace_id=tid.to_bytes(16, "big"),
                    span_id=eid.to_bytes(8, "big"),
                    parent_span_id=(
                        b""
                        if is_root
                        else (tid * _SPANS_PER_TRACE).to_bytes(8, "big")
                    ),
                    name=r.event_type,
                    kind=2 if is_root else 3,
                    start_ns=r.ts,
                    end_ns=r.ts + int(round(r.value * 1e6)),
                    attrs={"user": str(r.user_id)},
                    status_code=2 if r.event_type == "error" else 0,
                )
            )
        payloads.append(pb.enc_traces_request({"service.name": "svc-traces"}, spans))
    return payloads


_SPANS_ORACLE = f"""SELECT
  printf('%032x', event_id // {_SPANS_PER_TRACE}) AS trace_id,
  printf('%016x', event_id) AS span_id,
  CASE WHEN event_id % {_SPANS_PER_TRACE} = 0 THEN NULL
       ELSE printf('%016x', (event_id // {_SPANS_PER_TRACE}) * {_SPANS_PER_TRACE})
  END AS parent_span_id,
  event_type AS name,
  CAST(CASE WHEN event_id % {_SPANS_PER_TRACE} = 0 THEN 2 ELSE 3 END AS BIGINT)
    AS kind,
  epoch_ns(ts) AS start_ns,
  epoch_ns(ts) + CAST(round(value * 1000000) AS BIGINT) AS end_ns,
  CAST(round(value * 1000000) AS BIGINT) AS duration_ns,
  CAST(CASE WHEN event_type = 'error' THEN 2 ELSE 0 END AS BIGINT)
    AS status_code,
  CAST(user_id AS VARCHAR) AS user,
  'svc-traces' AS service_name
FROM events WHERE event_id < {_LIMIT}"""


@register("otlp_pb_ingest_spans", _SPANS_ORACLE)
def otlp_pb_ingest_spans(spark, sf_dir):
    flat = pb.pb_spans(_payload_df(spark, _span_payloads(spark, sf_dir)))
    return flat.select(
        "trace_id",
        "span_id",
        "parent_span_id",
        "name",
        "kind",
        "start_ns",
        "end_ns",
        "duration_ns",
        "status_code",
        F.col("attrs")["user"].alias("user"),
        "service_name",
    )


# --- histogram explosion through the wire path -------------------------------

_T0_NS = 1_704_067_200_000_000_000
_BOUNDS = [10.0, 100.0]


def _hist_payloads(spark, sf_dir) -> list[bytes]:
    metrics = []
    for etype, rs in sorted(_by_type(_rows(spark, sf_dir)).items()):
        counts = [
            sum(1 for r in rs if r.value <= 10.0),
            sum(1 for r in rs if 10.0 < r.value <= 100.0),
            sum(1 for r in rs if r.value > 100.0),
        ]
        # integer-cents sum: identical in Python and SQL regardless of
        # float accumulation order
        sum_ = sum(int(round(r.value * 100)) for r in rs) / 100.0
        metrics.append(
            pb.enc_histogram_metric(
                "app_value_dist",
                "1",
                [
                    pb.enc_histogram_point(
                        time_ns=_T0_NS,
                        bucket_counts=counts,
                        explicit_bounds=_BOUNDS,
                        sum_=sum_,
                        attrs={"etype": etype},
                    )
                ],
            )
        )
    return [pb.enc_metrics_request({"service.name": "svc-hist"}, metrics)]


_HIST_ORACLE = f"""WITH e AS (
  SELECT event_type AS etype, value FROM events WHERE event_id < {_LIMIT}
), agg AS (
  SELECT etype,
    CAST(count(*) FILTER (value <= 10.0) AS DOUBLE) AS c1,
    CAST(count(*) FILTER (value <= 100.0) AS DOUBLE) AS c2,
    CAST(count(*) AS DOUBLE) AS n,
    sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS s
  FROM e GROUP BY etype
)
SELECT 'app_value_dist_bucket' AS name, etype, '10' AS le, c1 AS value,
       'histogram_bucket' AS mapping FROM agg
UNION ALL
SELECT 'app_value_dist_bucket', etype, '100', c2, 'histogram_bucket' FROM agg
UNION ALL
SELECT 'app_value_dist_bucket', etype, '+Inf', n, 'histogram_bucket' FROM agg
UNION ALL
SELECT 'app_value_dist_count', etype, NULL, n, 'histogram_count' FROM agg
UNION ALL
SELECT 'app_value_dist_sum', etype, NULL, s, 'histogram_sum' FROM agg"""


@register("otlp_pb_ingest_hist", _HIST_ORACLE)
def otlp_pb_ingest_hist(spark, sf_dir):
    flat = pb.pb_metrics(_payload_df(spark, _hist_payloads(spark, sf_dir)))
    return flat.filter(F.col("mapping").startswith("histogram")).select(
        "name",
        F.col("labels")["etype"].alias("etype"),
        F.col("labels")["le"].alias("le"),
        "value",
        "mapping",
    )
