"""Ingest→store→query round-trip: the decode path, the partitioned
store layout and the query path certified as ONE loop.

``prw_ingest_points`` certifies the wire decode against SQL ground
truth and ``bench_ingest.measure_prw_e2e`` times the full insert
path; this gate closes the remaining gap — a VALUE-level check that
what the ingest loop WRITES is what the query path then READS.  PRW
WriteRequests (deterministic fixture from the events table, same
construction as prw_ingest) are decoded by the real ingest path
(``sources/prw.py::prw_points``, executor-side mapInPandas), appended
to a date-partitioned parquet metric store (the layout
``streaming/ingest.py`` writes in production), and the gate's answer
is computed FROM THE STORE with the metric-name filter pushed to the
parquet scan.  The DuckDB oracle recreates the expected aggregate
straight from the events table, so a bug anywhere in
decode → flatten → partitioned write → scan → aggregate surfaces as a
value mismatch.

Reference composition: ``prometheusremotewritereceiver/receiver.go:113``
(ServeHTTP → DecodeRequest) feeding ``inserter_metrics.go`` and read
back by the ``chstorage`` points querier.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..memo import SessionMemo
from ..sources import prw
from .prw_ingest import _POINTS_ORACLE_BODY, _payload_df
from .registry import register

_STORE_MEMO = SessionMemo()


def _points_store(spark, sf_dir) -> str:
    """Decode the fixture payloads once per (session, sf_dir) and
    materialize the date-partitioned store table; stale tables from
    dead sessions are swept by pid-suffix liveness like the other
    materialized stores."""
    table = _STORE_MEMO.get(spark, sf_dir)
    if table is not None:
        return table
    from .structural_stored import _sweep_stale_tables

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    table = f"prw_points_store_{tag}_p{os.getpid()}"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    _sweep_stale_tables(spark, f"prw_points_store_{tag}_p")
    pts = prw.prw_points(_payload_df(spark, sf_dir))
    flat = pts.select(
        "name",
        "mtype",
        "unit",
        F.col("labels")["service"].alias("service"),
        "ts_ms",
        "value",
        F.to_date(F.timestamp_millis(F.col("ts_ms"))).alias("date"),
    )
    (
        flat.write.mode("overwrite")
        .partitionBy("date")
        .format("parquet")
        .saveAsTable(table)
    )
    _STORE_MEMO.set(spark, sf_dir, table)
    return table


@register(
    "prw_store_roundtrip",
    f"""WITH pts AS ({_POINTS_ORACLE_BODY})
SELECT service, CAST(ts_ms // 3600000 AS BIGINT) AS hour_bucket,
       CAST(count(*) AS BIGINT) AS n_points,
       round(sum(value), 6) AS value_sum
FROM pts
WHERE name = 'app_latency_seconds'
GROUP BY service, hour_bucket""",
)
def prw_store_roundtrip(spark, sf_dir):
    table = _points_store(spark, sf_dir)
    pts = spark.table(table).filter(F.col("name") == "app_latency_seconds")
    return pts.groupBy(
        "service",
        F.floor(F.col("ts_ms") / 3_600_000).cast("long").alias("hour_bucket"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.round(F.sum("value"), 6).alias("value_sum"),
    )
