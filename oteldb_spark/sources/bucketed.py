"""Bucketed table writers — the shuffle-free layout for trace joins.

The reference co-locates a trace's spans physically via the MergeTree
ORDER BY (trace_id, ...) so structural queries never redistribute
data.  The Spark-native equivalent is a bucketed table: bucketBy
(trace_id) hash-splits rows into a fixed bucket count at write time,
and any later equi-join whose keys contain trace_id reads both sides
already co-partitioned — the sort-merge join plans with ZERO Exchange
nodes (asserted in tests/test_bucketed.py).  At 100 TB this converts
every per-trace self-join (child/sibling/descendant, trace assembly)
from a full shuffle of the span table into a local per-bucket join.

Series stores bucket by series_hash for the same reason: step
aggregation and rate windows group on the series key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    n_buckets: int = 64,
) -> None:
    """Write ``df`` as a bucketed, sorted managed table (overwrite)."""
    w = df.write.bucketBy(n_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    w.mode("overwrite").format("parquet").saveAsTable(table)


def write_bucketed_spans(
    spans: DataFrame,
    table: str = "spans_bucketed",
    n_buckets: int = 64,
    with_coords: bool = False,
) -> None:
    """Span store bucketed by trace_id, sorted (trace_id, start_us) —
    the layout under every structural operator.

    ``with_coords=True`` additionally materializes the nested-set
    columns ``ns_left``/``ns_right``/``ns_parent`` (per-trace DFS
    numbering, ``operators.structural.trace_coords``) at WRITE time:
    the one Python stage in the ``>>``/``<<`` story is paid once per
    ingest batch instead of once per query, and structural queries
    over the stored table become a single zero-exchange range
    semi-join (``descendants_stored``).  The reference schema reserves
    these columns as intrinsics without computing them
    (``traceql/attribute.go:60-65``).  The coords join shuffles on
    trace_id — the same key the bucketed write shuffles on anyway, so
    the materialization adds no extra data-scale exchange."""
    if with_coords:
        from ..operators.structural import trace_coords

        coords = trace_coords(spans, with_parent=True)
        spans = spans.join(coords, ["trace_id", "span_id"])
    write_bucketed(
        spans, table, ["trace_id"], ["trace_id", "start_us"], n_buckets
    )


def write_bucketed_points(
    points: DataFrame,
    table: str = "points_bucketed",
    key: str = "series_hash",
    ts: str = "ts_us",
    n_buckets: int = 64,
) -> None:
    """Metric point store bucketed by the series key, time-sorted
    within buckets (rate windows scan one bucket run)."""
    write_bucketed(points, table, [key], [key, ts], n_buckets)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def sweep_stale_tables(spark: SparkSession, prefix: str) -> None:
    """Remove warehouse leftovers of DEAD processes that wrote
    pid-tagged tables: directories matching ``<prefix><pid>`` where pid
    is no longer alive.  Only touches a LOCAL-filesystem warehouse
    (file:/ scheme or no scheme) — on any other URI this is a no-op
    rather than a silent partial delete; live processes' tables are
    never touched."""
    import os
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir")
    path = None
    for pfx in ("file://", "file:"):
        if wh.startswith(pfx):
            path = wh[len(pfx):]
            break
    else:
        if "://" not in wh and not wh.startswith("file:"):
            path = wh  # bare local path, no scheme
    if path is None or not os.path.isdir(path):
        return
    base = os.path.basename(prefix)
    for entry in os.listdir(path):
        if not entry.startswith(base):
            continue
        pid_part = entry[len(base):]
        if not pid_part.isdigit():
            continue
        pid = int(pid_part)
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)
            continue  # owner still alive: leave its table alone
        except ProcessLookupError:
            pass
        except PermissionError:
            continue  # alive under another uid
        spark.sql(f"DROP TABLE IF EXISTS {entry}")
        shutil.rmtree(os.path.join(path, entry), ignore_errors=True)
