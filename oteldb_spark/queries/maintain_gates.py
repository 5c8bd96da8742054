"""Driver-gated maintenance ops: backup/restore round-trip, TTL
retention sweep, compaction invariance.

The reference gets these from its storage engine (``chstorage/
backup.go`` table dump/restore; the 3-day TTL in docs/architecture.md:
13; MergeTree background merges).  Here each gate materializes a
scratch parquet copy of an sf table under a temp dir, runs the real
maintenance op against it, and returns content the DuckDB oracle
recomputes from the ORIGINAL table — content equality across the
round-trip / sweep / rewrite IS the correctness statement.  Boolean
invariants the oracle cannot observe (manifest row match, file-count
reduction, within-file sortedness, partitions-swept count) are
computed Spark-side and asserted as constant-true columns in the
oracle.

Scratch hygiene: every gate deletes its temp dir in a ``finally``
after materializing the result — the distributed work (write, sweep,
compaction rewrite, sortedness scan) runs on the cluster; only the
final gate-sized result (≤ the 4000-row backup subset) is collected
so the directory can be removed before returning.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from ..sources.backup import backup_table, restore_table
from ..sources.maintain import compact_table
from ..streaming.ingest import retention_sweep
from ..tables import load
from .registry import register

# bounded, content-bearing events subset shared by all three gates
_LIMIT = 4000


def _subset(spark, sf_dir):
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") < _LIMIT)
        .select("event_id", "event_type", F.col("value").cast("double").alias("value"))
    )


@register(
    "maintain_backup_restore",
    f"""SELECT event_id, event_type, CAST(value AS DOUBLE) AS value,
       TRUE AS manifest_ok
FROM events WHERE event_id < {_LIMIT}""",
)
def maintain_backup_restore(spark, sf_dir):
    """Snapshot → restore → read back: restored content must equal the
    source selection byte-for-byte (the oracle reads the source), and
    the restore-time manifest verification must agree on row count."""
    base = tempfile.mkdtemp(prefix="oteldb_bak_")
    try:
        tdir, bdir, rdir = (os.path.join(base, d) for d in ("t", "b", "r"))
        _subset(spark, sf_dir).write.parquet(tdir)
        manifest = backup_table(spark, tdir, bdir)
        restored = restore_table(spark, bdir, rdir)
        ok = manifest["rows"] == restored["rows"]
        rows = (
            spark.read.parquet(rdir)
            .select("event_id", "event_type", "value")
            .collect()
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        rows, "event_id bigint, event_type string, value double"
    ).withColumn("manifest_ok", F.lit(bool(ok)))


@register(
    "maintain_retention_sweep",
    f"""WITH e AS (
  SELECT event_id,
         CAST('2026-01-01' AS DATE)
           + CAST(event_id % 10 AS INTEGER) AS d
  FROM events WHERE event_id < {_LIMIT})
SELECT CAST(d AS VARCHAR) AS date,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(event_id) AS BIGINT) AS id_sum,
       TRUE AS swept_ok
FROM e WHERE d >= CAST('2026-01-06' AS DATE)
GROUP BY 1""",
)
def maintain_retention_sweep(spark, sf_dir):
    """TTL job over a date-partitioned table: partitions older than the
    keep window are deleted on disk; the surviving per-date aggregate
    must equal the oracle's date-filtered aggregate over the source.
    Dates derive deterministically from event_id (10 synthetic days);
    keep_days=5 at now=2026-01-11 ⇒ cutoff 2026-01-06 drops days 0-4.
    The partitions-swept count is surfaced as the oracle-checked
    ``swept_ok`` column (a bare assert would vanish under python -O)."""
    base = tempfile.mkdtemp(prefix="oteldb_ttl_")
    try:
        tdir = os.path.join(base, "t")
        (
            _subset(spark, sf_dir)
            .withColumn(
                "date",
                F.date_add(F.lit("2026-01-01").cast("date"), (F.col("event_id") % 10).cast("int")),
            )
            .write.partitionBy("date")
            .parquet(tdir)
        )
        dropped = retention_sweep(tdir, keep_days=5, now_date="2026-01-11")
        rows = (
            spark.read.parquet(tdir)
            .groupBy(F.col("date").cast("string").alias("date"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("event_id").cast("long").alias("id_sum"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        rows, "date string, n bigint, id_sum bigint"
    ).withColumn("swept_ok", F.lit(len(dropped) == 5))


@register(
    "maintain_compaction",
    f"""SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(event_id) AS BIGINT) AS id_sum,
       CAST(min(event_id) AS BIGINT) AS id_min,
       CAST(max(event_id) AS BIGINT) AS id_max,
       TRUE AS files_reduced, TRUE AS sorted_within_files
FROM events WHERE event_id < {_LIMIT}""",
)
def maintain_compaction(spark, sf_dir):
    """OPTIMIZE invariance: a 64-small-file table rewritten by
    ``compact_table`` must (a) keep exactly the same rows — the content
    aggregate equals the oracle's over the source, (b) reduce the file
    count, (c) leave every output file sorted by the query key.

    The sortedness check is distributed AND split-safe: the scan tags
    each row with ``_metadata.file_path`` and ``_metadata.
    file_block_start``, so a file larger than the split size arrives as
    several (file, offset) fragments; mapInPandas emits one
    (first, last, internally_sorted) triple per FRAGMENT (a fragment is
    always wholly inside one input partition), and the output-scale
    boundary comparison — fragment[k].last <= fragment[k+1].first in
    byte-offset order — runs as a window over the tiny per-fragment
    frame, so disorder straddling a split boundary is caught."""
    base = tempfile.mkdtemp(prefix="oteldb_cmp_")
    try:
        tdir = os.path.join(base, "t")
        _subset(spark, sf_dir).repartition(64).write.parquet(tdir)
        report = compact_table(spark, tdir, sort_cols=["event_id"], target_file_mb=128)
        reduced = all(
            v["files_after"] <= v["files_before"] for v in report.values()
        ) and any(v["files_after"] < v["files_before"] for v in report.values())

        compacted = spark.read.parquet(tdir)

        def fragment_stats(batches):
            import pandas as pd

            first: dict = {}
            last: dict = {}
            internal_ok: dict = {}
            for b in batches:
                for key, g in b.groupby(["__file", "__off"], sort=False):
                    vals = g["event_id"].tolist()
                    if not vals:
                        continue
                    ok = all(x <= y for x, y in zip(vals, vals[1:]))
                    if key in last:  # fragment spanning Arrow batches
                        ok = ok and vals[0] >= last[key]
                        internal_ok[key] = internal_ok[key] and ok
                    else:
                        first[key] = vals[0]
                        internal_ok[key] = ok
                    last[key] = vals[-1]
            yield pd.DataFrame(
                {
                    "__file": [k[0] for k in first],
                    "__off": [k[1] for k in first],
                    "first": [first[k] for k in first],
                    "last": [last[k] for k in first],
                    "internal_ok": [internal_ok[k] for k in first],
                }
            )

        from pyspark.sql import Window as W

        frags = (
            compacted.select(
                "event_id",
                F.col("_metadata.file_path").alias("__file"),
                F.col("_metadata.file_block_start").alias("__off"),
            )
            .mapInPandas(
                fragment_stats,
                "__file string, __off long, first long, last long, internal_ok boolean",
            )
        )
        w = W.partitionBy("__file").orderBy("__off")
        prev_last = F.lag("last").over(w)
        sorted_ok = (
            frags.withColumn(
                "ok",
                F.col("internal_ok")
                & (prev_last.isNull() | (prev_last <= F.col("first"))),
            )
            .agg(F.min("ok").alias("ok"))
            .first()["ok"]
        )
        agg = compacted.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("event_id").cast("long").alias("id_sum"),
            F.min("event_id").cast("long").alias("id_min"),
            F.max("event_id").cast("long").alias("id_max"),
        ).collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return (
        spark.createDataFrame(
            agg, "n bigint, id_sum bigint, id_min bigint, id_max bigint"
        )
        .withColumn("files_reduced", F.lit(bool(reduced)))
        .withColumn("sorted_within_files", F.lit(bool(sorted_ok)))
    )
