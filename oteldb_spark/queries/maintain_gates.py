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
reduction, within-file sortedness) are computed Spark-side and
asserted as constant-true columns in the oracle.
"""

from __future__ import annotations

import os
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
    tdir, bdir, rdir = (os.path.join(base, d) for d in ("t", "b", "r"))
    _subset(spark, sf_dir).write.parquet(tdir)
    manifest = backup_table(spark, tdir, bdir)
    restored = restore_table(spark, bdir, rdir)
    ok = manifest["rows"] == restored["rows"]
    return spark.read.parquet(rdir).select(
        "event_id", "event_type", "value", F.lit(ok).alias("manifest_ok")
    )


@register(
    "maintain_retention_sweep",
    f"""WITH e AS (
  SELECT event_id,
         CAST('2026-01-01' AS DATE)
           + CAST(event_id % 10 AS INTEGER) AS d
  FROM events WHERE event_id < {_LIMIT})
SELECT CAST(d AS VARCHAR) AS date,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(event_id) AS BIGINT) AS id_sum
FROM e WHERE d >= CAST('2026-01-06' AS DATE)
GROUP BY 1""",
)
def maintain_retention_sweep(spark, sf_dir):
    """TTL job over a date-partitioned table: partitions older than the
    keep window are deleted on disk; the surviving per-date aggregate
    must equal the oracle's date-filtered aggregate over the source.
    Dates derive deterministically from event_id (10 synthetic days);
    keep_days=5 at now=2026-01-11 ⇒ cutoff 2026-01-06 drops days 0-4."""
    base = tempfile.mkdtemp(prefix="oteldb_ttl_")
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
    assert len(dropped) == 5, dropped  # days 01..05 swept
    return (
        spark.read.parquet(tdir)
        .groupBy(F.col("date").cast("string").alias("date"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("event_id").cast("long").alias("id_sum"),
        )
    )


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
    count, (c) leave every output file sorted by the query key.  The
    sortedness check is distributed (mapInPandas tracking per-file
    monotonicity across Arrow batches), not a driver-side collect."""
    base = tempfile.mkdtemp(prefix="oteldb_cmp_")
    tdir = os.path.join(base, "t")
    _subset(spark, sf_dir).repartition(64).write.parquet(tdir)
    report = compact_table(spark, tdir, sort_cols=["event_id"], target_file_mb=128)
    reduced = all(
        v["files_after"] <= v["files_before"] for v in report.values()
    ) and any(v["files_after"] < v["files_before"] for v in report.values())

    compacted = spark.read.parquet(tdir)

    def monotone_per_file(batches):
        import pandas as pd

        last: dict = {}
        ok = True
        for b in batches:
            for fname, g in b.groupby("__file", sort=False):
                vals = g["event_id"].tolist()
                if any(y < x for x, y in zip(vals, vals[1:])):
                    ok = False
                if vals:
                    if fname in last and vals[0] < last[fname]:
                        ok = False
                    last[fname] = vals[-1]
        yield pd.DataFrame({"ok": [ok]})

    sorted_ok = (
        compacted.select("event_id", F.input_file_name().alias("__file"))
        .mapInPandas(monotone_per_file, "ok boolean")
        .agg(F.min("ok").alias("ok"))
        .first()["ok"]
    )
    return compacted.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("event_id").cast("long").alias("id_sum"),
        F.min("event_id").cast("long").alias("id_min"),
        F.max("event_id").cast("long").alias("id_max"),
        F.lit(bool(reduced)).alias("files_reduced"),
        F.lit(bool(sorted_ok)).alias("sorted_within_files"),
    )
