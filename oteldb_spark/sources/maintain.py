"""Storage maintenance — the background-merge analog.

The reference's ClickHouse backend gets compaction for free from
MergeTree background merges (SURVEY §1.2: parts are merged until the
ORDER-BY key is globally sorted per partition).  A parquet/Delta lake
on object storage instead accumulates the small files every
micro-batch append creates (`streaming/ingest.py`), and pays for
them on every scan: one file = at least one task + one footer read,
so a partition with 10k tiny files costs 10k round-trips before the
first row.  ``compact_table`` is the OPTIMIZE pass a real deployment
schedules: rewrite each date partition into size-targeted files,
rows sorted by the query key (so min/max column stats become
selective — the data-skipping analog of the MergeTree primary key).

Plan shape at 100 TB: one repartition per partition-directory sized
by bytes/target, sort WITHIN files only (`sortWithinPartitions` — a
local sort, no global shuffle-and-merge), and an atomic
swap-by-rename at the end.  Nothing passes through the driver.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _data_files(path: str) -> list[str]:
    return [
        os.path.join(root, f)
        for root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    ]


def compact_table(
    spark: SparkSession,
    table_dir: str,
    sort_cols: list[str],
    target_file_mb: int = 128,
) -> dict:
    """Rewrite every partition dir of ``table_dir`` into size-targeted,
    key-sorted parquet files; atomic per-partition swap.

    Returns {partition: {"files_before": n, "files_after": m}}.
    Directories already at one file per ``target_file_mb`` are left
    untouched (idempotent, like a merge that has nothing to do).
    """
    report: dict[str, dict] = {}
    parts = [
        d
        for d in sorted(os.listdir(table_dir))
        if os.path.isdir(os.path.join(table_dir, d)) and "=" in d
    ] or [""]  # unpartitioned table → compact the root
    for part in parts:
        pdir = os.path.join(table_dir, part) if part else table_dir
        before = _data_files(pdir)
        n_out = max(1, -(-_dir_bytes(pdir) // (target_file_mb << 20)))
        if len(before) <= n_out:
            report[part or "."] = {
                "files_before": len(before),
                "files_after": len(before),
            }
            continue
        df: DataFrame = spark.read.parquet(pdir)
        tmp = os.path.join(table_dir, f"_compact-{uuid.uuid4().hex[:8]}")
        (
            df.repartition(n_out)
            .sortWithinPartitions(*sort_cols)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        # swap: writes land in tmp, then two renames replace the
        # partition dir.  NOT atomic — single-writer maintenance with
        # no concurrent readers is assumed (a reader between the two
        # renames sees the partition missing; a crash between them
        # leaves it stranded in the .old dir).  A production deployment
        # gets atomicity from a table format with a manifest commit
        # (Delta/Iceberg) rather than directory renames; this filesystem
        # path is the parquet-only fallback.
        if part:
            old = pdir + f".old-{uuid.uuid4().hex[:8]}"
            os.rename(pdir, old)
            os.rename(tmp, pdir)
            shutil.rmtree(old)
        else:
            # unpartitioned root: move files in place of the old set
            for f in before:
                os.remove(f)
            for f in _data_files(tmp):
                shutil.move(f, os.path.join(table_dir, os.path.basename(f)))
            shutil.rmtree(tmp)
        report[part or "."] = {
            "files_before": len(before),
            "files_after": len(_data_files(pdir)),
        }
    return report
