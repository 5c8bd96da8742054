"""Backup / restore — table snapshot with manifest.

Mirrors ``chstorage/backup.go`` (table dump + restore).  Parquet-level
implementation: snapshot copies the table directory plus a manifest
(row count, schema, partition list); restore verifies the manifest
after copying back.  On Delta Lake this collapses to time travel /
``CLONE`` — documented as the production path.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import SparkSession


def backup_table(spark: SparkSession, table_dir: str, backup_dir: str) -> dict:
    df = spark.read.parquet(table_dir)
    manifest = {
        "rows": df.count(),
        "schema": df.schema.jsonValue(),
        "partitions": sorted(
            e for e in os.listdir(table_dir) if e.startswith("date=")
        ),
    }
    os.makedirs(os.path.dirname(backup_dir) or ".", exist_ok=True)
    shutil.copytree(table_dir, backup_dir, dirs_exist_ok=True)
    with open(os.path.join(backup_dir, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def restore_table(spark: SparkSession, backup_dir: str, table_dir: str) -> dict:
    with open(os.path.join(backup_dir, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    if os.path.exists(table_dir):
        shutil.rmtree(table_dir)
    shutil.copytree(backup_dir, table_dir)
    os.remove(os.path.join(table_dir, "_MANIFEST.json"))
    got = spark.read.parquet(table_dir).count()
    if got != manifest["rows"]:
        raise RuntimeError(
            f"restore verification failed: {got} rows != {manifest['rows']}"
        )
    return manifest
