"""Materialize the observability store — SURVEY §7 milestone 0 made
concrete: build the logs / spans / metric_points / metric_series
tables from the testdata signals with the reference's physical layout
(date partitions + sort-within-partition keys), then demonstrate a
partition-pruned query on each.

Usage: python tools/materialize_store.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from oteldb_spark.session import get_spark  # noqa: E402
from oteldb_spark.signals import (  # noqa: E402
    counter_points_frame,
    logs_frame,
    spans_frame,
)
from oteldb_spark.sources.otlp import series_key  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.store"
    shutil.rmtree(out, ignore_errors=True)
    spark = get_spark("materialize-store")

    # logs: PARTITION BY date, sorted by (severity, service, ts) —
    # mirrors the MergeTree ORDER BY (chstorage/columns_logs.go)
    logs = logs_frame(spark, sf_dir).withColumn(
        "date", F.to_date(F.timestamp_micros(F.col("ts_us")))
    )
    (
        logs.repartition("date")
        .sortWithinPartitions("severity_number", "service", "ts_us")
        .write.partitionBy("date")
        .parquet(f"{out}/logs")
    )

    # spans: partitioned by start date, sorted by (service, start)
    spans = spans_frame(spark, sf_dir).withColumn(
        "date", F.to_date(F.timestamp_micros(F.col("start_us")))
    )
    (
        spans.repartition("date")
        .sortWithinPartitions("service", "start_us")
        .write.partitionBy("date")
        .parquet(f"{out}/spans")
    )

    # metric points + series registry (hash keyed)
    pts = counter_points_frame(spark, sf_dir)
    labels = F.map_from_arrays(
        F.array(F.lit("mtype"), F.lit("instance")),
        F.array(F.col("mtype"), F.col("instance")),
    )
    keyed = pts.withColumn(
        "series_hash", series_key(F.lit("events_value_total"), labels)
    ).withColumn("date", F.to_date(F.timestamp_micros(F.col("ts_us"))))
    (
        keyed.select("series_hash", "ts_us", "counter_mod", "gauge", "date")
        .repartition("date")
        .sortWithinPartitions("series_hash", "ts_us")
        .write.partitionBy("date")
        .parquet(f"{out}/metric_points")
    )
    (
        keyed.groupBy("series_hash", "mtype", "instance")
        .agg(
            F.min("ts_us").alias("first_seen_us"),
            F.max("ts_us").alias("last_seen_us"),
            F.count(F.lit(1)).alias("n_points"),
        )
        .write.mode("overwrite")
        .parquet(f"{out}/metric_series")
    )

    # bucketed variants: trace-co-located spans and series-co-located
    # points — structural joins / rate windows plan without Exchange
    # (see sources/bucketed.py and tests/test_bucketed.py)
    from oteldb_spark.operators.structural import child_join
    from oteldb_spark.plans.audit import audit
    from oteldb_spark.sources.bucketed import (
        write_bucketed_points,
        write_bucketed_spans,
    )

    write_bucketed_spans(
        spans.drop("date"), "store_spans_bucketed", with_coords=True
    )
    write_bucketed_points(keyed.drop("date"), "store_points_bucketed")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    j = child_join(
        spark.table("store_spans_bucketed"),
        F.col("status_code") == 2,
        F.col("duration_us") > 0,
    )
    print(
        f"bucketed spans: child-join exchanges={audit(j).n_exchanges}"
        f" rows={j.count()}"
    )
    # >> from the INGEST-TIME coords: zero Python, zero exchange
    from oteldb_spark.operators.structural import descendants_stored

    d = descendants_stored(
        spark.table("store_spans_bucketed"),
        F.col("status_code") == 2,
        F.col("duration_us") > 0,
    )
    facts = audit(d)
    assert "InPandas" not in facts.text
    print(
        f"bucketed spans: stored->> exchanges={facts.n_exchanges}"
        f" rows={d.count()}"
    )
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    # demonstrate partition-pruned reads
    for table, pred, cols in [
        ("logs", "date = '2024-01-15' AND severity_number >= 17", "count(*)"),
        ("spans", "date = '1996-06-01'", "count(*)"),
        ("metric_points", "date = '2024-01-15'", "count(*)"),
    ]:
        t0 = time.time()
        df = spark.read.parquet(f"{out}/{table}").where(pred)
        n = df.count()
        print(f"{table:14s} [{pred}] -> {n} rows in {time.time()-t0:.2f}s")
    reg = spark.read.parquet(f"{out}/metric_series")
    print(f"metric_series  -> {reg.count()} series")


if __name__ == "__main__":
    main()
