"""sources/payloads.payload_frame — the Arrow-built local payload
frame that replaced the pickled-list + repartition feed (r13).

Contract: byte-exact round trip, one partition per payload (bounded by
cores), a pure-JVM scan (no Python-RDD stage, no Exchange), and the
batch-size conf restored afterwards.
"""

from __future__ import annotations

from oteldb_spark.sources.payloads import payload_frame


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_round_trip_bytes(spark):
    pls = [bytes([i]) * (3 + 5 * i) for i in range(6)]
    got = sorted(bytes(r.payload) for r in payload_frame(spark, pls).collect())
    assert got == sorted(pls)


def test_one_partition_per_payload(spark):
    # session fixture runs on 8 cores; below that, parts == payloads
    assert payload_frame(spark, [b"a", b"b", b"c"]).rdd.getNumPartitions() == 3
    assert payload_frame(spark, [b"x"]).rdd.getNumPartitions() == 1


def test_plan_is_jvm_local_scan(spark):
    plan = _formatted_plan(payload_frame(spark, [b"a", b"b"]))
    assert "LocalTableScan" in plan
    # the old shape: pickled Python RDD scan + repartition Exchange
    assert "ExistingRDD" not in plan
    assert "Exchange" not in plan


def test_empty_payload_list(spark):
    assert payload_frame(spark, []).count() == 0


def test_batch_conf_restored(spark):
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    before = spark.conf.get(key)
    payload_frame(spark, [b"a", b"b"])
    assert spark.conf.get(key) == before


def test_arrow_path_not_fallback(spark):
    # forbid the silent pickle fallback while building: if the Arrow
    # conversion ever regresses (schema/type drift), this surfaces it
    key = "spark.sql.execution.arrow.pyspark.fallback.enabled"
    before = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        assert payload_frame(spark, [b"\x00\xff" * 10]).count() == 1
    finally:
        spark.conf.set(key, before)
