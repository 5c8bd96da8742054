"""Backup/restore, salted aggregation, error labels, prebucketed
range aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oteldb_spark.logql import EvalParams, LogSource, compile_logql
from oteldb_spark.operators.range_agg import (
    range_aggregate,
    range_aggregate_prebucketed,
)
from oteldb_spark.operators.skew import salted_agg
from oteldb_spark.sources.backup import backup_table, restore_table

US = 1_000_000


def test_backup_restore_roundtrip(spark, tmp_path):
    table, bak, restored = (
        str(tmp_path / "t"),
        str(tmp_path / "bak"),
        str(tmp_path / "t"),
    )
    df = spark.range(100).withColumn("date", F.lit("2024-01-01"))
    df.write.partitionBy("date").parquet(table)
    manifest = backup_table(spark, table, bak)
    assert manifest["rows"] == 100
    assert manifest["partitions"] == ["date=2024-01-01"]
    # corrupt the live table, then restore
    import shutil

    shutil.rmtree(table)
    m2 = restore_table(spark, bak, restored)
    assert m2["rows"] == 100
    assert spark.read.parquet(restored).count() == 100


def test_salted_agg_matches_plain(spark):
    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(1000)] + [("cold", 5.0)],
        "k string, v double",
    )
    out = {r.k: r.value for r in salted_agg(df, ["k"], "v", "sum").collect()}
    assert out["hot"] == sum(float(i) for i in range(1000))
    assert out["cold"] == 5.0
    cnt = {r.k: r.value for r in salted_agg(df, ["k"], "v", "count").collect()}
    assert cnt == {"hot": 1000.0, "cold": 1.0}


def test_error_labels(spark):
    df = spark.createDataFrame(
        [(1, 1_000_000, '{"k": 1}'), (2, 2_000_000, "not-json")],
        "event_id long, ts_us long, body string",
    )
    src = LogSource(df=df, label_cols={}, error_labels=True)
    out = compile_logql(
        '{} | json k="k"',
        src,
        EvalParams(0, 10_000_000, 1_000_000),
        spark,
    )
    rows = {r.event_id if "event_id" in out.columns else i: r for i, r in enumerate(out.collect())}
    by_body = {r.body: r for r in out.collect()}
    assert by_body['{"k": 1}']["__error__"] is None
    assert by_body["not-json"]["__error__"] == "JSONParserErr"
    assert by_body["not-json"]["k"] is None


@pytest.mark.parametrize("op", ["count_over_time", "sum_over_time", "max_over_time"])
def test_prebucketed_matches_naive(spark, op):
    import random

    rng = random.Random(42)
    rows = [
        ("s" + str(i % 3), rng.randrange(0, 100) * US, float(rng.randrange(1, 50)))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "svc string, ts_us long, sample double")
    kw = dict(start_us=0, end_us=100 * US, step_us=10 * US, range_us=40 * US, by=["svc"])
    naive = range_aggregate(df, op, **kw)
    fast = range_aggregate_prebucketed(df, op, **kw)
    a = {(r.svc, r.step_us): r.value for r in naive.collect()}
    b = {(r.svc, r.step_us): r.value for r in fast.collect()}
    assert a == b


def test_deduce_severity_and_nanos(spark):
    from pyspark.sql import functions as F

    from oteldb_spark.sources.deduce import deduce_nanos, deduce_severity

    df = spark.createDataFrame(
        [
            ("WARN",), ("warning",), ("  Critical ",), ("e",), ("I",),
            ("trace",), ("",), ("nonsense",),
        ],
        "lvl string",
    ).withColumn("sev", deduce_severity("lvl"))
    got = [r["sev"] for r in df.collect()]
    assert got == [13, 13, 21, 17, 9, 1, 0, 0]

    ts = spark.createDataFrame(
        [
            (1_704_067_200,),             # seconds
            (1_704_067_200_000,),         # millis
            (1_704_067_200_000_000,),     # micros
            (1_704_067_200_000_000_000,), # nanos
            (12345,),                     # pre-2000 → unknown
        ],
        "n long",
    ).withColumn("ns", deduce_nanos("n"))
    vals = [r["ns"] for r in ts.collect()]
    assert vals[:4] == [1_704_067_200_000_000_000] * 4
    assert vals[4] is None


def test_lineformat_parsers(spark):
    from oteldb_spark.sources.lineformats import parse_lines

    df = spark.createDataFrame(
        [
            ("I0513 12:34:56.789012 3492 server.go:123] started ok",),
            ("2024-05-13T12:34:56.789Z\tWARN\tsched\tslow tick",),
            ("not a structured line at all",),
        ],
        "body string",
    )
    rows = parse_lines(df, year=2024).collect()
    klog, zap, plain = rows
    assert klog["parsed"]["severity_number"] == 9
    assert klog["parsed"]["origin"] == "server.go:123"
    assert klog["parsed"]["body"] == "started ok"
    assert zap["parsed"]["severity_number"] == 13
    assert zap["parsed"]["origin"] == "sched"
    assert plain["parsed"] is None


def test_docker_stream_roundtrip_and_systemerr():
    import pytest as _pytest

    from oteldb_spark.sources.dockerlog import (
        encode_docker_stream,
        parse_docker_stream,
    )

    ts = 1_704_067_200_123_456_789
    blob = encode_docker_stream(
        [(1, ts, "hello out"), (2, ts + 1, "oh no")]
    )
    rows = list(parse_docker_stream(blob))
    assert [r["stream"] for r in rows] == ["stdout", "stderr"]
    assert rows[0]["ts_ns"] == ts and rows[0]["body"] == "hello out"
    # truncated trailing header ends gracefully (docker-cli behavior)
    assert len(list(parse_docker_stream(blob + b"\x01\x00\x00"))) == 2
    with _pytest.raises(ValueError):
        list(parse_docker_stream(encode_docker_stream([(3, ts, "boom")])))


def test_pq_encoding_and_adc(spark):
    """PQ codes are one centroid id per (vector, subspace); the ADC
    score of a vector that IS a codebook seed against itself as the
    query is exactly 0 (every subspace hits its own centroid)."""
    from oteldb_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_subvectors,
    )
    from oteldb_spark.tables import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    n = emb.count()
    sub = pq_subvectors(emb, 8, 8)
    codebook = sub.filter(F.col("vec_id") < 16).select(
        "m", F.col("vec_id").alias("cid"), F.col("s").alias("cs")
    )
    codes = pq_encode(sub, codebook)
    assert codes.count() == n * 8
    assert codes.agg(F.max("code")).first()[0] < 16
    # seed vector 3 queries itself: each subspace's nearest centroid is
    # centroid 3 at distance 0, so its ADC total must be 0.0
    top = pq_adc_topk(
        codes, codebook, sub.filter(F.col("vec_id") == 3), 1
    ).first()
    assert top.vec_id == 3 and top.dist2 == 0.0


def test_compact_table_merges_small_files(spark, tmp_path):
    """compact_table rewrites a fragmented partition into few sorted
    files, preserves every row, and is idempotent (sources/maintain.py
    — the MergeTree background-merge analog)."""
    from pyspark.sql import functions as F

    from oteldb_spark.sources.maintain import compact_table, _data_files
    from oteldb_spark.tables import load

    ev = load(spark, "/root/testdata/sf0.001", "events").select("event_id", "ts", "user_id", "value")
    table = str(tmp_path / "events_t")
    # fragment: 3 partition dirs, many tiny appends each
    for i in range(6):
        (
            ev.withColumn("date", (F.col("user_id") % 3).cast("string"))
            .repartition(4)
            .write.mode("append")
            .partitionBy("date")
            .parquet(table)
        )
    before = len(_data_files(table))
    n_rows = spark.read.parquet(table).count()
    report = compact_table(spark, table, sort_cols=["ts"], target_file_mb=128)
    after = len(_data_files(table))
    assert after < before and after == sum(
        v["files_after"] for v in report.values()
    )
    got = spark.read.parquet(table)
    assert got.count() == n_rows
    # rows are ts-sorted within every rewritten file
    from pyspark.sql.functions import input_file_name, lag
    from pyspark.sql import Window

    w = Window.partitionBy(input_file_name()).orderBy(F.monotonically_increasing_id())
    disorder = (
        got.withColumn("prev", lag("ts").over(w))
        .filter(F.col("prev") > F.col("ts"))
        .count()
    )
    assert disorder == 0
    # second pass: nothing to do
    report2 = compact_table(spark, table, sort_cols=["ts"], target_file_mb=128)
    assert all(
        v["files_before"] == v["files_after"] for v in report2.values()
    )


def test_jaccard_prefix_join_equals_brute_force(spark):
    """AllPairs prefix filtering is LOSSLESS: on a random corpus with
    planted near-duplicates and heavy stopword grams, the prefix join
    returns exactly the brute-force pair set at every tau."""
    import random

    from pyspark.sql import functions as F

    from oteldb_spark.operators.dedup import jaccard_prefix_join

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for d in range(30):
        n = rng.randrange(4, 15)
        docs.append((d, ["stop", "common"] + rng.sample(vocab, n)))
    # planted near-dup: copy with one substitution
    twin = list(docs[3][1])
    twin[-1] = "w999"
    docs.append((30, twin))
    rows = [(d, g) for d, grams in docs for g in set(grams)]
    sh = spark.createDataFrame(rows, "doc long, gram string")

    gram_sets = {d: set(g) for d, g in docs}
    for tau in (0.2, 0.5, 0.8):
        want = {}
        ids = sorted(gram_sets)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                A, B = gram_sets[ids[i]], gram_sets[ids[j]]
                jac = len(A & B) / len(A | B)
                if jac >= tau:
                    want[(ids[i], ids[j])] = round(jac, 9)
        got = {
            (r.doc_a, r.doc_b): round(r.jaccard, 9)
            for r in jaccard_prefix_join(sh, tau).collect()
        }
        assert got == want, tau
