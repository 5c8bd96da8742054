"""Streaming MinHash-LSH near-dup e2e: documents parquet → stream →
per-row signatures → band-bucket state → candidate pairs; signatures
and the candidate set cross-checked against the batch LSH operators.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oteldb_spark.operators.dedup import lsh_candidate_pairs, minhash_vector
from oteldb_spark.streaming.neardup import (
    minhash_signature_col,
    stream_near_dup_pairs,
)
from oteldb_spark.tables import load

SF = "/root/testdata/sf0.001"
THRESHOLD = 4


def _docs(spark):
    # deterministic event times 1s apart, ordered by doc_id, so the
    # stream's (earlier, later) pair orientation matches doc_id order
    return (
        load(spark, SF, "documents")
        .select(
            "doc_id",
            "text",
            (1_700_000_000_000 + F.col("doc_id") * 1000).alias("ts_ms"),
        )
    )


def test_streaming_signature_matches_batch(spark):
    docs = _docs(spark)
    got = {
        r["doc_id"]: list(r["sigv"])
        for r in docs.select(
            "doc_id", minhash_signature_col("text").alias("sigv")
        ).collect()
    }
    want = {
        r["doc"]: list(r["sigv"])
        for r in minhash_vector(docs, "doc_id", "text").collect()
    }
    assert got == want


def test_stream_near_dup_matches_batch(spark, tmp_path):
    docs = _docs(spark)
    src = str(tmp_path / "docs_in")
    docs.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    out_dir = str(tmp_path / "pairs_out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        stream_near_dup_pairs(stream, threshold=THRESHOLD)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got_pairs = {
        (r.doc_a, r.doc_b)
        for r in spark.read.parquet(out_dir)
        .select("doc_a", "doc_b")
        .distinct()
        .collect()
    }

    vecs = minhash_vector(docs, "doc_id", "text")
    want_pairs = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(
            vecs, threshold_components=THRESHOLD
        ).collect()
    }
    assert got_pairs == want_pairs
    assert got_pairs, "corpus must contain near-dups for a real check"
