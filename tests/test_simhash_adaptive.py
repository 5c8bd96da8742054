"""simhash_adaptive_pairs — tier-switch semantics (r13: this operator
became the primary ``dedup_simhash_pairs`` gate).

Below the tier threshold the adaptive operator must be byte-identical
to the historic fixed 60-bit banded join; above it, the 120-bit banded
join must equal the brute-force pair join over the 120-bit
fingerprints (pigeonhole exactness at the wider band width).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oteldb_spark.operators.dedup import (
    simhash64,
    simhash128,
    simhash_adaptive_pairs,
    simhash_near_pairs,
)


def _docs(spark, n=40):
    # clusters of near-duplicates: base texts plus light perturbations
    base = [
        " ".join(f"tok{(i * 7 + j) % 23}" for j in range(30)) for i in range(8)
    ]
    rows = []
    for d in range(n):
        words = base[d % 8].split()
        # perturb one token per copy index so hamming stays small
        words[d % len(words)] = f"mut{d}"
        rows.append((d, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _collected(df):
    return sorted((r.doc_a, r.doc_b, r.hamming) for r in df.collect())


def test_below_threshold_equals_fixed_tier(spark):
    docs = _docs(spark)
    got = _collected(simhash_adaptive_pairs(docs, "doc_id", "text"))
    fixed = _collected(
        simhash_near_pairs(simhash64(docs, "doc_id", "text"), max_hamming=4)
    )
    assert got == fixed and got, "expected non-empty identical pair sets"


def test_above_threshold_equals_brute_force_120bit(spark):
    docs = _docs(spark)
    # force the 120-bit tier with a tiny threshold
    got = _collected(
        simhash_adaptive_pairs(docs, "doc_id", "text", tier_rows=10)
    )
    fps = simhash128(docs, "doc_id", "text")
    a, b = fps.alias("a"), fps.alias("b")
    brute = (
        a.join(b, F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.expr("bit_count(a.f1 ^ b.f1) + bit_count(a.f2 ^ b.f2)")
            .cast("long")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= 4)
    )
    assert got == _collected(brute) and got
