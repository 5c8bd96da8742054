"""Driver-gated MinHash-LSH and SimHash queries (exact oracle replay
of the portable-hash computation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.dedup import (
    MINHASH_ORACLE_CTES,
    SIMHASH_ORACLE_CTES,
    lsh_candidate_pairs,
    minhash_signatures,
    minhash_vector,
    simhash64,
)
from ..tables import load
from .registry import register


# MinHash signatures themselves (doc × 16 components) — determinism
# check of the whole permutation pipeline
@register(
    "dedup_minhash_signatures",
    f"""WITH {MINHASH_ORACLE_CTES}
SELECT doc, i, sig FROM sigs""",
)
def dedup_minhash_signatures(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return minhash_signatures(docs, "doc_id", "text")


# LSH candidate pairs with component-agreement count ≥ 4 (of 16)
@register(
    "dedup_minhash_lsh",
    f"""WITH {MINHASH_ORACLE_CTES}
SELECT c.doc_a, c.doc_b,
       CAST(count(CASE WHEN sa.sig = sb.sig THEN 1 END) AS BIGINT) AS agree
FROM cand c
JOIN sigs sa ON sa.doc = c.doc_a
JOIN sigs sb ON sb.doc = c.doc_b AND sb.i = sa.i
GROUP BY c.doc_a, c.doc_b
HAVING count(CASE WHEN sa.sig = sb.sig THEN 1 END) >= 4""",
)
def dedup_minhash_lsh(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    vecs = minhash_vector(docs, "doc_id", "text")
    out = lsh_candidate_pairs(vecs, threshold_components=4)
    return out.select("doc_a", "doc_b", F.col("agree").cast("long").alias("agree"))


# SimHash fingerprints (60-bit)
@register(
    "dedup_simhash",
    f"""WITH {SIMHASH_ORACLE_CTES}
SELECT doc, simhash FROM fps""",
)
def dedup_simhash(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return simhash64(docs, "doc_id", "text")


# SimHash near-dup pairs: hamming distance ≤ 4 of 60 bits
@register(
    "dedup_simhash_pairs",
    f"""WITH {SIMHASH_ORACLE_CTES}
SELECT a.doc AS doc_a, b.doc AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM fps a JOIN fps b ON a.doc < b.doc
WHERE bit_count(xor(a.simhash, b.simhash)) <= 4""",
)
def dedup_simhash_pairs(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    fps = simhash64(docs, "doc_id", "text")
    a = fps.alias("a")
    b = fps.alias("b")
    hamming = F.expr("bit_count(a.simhash ^ b.simhash)")
    return (
        a.join(b, F.col("a.doc") < F.col("b.doc"))
        .withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= 4)
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            "hamming",
        )
    )
