"""Driver-gated MinHash-LSH and SimHash queries (exact oracle replay
of the portable-hash computation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.dedup import (
    MINHASH_ORACLE_CTES,
    SIMHASH_ADAPTIVE_ORACLE,
    SIMHASH_ORACLE_CTES,
    lsh_candidate_pairs,
    minhash_signatures,
    minhash_vector,
    simhash64,
    simhash_adaptive_pairs,
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
    docs = load(spark, sf_dir, "documents", spread=True)
    return simhash64(docs, "doc_id", "text")


# SimHash near-dup pairs: hamming distance ≤ 4, SCALE-ADAPTIVE tier
# (r13, VERDICT r12 ask #1): 60-bit fingerprints / 12-bit pigeonhole
# bands up to 32k docs, 120-bit / 24-bit bands above — the fixed
# 12-bit tier's random-collision candidate tail grows ~5·N²/2^12
# (SCALING_r12 watch: ×64 point 29.3 s, confirm lb 1.158).  The oracle
# replays the same tier formula in a scalar-subquery CASE; below the
# threshold both sides reduce exactly to the historic fixed 60-bit
# gate, so every fixture SF (500/500/5000 docs) is byte-identical to
# the r12 results.
@register("dedup_simhash_pairs", SIMHASH_ADAPTIVE_ORACLE)
def dedup_simhash_pairs(spark, sf_dir):
    # Banded pigeonhole join, not the brute-force pair join the oracle
    # runs — same answer, candidates scale with band collisions
    # instead of n^2.
    docs = load(spark, sf_dir, "documents", spread=True)
    return simhash_adaptive_pairs(docs, "doc_id", "text", max_hamming=4)


# EXACT Jaccard >= tau via AllPairs prefix filtering — same answer as
# the brute-force inverted join (the oracle below IS the brute force)
# but candidate volume scales with rare-gram co-occurrence, not with
# frequent-gram blowup: the 100 TB-safe exact tier that retires the
# "quadratic by contract" caveat on dedup_ngram_jaccard.
@register(
    "dedup_jaccard_prefix",
    """WITH shingled AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, len(string_split(text, ' ')) - 2),
           i -> string_split(text, ' ')[i] || ' ' ||
                string_split(text, ' ')[i+1] || ' ' ||
                string_split(text, ' ')[i+2]))) AS shingle
  FROM documents
),
sizes AS (SELECT doc_id, count(*) AS n FROM shingled GROUP BY doc_id)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(CAST(count(*) AS DOUBLE) /
             (any_value(sa.n) + any_value(sb.n) - count(*)), 6) AS jaccard
FROM shingled a
JOIN shingled b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
JOIN sizes sa ON sa.doc_id = a.doc_id
JOIN sizes sb ON sb.doc_id = b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING CAST(count(*) AS DOUBLE) /
       (any_value(sa.n) + any_value(sb.n) - count(*)) >= 0.8""",
)
def dedup_jaccard_prefix(spark, sf_dir):
    from ..operators.dedup import jaccard_prefix_join

    docs = load(spark, sf_dir, "documents", spread=True)
    shingles = F.array_distinct(
        F.expr(
            "CASE WHEN size(split(text,' ')) >= 3 THEN"
            " transform(sequence(0, size(split(text,' ')) - 3),"
            " i -> concat_ws(' ', split(text,' ')[i],"
            " split(text,' ')[i+1], split(text,' ')[i+2]))"
            " ELSE array() END"
        )
    )
    sh = docs.select(
        F.col("doc_id").alias("doc"), F.explode(shingles).alias("gram")
    )
    # tau=0.8: the near-duplicate regime prefix filtering is FOR — the
    # per-doc prefix shrinks to ~n/5 rarest grams, so candidates are a
    # sliver of the inverted join (at tau->0 everything is a candidate
    # and no exact algorithm beats the plain join)
    out = jaccard_prefix_join(sh, 0.8)
    return out.select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    )
