"""Training-data pipeline queries — dedup, similarity search, text
analysis — over the documents/embeddings tables.

These are first-class operators alongside SURVEY §2 (per the build
brief): exact/fuzzy dedup, ANN search, token/quality statistics.  The
heavier LSH variants (MinHash banding, SimHash) live in
operators/dedup.py with their own entries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.pin import pin
from ..tables import load
from .registry import register

# --- deduplication -----------------------------------------------------------


# exact dedup: keep-first per key (deterministic representative =
# min doc_id), report group sizes — the hash-groupBy dedup pattern
@register(
    "dedup_exact_keyed",
    """SELECT lang, source, CAST(min(doc_id) AS BIGINT) AS keep_id,
       CAST(count(*) AS BIGINT) AS group_size
FROM documents GROUP BY lang, source""",
)
def dedup_exact_keyed(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.min("doc_id").cast("long").alias("keep_id"),
        F.count(F.lit(1)).cast("long").alias("group_size"),
    )


# exact content dedup over normalized text (md5 content fingerprint):
# distinct-count per fingerprint; groups of size 1 everywhere means no
# byte-identical dups — the operator still exercises the full path
@register(
    "dedup_exact_content",
    """SELECT md5(lower(text)) AS fp, CAST(min(doc_id) AS BIGINT) AS keep_id,
       CAST(count(*) AS BIGINT) AS dups
FROM documents GROUP BY md5(lower(text)) HAVING count(*) >= 1""",
)
def dedup_exact_content(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return (
        docs.withColumn("fp", F.md5(F.lower("text")))
        .groupBy("fp")
        .agg(
            F.min("doc_id").cast("long").alias("keep_id"),
            F.count(F.lit(1)).cast("long").alias("dups"),
        )
    )


# n-gram Jaccard near-dup pairs: 3-word shingles, pairwise Jaccard via
# a plain shingle-join — the didactic exact tier.  Its candidate space
# blows up on frequent shingles; the SCALE-SAFE exact tier is the
# AllPairs prefix-filter join (operators/dedup.py jaccard_prefix_join,
# gate dedup_jaccard_prefix — identical output, candidates bounded by
# rare-gram co-occurrence), and the approximate tier is MinHash-LSH.
_SHINGLE_SQL = """shingled AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, len(string_split(text, ' ')) - 2),
           i -> string_split(text, ' ')[i] || ' ' ||
                string_split(text, ' ')[i+1] || ' ' ||
                string_split(text, ' ')[i+2]))) AS shingle
  FROM documents
),
sizes AS (SELECT doc_id, count(*) AS n FROM shingled GROUP BY doc_id)"""

@register(
    "dedup_ngram_jaccard",
    f"""WITH {_SHINGLE_SQL}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(CAST(count(*) AS DOUBLE) /
             (any_value(sa.n) + any_value(sb.n) - count(*)), 6) AS jaccard
FROM shingled a
JOIN shingled b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
JOIN sizes sa ON sa.doc_id = a.doc_id
JOIN sizes sb ON sb.doc_id = b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING CAST(count(*) AS DOUBLE) /
       (any_value(sa.n) + any_value(sb.n) - count(*)) >= 0.2""",
)
def dedup_ngram_jaccard(spark, sf_dir):
    docs = load(spark, sf_dir, "documents", spread=True)
    words = F.split("text", " ")
    shingles = F.array_distinct(
        F.expr(
            "CASE WHEN size(split(text,' ')) >= 3 THEN"
            " transform(sequence(0, size(split(text,' ')) - 3),"
            " i -> concat_ws(' ', split(text,' ')[i],"
            " split(text,' ')[i+1], split(text,' ')[i+2]))"
            " ELSE array() END"
        )
    )
    par = spark.sparkContext.defaultParallelism
    # spread the docs for the explode AND hash-partition the shingles
    # for the self-join: the join's shuffle volume (~pairs per shared
    # shingle) wants full parallelism even when the session default is
    # sized for small aggregations.  Checkpoint: the stage feeds three
    # plan branches (sizes + both join sides).
    sh = (
        docs.repartition(par)
        .select("doc_id", F.explode(shingles).alias("shingle"))
        .repartition(par, "shingle")
        .transform(pin)
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    out = (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("sa.n") + F.col("sb.n") - F.col("common")),
        )
        .filter(F.col("jaccard") >= 0.2)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


# --- similarity search -------------------------------------------------------


# brute-force cosine top-k against a query vector (vec_id 0) — the
# baseline ANN; the scale path (LSH-bucketed) lives in
# operators/similarity.py
@register(
    "ann_cosine_top10",
    """WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0
),
scored AS (
  SELECT vec_id,
         round(list_dot_product(CAST(embedding AS DOUBLE[]), qe) /
               (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(qe, qe))), 6) AS cosine
  FROM embeddings, q
  WHERE vec_id <> 0
)
SELECT vec_id, cosine FROM scored
ORDER BY cosine DESC, vec_id LIMIT 10""",
)
def ann_cosine_top10(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("e").alias("qe"))
    dot = F.aggregate(
        F.zip_with("e", "qe", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)  # noqa: E731
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .withColumn(
            "cosine", F.round(dot / (norm(F.col("e")) * norm(F.col("qe"))), 6)
        )
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(10)
        .select("vec_id", "cosine")
    )


# embedding-cosine near-dup pairs above a threshold (brute force at
# oracle scale; LSH-bucketed at 100 TB)
@register(
    "ann_near_dup_pairs",
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round(list_dot_product(a.e, b.e) /
               (sqrt(list_dot_product(a.e, a.e)) *
                sqrt(list_dot_product(b.e, b.e))), 6) AS cosine
  FROM v a JOIN v b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine >= 0.35""",
)
def ann_near_dup_pairs(spark, sf_dir):
    from ..operators.similarity import near_dup_pairs_blocked

    emb = load(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    # small block size so the multi-block (off-diagonal GEMM) path is
    # the one the oracle gates at every test SF
    return near_dup_pairs_blocked(emb, 0.35, block_rows=256)


# --- text analysis -----------------------------------------------------------


# token counting: whitespace tokens + a BPE-ish regex tokenizer
@register(
    "text_token_count",
    r"""SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT)
         AS re_tokens
FROM documents""",
)
def text_token_count(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(
                "text", F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0
            )
        )
        .cast("long")
        .alias("re_tokens"),
    )


# quality scoring: length / mean word length / stopword ratio /
# unique-token ratio
@register(
    "text_quality",
    """SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / len(string_split(text, ' ')), 6) AS mean_word_len,
       round(CAST(len(list_filter(string_split(text, ' '),
                      w -> w IN ('the', 'a', 'of', 'to', 'in', 'and'))) AS DOUBLE)
             / len(string_split(text, ' ')), 6) AS stopword_ratio,
       round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')), 6) AS unique_ratio
FROM documents""",
)
def text_quality(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_words = F.size(words)
    return docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        F.round(
            F.length(F.replace("text", F.lit(" "), F.lit(""))).cast("double")
            / n_words,
            6,
        ).alias("mean_word_len"),
        F.round(
            F.expr(
                "size(filter(split(text, ' '),"
                " w -> w IN ('the', 'a', 'of', 'to', 'in', 'and')))"
            ).cast("double")
            / n_words,
            6,
        ).alias("stopword_ratio"),
        F.round(F.size(F.array_distinct(words)).cast("double") / n_words, 6).alias(
            "unique_ratio"
        ),
    )


# document fingerprinting: full-content md5 + first-8-token prefix
# fingerprint (cheap near-head dedup key)
@register(
    "text_fingerprint",
    """SELECT doc_id, md5(text) AS content_fp,
       md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS prefix_fp
FROM documents""",
)
def text_fingerprint(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("content_fp"),
        F.md5(F.concat_ws(" ", F.slice(F.split("text", " "), 1, 8))).alias(
            "prefix_fp"
        ),
    )
