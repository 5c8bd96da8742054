"""End-to-end corpus build: the full training-data curation funnel as
ONE composed query.

Every stage exists as its own certified gate (docs_gopher_rules,
dedup_exact_content, dedup_minhash_lsh, pipeline_decontaminate); this
module composes them sequentially the way a production curation run
does — quality rules → exact dedup → near-dup suppression →
decontamination — and emits one row per corpus document with the full
per-stage flag vector.  The point at 100 TB: the stages FUSE.  One
scan of `documents` feeds the quality column math (map-side, no
shuffle), the content-hash grouping, the MinHash banding (restricted
to stage-2 survivors — signatures are per-doc pure functions, so
restricting the input set provably yields exactly the pairs whose both
endpoints survive), and the gram explode; nothing is materialized
between stages and Catalyst shares the scan.

Stage semantics (deterministic, order-free):
  1. quality      — Gopher rule set (Rae et al. 2021 §A.1.1).
  2. exact        — among quality docs, keep the min doc_id per
                    md5(lower(text)) group.
  3. near-dup     — among stage-2 survivors, drop a doc iff an LSH
                    pair (≥4 of 16 MinHash components agree) links it
                    to a stage-2 survivor with a SMALLER doc_id (the
                    "earlier doc wins" greedy every sequential
                    curation run implements; defined against stage-2
                    survivorship so the rule is non-recursive).
  4. decontam     — drop docs sharing any word 4-gram with the eval
                    holdout (doc_id % 50 = 0, which is excluded from
                    the corpus up front).

Reference anchor: the reference has no curation pipeline (it is an
observability store); this is part of the training-data extension
surface the build adds on top of SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators.dedup import (
    MINHASH_ORACLE_CTES,
    lsh_candidate_pairs,
    minhash_vector,
)
from ..operators.pin import pin
from ..tables import load
from .registry import register

_STOPS = "('the', 'be', 'to', 'of', 'and', 'that', 'have', 'with', 'a', 'in')"
_W = 4  # decontamination gram width

# DuckDB restatement, built from the same CTE fragments the per-stage
# gates use.  `q` evaluates the Gopher rules for every corpus doc;
# `canon` marks min-doc_id-per-content-hash among quality docs; the
# MinHash CTEs (shingled..cand) run over all documents and `nd`
# restricts pairs to both-endpoints-in-stage-2 (equivalent to banding
# the survivor subset); `cont` flags shared-gram docs.
_FUNNEL_CTES = f"""corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 50 != 0
),
q AS (
  SELECT doc_id, text, n_words,
         (n_words BETWEEN 50 AND 100000
          AND mean_word_len BETWEEN 3 AND 10
          AND alpha_ratio >= 0.8
          AND stop_hits >= 2) AS ok
  FROM (
    SELECT doc_id, text,
           len(string_split(text, ' ')) AS n_words,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / len(string_split(text, ' ')) AS mean_word_len,
           CAST(len(list_filter(string_split(text, ' '),
                    w -> regexp_matches(w, '[a-zA-Z]'))) AS DOUBLE)
             / len(string_split(text, ' ')) AS alpha_ratio,
           len(list_distinct(list_filter(string_split(text, ' '),
                    w -> w IN {_STOPS}))) AS stop_hits
    FROM corpus)
),
canon AS (
  SELECT doc_id,
         (doc_id = min(doc_id) OVER (PARTITION BY md5(lower(text))))
           AS is_canon
  FROM q WHERE ok
),
s2 AS (SELECT doc_id FROM canon WHERE is_canon),
{MINHASH_ORACLE_CTES},
agree AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c
  JOIN sigs sa ON sa.doc = c.doc_a
  JOIN sigs sb ON sb.doc = c.doc_b AND sb.i = sa.i
  GROUP BY c.doc_a, c.doc_b
  HAVING count(CASE WHEN sa.sig = sb.sig THEN 1 END) >= 4
),
nd AS (
  SELECT DISTINCT a.doc_b AS doc_id
  FROM agree a
  JOIN s2 x ON x.doc_id = a.doc_a
  JOIN s2 y ON y.doc_id = a.doc_b
),
grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    generate_series(1, len(string_split(text, ' ')) - {_W - 1}),
    i -> array_to_string(string_split(text, ' ')[i:i+{_W - 1}], ' '))))
    AS gram
  FROM documents
),
ev AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0),
cont AS (
  SELECT DISTINCT g.doc_id FROM grams g JOIN ev USING (gram)
  WHERE g.doc_id % 50 != 0
),
funnel AS (
  SELECT q.doc_id,
         CAST(q.n_words AS BIGINT) AS n_tokens,
         q.ok AS passed_quality,
         coalesce(c.is_canon, FALSE) AS is_canonical,
         (nd.doc_id IS NOT NULL) AS near_dup_dropped,
         (ct.doc_id IS NOT NULL) AS contaminated,
         (q.ok AND coalesce(c.is_canon, FALSE)
          AND nd.doc_id IS NULL AND ct.doc_id IS NULL) AS survives
  FROM q
  LEFT JOIN canon c ON c.doc_id = q.doc_id
  LEFT JOIN nd ON nd.doc_id = q.doc_id
  LEFT JOIN cont ct ON ct.doc_id = q.doc_id
)"""


def _funnel_frame(spark, sf_dir):
    docs = load(spark, sf_dir, "documents", spread=True)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    words = F.split("text", " ")
    n_words = F.size(words)
    mean_word_len = (
        F.length(F.replace("text", F.lit(" "), F.lit(""))).cast("double")
        / n_words
    )
    alpha_ratio = (
        F.expr("size(filter(split(text, ' '), w -> w rlike '[a-zA-Z]'))")
        .cast("double") / n_words
    )
    stop_hits = F.size(
        F.array_distinct(
            F.expr(f"filter(split(text, ' '), w -> w IN {_STOPS})")
        )
    )
    ok = (
        n_words.between(50, 100000)
        & mean_word_len.between(3, 10)
        & (alpha_ratio >= 0.8)
        & (stop_hits >= 2)
    )
    # one row per corpus doc with the quality verdict; feeds four
    # downstream branches (canon, survivor minhash, grams, final
    # assembly).  Carries the full text column → data-sized, so the
    # default DISK_ONLY pin (an in-memory pin of every document would
    # evict the working set at corpus scale)
    q = pin(
        corpus.select("doc_id", "text", n_words.alias("n_words"), ok.alias("ok"))
    )

    canon = q.filter("ok").withColumn(
        "is_canon",
        F.col("doc_id")
        == F.min("doc_id").over(W.partitionBy(F.md5(F.lower("text")))),
    ).select("doc_id", "is_canon")
    s2 = canon.filter("is_canon").select("doc_id")

    # MinHash only over stage-2 survivors: signatures are pure per-doc
    # functions, so pairs(survivors) == pairs(all) ∩ survivors² — the
    # oracle states the latter, this computes the former (cheaper: the
    # banding shuffle carries survivors only)
    surv_docs = q.join(s2, "doc_id").select("doc_id", "text")
    vecs = minhash_vector(surv_docs, "doc_id", "text")
    nd = (
        lsh_candidate_pairs(vecs, threshold_components=4)
        .select("doc_b").distinct()
        .withColumnRenamed("doc_b", "doc_id")
        .withColumn("_nd", F.lit(True))
    )

    # decontamination grams: eval side from the held-out shard of the
    # RAW table (quality-independent), train side from the corpus
    gram_expr = F.explode(
        F.array_distinct(
            F.expr(
                f"CASE WHEN size(w) >= {_W} THEN"
                f" transform(sequence(1, size(w) - {_W - 1}),"
                f" i -> concat_ws(' ', slice(w, i, {_W})))"
                " ELSE array() END"
            )
        )
    ).alias("gram")
    ev = (
        docs.filter(F.col("doc_id") % 50 == 0)
        .select(F.split("text", " ").alias("w"))
        .select(gram_expr)
        .distinct()
    )
    cont = (
        q.select("doc_id", F.split("text", " ").alias("w"))
        .select("doc_id", gram_expr)
        .join(F.broadcast(ev), "gram")
        .select("doc_id").distinct()
        .withColumn("_ct", F.lit(True))
    )

    out = (
        q.select("doc_id", "n_words", "ok")
        .join(canon, "doc_id", "left")
        .join(nd, "doc_id", "left")
        .join(cont, "doc_id", "left")
    )
    return out.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_tokens"),
        F.col("ok").alias("passed_quality"),
        F.coalesce("is_canon", F.lit(False)).alias("is_canonical"),
        F.coalesce("_nd", F.lit(False)).alias("near_dup_dropped"),
        F.coalesce("_ct", F.lit(False)).alias("contaminated"),
        (
            F.col("ok")
            & F.coalesce("is_canon", F.lit(False))
            & ~F.coalesce("_nd", F.lit(False))
            & ~F.coalesce("_ct", F.lit(False))
        ).alias("survives"),
    )


@register(
    "corpus_build_survivors",
    f"""WITH {_FUNNEL_CTES}
SELECT doc_id, n_tokens, passed_quality, is_canonical,
       near_dup_dropped, contaminated, survives
FROM funnel""",
)
def corpus_build_survivors(spark, sf_dir):
    return _funnel_frame(spark, sf_dir)


@register(
    "corpus_build_funnel",
    f"""WITH {_FUNNEL_CTES}
SELECT CAST(count(*) AS BIGINT) AS n_corpus,
       CAST(count(*) FILTER (WHERE passed_quality) AS BIGINT) AS n_quality,
       CAST(count(*) FILTER (WHERE is_canonical) AS BIGINT) AS n_exact,
       CAST(count(*) FILTER (WHERE is_canonical AND NOT near_dup_dropped)
            AS BIGINT) AS n_after_neardup,
       CAST(count(*) FILTER (WHERE survives) AS BIGINT) AS n_survivors,
       CAST(sum(n_tokens) FILTER (WHERE survives) AS BIGINT)
         AS survivor_tokens
FROM funnel""",
)
def corpus_build_funnel(spark, sf_dir):
    """Stage-attrition report: the numbers a curation run logs."""
    f = _funnel_frame(spark, sf_dir)
    return f.agg(
        F.count(F.lit(1)).cast("long").alias("n_corpus"),
        F.count(F.when(F.col("passed_quality"), 1)).cast("long").alias("n_quality"),
        F.count(F.when(F.col("is_canonical"), 1)).cast("long").alias("n_exact"),
        F.count(
            F.when(F.col("is_canonical") & ~F.col("near_dup_dropped"), 1)
        ).cast("long").alias("n_after_neardup"),
        F.count(F.when(F.col("survives"), 1)).cast("long").alias("n_survivors"),
        F.sum(F.when(F.col("survives"), F.col("n_tokens")))
        .cast("long").alias("survivor_tokens"),
    )
