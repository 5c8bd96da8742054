"""Corpus-analysis operators for training-data curation: vocabulary
statistics, lexical-diversity scoring, keyword extraction.

These sit beside the dedup/similarity tier (queries/pipeline.py): a
100 TB curation run interleaves dedup with corpus-level frequency
passes (vocabulary pruning, boilerplate detection) and per-document
lexical quality signals.  All three are pure DataFrame aggregations —
word explode is narrow, every groupBy partial-aggregates map-side,
and the only joins broadcast a small side (the document-frequency
table after its count collapse, the corpus-size literal).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from .registry import register

# --- corpus-wide top bigrams -------------------------------------------------
# vocabulary/boilerplate pass: most frequent word bigrams across the
# corpus.  Deterministic top-k: count desc, bigram asc tie-break.


@register(
    "text_top_bigrams",
    """WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
bg AS (
  SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                i -> ws[i] || ' ' || ws[i + 1])) AS bigram
  FROM w
)
SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
FROM bg GROUP BY bigram
ORDER BY cnt DESC, bigram LIMIT 20""",
)
def text_top_bigrams(spark, sf_dir):
    docs = load(spark, sf_dir, "documents", spread=True)
    bigrams = docs.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(split(text, ' ')) - 2),"
                " i -> concat_ws(' ', split(text, ' ')[i],"
                " split(text, ' ')[i+1]))"
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "bigram")
        .limit(20)
    )


# --- lexical diversity (type-token ratio) ------------------------------------
# quality signal: near-duplicate / templated docs have low TTR.  The
# ratio is one IEEE divide of two exact counts — deterministic.


@register(
    "text_ttr",
    """WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS tokens,
       CAST(count(DISTINCT tok) AS BIGINT) AS types,
       CAST(count(DISTINCT tok) AS DOUBLE) / count(*) AS ttr
FROM w GROUP BY doc_id""",
)
def text_ttr(spark, sf_dir):
    docs = load(spark, sf_dir, "documents", spread=True)
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    return toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("tokens"),
        F.countDistinct("tok").cast("long").alias("types"),
        (F.countDistinct("tok").cast("double") / F.count(F.lit(1))).alias(
            "ttr"
        ),
    )


# --- keyword extraction (tf-idf, linear idf) ---------------------------------
# top distinguishing term per document.  idf is the linear N/df rather
# than ln(N/df): the ranking inside a document is what matters for
# extraction, ln is monotone in N/df so top-1 is identical, and the
# linear form keeps the score two IEEE ops on exact integers
# (hash-deterministic; engine ln() differs at ulp level).


@register(
    "text_keyword_top1",
    """WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM w GROUP BY doc_id, tok
),
df AS (
  SELECT tok, count(DISTINCT doc_id) AS df FROM w GROUP BY tok
),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok,
         round(tf.tf * (CAST(n.n AS DOUBLE) / df.df), 6) AS score
  FROM tf JOIN df USING (tok) CROSS JOIN n
)
SELECT doc_id, tok AS keyword, score FROM (
  SELECT doc_id, tok, score,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, tok) AS rn
  FROM scored
) WHERE rn = 1""",
)
def text_keyword_top1(spark, sf_dir):
    docs = load(spark, sf_dir, "documents", spread=True)
    n_docs = docs.count()  # scalar corpus size (one job, not a join)
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(df), "tok").withColumn(
        "score",
        F.round(
            F.col("tf") * (F.lit(float(n_docs)) / F.col("df")), 6
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "tok")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("tok").alias("keyword"), "score")
    )


# --- end-to-end curation pipeline --------------------------------------------
# the composed pass a corpus run executes: quality gate → exact dedup
# (content-hash keep-first) → MinHash-LSH near-dup drop → per-shard
# stats.  One gate over the whole composition so stage wiring (not
# just each stage alone) is oracle-checked.

from ..operators.dedup import (  # noqa: E402
    MINHASH_ORACLE_CTES,
    lsh_candidate_pairs,
    minhash_vector,
)

_SURV_SQL = """survivors AS (
  SELECT doc_id, text, lang, source
  FROM (
    SELECT d.*, row_number() OVER (
      PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM (
      SELECT * FROM documents
      WHERE len(string_split(text, ' ')) BETWEEN 30 AND 400
        AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              / len(string_split(text, ' ')) >= 0.2
    ) d
  ) WHERE rn = 1
)"""

_MINH_SURV = MINHASH_ORACLE_CTES.replace("FROM documents", "FROM survivors")


@register(
    "pipeline_curation",
    f"""WITH {_SURV_SQL},
{_MINH_SURV},
agree AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c JOIN sigs sa ON sa.doc = c.doc_a
  JOIN sigs sb ON sb.doc = c.doc_b AND sb.i = sa.i
  GROUP BY c.doc_a, c.doc_b
  HAVING count(CASE WHEN sa.sig = sb.sig THEN 1 END) >= 8
),
final AS (
  SELECT s.* FROM survivors s
  WHERE s.doc_id NOT IN (SELECT doc_b FROM agree)
)
SELECT lang, source, CAST(count(*) AS BIGINT) AS docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
FROM final GROUP BY lang, source""",
)
def pipeline_curation(spark, sf_dir):
    docs = load(spark, sf_dir, "documents", spread=True)
    words = F.split("text", " ")
    n_words = F.size(words)
    uniq = F.size(F.array_distinct(words)).cast("double") / n_words
    q = docs.filter(n_words.between(30, 400) & (uniq >= 0.2))
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    sur = (
        q.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    vecs = minhash_vector(sur, "doc_id", "text")
    pairs = lsh_candidate_pairs(vecs, threshold_components=8)
    dropped = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    final = sur.join(dropped, "doc_id", "left_anti")
    return final.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("tokens"),
    )


# --- frequency-capped n-gram Jaccard -----------------------------------------
# the scale tier between exact shingle-join Jaccard (quadratic in
# shared-shingle frequency) and MinHash-LSH: shingles appearing in
# more than CAP documents are boilerplate and contribute pairs
# quadratically, so they are dropped BEFORE the self-join — candidate
# volume then scales with sum(df^2) over rare shingles only.  The
# Jaccard denominator still uses the full shingle sets, so scores for
# surviving pairs are exact; only pairs connected solely through
# boilerplate are (intentionally) lost.

_SHINGLE_CAP = 50


@register(
    "dedup_ngram_jaccard_capped",
    f"""WITH shingled AS (
  SELECT doc_id AS doc, unnest(list_distinct(list_transform(
           generate_series(1, len(string_split(text, ' ')) - 2),
           i -> string_split(text, ' ')[i] || ' ' ||
                string_split(text, ' ')[i+1] || ' ' ||
                string_split(text, ' ')[i+2]))) AS shingle
  FROM documents
),
sizes AS (SELECT doc, count(*) AS n FROM shingled GROUP BY doc),
rare AS (
  SELECT shingle FROM shingled GROUP BY shingle
  HAVING count(*) <= {_SHINGLE_CAP}
),
filtered AS (
  SELECT s.doc, s.shingle FROM shingled s JOIN rare USING (shingle)
),
pairs AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS common
  FROM filtered a JOIN filtered b
    ON a.shingle = b.shingle AND a.doc < b.doc
  GROUP BY a.doc, b.doc
)
SELECT p.doc_a, p.doc_b,
       round(CAST(p.common AS DOUBLE) / (sa.n + sb.n - p.common), 6)
         AS jaccard_lb
FROM pairs p
JOIN sizes sa ON sa.doc = p.doc_a
JOIN sizes sb ON sb.doc = p.doc_b
WHERE CAST(p.common AS DOUBLE) / (sa.n + sb.n - p.common) >= 0.1""",
)
def dedup_ngram_jaccard_capped(spark, sf_dir):
    from ..operators.dedup import shingles as shingle_expr

    docs = load(spark, sf_dir, "documents", spread=True)
    par = spark.sparkContext.defaultParallelism
    sh = (
        docs.repartition(par)
        .select(
            F.col("doc_id").alias("doc"),
            F.explode(shingle_expr("text")).alias("shingle"),
        )
    )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    rare = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _SHINGLE_CAP)
        .select("shingle")
    )
    filt = sh.join(rare, "shingle").repartition(par, "shingle")
    a, b = filt.alias("a"), filt.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("common").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("common")
    )
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc"))
        .join(sb, F.col("doc_b") == F.col("sb.doc"))
        .filter(jac >= 0.1)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard_lb"))
    )


# ------------------------------------------------------------ count-min

# Count-min sketch over user event counts: depth-3 md5-derived
# hashes into 256-bucket rows, estimate = min of the probed buckets.
# The sketch build is one groupBy over (depth, bucket) — 768 rows of
# state regardless of cardinality, the structure a 100 TB frequency
# service actually ships; estimates are deterministic (md5 hashing),
# so the DuckDB oracle replays them exactly, overestimates included.
_CMS_W = 256
_CMS_D = 3
_CMS_PROBES = list(range(10))


@register(
    "sketch_count_min",
    f"""WITH rows_h AS (
  SELECT d.d AS d,
         CAST('0x' || substr(md5(d.d || '_' || user_id), 1, 15) AS BIGINT)
           % {_CMS_W} AS bucket
  FROM events, (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS d) d
),
sketch AS (
  SELECT d, bucket, count(*) AS c FROM rows_h GROUP BY d, bucket
),
probes AS (
  SELECT unnest({_CMS_PROBES}) AS user_id
),
probe_h AS (
  SELECT p.user_id, d.d AS d,
         CAST('0x' || substr(md5(d.d || '_' || p.user_id), 1, 15) AS BIGINT)
           % {_CMS_W} AS bucket
  FROM probes p, (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS d) d
)
SELECT ph.user_id, CAST(min(s.c) AS BIGINT) AS est_count
FROM probe_h ph JOIN sketch s ON s.d = ph.d AND s.bucket = ph.bucket
GROUP BY ph.user_id""",
)
def sketch_count_min(spark, sf_dir):
    # spread: depth-exploded md5 hashing is per-row-heavy (rows x D
    # digests) and a one-file events scan would run it on one core
    # (parallelism_audit flagged a 5.4 s single-task stage)
    ev = load(spark, sf_dir, "events", spread=True)

    def bucket(d_col, key_col):
        return F.expr(
            f"cast(conv(substr(md5(concat({d_col}, '_', {key_col})), 1, 15),"
            " 16, 10) as bigint)"
        ) % _CMS_W

    depths = F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("d")
    rows_h = ev.select("user_id", depths).select(
        "d", bucket("d", "user_id").alias("bucket")
    )
    sketch = rows_h.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("c"))
    probes = spark.createDataFrame(
        [(u,) for u in _CMS_PROBES], "user_id long"
    ).select("user_id", depths).select(
        "user_id", "d", bucket("d", "user_id").alias("bucket")
    )
    # broadcast the tiny probe set against the 768-row sketch
    return (
        sketch.join(F.broadcast(probes), ["d", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").alias("est_count"))
    )


# --------------------------------------------------------------- z-order

# Z-order (Morton) clustering key: interleave the bits of two layout
# dimensions so files sorted by the key keep both columns' min/max
# stats tight — the multi-column analog of the MergeTree ORDER BY
# prefix (SURVEY §1.2 suggests Z-ORDER for the Delta layout).  16
# bits per dimension as a closed-form bit expression, identical in
# Spark and the SQL oracle; a writer uses it as
# sortWithinPartitions(zkey).
_Z_BITS = 16


def _interleave_sql(a: str, b: str) -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@register(
    "layout_zorder_key",
    f"""SELECT event_id,
       CAST({_interleave_sql('(user_id & 65535)',
                             '((epoch_ns(ts) // 60000000000) & 65535)')} AS BIGINT)
         AS zkey
FROM events
ORDER BY zkey, event_id LIMIT 100""",
)
def layout_zorder_key(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    # minute buckets of the ns timestamp as the time dimension
    zkey = F.expr(
        "CAST("
        + _interleave_sql("(user_id & 65535)", "((ts div 60000000000) & 65535)")
        + " AS BIGINT)"
    )
    return (
        ev.select("event_id", zkey.alias("zkey"))
        .orderBy("zkey", "event_id")
        .limit(100)
    )


# ----------------------------------------------------------------- drift

# New-term detection between corpus halves: bigrams present in the
# second half of doc ids but never seen in the first — the vocabulary
# drift check a periodic ingest monitors.  Set difference as a
# broadcast anti-join against the (smaller) reference vocabulary.
@register(
    "corpus_new_terms",
    """WITH bg AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    generate_series(1, len(string_split(text, ' ')) - 1),
    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])))
      AS bigram
  FROM documents
),
half AS (SELECT CAST(max(doc_id) / 2 AS BIGINT) AS mid FROM documents),
old_v AS (SELECT DISTINCT bigram FROM bg, half WHERE doc_id < mid),
new_v AS (SELECT DISTINCT bigram FROM bg, half WHERE doc_id >= mid)
SELECT bigram FROM new_v
WHERE bigram NOT IN (SELECT bigram FROM old_v)""",
)
def corpus_new_terms(spark, sf_dir):
    docs = load(spark, sf_dir, "documents", spread=True)
    bigrams = F.array_distinct(
        F.expr(
            "CASE WHEN size(split(text,' ')) >= 2 THEN"
            " transform(sequence(0, size(split(text,' ')) - 2),"
            " i -> concat(split(text,' ')[i], ' ', split(text,' ')[i+1]))"
            " ELSE array() END"
        )
    )
    half = docs.agg((F.max("doc_id") / 2).cast("long").alias("mid"))
    bg = docs.select("doc_id", F.explode(bigrams).alias("bigram")).crossJoin(
        F.broadcast(half)  # scalar boundary stays in the plan, not the driver
    )
    old_v = bg.filter(F.col("doc_id") < F.col("mid")).select("bigram").distinct()
    new_v = bg.filter(F.col("doc_id") >= F.col("mid")).select("bigram").distinct()
    return new_v.join(old_v, "bigram", "left_anti")
