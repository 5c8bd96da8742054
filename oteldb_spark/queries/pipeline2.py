"""Training-data pipeline, part 2: dedup clustering, decontamination,
deterministic splits, sequence packing.

These are the curation steps downstream of pair finding: near-dup
*pairs* (pipeline.py, dedup_lsh.py) become *clusters* with one kept
canonical doc; train shards are checked for eval-set n-gram overlap
(decontamination); docs are routed to train/holdout by a content
hash; and docs are packed into fixed-token context windows.

Scale shapes:
- components: min-label propagation — one shuffle join per round,
  O(cluster diameter) rounds (near-dup clusters are shallow; the
  big-star/small-star variant would bound rounds by O(log n) at
  adversarial diameters).  Lineage is pinned per round.
- decontamination: the eval-set gram list is small by construction,
  so the join broadcasts it; the train side streams map-side with no
  shuffle of the big table.
- split: pure row-local hashing — no shuffle at all before the
  final stats aggregation.
- packing: one window per shard ordered by doc id — equivalent to
  the streaming first-fit pass a packing job runs per output shard.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.pin import pin
from ..tables import load
from .registry import register

# ---------------------------------------------------------------- components

# edges: 3-word-shingle Jaccard ≥ 0.5 (the tight near-dup tier)
_EDGE_SQL = """shingled AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, len(string_split(text, ' ')) - 2),
           i -> string_split(text, ' ')[i] || ' ' ||
                string_split(text, ' ')[i+1] || ' ' ||
                string_split(text, ' ')[i+2]))) AS shingle
  FROM documents
),
sizes AS (SELECT doc_id, count(*) AS n FROM shingled GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM shingled a
  JOIN shingled b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN sizes sa ON sa.doc_id = a.doc_id
  JOIN sizes sb ON sb.doc_id = b.doc_id
  GROUP BY a.doc_id, b.doc_id, sa.n, sb.n
  HAVING CAST(count(*) AS DOUBLE) / (sa.n + sb.n - count(*)) >= 0.5
),
edges AS (
  SELECT doc_a AS v, doc_b AS w FROM pairs
  UNION
  SELECT doc_b AS v, doc_a AS w FROM pairs
)"""


def _jaccard_edges(spark, sf_dir):
    """Symmetric near-dup edge list (v, w) at Jaccard ≥ 0.5."""
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
    sh = docs.select("doc_id", F.explode(shingles).alias("shingle")).transform(pin)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
        .join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(
            F.col("common").cast("double")
            / (F.col("sa.n") + F.col("sb.n") - F.col("common"))
            >= 0.5
        )
        .select("doc_a", "doc_b")
    )
    return pairs.select(
        F.col("doc_a").alias("v"), F.col("doc_b").alias("w")
    ).unionByName(pairs.select(F.col("doc_b").alias("v"), F.col("doc_a").alias("w")))


@register(
    "dedup_components",
    f"""WITH RECURSIVE {_EDGE_SQL},
reach(v, r) AS (
  SELECT DISTINCT v, v FROM edges
  UNION
  SELECT e.v, reach.r FROM edges e JOIN reach ON reach.v = e.w
)
SELECT v AS doc_id, MIN(r) AS canonical_id,
       CAST(MIN(r) = v AS BOOLEAN) AS is_canonical
FROM reach GROUP BY v""",
)
def dedup_components(spark, sf_dir):
    """Near-dup clusters via min-label propagation; keep min doc_id.

    Each round joins labels across edges and takes the min — the
    classic distributed connected-components loop (one shuffle per
    round, converges in O(cluster diameter) rounds).  The DuckDB
    oracle states the same fixpoint as a recursive reachability CTE.
    """
    edges = _jaccard_edges(spark, sf_dir).transform(pin)
    labels = edges.groupBy("v").agg(
        F.least(F.min("w"), F.col("v")).alias("lbl")
    )
    # rounds needed = max cluster diameter; near-dup clusters are
    # shallow, but an unconverged exit must fail loudly, never return
    # silently wrong labels (64 ≈ 4× the deepest chain ever observed)
    changed = -1
    for _ in range(64):
        nb = (
            edges.join(
                labels.select(F.col("v").alias("w"), F.col("lbl").alias("wlbl")),
                "w",
            )
            .groupBy("v")
            .agg(F.min("wlbl").alias("nlbl"))
        )
        new = (
            labels.join(nb, "v", "left")
            .select(
                "v",
                F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias(
                    "lbl"
                ),
            )
            .transform(pin)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "v")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels.unpersist()  # free the superseded round (no-op round 1)
        labels = new
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError("connected components did not converge in 64 rounds")
    return labels.select(
        F.col("v").alias("doc_id"),
        F.col("lbl").alias("canonical_id"),
        (F.col("lbl") == F.col("v")).alias("is_canonical"),
    )


# ----------------------------------------------------------- decontamination

# 4-word grams here (real corpora use 8-13-gram windows; width only
# changes the explode factor, not the plan shape)
_NGRAM_W = 4

_GRAMS_SQL = f"""grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    generate_series(1, len(string_split(text, ' ')) - {_NGRAM_W - 1}),
    i -> array_to_string(string_split(text, ' ')[i:i+{_NGRAM_W - 1}], ' ')))) AS gram
  FROM documents
)"""


@register(
    "pipeline_decontaminate",
    f"""WITH {_GRAMS_SQL},
ev AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0)
SELECT g.doc_id, CAST(count(DISTINCT g.gram) AS BIGINT) AS n_shared_grams
FROM grams g JOIN ev USING (gram)
WHERE g.doc_id % 50 != 0
GROUP BY g.doc_id""",
)
def pipeline_decontaminate(spark, sf_dir):
    """Train docs sharing any word 4-gram with the eval set.

    The eval gram set (docs with doc_id % 50 = 0 here; a benchmark
    suite in production) is orders of magnitude smaller than the
    corpus, so it broadcasts and the train side never shuffles.
    """
    docs = load(spark, sf_dir, "documents", spread=True)
    # split once per doc: the gram expression references the word
    # array four times, and Generate input is not CSE'd — inlining
    # split(text) would tokenize every document 4×
    words = docs.select("doc_id", F.split("text", " ").alias("w"))
    grams = words.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"CASE WHEN size(w) >= {_NGRAM_W} THEN"
                    f" transform(sequence(1, size(w) - {_NGRAM_W - 1}),"
                    f" i -> concat_ws(' ', slice(w, i, {_NGRAM_W})))"
                    " ELSE array() END"
                )
            )
        ).alias("gram"),
    )
    ev = (
        grams.filter(F.col("doc_id") % 50 == 0).select("gram").distinct()
    )
    return (
        grams.filter(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(ev), "gram")
        .groupBy("doc_id")
        # grams are array_distinct'ed per doc before the explode, so
        # (doc_id, gram) pairs are already unique — a plain count
        # avoids the count-distinct expand/dedup aggregate entirely
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


# -------------------------------------------------------------------- split

# holdout iff the first two hex chars of md5(text) sort below '1a'
# (26/256 ≈ 10.2%) — content-hash routing survives re-shards and
# re-ingests, unlike row-number splits
@register(
    "pipeline_train_split",
    """SELECT
  CASE WHEN substr(md5(text), 1, 2) < '1a' THEN 'holdout' ELSE 'train' END
    AS split,
  source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1, 2""",
)
def pipeline_train_split(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    split = F.when(F.substring(F.md5("text"), 1, 2) < "1a", "holdout").otherwise(
        "train"
    )
    return (
        docs.withColumn("split", split)
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# ------------------------------------------------------------------ packing

_PACK_TOKENS = 2048


@register(
    "pipeline_pack_sequences",
    f"""WITH toks AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok
  FROM documents
),
placed AS (
  SELECT source, n_tok,
         sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - n_tok AS off
  FROM toks
)
SELECT source, CAST(off // {_PACK_TOKENS} AS BIGINT) AS pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS pack_tokens
FROM placed GROUP BY source, off // {_PACK_TOKENS}""",
)
def pipeline_pack_sequences(spark, sf_dir):
    """Streaming sequential packing into {_PACK_TOKENS}-token windows.

    One window per shard (source) ordered by doc_id: each doc's pack
    is its starting token offset divided by the window size — the
    same assignment a single-pass packer writing shard files would
    make.  Per-shard windows parallelize across shards; no global
    ordering is ever needed.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = toks.withColumn("off", F.sum("n_tok").over(w) - F.col("n_tok"))
    return (
        placed.groupBy(
            "source", (F.col("off") / _PACK_TOKENS).cast("long").alias("pack_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("pack_tokens"),
        )
    )


# ------------------------------------------------------------- repetition

# Gopher-style intra-document repetition: the mass of duplicate
# 3-grams inside a doc (high → boilerplate/spam; filters of this
# family gate pretraining corpora).  Row-local arithmetic — no
# shuffle before the final projection.
@register(
    "text_repetition",
    """SELECT doc_id,
       round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
         AS rep_score
FROM (
  SELECT doc_id, list_transform(
    generate_series(1, len(string_split(text, ' ')) - 2),
    i -> string_split(text, ' ')[i] || ' ' ||
         string_split(text, ' ')[i+1] || ' ' ||
         string_split(text, ' ')[i+2]) AS grams
  FROM documents
  WHERE len(string_split(text, ' ')) >= 3
)""",
)
def text_repetition(spark, sf_dir):
    docs = load(spark, sf_dir, "documents", spread=True)
    grams = F.expr(
        "transform(sequence(0, size(split(text,' ')) - 3),"
        " i -> concat_ws(' ', split(text,' ')[i],"
        " split(text,' ')[i+1], split(text,' ')[i+2]))"
    )
    return (
        docs.filter(F.size(F.split("text", " ")) >= 3)
        .select(
            "doc_id",
            F.round(
                1.0
                - F.size(F.array_distinct(grams)).cast("double") / F.size(grams),
                6,
            ).alias("rep_score"),
        )
    )


# ------------------------------------------------------------- sampling

# deterministic stratified sample: per (lang, source) stratum keep
# the K docs with the smallest content hash — reproducible across
# runs and re-shards (hash order, not storage order), one window
# per stratum
_SAMPLE_K = 3


@register(
    "docs_stratified_sample",
    f"""SELECT lang, source, doc_id FROM (
  SELECT lang, source, doc_id,
         row_number() OVER (PARTITION BY lang, source
                            ORDER BY md5(text), doc_id) AS rn
  FROM documents
) WHERE rn <= {_SAMPLE_K}""",
)
def docs_stratified_sample(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(F.md5("text"), "doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _SAMPLE_K)
        .select("lang", "source", "doc_id")
    )


# ------------------------------------------------------------- chunking

# overlapping token windows (embedding / retrieval prep): 32-token
# chunks on a 16-token stride, each with its offset and content
# hash.  Pure explode — the fan-out factor is doc_len/stride, no
# shuffle until a consumer aggregates.
_CHUNK_TOKENS = 32
_CHUNK_STRIDE = 16


@register(
    "docs_chunk_windows",
    f"""SELECT doc_id, off, n_tok, md5(chunk) AS chunk_hash FROM (
  SELECT doc_id, ((i - 1) * {_CHUNK_STRIDE}) AS off,
         least(len(w) - (i - 1) * {_CHUNK_STRIDE}, {_CHUNK_TOKENS}) AS n_tok,
         array_to_string(w[(i - 1) * {_CHUNK_STRIDE} + 1 :
                           (i - 1) * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}], ' ')
           AS chunk
  FROM (
    SELECT doc_id, string_split(text, ' ') AS w,
           unnest(generate_series(
             1, greatest(1, cast(ceil((len(string_split(text, ' ')) -
                  {_CHUNK_TOKENS}) / CAST({_CHUNK_STRIDE} AS DOUBLE)) AS BIGINT) + 1)
           )) AS i
    FROM documents
  )
)""",
)
def docs_chunk_windows(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size(w) - _CHUNK_TOKENS) / float(_CHUNK_STRIDE)).cast("long")
        + 1,
    )
    exploded = docs.select(
        "doc_id",
        w.alias("w"),
        F.explode(F.sequence(F.lit(1), n_chunks)).alias("i"),
    )
    off = (F.col("i") - 1) * _CHUNK_STRIDE
    return exploded.select(
        "doc_id",
        off.alias("off"),
        F.least(F.size("w") - off, F.lit(_CHUNK_TOKENS)).alias("n_tok"),
        F.md5(F.concat_ws(" ", F.slice("w", off + 1, _CHUNK_TOKENS))).alias(
            "chunk_hash"
        ),
    )
