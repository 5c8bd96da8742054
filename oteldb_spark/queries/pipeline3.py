"""Training-data pipeline operators, round 3: PII redaction,
cross-document repeated-substring detection (Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better" — the
token-window variant), HyperLogLog distinct sketches, bigram-LM
cross-entropy quality scoring, deterministic domain-balanced
sampling, and char-trigram language identification.

Every gate is deterministic end-to-end (md5-derived hashes, integer
or quantized-integer aggregation) so the DuckDB oracle replays exact
values, not approximations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.hll import hll_estimate, hll_oracle_sql, hll_registers
from ..tables import load
from .registry import register

# --------------------------------------------------------------- PII redact

# Deterministic synthetic PII is injected per doc (the corpus itself is
# clean), then detected and redacted — the gate validates the scrubber
# machinery; both engines build identical dirty text.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PHONE_RE = r"\b555-\d{4}\b"

_DIRTY_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com from 10.0.' || CAST(doc_id % 200 AS VARCHAR)"
    " || '.7 call 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')"
)


@register(
    "pii_redact",
    f"""WITH dirty AS (
  SELECT doc_id, {_DIRTY_SQL} AS t FROM documents
),
red AS (
  SELECT doc_id,
         CAST(length(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_email,
         CAST(length(regexp_extract_all(t, '{_IP_RE}')) AS BIGINT) AS n_ip,
         CAST(length(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT) AS n_phone,
         regexp_replace(
           regexp_replace(
             regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
             '{_IP_RE}', '<IP>', 'g'),
           '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
  FROM dirty
)
SELECT doc_id, n_email, n_ip, n_phone, md5(redacted) AS red_hash
FROM red""",
)
def pii_redact(spark, sf_dir):
    """Regex PII scrub: detect counts + redact in place.  Pure
    column expressions — whole-stage codegen, no UDFs, trivially
    scan-parallel at 100 TB."""
    docs = load(spark, sf_dir, "documents")
    dirty = docs.select(
        "doc_id",
        F.expr(
            "concat(text, ' contact user', cast(doc_id as string),"
            " '@mail.example.com from 10.0.',"
            " cast(doc_id % 200 as string), '.7 call 555-01',"
            " lpad(cast(doc_id % 100 as string), 2, '0'))"
        ).alias("t"),
    )
    t = F.col("t")
    red = (
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(t, _EMAIL_RE, "<EMAIL>"),
                _IP_RE, "<IP>",
            ),
            _PHONE_RE, "<PHONE>",
        )
    )
    return dirty.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(_EMAIL_RE), F.lit(0)))
        .cast("long").alias("n_email"),
        F.size(F.regexp_extract_all(t, F.lit(_IP_RE), F.lit(0)))
        .cast("long").alias("n_ip"),
        F.size(F.regexp_extract_all(t, F.lit(_PHONE_RE), F.lit(0)))
        .cast("long").alias("n_phone"),
        F.md5(red).alias("red_hash"),
    )


# ------------------------------------------------- repeated token windows

# Lee et al. exact-substring dedup, token-window form: every K-token
# window is hashed; windows occurring in ≥2 distinct docs mark
# duplicated spans.  Linear in total tokens (each token enters K
# windows), one shuffle on window hash — the 100 TB shape (the
# suffix-array construction in the paper is the single-machine
# equivalent; window hashing is how it distributes).
_K = 8


@register(
    "dedup_repeated_windows",
    f"""WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
w AS (
  SELECT doc_id, md5(array_to_string(tk[i:i+{_K - 1}], ' ')) AS h
  FROM t, UNNEST(CASE WHEN len(tk) < {_K} THEN CAST([] AS BIGINT[])
                 ELSE range(1, len(tk) - {_K - 2}) END) AS u(i)
),
dup AS (
  SELECT h FROM w GROUP BY h HAVING count(DISTINCT doc_id) >= 2
),
per_doc AS (
  SELECT w.doc_id,
         count(*) AS n_win,
         count(*) FILTER (WHERE dup.h IS NOT NULL) AS n_dup
  FROM w LEFT JOIN dup ON w.h = dup.h
  GROUP BY w.doc_id
)
SELECT t.doc_id,
       CAST(coalesce(p.n_win, 0) AS BIGINT) AS n_win,
       CAST(coalesce(p.n_dup, 0) AS BIGINT) AS n_dup
FROM t LEFT JOIN per_doc p ON t.doc_id = p.doc_id""",
)
def dedup_repeated_windows(spark, sf_dir):
    docs = load(spark, sf_dir, "documents", spread=True)
    wins = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(split(text, ' ')) < {_K}"
                f" THEN array()"
                f" ELSE transform(sequence(0, size(split(text, ' ')) - {_K}),"
                f"      i -> array_join(slice(split(text, ' '), i + 1, {_K}), ' '))"
                f" END"
            )
        ).alias("win"),
    ).select("doc_id", F.md5("win").alias("h"))
    dup = (
        wins.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= 2)
        .select("h")
    )
    per_doc = (
        wins.join(dup.withColumn("_d", F.lit(1)), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_win"),
            F.count("_d").alias("n_dup"),
        )
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_win", F.lit(0)).cast("long").alias("n_win"),
        F.coalesce("n_dup", F.lit(0)).cast("long").alias("n_dup"),
    )


# --------------------------------------------------------- HyperLogLog

_HLL_REGS, _HLL_EST = hll_oracle_sql(
    "events", "user_id", ["event_type"]
)


@register("sketch_hll_registers", _HLL_REGS)
def sketch_hll_registers(spark, sf_dir):
    """Distinct users per event type — the register state itself
    (bucket → max rank), the mergeable 100 TB distinct structure."""
    ev = load(spark, sf_dir, "events")
    return hll_registers(ev, "user_id", ["event_type"])


@register("sketch_hll_estimate", _HLL_EST)
def sketch_hll_estimate(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    regs = hll_registers(ev, "user_id", ["event_type"])
    return hll_estimate(regs, ["event_type"])


# ------------------------------------------------- bigram LM cross-entropy

# Add-one–smoothed bigram LM trained on the corpus itself; each doc is
# scored with its total cross-entropy in µbits (quantized per-bigram to
# exact BIGINTs so the distributed sum is order-independent).  The
# classic LM-based quality filter (CCNet uses a KenLM 5-gram; the
# Spark shape — broadcast counts, join, integer fold — is the same).


@register(
    "text_bigram_xent",
    """WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
bi AS (
  SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
  FROM t, UNNEST(CASE WHEN len(tk) < 2 THEN CAST([] AS BIGINT[])
                 ELSE range(1, len(tk)) END) AS u(i)
),
c2 AS (SELECT w1, w2, count(*) AS c FROM bi GROUP BY w1, w2),
c1 AS (SELECT w1, count(*) AS c FROM bi GROUP BY w1),
v AS (SELECT count(DISTINCT w) AS v FROM (
        SELECT unnest(tk) AS w FROM t)),
scored AS (
  SELECT bi.doc_id,
         CAST(round(-log2((c2.c + 1.0) / (c1.c + v.v)) * 1000000)
              AS BIGINT) AS q
  FROM bi JOIN c2 ON bi.w1 = c2.w1 AND bi.w2 = c2.w2
         JOIN c1 ON bi.w1 = c1.w1
         CROSS JOIN v
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(q) AS BIGINT) AS xent_micro
FROM scored GROUP BY doc_id""",
)
def text_bigram_xent(spark, sf_dir):
    docs = load(spark, sf_dir, "documents", spread=True)
    # split ONCE per row into a projected column — referencing
    # split(text) inside the transform lambda re-tokenizes per
    # element (no CSE across lambda invocations), turning the explode
    # quadratic in document length
    bi = (
        docs.select("doc_id", F.split("text", " ").alias("tk"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "CASE WHEN size(tk) < 2 THEN array()"
                    " ELSE transform(sequence(0, size(tk) - 2),"
                    "      i -> struct(element_at(tk, i + 1) AS w1,"
                    "                  element_at(tk, i + 2) AS w2))"
                    " END"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    from pyspark.sql import Window as W

    # window counts instead of groupBy + self-join: the corpus is
    # scanned/exploded ONCE, then two shuffles (by bigram, by first
    # token) attach the counts — no join of the big side with itself
    v = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .agg(F.countDistinct("w").alias("v"))
    )
    scored = (
        bi.withColumn(
            "c2", F.count(F.lit(1)).over(W.partitionBy("w1", "w2"))
        )
        .withColumn("c1", F.count(F.lit(1)).over(W.partitionBy("w1")))
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.round(
                -F.log2((F.col("c2") + 1.0) / (F.col("c1") + F.col("v")))
                * 1_000_000
            ).cast("long").alias("q"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("q").cast("long").alias("xent_micro"),
    )


# --------------------------------------------- domain-balanced sampling

# Deterministic mixture balancing: undersample every source to the
# smallest source's count, picking docs by md5 rank (a seeded,
# replayable "random" order) — the data-mixture step of a training
# pipeline, exact-k per domain where hash-threshold sampling is only
# expected-k.


@register(
    "docs_balanced_sample",
    """WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rnk
  FROM documents
),
target AS (SELECT min(c) AS k FROM (
  SELECT count(*) AS c FROM documents GROUP BY source))
SELECT r.doc_id, r.source, CAST(r.rnk AS BIGINT) AS rnk
FROM ranked r CROSS JOIN target WHERE r.rnk <= target.k""",
)
def docs_balanced_sample(spark, sf_dir):
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = docs.select(
        "doc_id", "source", F.row_number().over(w).alias("rnk")
    )
    target = (
        docs.groupBy("source").count().agg(F.min("count").alias("k"))
    )
    return (
        ranked.crossJoin(F.broadcast(target))
        .filter(F.col("rnk") <= F.col("k"))
        .select("doc_id", "source", F.col("rnk").cast("long").alias("rnk"))
    )


# ------------------------------------------- content-defined chunking

# CDC (rolling-hash boundaries, the storage-dedup / training-shard
# trick): a Horner-rule polynomial hash over a sliding W-char window,
# cut where hash % DIV == 0.  Shift-resilient: inserting a byte only
# moves nearby boundaries, so near-identical docs share most chunk
# hashes — unlike fixed-size chunking.  Both engines run the identical
# integer recurrence (base 257 mod 2^31-1), so chunk sets replay
# exactly.
_CDC_W = 16
_CDC_B = 257
_CDC_M = 2_147_483_647
_CDC_DIV = 64


@register(
    "chunk_cdc_dedup",
    f"""WITH ch AS (
  SELECT doc_id, string_split(text, '') AS cs, length(text) AS n
  FROM documents
),
cuts AS (
  SELECT doc_id, n,
         list_filter(
           list_transform(range(1, greatest(n - {_CDC_W} + 2, 1)),
             i -> CASE WHEN list_reduce(
                        list_concat([0::BIGINT],
                          list_transform(cs[i:i+{_CDC_W - 1}],
                                         c -> ascii(c)::BIGINT)),
                        (acc, c) -> (acc * {_CDC_B} + c) % {_CDC_M})
                        % {_CDC_DIV} = 0
                  THEN i + {_CDC_W} - 1 ELSE NULL END),
           x -> x IS NOT NULL) AS cut
  FROM ch
),
spans AS (
  SELECT doc_id, n,
         list_concat([0], list_concat(cut, [CAST(n AS BIGINT)])) AS b
  FROM cuts
),
chunks AS (
  SELECT doc_id,
         md5(substr(d.text, CAST(b[j] + 1 AS INT),
                    CAST(b[j+1] - b[j] AS INT))) AS h
  FROM spans JOIN documents d USING (doc_id),
       UNNEST(range(1, len(b))) AS u(j)
  WHERE b[j+1] > b[j]
),
dup AS (SELECT h FROM chunks GROUP BY h HAVING count(DISTINCT doc_id) >= 2)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(*) FILTER (WHERE dup.h IS NOT NULL) AS BIGINT) AS n_dup
FROM chunks c LEFT JOIN dup ON c.h = dup.h
GROUP BY c.doc_id""",
)
def chunk_cdc_dedup(spark, sf_dir):
    docs = load(spark, sf_dir, "documents", spread=True)
    w, b, m, div = _CDC_W, _CDC_B, _CDC_M, _CDC_DIV

    # Rolling hashes over every W-char window via Arrow-batched numpy
    # (one of the few justified UDF spots: a per-position Horner fold
    # in Catalyst higher-order functions costs ~1µs/element — numpy
    # vectorizes the same 16-step recurrence across all positions).
    # Intermediate magnitude stays < 2^43, exact in int64.
    def cut_chunks(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_doc, out_hash = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n = len(text)
                codes = np.frombuffer(text.encode("latin-1", "replace"),
                                      dtype=np.uint8).astype(np.int64)
                if n >= w:
                    h = np.zeros(n - w + 1, dtype=np.int64)
                    for j in range(w):
                        h = (h * b + codes[j : j + n - w + 1]) % m
                    # window-end offsets of dividing hashes
                    cuts = (np.nonzero(h % div == 0)[0] + w).tolist()
                else:
                    cuts = []
                bounds = [0, *cuts, n]
                for lo, hi in zip(bounds, bounds[1:]):
                    if hi > lo:
                        out_doc.append(doc_id)
                        out_hash.append(
                            hashlib.md5(
                                text[lo:hi].encode()
                            ).hexdigest()
                        )
            yield pd.DataFrame({"doc_id": out_doc, "h": out_hash})

    par = spark.sparkContext.defaultParallelism
    from ..operators.pin import pin

    chunks = (
        docs.select("doc_id", "text")
        # small local files arrive as one split; spread the batches so
        # the vectorized workers run wide (at scale the file splits
        # provide this and the repartition collapses to a no-op cost)
        .repartition(par)
        .mapInPandas(cut_chunks, "doc_id long, h string")
    )
    # pin: chunks feeds BOTH the dup-hash aggregate and the join left
    # side — unpinned, the whole text-shipping Arrow chunker ran twice
    # (union-branch recompute); the pinned rows are (long, 32-char
    # hash), far smaller than the texts they derive from.  Found by
    # the r10 ×64 scaling point (320k docs): last-decade ratio 4.3×
    # for 4× rows unpinned, back under 4× pinned.
    chunks = pin(chunks)
    dup = (
        chunks.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    return (
        chunks.join(dup.withColumn("_d", F.lit(1)), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.count("_d").cast("long").alias("n_dup"),
        )
    )


# ------------------------------------------- weighted sampling (A-ES)

# Efraimidis–Spirakis weighted reservoir: key = u^(1/w) with a
# deterministic md5-derived u, take the global top-K by key.  Longer
# docs (weight = n_chars) are proportionally more likely — the
# standard "sample by importance" primitive.  Distributed shape:
# per-partition top-K then merge (Spark's sort-limit does exactly
# that); no full sort materialization at 100 TB.
_AES_K = 64


@register(
    "docs_weighted_sample",
    f"""WITH keyed AS (
  SELECT doc_id, n_chars,
         ln(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT)
            / 4503599627370496.0) / n_chars AS logkey
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
FROM keyed ORDER BY logkey DESC, doc_id LIMIT {_AES_K}""",
)
def docs_weighted_sample(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    # u ∈ (0,1) from a 52-bit md5 prefix; rank by log(u)/w — the
    # monotone-equivalent form of u^(1/w) that avoids pow precision
    u = F.expr(
        "cast(conv(substr(md5(cast(doc_id as string)), 1, 13), 16, 10)"
        " as bigint) / 4503599627370496.0"
    )
    keyed = docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        (F.log(u) / F.col("n_chars")).alias("logkey"),
    )
    return (
        keyed.orderBy(F.col("logkey").desc(), "doc_id")
        .limit(_AES_K)
        .select("doc_id", "n_chars")
    )


# ------------------------------------------------------- language ID

# Char-trigram language identification: per-language profiles (top-N
# trigrams by frequency from the labeled corpus) scored against each
# doc's trigrams; prediction = argmax overlap, ties broken lexically.
# Integer counts end-to-end.  (The shared-wordlist testdata makes the
# labels uninformative — the gate certifies the MACHINERY: profile
# build, broadcast join, argmax — which is what transfers to real
# corpora; COVERAGE.md documents the constraint.)
_TOP_N = 40


@register(
    "text_langid_trigram",
    f"""WITH tri AS (
  SELECT doc_id, lang, substr(text, i, 3) AS g
  FROM documents, UNNEST(CASE WHEN length(text) < 3 THEN CAST([] AS BIGINT[])
                         ELSE range(1, length(text) - 1) END) AS u(i)
),
prof AS (
  SELECT lang, g FROM (
    SELECT lang, g, row_number() OVER (
      PARTITION BY lang ORDER BY count(*) DESC, g) AS rnk
    FROM tri GROUP BY lang, g
  ) WHERE rnk <= {_TOP_N}
),
scores AS (
  SELECT t.doc_id, p.lang AS cand, count(*) AS score
  FROM tri t JOIN prof p ON t.g = p.g
  GROUP BY t.doc_id, p.lang
)
SELECT doc_id, cand AS pred_lang, CAST(score AS BIGINT) AS score
FROM (
  SELECT doc_id, cand, score, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, cand) AS rnk
  FROM scores
) WHERE rnk = 1""",
)
def text_langid_trigram(spark, sf_dir):
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents", spread=True)
    tri = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "CASE WHEN length(text) < 3 THEN array()"
                " ELSE transform(sequence(1, length(text) - 2),"
                "      i -> substring(text, i, 3)) END"
            )
        ).alias("g"),
    )
    from ..operators.pin import pin

    tri = pin(tri)  # consumed by both the profile build and scoring
    prof = (
        tri.groupBy("lang", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "rnk",
            F.row_number().over(
                W.partitionBy("lang").orderBy(F.col("c").desc(), "g")
            ),
        )
        .filter(F.col("rnk") <= _TOP_N)
        .select(F.col("lang").alias("cand"), "g")
    )
    scores = (
        tri.join(F.broadcast(prof), "g")
        .groupBy("doc_id", "cand")
        .agg(F.count(F.lit(1)).alias("score"))
    )
    best = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.col("score").desc(), "cand")
    )
    return (
        scores.withColumn("rnk", best)
        .filter(F.col("rnk") == 1)
        .select(
            "doc_id",
            F.col("cand").alias("pred_lang"),
            F.col("score").cast("long").alias("score"),
        )
    )


# ------------------------------------------------------- Gopher rules
# Rule-based document filtering (Rae et al. 2021 "Scaling Language
# Models" §A.1.1 — the standard pre-training curation rule set): word
# count bounds, mean word length bounds, symbol-to-word ratio,
# alphabetic-word ratio, minimum distinct stop-word hits.  Pure
# per-row codegen column math — no shuffle, no UDF; at 100 TB this is
# a single map-side pass over the scan.
_GOPHER_STOPS = "('the', 'be', 'to', 'of', 'and', 'that', 'have', 'with', 'a', 'in')"


@register(
    "docs_gopher_rules",
    f"""SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       round(mean_word_len, 6) AS mean_word_len,
       round(alpha_ratio, 6) AS alpha_ratio,
       CAST(stop_hits AS BIGINT) AS stop_hits,
       CAST(CASE WHEN n_words BETWEEN 50 AND 100000
                  AND mean_word_len BETWEEN 3 AND 10
                  AND alpha_ratio >= 0.8
                  AND stop_hits >= 2 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_words,
         CAST(length(replace(text, ' ', '')) AS DOUBLE)
           / len(string_split(text, ' ')) AS mean_word_len,
         CAST(len(list_filter(string_split(text, ' '),
                  w -> regexp_matches(w, '[a-zA-Z]'))) AS DOUBLE)
           / len(string_split(text, ' ')) AS alpha_ratio,
         len(list_distinct(list_filter(string_split(text, ' '),
                  w -> w IN {_GOPHER_STOPS}))) AS stop_hits
  FROM documents)""",
)
def docs_gopher_rules(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_words = F.size(words)
    mean_word_len = (
        F.length(F.replace("text", F.lit(" "), F.lit(""))).cast("double")
        / n_words
    )
    alpha_ratio = (
        F.expr(
            "size(filter(split(text, ' '), w -> w rlike '[a-zA-Z]'))"
        ).cast("double")
        / n_words
    )
    stop_hits = F.size(
        F.array_distinct(
            F.expr(f"filter(split(text, ' '), w -> w IN {_GOPHER_STOPS})")
        )
    )
    keep = (
        n_words.between(50, 100000)
        & mean_word_len.between(3, 10)
        & (alpha_ratio >= 0.8)
        & (stop_hits >= 2)
    )
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        stop_hits.cast("long").alias("stop_hits"),
        keep.cast("long").alias("keep"),
    )


# ---------------------------------------------------------------------------
# The REMOVAL step of ExactSubstr dedup (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better"): dedup_repeated_windows
# counts cross-document duplicated K-token windows; this gate emits the
# actionable output — per doc, the MERGED token intervals covered by any
# such window (classic gaps-and-islands interval union), i.e. exactly
# the spans a curation run cuts.  Plan shape: the window explode and
# dup-hash groupBy from the detection gate, one window function per doc
# for the island ids, one final groupBy — all data-scale work is the
# same two shuffles the detection pays; the interval merge is
# output-scale (flagged windows only).
# shared oracle CTEs: tokenized docs -> duplicated K-windows ->
# per-doc merged islands (grp carries the island id per flagged window)
_EXACT_SUBSTR_GRP_CTES = f"""t AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
w AS (
  SELECT doc_id, i, md5(array_to_string(tk[i:i+{_K - 1}], ' ')) AS h
  FROM t, UNNEST(CASE WHEN len(tk) < {_K} THEN CAST([] AS BIGINT[])
                 ELSE range(1, len(tk) - {_K - 2}) END) AS u(i)
),
dup AS (
  SELECT h FROM w GROUP BY h HAVING count(DISTINCT doc_id) >= 2
),
flagged AS (
  SELECT w.doc_id, w.i AS s, w.i + {_K} AS e
  FROM w JOIN dup USING (h)
),
isl AS (
  SELECT doc_id, s, e,
         CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) >= s
              THEN 0 ELSE 1 END AS brk
  FROM flagged
),
grp AS (
  SELECT doc_id, s, e,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM isl
)"""


def exact_substr_cut_intervals(docs):
    """Merged [cut_start, cut_end) token intervals (1-based) covered by
    any cross-document duplicated K-window in ``docs`` (doc_id, text) —
    the shared core of the cuts report and the removal gate."""
    from pyspark.sql import Window as W

    wins = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(split(text, ' ')) < {_K}"
                f" THEN array()"
                f" ELSE transform(sequence(1, size(split(text, ' ')) - {_K - 1}),"
                f"      i -> struct(i AS i,"
                f"        md5(array_join(slice(split(text, ' '), i, {_K}), ' ')) AS h))"
                f" END"
            )
        ).alias("g"),
    ).select("doc_id", F.col("g.i").alias("s"), F.col("g.h").alias("h"))
    dup = (
        wins.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= 2)
        .select("h")
    )
    flagged = wins.join(dup, "h").select(
        "doc_id", "s", (F.col("s") + F.lit(_K)).alias("e")
    )
    w_doc = W.partitionBy("doc_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        w_doc.rowsBetween(W.unboundedPreceding, -1)
    )
    brk = F.when(prev_max_e >= F.col("s"), F.lit(0)).otherwise(F.lit(1))
    grp = flagged.withColumn("brk", brk).withColumn(
        "island",
        F.sum("brk").over(w_doc.rowsBetween(W.unboundedPreceding, 0)),
    )
    return grp.groupBy("doc_id", "island").agg(
        F.min("s").cast("long").alias("cut_start"),
        F.max("e").cast("long").alias("cut_end"),
    ).select("doc_id", "cut_start", "cut_end")


@register(
    "dedup_exact_substr_cuts",
    f"""WITH {_EXACT_SUBSTR_GRP_CTES}
SELECT doc_id, CAST(min(s) AS BIGINT) AS cut_start,
       CAST(max(e) AS BIGINT) AS cut_end,
       CAST(max(e) - min(s) AS BIGINT) AS n_tokens_cut
FROM grp GROUP BY doc_id, island""",
)
def dedup_exact_substr_cuts(spark, sf_dir):
    """Merged cut intervals: [cut_start, cut_end) in 1-based token
    positions; overlapping or touching flagged windows coalesce."""
    docs = load(spark, sf_dir, "documents", spread=True)
    return exact_substr_cut_intervals(docs).select(
        "doc_id",
        "cut_start",
        "cut_end",
        (F.col("cut_end") - F.col("cut_start")).cast("long").alias("n_tokens_cut"),
    )


def exact_substr_apply(docs):
    """The REMOVAL step applied as data (Lee et al. 2022 §4: drop the
    duplicated spans, keep the rest): re-emit every document with the
    tokens inside any merged cut interval removed and the survivors
    re-joined.  Detection pays the same two data-scale shuffles as the
    cuts report; the apply side is one left join of the corpus against
    the OUTPUT-SCALE per-doc interval lists (collect_list over merged
    islands — bounded by tokens/K per doc) and a codegen'd HOF filter,
    so the reassembly adds no new data-scale shuffle."""
    ivs = (
        exact_substr_cut_intervals(docs)
        .groupBy("doc_id")
        .agg(
            F.collect_list(F.struct("cut_start", "cut_end")).alias("__ivs")
        )
    )
    kept = F.expr(
        "filter(transform(split(text, ' '), (w, i) ->"
        " struct(i + 1 AS pos, w AS w)),"
        " s -> __ivs IS NULL OR NOT exists(__ivs,"
        " v -> s.pos >= v.cut_start AND s.pos < v.cut_end))"
    )
    return (
        docs.join(ivs, "doc_id", "left")
        .withColumn("__kept", kept)
        .select(
            "doc_id",
            F.array_join(F.expr("transform(__kept, s -> s.w)"), " ").alias(
                "cleaned_text"
            ),
            F.size("__kept").cast("long").alias("n_tokens_kept"),
        )
    )


@register(
    "dedup_exact_substr_apply",
    f"""WITH {_EXACT_SUBSTR_GRP_CTES},
cuts AS (
  SELECT doc_id, min(s) AS cs, max(e) AS ce
  FROM grp GROUP BY doc_id, island
),
tok AS (
  SELECT doc_id, i, tk[i] AS tok
  FROM t, UNNEST(generate_series(1, len(tk))) AS u(i)
),
kept AS (
  SELECT tok.doc_id, tok.i, tok.tok FROM tok
  WHERE NOT EXISTS (
    SELECT 1 FROM cuts c
    WHERE c.doc_id = tok.doc_id AND tok.i >= c.cs AND tok.i < c.ce)
)
SELECT t.doc_id,
       coalesce(array_to_string(list(k.tok ORDER BY k.i)
                FILTER (WHERE k.tok IS NOT NULL), ' '), '') AS cleaned_text,
       CAST(count(k.tok) AS BIGINT) AS n_tokens_kept
FROM t LEFT JOIN kept k USING (doc_id)
GROUP BY t.doc_id""",
)
def dedup_exact_substr_apply(spark, sf_dir):
    """detect -> merge -> REMOVE, end to end: the cleaned corpus as
    data (every doc re-emitted; docs fully covered by cuts come back
    empty), completing the Lee et al. pipeline."""
    docs = load(spark, sf_dir, "documents", spread=True)
    return exact_substr_apply(docs)
