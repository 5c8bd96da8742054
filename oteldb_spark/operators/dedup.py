"""Scalable near-duplicate detection: MinHash + LSH banding, SimHash.

These are the 100 TB paths for what dedup_ngram_jaccard does exactly:
instead of a quadratic shingle self-join, MinHash compresses each doc
to a k-component signature and LSH banding only pairs docs that
collide in at least one band — candidate volume scales with true
near-dup density, not n².

All hashing is a portable md5→int64 construction (identical in Spark
and DuckDB), so driver oracles can replay the exact computation:

    base  = int64(md5(token)[0:15 hex])  mod P      (P = 2^31 - 1)
    h_i   = (A_i * base + B_i) mod P                (k permutations)
    sig_i = min over doc's distinct shingles

Plan shape: shingle explode (narrow) → one groupBy(doc, i) for
signatures → band self-join on (band, band-signature) → per-pair
component-agreement estimate.  No UDFs — everything is codegen'd
expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

P = 2_147_483_647  # 2^31 - 1
K = 16  # minhash permutations
BANDS = 4  # → 4 rows per band
ROWS = K // BANDS

# fixed permutation constants (odd multipliers, arbitrary offsets)
A = [2 * i + 1 for i in range(1, K + 1)]
B = [(7919 * i + 104729) % P for i in range(K)]


def _hash_expr(col_name: str) -> Column:
    return F.expr(f"cast(conv(substr(md5({col_name}), 1, 15), 16, 10) as bigint)")


def shingles(text_col: str, n: int = 3) -> Column:
    """Distinct n-word shingles of a text column (n=3)."""
    w = f"split({text_col}, ' ')"
    return F.expr(
        f"CASE WHEN size({w}) >= {n} THEN array_distinct(transform("
        f"sequence(0, size({w}) - {n}),"
        f" i -> concat_ws(' ', {w}[i], {w}[i+1], {w}[i+2])))"
        f" ELSE array() END"
    )


def minhash_vector(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, sigv[K]) — MinHash signature vector per document.

    One md5 per distinct shingle, K cheap affine hashes as sibling
    columns, and a single groupBy(doc) with K ``min`` aggregates —
    map-side partial aggregation, no K× row fan-out.  Input is spread
    across the cluster first: small document tables often arrive as
    one file → one partition, which would serialize the hash work."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    sh = docs.repartition(par).select(
        F.col(id_col).alias("doc"), F.explode(shingles(text_col)).alias("shingle")
    )
    base = (_hash_expr("shingle") % P).alias("base")
    hashed = sh.select("doc", base)
    mins = [
        F.min(F.expr(f"({A[i]} * base + {B[i]}) % {P}")).alias(f"h{i}")
        for i in range(K)
    ]
    collapsed = hashed.groupBy("doc").agg(*mins)
    return collapsed.select(
        "doc", F.array(*[F.col(f"h{i}") for i in range(K)]).alias("sigv")
    )


def minhash_signatures(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, i, sig) — long-form MinHash signatures (posexplode of the
    vector form)."""
    vecs = minhash_vector(docs, id_col, text_col)
    return vecs.select("doc", F.posexplode("sigv").alias("i", "sig"))


def lsh_candidate_pairs(
    sigs: DataFrame, threshold_components: int = 8
) -> DataFrame:
    """Band the signatures and emit candidate pairs with an agreement
    count (how many of the K components match).  Pairs sharing any
    band collide; the estimate filters false positives.

    Plan: accepts either the long form (doc, i, sig) or the vector
    form (doc, sigv); the vector is checkpointed so the expensive
    shingle→hash→min lineage runs once, then banded (narrow explode)
    and self-joined per band; agreement compares the two K-vectors
    directly — no per-component re-join."""
    if "sigv" in sigs.columns:
        vecs = sigs
    else:
        vecs = sigs.groupBy("doc").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "sig"))), lambda s: s["sig"]
            ).alias("sigv")
        )
    from .pin import pin

    vecs = pin(vecs)
    banded = vecs.select(
        "doc",
        "sigv",
        F.explode(F.sequence(F.lit(0), F.lit(BANDS - 1))).alias("band"),
    ).withColumn(
        "band_sig",
        F.concat_ws(
            ",",
            F.transform(
                F.slice(F.col("sigv"), F.col("band") * ROWS + 1, ROWS),
                lambda v: v.cast("string"),
            ),
        ),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    agree_col = F.size(
        F.filter(
            F.zip_with(F.col("a.sigv"), F.col("b.sigv"), lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            agree_col.alias("agree"),
        )
        .distinct()
    )
    return cand.filter(F.col("agree") >= threshold_components)


MINHASH_ORACLE_CTES = f"""shingled AS (
  SELECT doc_id AS doc, unnest(list_distinct(list_transform(
           generate_series(1, len(string_split(text, ' ')) - 2),
           i -> string_split(text, ' ')[i] || ' ' ||
                string_split(text, ' ')[i+1] || ' ' ||
                string_split(text, ' ')[i+2]))) AS shingle
  FROM documents
),
hashed AS (
  SELECT doc, CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) % {P} AS base
  FROM shingled
),
perms AS (
  SELECT i,
         (2 * (i + 1) + 1) AS a,
         (7919 * i + 104729) % {P} AS b
  FROM (SELECT range AS i FROM range(0, {K}, 1))
),
sigs AS (
  SELECT doc, i, min((a * base + b) % {P}) AS sig
  FROM hashed CROSS JOIN perms
  GROUP BY doc, i
),
banded AS (
  SELECT doc, i // {ROWS} AS band,
         string_agg(CAST(sig AS VARCHAR), ',' ORDER BY i) AS band_sig
  FROM sigs GROUP BY doc, i // {ROWS}
),
cand AS (
  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc < b.doc
)"""


# --- SimHash -----------------------------------------------------------------


def simhash64(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over word tokens: bit j of the fingerprint is 1
    iff the sum over tokens of ±1 (by token-hash bit j) is positive.

    The 60 per-bit vote counters are 60 codegen'd conditional SUMs in
    ONE groupBy(doc) — no 60× row fan-out and no second shuffle (the
    previous shape exploded j=0..59 per token: tokens×60 rows through
    a (doc, j) aggregate, then re-grouped by doc).  Map-side partial
    aggregation reduces each partition to |docs|×60 counters before
    the single doc-keyed exchange, so the shuffle volume is
    fingerprint-sized, not token-sized — the shape that matters at
    100 TB."""
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.expr(f"array_distinct(split({text_col}, ' '))")).alias("tok"),
    )
    h = toks.withColumn("h", _hash_expr("tok"))
    votes = [
        F.sum(
            F.expr(f"CASE WHEN (h >> {j}) % 2 = 1 THEN 1 ELSE -1 END")
        ).alias(f"v{j}")
        for j in range(60)
    ]
    fp_bits = " + ".join(
        f"CASE WHEN v{j} > 0 THEN {1 << j}L ELSE 0L END" for j in range(60)
    )
    return (
        h.groupBy("doc")
        .agg(*votes)
        .select("doc", F.expr(fp_bits).alias("simhash"))
    )


SIMHASH_ORACLE_CTES = """toks AS (
  SELECT doc_id AS doc, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents
),
hashed AS (
  SELECT doc, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM toks
),
bits AS (
  SELECT doc, j, sum(CASE WHEN (h >> j) % 2 = 1 THEN 1 ELSE -1 END) AS v
  FROM hashed CROSS JOIN (SELECT range AS j FROM range(0, 60, 1))
  GROUP BY doc, j
),
fps AS (
  SELECT doc, CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)
           AS BIGINT) AS simhash
  FROM bits GROUP BY doc
)"""


def simhash_near_pairs(fps: DataFrame, max_hamming: int = 4) -> DataFrame:
    """All pairs within ``max_hamming`` of the 60-bit fingerprint via
    pigeonhole band blocking — EXACT, no cross join.

    Split the fingerprint into ``max_hamming + 1`` bands of 12 bits:
    a pair that differs in at most ``max_hamming`` bits cannot differ
    in every band, so it agrees EXACTLY on >= 1 band and surfaces in
    an equi-join on (band, band_bits).  Candidate volume scales with
    band collisions (true near-dups + a thin random-collision tail at
    2^-12 per band), not with n^2; the exact hamming filter then
    removes false positives and ``distinct`` folds multi-band
    collisions.  Same answer as the brute-force pair join the oracle
    runs.
    """
    from .pin import pin

    # fingerprints are |docs|-sized (output-scale): pin them so the
    # self-join reads the aggregate once — unpinned, BOTH join sides
    # re-run the whole token aggregation from the scan (the broadcast
    # side too), doubling the gate's data-scale work
    fps = pin(fps, small=True)
    n_bands = max_hamming + 1
    width = 60 // n_bands
    banded = fps.select(
        "doc",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).withColumn(
        "band_bits",
        F.expr(f"(simhash >> (band * {width})) & {(1 << width) - 1}"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_bits") == F.col("b.band_bits"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash128(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """120-bit SimHash as two independent 60-bit halves (md5 hex chars
    1-15 and 17-31 of each token — the first half is EXACTLY
    :func:`simhash64`'s hash, so the 60-bit tier is a prefix of this
    one).  Same single-shuffle shape as simhash64: 120 conditional
    SUMs in one groupBy(doc)."""
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.expr(f"array_distinct(split({text_col}, ' '))")).alias("tok"),
    )
    h = toks.select(
        "doc",
        _hash_expr("tok").alias("h1"),
        F.expr(
            "cast(conv(substr(md5(tok), 17, 15), 16, 10) as bigint)"
        ).alias("h2"),
    )
    votes = [
        F.sum(
            F.expr(f"CASE WHEN (h{k} >> {j}) % 2 = 1 THEN 1 ELSE -1 END")
        ).alias(f"v{k}_{j}")
        for k in (1, 2)
        for j in range(60)
    ]
    fp = {
        k: " + ".join(
            f"CASE WHEN v{k}_{j} > 0 THEN {1 << j}L ELSE 0L END"
            for j in range(60)
        )
        for k in (1, 2)
    }
    return (
        h.groupBy("doc")
        .agg(*votes)
        .select("doc", F.expr(fp[1]).alias("f1"), F.expr(fp[2]).alias("f2"))
    )


# 5 pigeonhole bands of 24 bits over the 120-bit (f1 | f2<<60)
# fingerprint: bands 0-1 inside f1, band 2 straddles (f1 top 12 bits |
# f2 low 12), bands 3-4 inside f2 — same shift/mask spelling in Spark
# and DuckDB
SIMHASH120_BAND_EXPRS = [
    "f1 & 16777215",
    "(f1 >> 24) & 16777215",
    "((f1 >> 48) & 4095) | ((f2 & 4095) * 4096)",
    "(f2 >> 12) & 16777215",
    "(f2 >> 36) & 16777215",
]

SIMHASH_TIER_ROWS = 32_000  # ≤ this many docs → 60-bit tier

# DuckDB replay of the ADAPTIVE pairs semantics: brute-force pair join
# over the tier fingerprint, with the tier picked by the same count
# formula in a scalar-subquery CASE.  Below the tier threshold this
# reduces exactly to the fixed 60-bit oracle (f2 contributes zero), so
# every fixture SF (500/500/5000 docs) hash-matches the historic
# fixed-tier gate byte for byte.  Shared by the primary
# ``dedup_simhash_pairs`` gate (adaptive since r13) and the
# ``dedup_simhash_adaptive_pairs`` certification gate — defined here,
# NOT in a queries module, so neither import perturbs the static
# registry order.
SIMHASH_ADAPTIVE_ORACLE = f"""WITH nn AS (
  SELECT count(*) AS n FROM documents
),
toks AS (
  SELECT doc_id AS doc, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents
),
hashed AS (
  SELECT doc,
         CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h1,
         CAST('0x' || substr(md5(tok), 17, 15) AS BIGINT) AS h2
  FROM toks
),
bits AS (
  SELECT doc, j,
         sum(CASE WHEN (h1 >> j) % 2 = 1 THEN 1 ELSE -1 END) AS v1,
         sum(CASE WHEN (h2 >> j) % 2 = 1 THEN 1 ELSE -1 END) AS v2
  FROM hashed CROSS JOIN (SELECT range AS j FROM range(0, 60, 1))
  GROUP BY doc, j
),
fps AS (
  SELECT doc,
         CAST(sum(CASE WHEN v1 > 0 THEN (CAST(1 AS BIGINT) << j)
                  ELSE 0 END) AS BIGINT) AS f1,
         CAST(sum(CASE WHEN v2 > 0 THEN (CAST(1 AS BIGINT) << j)
                  ELSE 0 END) AS BIGINT) AS f2
  FROM bits GROUP BY doc
)
SELECT a.doc AS doc_a, b.doc AS doc_b,
       CAST(bit_count(xor(a.f1, b.f1))
            + CASE WHEN (SELECT n FROM nn) <= {SIMHASH_TIER_ROWS} THEN 0
                   ELSE bit_count(xor(a.f2, b.f2)) END AS BIGINT) AS hamming
FROM fps a JOIN fps b ON a.doc < b.doc
WHERE bit_count(xor(a.f1, b.f1))
      + CASE WHEN (SELECT n FROM nn) <= {SIMHASH_TIER_ROWS} THEN 0
             ELSE bit_count(xor(a.f2, b.f2)) END <= 4"""


def simhash_adaptive_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 4,
    tier_rows: int = SIMHASH_TIER_ROWS,
) -> DataFrame:
    """Scale-adaptive SimHash near-dup pairs: the fingerprint WIDTH
    steps with corpus size — 60-bit (5×12-bit pigeonhole bands) up to
    ``tier_rows`` docs, 120-bit (5×24-bit bands) above.

    Fixed-precision banding has the same physics as fixed-plane LSH:
    random band collisions scale ~N²/2^band_bits, so a FIXED 12-bit
    band saturates as N grows (SCALING_r12 measured the fixed tier at
    29s on the ×64 axis, candidate volume ~5·N²/4096).  Doubling the
    fingerprint to 120 bits takes bands to 24 bits: the random tail
    drops 2^12× while true near-dups (small hamming distance) still
    agree on ≥1 band by pigeonhole.  One cheap count picks the tier —
    the DuckDB oracle evaluates the same formula in a scalar-subquery
    CASE, so the driver hash-checks the adaptive semantics themselves
    (the pattern certified for ann_lsh_adaptive_pairs in r11)."""
    from .pin import pin

    n = docs.count()
    if n <= tier_rows:
        return simhash_near_pairs(
            simhash64(docs, id_col, text_col), max_hamming
        )
    fps = pin(simhash128(docs, id_col, text_col), small=True)
    banded = fps.select(
        "doc",
        "f1",
        "f2",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"), F.expr(e).alias("bucket")
                    )
                    for i, e in enumerate(SIMHASH120_BAND_EXPRS)
                ]
            )
        ).alias("bb"),
    ).select("doc", "f1", "f2", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.expr("bit_count(a.f1 ^ b.f1) + bit_count(a.f2 ^ b.f2)")
            .cast("long")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def jaccard_prefix_join(
    sh: "DataFrame", tau: float, doc_col: str = "doc", gram_col: str = "gram"
) -> "DataFrame":
    """EXACT all-pairs Jaccard >= tau via prefix filtering — the
    AllPairs/PPJoin candidate generation (Bayardo et al. WWW'07,
    public algorithm): order each doc's grams by ascending global
    document frequency (rarest first, ties by gram), keep only the
    first ``n - ceil(tau*n) + 1`` grams as the doc's PREFIX, and join
    prefixes on shared grams.  Two docs with J >= tau MUST collide on
    a prefix gram under a shared total order, so the join is lossless;
    candidate volume scales with rare-gram co-occurrence instead of
    frequent-gram blowup (a stopword shingle shared by every doc
    contributes nothing unless it IS someone's prefix).  The length
    filter |B| >= tau*|A| prunes further.  Verification computes the
    exact overlap via per-doc sorted gram arrays (bounded by document
    length, Arrow-free `array_intersect` in codegen).

    Input: distinct (doc, gram) rows.  Output: (doc_a, doc_b, jaccard)
    for every pair with jaccard >= tau, doc_a < doc_b.
    """
    from pyspark.sql import Window

    from .pin import pin

    # the gram table feeds four branches (sizes, freq, rank, arrays) —
    # pin it so the upstream tokenize/explode runs once
    sh = pin(sh)
    doc = F.col(doc_col)
    sizes = sh.groupBy(doc_col).agg(F.count(F.lit(1)).alias("n"))
    freq = sh.groupBy(gram_col).agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        sh.join(freq, gram_col)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy(doc_col).orderBy("df", gram_col)
            ),
        )
        .join(sizes, doc_col)
    )
    # all ceil/threshold expressions subtract a tiny epsilon first:
    # tau*n is computed in binary floating point, and at exact
    # boundaries (tau=0.2, n=30 -> 6.000000000000001) a raw ceil
    # overshoots and wrongly prunes true pairs.  The epsilon only ever
    # ADMITS borderline candidates (the exact verify still decides).
    eps = F.lit(1e-6)
    # both join sides read the same ranked-prefix table — pin it so
    # the df join + per-doc window rank run once, not per side
    prefix = pin(
        ranked.filter(
            F.col("rk")
            <= F.col("n") - F.ceil(F.lit(tau) * F.col("n") - eps) + 1
        ).select(doc_col, gram_col, "n", "rk")
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    # positional filter (PPJoin): a shared gram at positions rk_a/rk_b
    # bounds the possible overlap by 1 + min(remaining grams on each
    # side); pairs that cannot reach the required overlap
    # ceil(tau*(n_a+n_b)/(1+tau)) are pruned before the distinct
    overlap_bound = F.lit(1) + F.least(
        F.col("a.n") - F.col("a.rk"), F.col("b.n") - F.col("b.rk")
    )
    required = F.ceil(
        F.lit(tau) * (F.col("a.n") + F.col("b.n")) / F.lit(1.0 + tau) - eps
    )
    cand = (
        a.join(
            b,
            (F.col(f"a.{gram_col}") == F.col(f"b.{gram_col}"))
            & (F.col(f"a.{doc_col}") < F.col(f"b.{doc_col}"))
            # J >= tau implies tau*|A| <= |B| and tau*|B| <= |A|
            & (F.col("b.n") >= F.lit(tau) * F.col("a.n") - eps)
            & (F.col("a.n") >= F.lit(tau) * F.col("b.n") - eps)
            & (overlap_bound >= required),
        )
        .select(
            F.col(f"a.{doc_col}").alias("doc_a"),
            F.col(f"b.{doc_col}").alias("doc_b"),
        )
        .distinct()
    )
    # verify only docs that appear in a candidate pair: the pair set is
    # output-scale while the corpus is data-scale, so the collect_list
    # shuffle shrinks from |corpus| to |candidate docs| — the move that
    # keeps the verify stage flat as the corpus grows.  cand is pinned
    # (it feeds the doc filter AND the final join); arrays is pinned
    # (read by both pair sides).
    cand = pin(cand, small=True)
    cand_docs = (
        cand.select(F.col("doc_a").alias(doc_col))
        .union(cand.select(F.col("doc_b").alias(doc_col)))
        .distinct()
    )
    arrays = pin(
        sh.join(F.broadcast(cand_docs), doc_col, "left_semi")
        .groupBy(doc_col)
        .agg(F.sort_array(F.collect_list(gram_col)).alias("grams")),
        small=True,
    )
    ga = arrays.select(
        F.col(doc_col).alias("doc_a"), F.col("grams").alias("ga")
    )
    gb = arrays.select(
        F.col(doc_col).alias("doc_b"), F.col("grams").alias("gb")
    )
    inter = F.size(F.array_intersect("ga", "gb")).cast("double")
    union = (F.size("ga") + F.size("gb")).cast("double") - inter
    return (
        # no broadcast hint on the pinned pair set: AQE re-plans the
        # join as broadcast at runtime iff the materialized size is
        # small, which both avoids the OOM an unconditional hint risks
        # on near-dup-heavy corpora AND the blocking count() job a
        # size-gated hint needs at plan-construction time (removing
        # that job measured faster end-to-end than the hint it bought)
        cand
        .join(ga, "doc_a")
        .join(gb, "doc_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= tau)
        .select("doc_a", "doc_b", "jaccard")
    )


def containment_prefix_join(
    sh: "DataFrame", tau: float, doc_col: str = "doc", gram_col: str = "gram"
) -> "DataFrame":
    """EXACT asymmetric containment join: pairs (a, b) with
    ``|A ∩ B| / |A| >= tau`` — "doc a is (near-)contained in doc b".
    The quote/boilerplate/superset detector that Jaccard misses when
    the containing doc is much larger (J shrinks with |B|, containment
    does not).

    Prefix theorem, containment form: if C(A,B) >= tau then A shares
    >= ceil(tau*|A|) grams with B, so among A's first
    ``|A| - ceil(tau*|A|) + 1`` grams under ANY fixed total order at
    least one is in B — joining A's rarest-first PREFIX against B's
    FULL posting list is lossless.  Only the probe side is pruned
    (unlike the symmetric AllPairs join); candidate volume scales with
    rare-gram posting length.  The size filter |B| >= tau*|A| prunes
    further (the intersection cannot exceed |B|).
    """
    from pyspark.sql import Window

    from .pin import pin

    sh = pin(sh)
    # NOT pinned: sizes is broadcast into both join sides, and an
    # InMemoryRelation's unknown stats would demote those to
    # sort-merge joins (measured 2x slower than re-aggregating)
    sizes = sh.groupBy(doc_col).agg(F.count(F.lit(1)).alias("n"))
    freq = sh.groupBy(gram_col).agg(F.count(F.lit(1)).alias("df"))
    eps = F.lit(1e-6)
    prefix_a = (
        sh.join(freq, gram_col)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy(doc_col).orderBy("df", gram_col)
            ),
        )
        .join(sizes, doc_col)
        .filter(
            F.col("rk")
            <= F.col("n") - F.ceil(F.lit(tau) * F.col("n") - eps) + 1
        )
        .select(
            F.col(doc_col).alias("doc_a"),
            F.col(gram_col).alias("gram"),
            F.col("n").alias("n_a"),
        )
    )
    full_b = sh.join(sizes, doc_col).select(
        F.col(doc_col).alias("doc_b"),
        F.col(gram_col).alias("gram"),
        F.col("n").alias("n_b"),
    )
    cand = (
        prefix_a.join(
            full_b,
            (prefix_a.gram == full_b.gram)
            & (prefix_a.doc_a != full_b.doc_b)
            & (F.col("n_b") >= F.lit(tau) * F.col("n_a") - eps),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    # verify only candidate docs (see jaccard_prefix_join): pair set is
    # output-scale, so the collect_list shuffle shrinks to the docs the
    # verify actually reads.
    cand = pin(cand, small=True)
    cand_docs = (
        cand.select(F.col("doc_a").alias(doc_col))
        .union(cand.select(F.col("doc_b").alias(doc_col)))
        .distinct()
    )
    arrays = pin(
        sh.join(F.broadcast(cand_docs), doc_col, "left_semi")
        .groupBy(doc_col)
        .agg(F.sort_array(F.collect_list(gram_col)).alias("grams")),
        small=True,
    )
    ga = arrays.select(F.col(doc_col).alias("doc_a"), F.col("grams").alias("ga"))
    gb = arrays.select(F.col(doc_col).alias("doc_b"), F.col("grams").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb")).cast("double")
    return (
        # no broadcast hint on the pinned pair set: AQE re-plans the
        # join as broadcast at runtime iff the materialized size is
        # small, which both avoids the OOM an unconditional hint risks
        # on near-dup-heavy corpora AND the blocking count() job a
        # size-gated hint needs at plan-construction time (removing
        # that job measured faster end-to-end than the hint it bought)
        cand
        .join(ga, "doc_a")
        .join(gb, "doc_b")
        .withColumn("containment", inter / F.size("ga").cast("double"))
        .filter(F.col("containment") >= tau)
        .select("doc_a", "doc_b", "containment")
    )
