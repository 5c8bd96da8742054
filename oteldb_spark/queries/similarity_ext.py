"""ANN scale-path queries: hyperplane-LSH bucketed near-dup pairs and
IVF (inverted-file) probing with deterministic centroids."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.pin import pin
from ..operators.similarity import (
    dot,
    hyperplane_lsh_bands,
    norm,
    plane_constants,
)
from ..tables import load
from .registry import register

# banded sign-LSH: N_PLANES sign bits split into N_BANDS tables.
# Bits-per-band (12 here) sets candidate precision — at 100 TB the
# within-bucket pair space is what explodes, so the knob that matters
# is bits-per-band, and recall is bought back with more bands, never
# with fewer bits.  All three are parameters (the round-1 version
# hardcoded a single 8-bit table).
#
# FIXED-PRECISION CONTRACT (SCALING_r11 allowlist entry): with the
# plane count held constant, bucket occupancy grows with N and
# within-bucket candidates grow ~N²/2^bits per band — the ×64
# confirmation pass measured exp 1.91, textbook fixed-precision LSH.
# The certified scale path is queries/adaptive_lsh.py
# (ann_lsh_adaptive_pairs): bits-per-band steps with corpus size,
# measured flat (exp 0.41) on the same artifact.
N_PLANES = 24
N_BANDS = 2
DIM = 64
_PLANES = plane_constants(N_PLANES, DIM)
_BITS = N_PLANES // N_BANDS


def _band_sql(band: int) -> str:
    """DuckDB bucket expression for one band, replaying the planes."""
    terms = []
    for i in range(band * _BITS, (band + 1) * _BITS):
        arr = "[" + ", ".join(repr(v) for v in _PLANES[i]) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(e, {arr}) > 0"
            f" THEN {1 << (i - band * _BITS)} ELSE 0 END)"
        )
    return " + ".join(terms)


_BANDS_SQL = " UNION ALL ".join(
    f"SELECT vec_id, e, {b} AS band, {_band_sql(b)} AS bucket FROM v"
    for b in range(N_BANDS)
)


# pairs sharing any band bucket, verified with exact cosine ≥ 0.3
@register(
    "ann_lsh_pairs",
    f"""WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
bb AS ({_BANDS_SQL}),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bb a JOIN bb b
    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b,
       round(list_dot_product(x.e, y.e) /
             (sqrt(list_dot_product(x.e, x.e)) *
              sqrt(list_dot_product(y.e, y.e))), 6) AS cosine
FROM cand c JOIN v x ON x.vec_id = c.vec_a JOIN v y ON y.vec_id = c.vec_b
WHERE round(list_dot_product(x.e, y.e) /
            (sqrt(list_dot_product(x.e, x.e)) *
             sqrt(list_dot_product(y.e, y.e))), 6) >= 0.3""",
)
def ann_lsh_pairs(spark, sf_dir):
    # carry the vectors through the band join and compute cosine
    # inline: two shuffles total (band-bucket join, pair dedup)
    # instead of four (join, distinct, two verify joins).  A pair
    # sharing k bands computes its cosine k times — k ≤ N_BANDS and
    # the arithmetic is codegen'd column math, cheaper than the extra
    # joins it replaces at any scale where banding keeps candidates
    # sparse (which is the regime LSH is for).
    emb = load(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
    )
    # norm once per VECTOR before the band join — computing it inside
    # the cosine would re-fold the 64-dim array once per candidate
    # pair per shared band; the value (same expression, same row) is
    # bit-identical either way
    emb = emb.withColumn("nrm", norm(F.col("e")))
    # pin the banded frame: it feeds BOTH sides of the self-join, and
    # the 24 plane projections are the expensive part (higher-order-fn
    # dot per plane per vector) — unpinned, the join re-projects every
    # vector twice; pinned, signatures are computed once and the join
    # reads them back (the same discipline the MinHash banding uses)
    bb = pin(hyperplane_lsh_bands(emb, "e", N_PLANES, N_BANDS, DIM))
    a = bb.alias("a")
    b = bb.alias("b")
    cos = F.round(
        dot(F.col("a.e"), F.col("b.e")) / (F.col("a.nrm") * F.col("b.nrm")),
        6,
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cosine"),
        )
        .groupBy("vec_a", "vec_b")
        .agg(F.first("cosine").alias("cosine"))
        .filter(F.col("cosine") >= 0.3)
    )


# IVF: centroids = embeddings 0..7; every vector assigned to its
# nearest centroid (rounded cosine, centroid-id tie-break); the query
# (vec 1) probes its top-2 centroid lists and ranks only those.
_IVF_COS = """round(list_dot_product(v.e, c.e) /
             (sqrt(list_dot_product(v.e, v.e)) *
              sqrt(list_dot_product(c.e, c.e))), 6)"""

@register(
    "ann_ivf_top5",
    f"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cents AS (SELECT vec_id AS cid, e FROM v WHERE vec_id < 8),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_IVF_COS.replace("c.e", "cents_e")} DESC, c.cid) AS rn
    FROM v, (SELECT cid, e AS cents_e FROM cents) c
  ) WHERE rn = 1
),
probes AS (
  SELECT c.cid FROM v, (SELECT cid, e AS cents_e FROM cents) c
  WHERE v.vec_id = 1
  ORDER BY {_IVF_COS.replace("c.e", "cents_e")} DESC, c.cid
  LIMIT 2
),
cand AS (
  SELECT a.vec_id FROM assign a JOIN probes p ON a.cid = p.cid
  WHERE a.vec_id <> 1
)
SELECT v.vec_id,
       round(list_dot_product(v.e, q.e) /
             (sqrt(list_dot_product(v.e, v.e)) *
              sqrt(list_dot_product(q.e, q.e))), 6) AS cosine
FROM v JOIN cand USING (vec_id), (SELECT e FROM v WHERE vec_id = 1) q
ORDER BY cosine DESC, vec_id LIMIT 5""",
)
def ann_ivf_top5(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce")
    )
    crossed = emb.crossJoin(F.broadcast(cents))
    cos = F.round(
        dot(F.col("e"), F.col("ce")) / (norm(F.col("e")) * norm(F.col("ce"))), 6
    )
    scored = crossed.withColumn("cos", cos)
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), "cid")
    assign = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
    )
    probes = (
        scored.filter(F.col("vec_id") == 1)
        .orderBy(F.col("cos").desc(), "cid")
        .limit(2)
        .select("cid")
    )
    cand = assign.join(F.broadcast(probes), "cid", "left_semi").filter(
        F.col("vec_id") != 1
    )
    q = emb.filter(F.col("vec_id") == 1).select(F.col("e").alias("qe"))
    qcos = F.round(
        dot(F.col("e"), F.col("qe")) / (norm(F.col("e")) * norm(F.col("qe"))), 6
    )
    return (
        emb.join(cand.select("vec_id"), "vec_id", "left_semi")
        .crossJoin(F.broadcast(q))
        .withColumn("cosine", qcos)
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(5)
        .select("vec_id", "cosine")
    )


# IVF with k-means centroids (the production upgrade over the fixed
# seed centroids above): one Lloyd iteration — spherical assignment by
# rounded cosine, then per-dimension mean update.  Coordinates are
# quantized to 2^20-scaled integers before the mean, so the update's
# sums are exact BIGINTs in any accumulation order and the recomputed
# centroids are bit-identical on both engines; every dot product is a
# sequential left fold on both sides.  At scale this is the standard
# IVF build: K centroid rows broadcast, assignment is a map-side
# scan, the update one groupBy — no all-pairs anywhere.
_QS = 1_048_576.0  # 2^20


def _kmeans_cos(v_e: str, c_e: str) -> str:
    return (
        f"round(list_dot_product({v_e}, {c_e}) /"
        f" (sqrt(list_dot_product({v_e}, {v_e})) *"
        f" sqrt(list_dot_product({c_e}, {c_e}))), 6)"
    )


@register(
    "ann_ivf_kmeans_top5",
    f"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
qv AS (SELECT vec_id, list_transform(e,
         x -> CAST(floor(x * {_QS!r} + 0.5) AS BIGINT)) AS qe FROM v),
c0 AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 8),
s0 AS (SELECT v.vec_id, c.cid, {_kmeans_cos("v.e", "c.ce")} AS cos
       FROM v CROSS JOIN c0 c),
a1 AS (SELECT vec_id, cid FROM (
         SELECT vec_id, cid, row_number() OVER (
           PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn FROM s0)
       WHERE rn = 1),
ex AS (SELECT a1.cid, d.d, qv.qe[CAST(d.d + 1 AS INT)] AS q
       FROM a1 JOIN qv USING (vec_id)
       CROSS JOIN (SELECT range AS d FROM range(0, 64, 1)) d),
cs AS (SELECT cid, d, CAST(sum(q) AS BIGINT) AS s, count(*) AS n
       FROM ex GROUP BY cid, d),
c1 AS (SELECT cid, list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / {_QS!r}
                        ORDER BY d) AS ce
       FROM cs GROUP BY cid),
s1 AS (SELECT v.vec_id, c.cid, {_kmeans_cos("v.e", "c.ce")} AS cos
       FROM v CROSS JOIN c1 c),
a2 AS (SELECT vec_id, cid FROM (
         SELECT vec_id, cid, row_number() OVER (
           PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn FROM s1)
       WHERE rn = 1),
probes AS (SELECT cid FROM s1 WHERE vec_id = 1
           ORDER BY cos DESC, cid LIMIT 2),
cand AS (SELECT a.vec_id FROM a2 a JOIN probes p ON a.cid = p.cid
         WHERE a.vec_id <> 1)
SELECT v.vec_id, {_kmeans_cos("v.e", "q.e")} AS cosine
FROM v JOIN cand USING (vec_id), (SELECT e FROM v WHERE vec_id = 1) q
ORDER BY cosine DESC, vec_id LIMIT 5""",
)
def ann_ivf_kmeans_top5(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    v = emb.withColumn(
        "qe", F.transform(F.col("e"), lambda x: F.floor(x * F.lit(_QS) + 0.5))
    )

    def cos_col(a, b):
        return F.round(dot(a, b) / (norm(a) * norm(b)), 6)

    def nearest(scored):
        w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), "cid")
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cid")
        )

    cents0 = v.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce")
    )
    s0 = v.crossJoin(F.broadcast(cents0)).withColumn(
        "cos", cos_col(F.col("e"), F.col("ce"))
    )
    a1 = nearest(s0)

    ex = a1.join(v.select("vec_id", "qe"), "vec_id").select(
        "cid", F.posexplode("qe").alias("d", "q")
    )
    cs = ex.groupBy("cid", "d").agg(
        F.sum("q").alias("s"), F.count(F.lit(1)).alias("n")
    )
    coord = F.col("s").cast("double") / F.col("n").cast("double") / F.lit(_QS)
    c1 = (
        cs.withColumn("coord", coord)
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "coord"))),
                lambda s: s["coord"],
            ).alias("ce")
        )
    )

    s1 = v.crossJoin(F.broadcast(c1)).withColumn(
        "cos", cos_col(F.col("e"), F.col("ce"))
    )
    a2 = nearest(s1)
    probes = (
        s1.filter(F.col("vec_id") == 1)
        .orderBy(F.col("cos").desc(), "cid")
        .limit(2)
        .select("cid")
    )
    cand = a2.join(F.broadcast(probes), "cid", "left_semi").filter(
        F.col("vec_id") != 1
    )
    q = emb.filter(F.col("vec_id") == 1).select(F.col("e").alias("qe2"))
    return (
        emb.join(cand.select("vec_id"), "vec_id", "left_semi")
        .crossJoin(F.broadcast(q))
        .withColumn("cosine", cos_col(F.col("e"), F.col("qe2")))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(5)
        .select("vec_id", "cosine")
    )


# IVF-PQ: product quantization over 8 subspaces of 8 dims, 16-entry
# codebooks seeded from the first 16 vectors (deterministic, like the
# IVF seeds above).  Vectors compress 512 B → 8 code bytes; the query
# scores candidates via an asymmetric-distance lookup table (K×M
# broadcast), so at 100 TB the scan touches only the code column and
# the shuffle carries one decimal per (vector, subspace).  Exact
# per-cell rounding + DECIMAL summation keep both engines identical.
_PQ_M, _PQ_D, _PQ_K = 8, 8, 16


def _pq_l2(a: str, b: str) -> str:
    return (
        f"round(list_dot_product({a}, {a}) - 2.0 * list_dot_product({a}, {b})"
        f" + list_dot_product({b}, {b}), 6)"
    )


@register(
    "ann_ivf_pq_top5",
    f"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
ms AS (SELECT range AS m FROM range(0, {_PQ_M}, 1)),
sub AS (SELECT vec_id, m, list_slice(e, m * {_PQ_D} + 1, m * {_PQ_D} + {_PQ_D}) AS s
        FROM v CROSS JOIN ms),
cb AS (SELECT m, vec_id AS cid, s AS cs FROM sub WHERE vec_id < {_PQ_K}),
asg AS (SELECT vec_id, m, cid AS code FROM (
          SELECT s.vec_id, s.m, c.cid, row_number() OVER (
            PARTITION BY s.vec_id, s.m
            ORDER BY {_pq_l2("s.s", "c.cs")} ASC, c.cid ASC) AS rn
          FROM sub s JOIN cb c ON s.m = c.m) t
        WHERE rn = 1),
qt AS (SELECT c.m, c.cid AS code,
              CAST({_pq_l2("q.s", "c.cs")} AS DECIMAL(18,6)) AS qd2
       FROM cb c JOIN sub q ON q.m = c.m AND q.vec_id = 1)
SELECT a.vec_id, CAST(sum(t.qd2) AS DOUBLE) AS dist2
FROM asg a JOIN qt t ON a.m = t.m AND a.code = t.code
WHERE a.vec_id <> 1
GROUP BY a.vec_id
ORDER BY dist2 ASC, a.vec_id ASC
LIMIT 5""",
)
def ann_ivf_pq_top5(spark, sf_dir):
    from ..operators.similarity import pq_adc_topk, pq_encode, pq_subvectors

    emb = load(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    sub = pq_subvectors(emb, _PQ_M, _PQ_D)
    codebook = sub.filter(F.col("vec_id") < _PQ_K).select(
        "m", F.col("vec_id").alias("cid"), F.col("s").alias("cs")
    )
    codes = pq_encode(sub, codebook).filter(F.col("vec_id") != 1)
    query_sub = sub.filter(F.col("vec_id") == 1)
    return pq_adc_topk(codes, codebook, query_sub, 5)


# Random-projection dimensionality reduction (Johnson–Lindenstrauss):
# 64-d → 16-d via the deterministic plane matrix, the cheap pre-step
# before clustering / coarse ANN.  Row-local column arithmetic — no
# shuffle, and the projection matrix is a plan literal (at 100 TB it
# would broadcast, never join).
_RP_DIM = 16
_RP_PLANES = plane_constants(_RP_DIM, DIM)


def _rp_sql(i: int) -> str:
    arr = "[" + ", ".join(repr(v) for v in _RP_PLANES[i]) + "]"
    return f"round(list_dot_product(e, {arr}), 6) AS p{i}"


@register(
    "emb_random_projection",
    "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)\n"
    "SELECT vec_id, " + ", ".join(_rp_sql(i) for i in range(_RP_DIM)) + " FROM v",
)
def emb_random_projection(spark, sf_dir):
    from ..operators.similarity import _dot_with_literal

    emb = load(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    return emb.select(
        "vec_id",
        *[
            F.round(_dot_with_literal("e", _RP_PLANES[i]), 6).alias(f"p{i}")
            for i in range(_RP_DIM)
        ],
    )


# SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
# corpus coarsely, then prune within-cluster near-duplicates by
# embedding cosine, keeping the lowest-id representative.  The
# clustering bounds the pairwise stage to within-cell pairs — the
# standard way the quadratic is tamed at 100 TB (cells are the IVF
# cells; the pair join is a per-cell self-join, never all-pairs).
#
# CELL SIZE MUST BE BOUNDED (round-9 scaling-curve find): with a FIXED
# codebook, cells grow linearly with the corpus and the within-cell
# self-join is O(n²/k) — tools/scaling_curve.py measured exponent 1.7
# over 500→8000 vectors.  Real SemDeDup scales k with n; here the
# 8-centroid coarse assignment is refined by deterministic RANK BLOCKS:
# within each coarse cell, vectors sort by (cos-to-centroid desc,
# vec_id) and split into blocks of ≤ _SEM_CELL_CAP, and the pair join
# runs per (cid, block).  Near-duplicates have near-equal cosine to
# their shared centroid, so they land in the same or adjacent block —
# the same sorted-projection approximation SemDeDup itself makes by
# pruning only within IVF cells.  Pair work is now ≤ n·CAP/2 (linear
# in n), re-measured exponent ~1.0, and the oracle replays the exact
# blocking (rounded cosine + vec_id tie-break ⇒ identical ranks).
#
# τ=0.3 is tuned DOWN to the synthetic corpus (random embeddings peak
# at cos≈0.49; a production 0.95+ would prune nothing here) — the
# machinery, not the constant, is the operator.  All cosines rounded
# to 6 digits on both engines before comparison or ordering.
_SEM_TAU = 0.3
_SEM_CELL_CAP = 128


@register(
    "dedup_semantic_survivors",
    f"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cents AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 8),
assign AS (
  SELECT vec_id, cid, cos FROM (
    SELECT v.vec_id, c.cid,
           round(list_dot_product(v.e, c.ce)
             / (sqrt(list_dot_product(v.e, v.e))
                * sqrt(list_dot_product(c.ce, c.ce))), 6) AS cos,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY round(list_dot_product(v.e, c.ce)
               / (sqrt(list_dot_product(v.e, v.e))
                  * sqrt(list_dot_product(c.ce, c.ce))), 6) DESC, c.cid) AS rn
    FROM v, cents c) WHERE rn = 1),
blocked AS (
  SELECT vec_id, cid,
         (row_number() OVER (
            PARTITION BY cid ORDER BY cos DESC, vec_id) - 1)
           // {_SEM_CELL_CAP} AS blk
  FROM assign),
drops AS (
  SELECT DISTINCT b.vec_id
  FROM blocked a JOIN blocked b
    ON a.cid = b.cid AND a.blk = b.blk AND a.vec_id < b.vec_id
  JOIN v x ON x.vec_id = a.vec_id JOIN v y ON y.vec_id = b.vec_id
  WHERE round(list_dot_product(x.e, y.e)
          / (sqrt(list_dot_product(x.e, x.e))
             * sqrt(list_dot_product(y.e, y.e))), 6) >= {_SEM_TAU!r})
SELECT vec_id, cid FROM assign
WHERE vec_id NOT IN (SELECT vec_id FROM drops)""",
)
def dedup_semantic_survivors(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce")
    )
    cos_c = F.round(
        dot(F.col("e"), F.col("ce")) / (norm(F.col("e")) * norm(F.col("ce"))), 6
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), "cid")
    wb = Window.partitionBy("cid").orderBy(F.col("cos").desc(), "vec_id")
    # The assignment subtree feeds THREE branches (both pair-join
    # sides and the survivor anti-join): pin it so the 8x crossjoin +
    # two windows run once, and hoist the per-vector norm into it so
    # the pair cosine below multiplies two cached scalars instead of
    # re-reducing both 64-dim arrays per candidate pair.
    assign = pin(
        emb.crossJoin(F.broadcast(cents))
        .withColumn("cos", cos_c)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .withColumn(
            "blk",
            ((F.row_number().over(wb) - 1) / _SEM_CELL_CAP).cast("long"),
        )
        .select("vec_id", "cid", "blk", "e", norm(F.col("e")).alias("nrm"))
    )
    a = assign.alias("a")
    b = assign.alias("b")
    pair_cos = F.round(
        dot(F.col("a.e"), F.col("b.e")) / (F.col("a.nrm") * F.col("b.nrm")),
        6,
    )
    drops = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(pair_cos >= _SEM_TAU)
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
    )
    return assign.join(drops, "vec_id", "left_anti").select("vec_id", "cid")
