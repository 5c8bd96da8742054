"""ANN scale-path queries: hyperplane-LSH bucketed near-dup pairs and
IVF (inverted-file) probing with deterministic centroids."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

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
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    bb = hyperplane_lsh_bands(emb, "e", N_PLANES, N_BANDS, DIM).select(
        "vec_id", "band", "bucket"
    )
    a = bb.alias("a")
    b = bb.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
        .distinct()
    )
    x = emb.alias("x")
    y = emb.alias("y")
    cos = F.round(
        dot(F.col("x.e"), F.col("y.e")) / (norm(F.col("x.e")) * norm(F.col("y.e"))),
        6,
    )
    return (
        cand.join(x, F.col("vec_a") == F.col("x.vec_id"))
        .join(y, F.col("vec_b") == F.col("y.vec_id"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= 0.3)
        .select("vec_a", "vec_b", "cosine")
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
    emb = load(spark, sf_dir, "embeddings").select(
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
