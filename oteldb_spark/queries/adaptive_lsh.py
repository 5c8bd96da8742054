"""Scale-adaptive banded sign-LSH near-dup pairs.

SCALING_r11 watch item: `ann_lsh_pairs` (fixed 12 bits × 2 bands)
reached exponent-lb 1.2 at the ×64 axis — with a FIXED plane count,
bucket occupancy grows with N and the within-bucket pair space grows
~N²/2^bits.  The production sizing rule is bits-per-band ≈
log2(N / target-occupancy); this gate certifies that rule end-to-end:
bits-per-band steps up with the corpus size (12 bits ≤ 32k vectors,
16 bits above), chosen by the SAME count-based formula on the Spark
side and inside the DuckDB oracle (a scalar-subquery CASE), so the
driver hash-checks the adaptive semantics themselves.  Planes are
md5-derived per (plane, dim) index (`plane_constants`), so the 12-bit
tier's planes are a prefix of the 16-bit tier's and both replay
exactly in SQL.
"""

from __future__ import annotations

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
from .similarity_ext import DIM

_AD_BANDS = 2
_AD_SMALL_BITS = 12
_AD_BIG_BITS = 16
_AD_TIER_ROWS = 32_000  # ≤ this many vectors -> 12 bits, else 16
_AD_PLANES = plane_constants(_AD_BIG_BITS * _AD_BANDS, DIM)


def _ad_band_sql(band: int, bits: int) -> str:
    terms = []
    for i in range(band * bits, (band + 1) * bits):
        arr = "[" + ", ".join(repr(v) for v in _AD_PLANES[i]) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(e, {arr}) > 0"
            f" THEN {1 << (i - band * bits)} ELSE 0 END)"
        )
    return " + ".join(terms)


_AD_BANDS_SQL = " UNION ALL ".join(
    f"SELECT vec_id, e, {b} AS band,"
    f" CASE WHEN (SELECT n FROM nn) <= {_AD_TIER_ROWS}"
    f" THEN {_ad_band_sql(b, _AD_SMALL_BITS)}"
    f" ELSE {_ad_band_sql(b, _AD_BIG_BITS)} END AS bucket FROM v"
    for b in range(_AD_BANDS)
)


@register(
    "ann_lsh_adaptive_pairs",
    f"""WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
nn AS (SELECT count(*) AS n FROM v),
bb AS ({_AD_BANDS_SQL}),
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
def ann_lsh_adaptive_pairs(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
    )
    # the adaptive knob: one cheap count picks the tier, the same
    # formula the oracle's scalar subquery evaluates
    n = emb.count()
    bits = _AD_SMALL_BITS if n <= _AD_TIER_ROWS else _AD_BIG_BITS
    emb = emb.withColumn("nrm", norm(F.col("e")))
    bb = pin(
        hyperplane_lsh_bands(emb, "e", bits * _AD_BANDS, _AD_BANDS, DIM)
    )
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
