"""Similarity search over embedding columns (array<float>).

Three tiers, matching how the cost scales:

* ``cosine_topk`` — brute-force top-k against one query vector
  (baseline; scan + rank, no shuffle beyond the top-k).
* ``near_dup_pairs_blocked`` — all-pairs above a threshold via a
  broadcast matrix + Arrow-batched numpy matmul (``mapInPandas``).
  Right side must fit in executor memory (~GBs of vectors); each
  partition of the left side does one BLAS GEMM against it.  This is
  the medium-scale path; beyond that, bucket first.
* ``hyperplane_lsh_buckets`` — random-hyperplane signatures (cosine
  LSH): vectors sharing a bucket are candidates, verified exactly.
  Candidate volume scales with collision density, not n².  Plane
  constants are derived from md5 so any oracle can replay them.

IVF (inverted file) indexing with deterministic centroids lives in
the query layer: assign every vector to its nearest centroid, probe
the query's top-``nprobe`` centroid lists only.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def plane_constants(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1], derived
    from md5(f"{plane}_{dim}") — replayable in SQL oracles."""
    planes = []
    for i in range(n_planes):
        row = []
        for j in range(dim):
            h = int(hashlib.md5(f"{i}_{j}".encode()).hexdigest()[:15], 16)
            row.append((h % 2_000_001 - 1_000_000) / 1e6)
        planes.append(row)
    return planes


def _dot_with_literal(col: str, vec: list[float]) -> Column:
    arr = "array(" + ", ".join(f"{v!r}D" for v in vec) + ")"
    return F.expr(
        f"aggregate(zip_with({col}, {arr}, (x, y) -> x * y),"
        f" 0D, (acc, x) -> acc + x)"
    )


def dot(a: str | Column, b: str | Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(c: str | Column) -> Column:
    return F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))


def hyperplane_lsh_buckets(
    emb: DataFrame, vec_col: str, n_planes: int, dim: int
) -> DataFrame:
    """Add a ``bucket`` column: n_planes sign bits of plane dots."""
    planes = plane_constants(n_planes, dim)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        bit = F.when(_dot_with_literal(vec_col, p) > 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + (bit.cast("long") * F.lit(1 << i))
    return emb.withColumn("bucket", bucket)


def cosine_topk(
    emb: DataFrame,
    query_vec: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "e",
    q_col: str = "qe",
    round_digits: int = 6,
) -> DataFrame:
    joined = emb.crossJoin(F.broadcast(query_vec))
    cos = F.round(
        dot(F.col(vec_col), F.col(q_col)) / (norm(F.col(vec_col)) * norm(F.col(q_col))),
        round_digits,
    )
    return (
        joined.withColumn("cosine", cos)
        .orderBy(F.col("cosine").desc(), id_col)
        .limit(k)
        .select(id_col, "cosine")
    )


def near_dup_pairs_blocked(
    emb: DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "e",
    round_digits: int = 6,
) -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold.

    The full (normalized) matrix is broadcast; each Arrow batch of the
    left side computes one numpy GEMM against it.  ~100× faster than
    the per-pair higher-order-function plan for mid-size tables.
    """
    import numpy as np
    import pandas as pd

    rows = emb.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    spark = emb.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    def block(it):
        bm = b_mat.value
        bi = b_ids.value
        for pdf in it:
            a = np.array(list(pdf[vec_col]), dtype=np.float64)
            a = a / np.linalg.norm(a, axis=1, keepdims=True)
            sims = a @ bm.T  # GEMM
            aid = pdf[id_col].to_numpy()
            out_a, out_b, out_c = [], [], []
            rounded = np.round(sims, round_digits)
            for r in range(sims.shape[0]):
                mask = (rounded[r] >= threshold) & (bi > aid[r])
                out_a.extend([aid[r]] * int(mask.sum()))
                out_b.extend(bi[mask].tolist())
                out_c.extend(rounded[r][mask].tolist())
            yield pd.DataFrame(
                {"vec_a": out_a, "vec_b": out_b, "cosine": out_c}
            )

    return emb.select(id_col, vec_col).mapInPandas(
        block, schema="vec_a long, vec_b long, cosine double"
    )
