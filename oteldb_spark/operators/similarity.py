"""Similarity search over embedding columns (array<float>).

Three tiers, matching how the cost scales:

* ``cosine_topk`` — brute-force top-k against one query vector
  (baseline; scan + rank, no shuffle beyond the top-k).
* ``near_dup_pairs_blocked`` — exact all-pairs above a threshold via
  a distributed block-pair GEMM: rows hash into B blocks, every
  unordered block pair (i ≤ j) becomes one shuffle group, and each
  group runs one Arrow-batched numpy GEMM (``applyInPandas``).
  Nothing touches the driver; shuffle volume is n·B rows and each
  task holds at most two blocks, so block size — not table size —
  bounds executor memory.  The O(n²) compute is inherent to the
  exact operator and is spread over B·(B+1)/2 tasks; beyond what
  that affords, bucket first (LSH tier below).
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


def hyperplane_lsh_bands(
    emb: DataFrame, vec_col: str, n_planes: int, n_bands: int, dim: int
) -> DataFrame:
    """Explode each vector into (band, bucket) rows — banded sign-LSH.

    ``n_planes`` sign bits split into ``n_bands`` contiguous bands;
    two vectors are candidates when ANY band bucket matches
    (multi-table OR-amplification, the same banding shape as the
    MinHash module in operators/dedup.py).  More bits per band →
    fewer, higher-precision candidates; more bands → higher recall.
    """
    planes = plane_constants(n_planes, dim)
    bits = n_planes // n_bands
    bands = []
    for b in range(n_bands):
        bucket = F.lit(0).cast("long")
        for i in range(b * bits, (b + 1) * bits):
            bit = F.when(
                _dot_with_literal(vec_col, planes[i]) > 0, F.lit(1)
            ).otherwise(F.lit(0))
            bucket = bucket + bit.cast("long") * F.lit(1 << (i - b * bits))
        bands.append(F.struct(F.lit(b).alias("band"), bucket.alias("bucket")))
    cols = list(emb.columns)
    return emb.withColumn("bb", F.explode(F.array(*bands))).select(
        *cols, "bb.band", "bb.bucket"
    )


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
    block_rows: int = 8192,
    n_blocks: int | None = None,
) -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold — exact, distributed.

    Every row is hashed to one of B blocks, then replicated to the B
    unordered block pairs it participates in (``explode`` of the pair
    keys).  ``groupBy(ka, kb).applyInPandas`` gives each block pair to
    one task, which runs a single numpy GEMM between its two blocks
    (or the upper triangle for the diagonal pair).  Each unordered id
    pair lands in exactly one group — (block(a), block(b)) sorted —
    so the union over groups is the exact all-pairs result, with no
    driver-side materialization or broadcast anywhere.
    """
    import math

    import numpy as np
    import pandas as pd

    if n_blocks is None:
        # count() is a scalar aggregate (parquet-metadata fast path),
        # not a data collect; callers on known inputs can pass
        # n_blocks to skip the extra job.
        n_blocks = max(1, math.ceil(emb.count() / block_rows))
    nb = n_blocks
    e = emb.select(id_col, vec_col).withColumn(
        "blk", F.pmod(F.xxhash64(F.col(id_col)), F.lit(nb)).cast("int")
    )
    # a row in block k joins pair groups (k, j≥k) as the a-side and
    # (i≤k, k) as the b-side; the diagonal (k, k) appears in both
    # lists, so dedupe
    pair_keys = F.array_distinct(
        F.concat(
            F.expr(
                f"transform(sequence(blk, {nb - 1}),"
                " j -> struct(blk AS ka, j AS kb))"
            ),
            F.expr(
                "transform(sequence(0, blk),"
                " i -> struct(i AS ka, blk AS kb))"
            ),
        )
    )
    exploded = e.select(
        id_col, vec_col, "blk", F.explode(pair_keys).alias("k")
    ).select(id_col, vec_col, "blk", "k.ka", "k.kb")

    def gemm(key, pdf):
        ka, kb = key
        ids = pdf[id_col].to_numpy()
        mat = np.array(list(pdf[vec_col]), dtype=np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        if ka == kb:
            a_idx = np.arange(len(ids))
            b_idx = a_idx
        else:
            blk = pdf["blk"].to_numpy()
            a_idx = np.nonzero(blk == ka)[0]
            b_idx = np.nonzero(blk == kb)[0]
        if len(a_idx) == 0 or len(b_idx) == 0:
            return pd.DataFrame(
                {
                    "vec_a": np.array([], dtype=np.int64),
                    "vec_b": np.array([], dtype=np.int64),
                    "cosine": np.array([], dtype=np.float64),
                }
            )
        sims = np.round(mat[a_idx] @ mat[b_idx].T, round_digits)
        r, c = np.nonzero(sims >= threshold)
        va = ids[a_idx][r]
        vb = ids[b_idx][c]
        cs = sims[r, c]
        if ka == kb:
            keep = va < vb
            va, vb, cs = va[keep], vb[keep], cs[keep]
        else:
            lo = np.minimum(va, vb)
            vb = np.maximum(va, vb)
            va = lo
        return pd.DataFrame({"vec_a": va, "vec_b": vb, "cosine": cs})

    return exploded.groupBy("ka", "kb").applyInPandas(
        gemm, schema="vec_a long, vec_b long, cosine double"
    )


def pq_subvectors(
    emb: DataFrame, n_sub: int, sub_dim: int, *, vec_col: str = "e"
) -> DataFrame:
    """Explode each vector into ``n_sub`` contiguous subvectors:
    one row per (original row, ``m``) with ``s`` = dims
    [m*sub_dim, (m+1)*sub_dim)."""
    cols = list(emb.columns)
    subs = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.slice(F.col(vec_col), m * sub_dim + 1, sub_dim).alias("s"),
            )
            for m in range(n_sub)
        ]
    )
    return emb.withColumn("__ms", F.explode(subs)).select(
        *cols, F.col("__ms.m").alias("m"), F.col("__ms.s").alias("s")
    )


def _l2sq(a, b) -> Column:
    # fixed operation order (a·a − 2·a·b) + b·b, each dot a sequential
    # fold — bit-reproducible across engines, then rounded
    return F.round(
        dot(a, a) - F.lit(2.0) * dot(a, b) + dot(b, b), 6
    )


def pq_encode(
    sub: DataFrame, codebook: DataFrame, *, id_col: str = "vec_id"
) -> DataFrame:
    """Product-quantization encoding: per (vector, subspace) the id of
    the nearest codebook centroid (L2², ties by centroid id).  Returns
    (id_col, m, code).  ``codebook`` is (m, cid, cs) and is broadcast —
    K×M rows; the assignment is a map-side scan, no shuffle of the
    vectors themselves beyond the explode."""
    from pyspark.sql import Window

    j = sub.join(F.broadcast(codebook), "m")
    d2 = _l2sq(F.col("s"), F.col("cs"))
    w = Window.partitionBy(id_col, "m").orderBy(d2.asc(), F.col("cid").asc())
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, "m", F.col("cid").alias("code"))
    )


def pq_adc_topk(
    codes: DataFrame,
    codebook: DataFrame,
    query_sub: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric distance computation: the query builds a (m, cid) →
    L2² lookup table against the codebook (K×M entries, broadcast);
    candidate scores are table-lookup sums over their M code bytes.
    The per-cell distances go through DECIMAL so the M-way sum is
    exact in any accumulation order.  Returns top-k (id_col, dist2)
    ascending."""
    table = (
        codebook.join(query_sub.select("m", F.col("s").alias("qs")), "m")
        .select(
            "m",
            F.col("cid").alias("code"),
            _l2sq(F.col("qs"), F.col("cs"))
            .cast("decimal(18,6)")
            .alias("qd2"),
        )
    )
    return (
        codes.join(F.broadcast(table), ["m", "code"])
        .groupBy(id_col)
        .agg(F.sum("qd2").cast("double").alias("dist2"))
        .orderBy(F.col("dist2").asc(), F.col(id_col).asc())
        .limit(k)
    )
