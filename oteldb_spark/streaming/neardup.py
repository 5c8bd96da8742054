"""Streaming MinHash-LSH near-duplicate detection.

The streaming counterpart of ``operators/dedup.py``: documents stream
in, each row computes its K-component MinHash signature with column
math (same md5→affine construction as the batch path, so signatures
are bit-identical), explodes into LSH band buckets, and a stateful
``applyInPandasWithState`` keyed by (band, bucket) compares each new
arrival against the signatures already seen in that bucket — emitting
a candidate pair whenever the full-signature agreement reaches the
threshold.

Scale shape: state is per (band, bucket) and holds only the signatures
of docs in that bucket within the TTL horizon, so memory is bounded by
(arrival rate × horizon), not stream history; the comparison work per
arrival is |bucket| signature diffs — the same sparsity argument as
batch LSH.  A pair sharing multiple bands is emitted once per shared
band; downstream consumers drop duplicates on (doc_a, doc_b) (cheap —
candidates are sparse by construction).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import A, B, BANDS, K, P, ROWS, shingles

OUTPUT_SCHEMA = "band int, doc_a long, doc_b long, agree long"
# parallel arrays: doc ids and their flattened K-component signatures
STATE_SCHEMA = "docs array<long>, sigs array<long>, last_ms long"


def minhash_signature_col(text_col: str) -> Column:
    """Per-row MinHash signature — identical values to the batch
    groupBy construction (operators/dedup.py minhash_vector): base =
    md5(shingle) % P, component i = min((A[i]·base + B[i]) % P).
    The shingle bases are materialized once per row (inner transform)
    and each of the K affine permutations folds over them."""
    bases = F.transform(
        shingles(text_col),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        % P,
    )
    comps = [
        F.array_min(
            F.transform(bases, lambda b: (F.lit(A[i]) * b + F.lit(B[i])) % P)
        )
        for i in range(K)
    ]
    return F.array(*comps)


def _near_dup_fn(threshold: int, ttl_ms: int):
    def fn(key, pdf_iter, state: GroupState):
        band = int(key[0])
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            docs, sigs, last_ms = state.get
            docs = list(docs)
            sigs = list(sigs)
        else:
            docs, sigs, last_ms = [], [], 0
        rows = pd.concat(list(pdf_iter)).sort_values("ts_ms")
        out_a, out_b, out_agree = [], [], []
        for doc, sigv, t in zip(rows["doc_id"], rows["sigv"], rows["ts_ms"]):
            sigv = list(sigv)
            for j, prior in enumerate(docs):
                prev = sigs[j * K : (j + 1) * K]
                agree = sum(1 for x, y in zip(prev, sigv) if x == y)
                if agree >= threshold:
                    out_a.append(prior)
                    out_b.append(int(doc))
                    out_agree.append(agree)
            docs.append(int(doc))
            sigs.extend(int(x) for x in sigv)
            last_ms = max(last_ms, int(t))
        state.update((docs, sigs, last_ms))
        state.setTimeoutTimestamp(last_ms + ttl_ms)
        if out_a:
            yield pd.DataFrame(
                {
                    "band": [band] * len(out_a),
                    "doc_a": out_a,
                    "doc_b": out_b,
                    "agree": out_agree,
                }
            )

    return fn


def stream_near_dup_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts_ms",
    threshold: int = 4,
    watermark: str = "10 minutes",
    ttl_ms: int = 10 * 60 * 1000,
) -> DataFrame:
    """Document stream → near-dup candidate-pair stream.

    ``ts_col`` is epoch millis; pairs carry (earlier doc, later doc,
    signature agreement of K components ≥ threshold)."""
    sigd = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(ts_col).alias("ts_ms"),
        minhash_signature_col(text_col).alias("sigv"),
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.hash(
                    *[F.element_at("sigv", b * ROWS + r + 1) for r in range(ROWS)]
                ).alias("bucket"),
            )
            for b in range(BANDS)
        ]
    )
    banded = (
        sigd.withColumn("bb", F.explode(band_structs))
        .select(
            "doc_id",
            "ts_ms",
            "sigv",
            F.col("bb.band").alias("band"),
            F.col("bb.bucket").alias("bucket"),
            F.timestamp_millis(F.col("ts_ms")).alias("event_time"),
        )
        .withWatermark("event_time", watermark)
    )
    return banded.groupBy("band", "bucket").applyInPandasWithState(
        _near_dup_fn(threshold, ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
