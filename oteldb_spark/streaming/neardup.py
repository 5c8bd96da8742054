"""Streaming MinHash-LSH near-duplicate detection.

The streaming counterpart of ``operators/dedup.py``: documents stream
in, each row computes its K-component MinHash signature with column
math (same md5→affine construction as the batch path, so signatures
are bit-identical), explodes into LSH band buckets, and a stateful
``applyInPandasWithState`` compares each new arrival against the
signatures already seen in its bucket — emitting a candidate pair
whenever the full-signature agreement reaches the threshold.

State is keyed by (band, SHARD) — ``shard = pmod(bucket, shard_count)``
— not by the raw bucket: per-entity state groups are tiny (a handful of
docs per bucket) and applyInPandasWithState costs ~1 ms of Arrow/plan
overhead PER GROUP per micro-batch, which dominated the gate 3× at
sf0.1 (the round-7 tiny-groups lesson, applied to streaming state).
Each shard's state stores the TRUE bucket id per doc and the comparison
loop only diffs same-bucket signatures, so the emitted pairs are
byte-identical to raw-bucket keying; shard_count bounds the group count
at any corpus size.

Scale shape: state holds only the signatures of docs within the TTL
horizon — entries older than (watermark − ttl) are pruned on every
invocation and an idle shard evicts wholesale via its event-time
timeout — so memory is bounded by (arrival rate × horizon), not stream
history; the comparison work per arrival is |bucket| signature diffs,
the same sparsity argument as batch LSH.  A pair sharing multiple bands
is emitted once per shared band; downstream consumers drop duplicates
on (doc_a, doc_b) (cheap — candidates are sparse by construction).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import A, B, BANDS, K, P, ROWS, shingles

OUTPUT_SCHEMA = "band int, doc_a long, doc_b long, agree long"
# parallel arrays: doc ids, their TRUE bucket, arrival ts, and the
# flattened K-component signatures
STATE_SCHEMA = (
    "docs array<long>, buckets array<long>, ts array<long>,"
    " sigs array<long>, last_ms long"
)


def minhash_signature_col(text_col: str) -> Column:
    """Per-row MinHash signature — identical values to the batch
    groupBy construction (operators/dedup.py minhash_vector): base =
    md5(shingle) % P, component i = min((A[i]·base + B[i]) % P).
    The shingle bases (shingling + md5 + base-16 conv) are computed
    ONCE per row via ``_bind`` — mentioning the bases array in each of
    the K component transforms would structurally inline the whole
    md5 pipeline K× per row (Catalyst does not CSE across lambda
    scopes; measured ~3× on the streaming gate)."""
    from ..functions.parsers import _bind

    bases = F.transform(
        shingles(text_col),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        % P,
    )
    return _bind(
        bases,
        lambda bs: F.array(
            *[
                F.array_min(
                    F.transform(
                        bs, lambda b: (F.lit(A[i]) * b + F.lit(B[i])) % P
                    )
                )
                for i in range(K)
            ]
        ),
    )


def _near_dup_fn(threshold: int, ttl_ms: int):
    def fn(key, pdf_iter, state: GroupState):
        band = int(key[0])
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            docs, buckets, ts, sigs, last_ms = state.get
            docs, buckets, ts = list(docs), list(buckets), list(ts)
            sigs = list(sigs)
        else:
            docs, buckets, ts, sigs, last_ms = [], [], [], [], 0
        # TTL prune: drop entries that fell out of the event-time
        # horizon (the shard groups many buckets, so whole-group
        # eviction alone would retain hot shards forever)
        horizon = state.getCurrentWatermarkMs() - ttl_ms
        if docs and ts and min(ts) < horizon:
            keep = [j for j, t in enumerate(ts) if t >= horizon]
            docs = [docs[j] for j in keep]
            buckets = [buckets[j] for j in keep]
            ts = [ts[j] for j in keep]
            sigs = [
                x for j in keep for x in sigs[j * K : (j + 1) * K]
            ]
        by_bucket: dict = {}
        for j, bk in enumerate(buckets):
            by_bucket.setdefault(bk, []).append(j)
        rows = pd.concat(list(pdf_iter)).sort_values("ts_ms")
        out_a, out_b, out_agree = [], [], []
        for doc, bk, sigv, t in zip(
            rows["doc_id"], rows["bucket"], rows["sigv"], rows["ts_ms"]
        ):
            sigv = list(sigv)
            bk = int(bk)
            for j in by_bucket.get(bk, ()):
                prev = sigs[j * K : (j + 1) * K]
                agree = sum(1 for x, y in zip(prev, sigv) if x == y)
                if agree >= threshold:
                    out_a.append(docs[j])
                    out_b.append(int(doc))
                    out_agree.append(agree)
            by_bucket.setdefault(bk, []).append(len(docs))
            docs.append(int(doc))
            buckets.append(bk)
            ts.append(int(t))
            sigs.extend(int(x) for x in sigv)
            last_ms = max(last_ms, int(t))
        state.update((docs, buckets, ts, sigs, last_ms))
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
    shard_count: int = 256,
) -> DataFrame:
    """Document stream → near-dup candidate-pair stream.

    ``ts_col`` is epoch millis; pairs carry (earlier doc, later doc,
    signature agreement of K components ≥ threshold).  ``shard_count``
    bounds the number of state groups per band (see module docstring);
    it does not affect WHICH pairs are emitted."""
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
                ).cast("long").alias("bucket"),
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
            F.pmod(F.col("bb.bucket"), F.lit(shard_count)).alias("shard"),
            F.timestamp_millis(F.col("ts_ms")).alias("event_time"),
        )
        .withWatermark("event_time", watermark)
    )
    return banded.groupBy("band", "shard").applyInPandasWithState(
        _near_dup_fn(threshold, ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
