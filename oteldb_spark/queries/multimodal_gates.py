"""Multimodal plumbing, driver-gated.

The decode step is stubbed (no codec libs in this container — see
``sources/multimodal.py``), but everything Spark-side is real:
binary columns, typed metadata, Arrow-batched mapInPandas feature
extraction, explode-based frame sampling, metadata resize planning.
These gates prove that plumbing against DuckDB oracles — possible
because the synthetic payloads are md5 byte streams the oracle can
regenerate arithmetically (DuckDB md5() returns the same hex digest
Python's hashlib produces), so even the byte-level feature means are
recomputed exactly, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.multimodal import (
    extract_features,
    frame_sample,
    resize_meta,
    synthesize_media,
)
from .registry import register

_N_IMG = 200
_N_VID = 64
_FPS = 4.0  # integer-exact frame timestamps (250 ms grid)
_MAX_SIDE = 96

# two hex chars -> byte value, DuckDB-side
_HEXVAL = (
    "((strpos('0123456789abcdef', substr(h, 2*b+1, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr(h, 2*b+2, 1)) - 1))"
)


@register(
    "multimodal_feature_extract",
    f"""WITH ids AS (SELECT range AS i FROM range({_N_IMG})),
chunks AS (
  SELECT i, j, md5('image-' || i || '-' || j) AS h
  FROM ids, range(8) t(j)),
bytes AS (
  SELECT i, j, CAST({_HEXVAL} AS DOUBLE) AS v
  FROM chunks, range(16) t2(b)),
feats AS (
  SELECT i, j, avg(v) AS f FROM bytes GROUP BY i, j)
SELECT i AS media_id, 'image' AS kind, CAST(128 AS BIGINT) AS n_bytes,
       list(f ORDER BY j) AS features
FROM feats GROUP BY i""",
)
def multimodal_feature_extract(spark, sf_dir):
    """Arrow-batched byte-statistics features over binary media: the
    128-byte md5-stream payload splits into 8 chunks of 16 — chunk k
    is exactly digest k, so each feature is the mean byte value of one
    md5 digest, which the oracle regenerates with hex arithmetic.
    Means are sums of <=4080 over /16 — exact in IEEE double on both
    engines, no rounding policy needed."""
    media = synthesize_media(spark, _N_IMG, "image")
    feats = extract_features(media, n_features=8)
    return (
        media.select("media_id", "kind", F.length("data").cast("long").alias("n_bytes"))
        .join(feats, "media_id")
        .select("media_id", "kind", "n_bytes", "features")
    )


@register(
    "multimodal_frame_sample",
    f"""WITH v AS (
  SELECT range AS media_id, 1000 + range * 250 AS duration_ms
  FROM range({_N_VID})),
n AS (SELECT media_id,
             CAST(floor(duration_ms / 1000.0 * {_FPS}) AS INTEGER) AS nf
      FROM v)
SELECT media_id, CAST(f AS INTEGER) AS frame_idx,
       CAST(floor(f / {_FPS} * 1000) AS INTEGER) AS frame_ts_ms
FROM (SELECT media_id, unnest(generate_series(0, nf - 1)) AS f FROM n)""",
)
def multimodal_frame_sample(spark, sf_dir):
    """Video frame-sampling plan (explode over duration at a target
    fps): one row per sampled frame with its timestamp; the per-frame
    decode is the stubbed step.  Synthetic durations are 1000+250i ms,
    so at 4 fps every count and timestamp is integer-exact."""
    media = synthesize_media(spark, _N_VID, "video")
    return frame_sample(media, fps=_FPS)


@register(
    "multimodal_resize_meta",
    f"""WITH m AS (
  SELECT range AS media_id,
         64 + (range % 4) * 32 AS w,
         64 + (range % 3) * 32 AS h
  FROM range({_N_IMG}))
SELECT media_id, 'image' AS kind,
       CAST(floor(w * least(1.0, {_MAX_SIDE} / greatest(w, h))) AS INTEGER)
         AS new_width,
       CAST(floor(h * least(1.0, {_MAX_SIDE} / greatest(w, h))) AS INTEGER)
         AS new_height
FROM m""",
)
def multimodal_resize_meta(spark, sf_dir):
    """Aspect-preserving resize planning over typed metadata (the
    pixel op is the stubbed decode): scale factors and the truncating
    int cast are the same IEEE double expression on both engines
    (oracle uses floor() because DuckDB's int cast rounds while
    Spark's truncates)."""
    media = synthesize_media(spark, _N_IMG, "image")
    return resize_meta(media, max_side=_MAX_SIDE)


# image near-dup via the banded Hamming join, value-level oracle: the
# near-dup fixture's payloads are md5 streams with ONE deterministic
# perturbed byte per variant, so DuckDB regenerates every byte with
# hex arithmetic, replays the 8x16 -> 8x8 block-mean dhash as a bits
# table, and computes ALL pairs within hamming <= 10 exactly — which is
# what the pigeonhole banding returns (11 disjoint bands over 64 bits:
# <= 10 differing bits cannot touch all of them, so the equi-join on
# (band, band_bits) is lossless and bit_count verification exact)
_NDG, _NDK = 40, 5  # 40 groups x 5 variants = 200 images, 400 near pairs


@register(
    "multimodal_phash_pairs",
    f"""WITH ids AS (SELECT range AS i FROM range({_NDG * _NDK})),
chunks AS (
  SELECT i, j, md5('image-' || (i // {_NDK}) || '-' || j) AS h
  FROM ids, range(8) t(j)),
rawb AS (
  SELECT i, j*16 + b AS pos, CAST({_HEXVAL} AS BIGINT) AS v
  FROM chunks, range(16) t2(b)),
pert AS (
  SELECT i, pos,
         CASE WHEN pos = ((i % {_NDK}) * 17) % 128
              THEN (v + (i % {_NDK}) * 50) % 256 ELSE v END AS v
  FROM rawb),
means AS (
  SELECT i, pos // 16 AS r, (pos % 16) // 2 AS c, sum(v) / 2.0 AS m
  FROM pert GROUP BY 1, 2, 3),
bits AS (
  SELECT a.i AS i, a.r * 7 + a.c AS bitpos,
         CASE WHEN b.m > a.m THEN 1 ELSE 0 END AS bit
  FROM means a JOIN means b ON a.i = b.i AND a.r = b.r AND b.c = a.c + 1)
SELECT x.i AS media_a, y.i AS media_b,
       CAST(sum(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) AS BIGINT)
         AS hamming
FROM bits x JOIN bits y ON x.bitpos = y.bitpos AND x.i < y.i
GROUP BY 1, 2
HAVING sum(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) <= 10""",
)
def multimodal_phash_pairs(spark, sf_dir):
    """Band-blocked image near-dup: byte-grid dhash (the oracle-
    replayable tier of the perceptual hash pair) -> pigeonhole-banded
    equi-join -> exact bit_count verify.  Within-group variants differ
    by <= 2 perturbed bytes (a handful of hash bits); cross-group
    hashes are md5-random, so the survivors are exactly the planted
    near-dup pairs."""
    from ..sources.multimodal import byte_dhash, phash_near_pairs, synthesize_near_dup_media

    media = synthesize_near_dup_media(spark, _NDG, _NDK)
    return phash_near_pairs(byte_dhash(media), max_hamming=10)
