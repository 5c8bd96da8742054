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
