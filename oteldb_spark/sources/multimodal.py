"""Multimodal columns — image/audio/video as opaque binary + typed
metadata, with Arrow-batched processing operators.

The decode step itself needs codec libraries that are not in this
container; it is stubbed behind an import-guard (``_try_decode_image``)
with a clearly-marked deterministic fallback.  Everything Spark-side —
schemas, partitioning, mapInPandas batch shapes, frame explosion — is
real and tested.

At 100 TB: binaries live in the table as parquet binary columns (or
pointers to object storage); the decode/feature operators are
``mapInPandas`` so each Arrow batch amortizes Python overhead, and the
pipeline parallelism is the file-partition parallelism of the scan.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("data", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)


def _media_frame(spark, rows) -> DataFrame:
    """Fixture rows → DataFrame via the Arrow path when available: a
    plain-list ``createDataFrame`` builds a pickled Python-RDD scan
    that spins a Python worker per slice (32 on local[32]) before the
    dhash/feature ``mapInPandas`` ever runs — and the phash gate's
    banded self-join materializes that scan on BOTH join sides
    concurrently (r12 driver artifact: 12.7 s at 32 cores vs 0.63 s at
    8).  The Arrow build lands as a pure-JVM ``LocalTableScan``.  Rows
    are identical either way (pinned by test)."""
    arrow_on = (
        spark.conf.get("spark.sql.execution.arrow.pyspark.enabled", "false")
        == "true"
    )
    if not arrow_on:
        return spark.createDataFrame(rows, MEDIA_SCHEMA)
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["media_id", "kind", "data", "meta"])
    return spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)


def synthesize_media(
    spark, n: int, kind: str = "image", real_png: bool = False
) -> DataFrame:
    """Deterministic fake media rows for tests: md5-stream payloads,
    or (``real_png=True``, images only) genuine PNG encodings of a
    seeded pixel pattern so the decode branch runs end-to-end."""
    import numpy as np

    from .png_codec import encode_png

    rows = []
    for i in range(n):
        if real_png and kind == "image":
            w, h = 16 + (i % 4) * 8, 16 + (i % 3) * 8
            rng = np.random.default_rng(i)
            payload = encode_png(
                rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            )
        else:
            payload = b"".join(
                hashlib.md5(f"{kind}-{i}-{j}".encode()).digest()
                for j in range(8)
            )
        meta = {
            "width": (
                (16 + (i % 4) * 8 if real_png else 64 + (i % 4) * 32)
                if kind == "image"
                else None
            ),
            "height": (
                (16 + (i % 3) * 8 if real_png else 64 + (i % 3) * 32)
                if kind == "image"
                else None
            ),
            "sample_rate": 16000 if kind == "audio" else None,
            "duration_ms": 1000 + i * 250 if kind in ("audio", "video") else None,
            "codec": {"image": "png", "audio": "pcm16", "video": "h264"}[kind],
        }
        rows.append((i, kind, payload, meta))
    return _media_frame(spark, rows)


def _try_decode_image(data: bytes):
    """Decode to a HxWxC uint8 array; None when undecodable so callers
    fall back to the deterministic byte-level path.

    Two tiers: PIL when installed (JPEG & friends); otherwise the
    pure-stdlib PNG codec (``png_codec.py`` — zlib-only, depth-8
    gray/RGB/RGBA) so the pixel branch is REAL and tested even in this
    codec-library-free container.  A decoder must never make
    extraction WORSE than none — undecodable payloads (like the
    md5-stream fixtures) fall back too."""
    try:
        from PIL import Image
    except ImportError:
        Image = None
    if Image is not None:
        import io

        import numpy as np

        try:
            with Image.open(io.BytesIO(data)) as img:
                return np.asarray(img.convert("RGB"))
        except Exception:
            return None
    from .png_codec import decode_png, is_png

    if not is_png(data):
        return None
    try:
        return decode_png(data)
    except ValueError:
        return None


def extract_features(media: DataFrame, n_features: int = 8) -> DataFrame:
    """Per-item feature vector via Arrow-batched mapInPandas.

    The feature computation is byte-level statistics (deterministic,
    library-free); a real model embedding slots into the same batch
    shape."""
    import numpy as np
    import pandas as pd

    def batches(it):
        for pdf in it:
            feats = []
            for blob in pdf["data"]:
                decoded = _try_decode_image(bytes(blob))
                if decoded is not None:  # pixel statistics
                    arr = decoded.astype(np.float64).ravel()
                else:  # fallback: byte statistics
                    arr = np.frombuffer(blob, dtype=np.uint8).astype(np.float64)
                chunks = np.array_split(arr, n_features)
                feats.append([float(c.mean()) for c in chunks])
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats}
            )

    return media.mapInPandas(
        batches, schema="media_id long, features array<double>"
    )


def resize_meta(media: DataFrame, max_side: int) -> DataFrame:
    """Resize planning: new dimensions preserving aspect ratio —
    metadata-only (the pixel op is the stubbed decode step)."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(1.0), F.lit(max_side) / F.greatest(w, h))
    return media.select(
        "media_id",
        "kind",
        (w * scale).cast("int").alias("new_width"),
        (h * scale).cast("int").alias("new_height"),
    )


def frame_sample(media: DataFrame, fps: float = 1.0) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame timestamp
    (explode over the duration) — the decode of each frame is the
    stubbed step."""
    n_frames = F.floor(F.col("meta.duration_ms") / F.lit(1000.0) * F.lit(fps)).cast(
        "int"
    )
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn(
        "frame_ts_ms", (F.col("frame_idx") / F.lit(fps) * 1000).cast("int")
    )


def synthesize_near_dup_media(
    spark, n_groups: int, group_size: int, kind: str = "image"
) -> DataFrame:
    """Near-duplicate fixture: ``n_groups`` base payloads (md5 streams,
    like :func:`synthesize_media`), each emitted ``group_size`` times
    with variant k perturbing ONE byte — index ``(k*17) % 128`` bumped
    by ``k*50 mod 256`` (k=0 is the unmodified base).  Within a group,
    payloads differ in ≤2 bytes ⇒ their byte-grid dhashes differ in a
    handful of bits (each byte touches one block mean ⇒ ≤2 comparison
    bits); across groups the hashes are md5-random (~28/56 bits apart).
    Every byte is recomputable by the DuckDB oracle via hex arithmetic,
    so the banded Hamming join gets a real value-level oracle."""
    rows = []
    for i in range(n_groups * group_size):
        g, k = divmod(i, group_size)
        payload = bytearray(
            b"".join(
                hashlib.md5(f"{kind}-{g}-{j}".encode()).digest()
                for j in range(8)
            )
        )
        idx = (k * 17) % 128
        payload[idx] = (payload[idx] + k * 50) % 256
        meta = {
            "width": 64,
            "height": 64,
            "sample_rate": None,
            "duration_ms": None,
            "codec": "raw",
        }
        rows.append((i, kind, bytes(payload), meta))
    return _media_frame(spark, rows)


def byte_dhash(media: DataFrame) -> DataFrame:
    """Difference-hash over OPAQUE payload bytes — the fallback tier of
    :func:`image_dhash` for blobs no codec can decode, and the tier a
    DuckDB oracle can replay byte-for-byte.

    The first 128 bytes form an 8×16 grid (for the synthetic payloads:
    one md5 digest per row); each row block-means to 8 columns of 2
    bytes (exact halves in IEEE), one bit per horizontal neighbor
    comparison ⇒ 8×7 = 56 bits packed MSB-first into a non-negative
    int64.  Same Arrow-batched mapInPandas shape as the pixel dhash;
    blobs under 128 bytes yield NULL."""
    import numpy as np
    import pandas as pd

    def one(blob: bytes):
        raw = np.frombuffer(bytes(blob)[:128], dtype=np.uint8)
        if raw.size < 128:
            return None
        m = raw.astype(np.float64).reshape(8, 8, 2).mean(axis=2)
        bits = (m[:, 1:] > m[:, :-1]).ravel()
        out = 0
        for b in bits:
            out = (out << 1) | int(b)
        return out

    def fn(it):
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dhash": [one(b) for b in pdf["data"]],
                }
            )

    return media.mapInPandas(fn, schema="media_id long, dhash long")


def image_dhash(media: DataFrame, *, grid: int = 8) -> DataFrame:
    """Perceptual difference-hash per image — Arrow-batched decode.

    Decode (PIL or the stdlib PNG codec) → grayscale → block-mean
    downsample to (grid+1)×grid → one bit per horizontal neighbor
    comparison ⇒ a 64-bit fingerprint (grid=8) whose hamming distance
    is a perceptual similarity metric.  Undecodable payloads yield
    NULL.  The heavy work is per-row numpy inside mapInPandas; pair
    finding downstream reuses the SimHash hamming-join machinery."""
    import numpy as np
    import pandas as pd

    def one(blob: bytes):
        arr = _try_decode_image(bytes(blob))
        if arr is None:
            return None
        g = arr.astype(np.float64).mean(axis=2)
        h, w = g.shape
        # block-mean resample to (grid)x(grid+1) via index binning
        ys = (np.arange(grid) * h) // grid
        ye = ((np.arange(grid) + 1) * h) // grid
        xs = (np.arange(grid + 1) * w) // (grid + 1)
        xe = ((np.arange(grid + 1) + 1) * w) // (grid + 1)
        small = np.empty((grid, grid + 1))
        for i in range(grid):
            for j in range(grid + 1):
                small[i, j] = g[ys[i] : max(ye[i], ys[i] + 1),
                                xs[j] : max(xe[j], xs[j] + 1)].mean()
        bits = (small[:, 1:] > small[:, :-1]).ravel()
        out = 0
        for b in bits:
            out = (out << 1) | int(b)
        # two's-complement fold so a set top bit stays int64-safe
        return out - (1 << 64) if out >= (1 << 63) else out

    def fn(it):
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dhash": [one(b) for b in pdf["data"]],
                }
            )

    return media.mapInPandas(fn, schema="media_id long, dhash long")


def phash_near_pairs(hashes: DataFrame, max_hamming: int = 10) -> DataFrame:
    """All pairs of images within ``max_hamming`` bits.

    Pigeonhole-blocked, not a full self-join: split the 64-bit dhash
    into ``max_hamming + 1`` disjoint bands — two hashes within
    ``max_hamming`` bits MUST agree exactly on at least one band, so
    the equi-join on (band, band_bits) is lossless while candidate
    volume scales with real collisions instead of n².  Same trick as
    the text SimHash/LSH banding in ``operators/dedup.py``; the exact
    ``bit_count`` filter then removes band-collision false positives
    and ``dropDuplicates`` collapses pairs colliding in >1 band."""
    from ..operators.pin import pin

    n_bands = max_hamming + 1
    width = max(1, 64 // n_bands)
    banded = hashes.select(
        "media_id",
        "dhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).withColumn(
        "band_bits",
        F.expr(
            f"CASE WHEN band < {n_bands - 1} THEN "
            f"shiftrightunsigned(dhash, band * {width}) & {(1 << width) - 1} "
            f"ELSE shiftrightunsigned(dhash, band * {width}) END"
        ),
    )
    # banded feeds BOTH self-join sides; upstream is usually a Python
    # hash stage (image_dhash / byte_dhash) that would otherwise run
    # twice — pin so the Arrow stage executes once
    banded = pin(banded, small=True)
    a = banded.alias("a")
    b = banded.alias("b")
    ham = F.expr("bit_count(a.dhash ^ b.dhash)")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_bits") == F.col("b.band_bits"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            "hamming",
        )
        .dropDuplicates(["media_a", "media_b"])
    )
