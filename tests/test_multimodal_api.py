"""Multimodal plumbing + API serializer tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from oteldb_spark.api.serializers import (
    loki_matrix,
    loki_streams,
    prom_vector,
    tempo_search,
)
from oteldb_spark.sources.multimodal import (
    extract_features,
    frame_sample,
    resize_meta,
    synthesize_media,
)


def test_extract_features_deterministic(spark):
    media = synthesize_media(spark, 6, "image")
    feats = extract_features(media, n_features=8)
    rows = {r.media_id: r.features for r in feats.collect()}
    assert len(rows) == 6
    assert all(len(v) == 8 for v in rows.values())
    # deterministic: same input → same features
    again = {r.media_id: r.features for r in extract_features(media, 8).collect()}
    assert rows == again


def test_resize_meta(spark):
    media = synthesize_media(spark, 4, "image")
    out = {r.media_id: (r.new_width, r.new_height) for r in resize_meta(media, 64).collect()}
    # media 0 is 64x64 → unchanged; larger ones scale to max side 64
    assert out[0] == (64, 64)
    for w, h in out.values():
        assert max(w, h) <= 64


def test_frame_sample(spark):
    media = synthesize_media(spark, 3, "video")
    frames = frame_sample(media, fps=2.0)
    per = (
        frames.groupBy("media_id").count().orderBy("media_id").collect()
    )
    # durations 1000, 1250, 1500 ms at 2fps → 2, 2, 3 frames
    assert [(r.media_id, r["count"]) for r in per] == [(0, 2), (1, 2), (2, 3)]
    ts = {(r.media_id, r.frame_idx): r.frame_ts_ms for r in frames.collect()}
    assert ts[(0, 1)] == 500


def test_loki_shapes(spark):
    df = spark.createDataFrame(
        [("svc-1", 1_000_000, "hello"), ("svc-1", 2_000_000, "world")],
        "service string, ts_us long, body string",
    )
    out = loki_streams(df, ["service"])
    assert out["data"]["resultType"] == "streams"
    st = out["data"]["result"][0]
    assert st["stream"] == {"service": "svc-1"}
    assert ["1000000000", "hello"] in st["values"]

    mdf = spark.createDataFrame(
        [("svc-1", 6_000_000, 2.5)], "service string, step_us long, value double"
    )
    m = loki_matrix(mdf, ["service"])
    assert m["data"]["result"][0]["values"] == [(6.0, "2.5")]


def test_prom_and_tempo_shapes(spark):
    vdf = spark.createDataFrame(
        [("error", "host-1", 1.5)], "mtype string, instance string, value double"
    )
    v = prom_vector(vdf, ["mtype", "instance"], 42.0)
    assert v["data"]["result"][0]["value"] == [42.0, "1.5"]

    tdf = spark.createDataFrame(
        [(1337, "order-1-URGENT", 2_500_000, 9)],
        "trace_id long, root_name string, trace_duration_us long, span_count long",
    )
    t = tempo_search(tdf)
    assert t["traces"][0]["traceID"].endswith("539")
    assert t["traces"][0]["durationMs"] == 2500


def test_png_codec_roundtrip_all_filters():
    import numpy as np

    from oteldb_spark.sources.png_codec import decode_png, encode_png, is_png

    rng = np.random.default_rng(7)
    for shape in [(7, 5, 3), (16, 16, 4), (9, 13), (1, 1, 3), (12, 8, 2)]:
        a = rng.integers(0, 256, size=shape, dtype=np.uint8)
        exp = a[:, :, None] if a.ndim == 2 else a
        for fc in [None, 0, 1, 2, 3, 4]:  # None cycles all five filters
            blob = encode_png(a, filter_choice=fc)
            assert is_png(blob)
            assert np.array_equal(decode_png(blob), exp)


def test_png_codec_rejects_garbage():
    import pytest as _pytest

    from oteldb_spark.sources.png_codec import decode_png

    with _pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_extract_features_pixel_branch(spark):
    """real_png payloads must flow through the DECODE branch: features
    equal the per-chunk means of the decoded pixel array, not of the
    raw encoded bytes."""
    import numpy as np

    from oteldb_spark.sources.multimodal import (
        extract_features,
        synthesize_media,
    )
    from oteldb_spark.sources.png_codec import decode_png

    media = synthesize_media(spark, 4, "image", real_png=True)
    got = {
        r["media_id"]: r["features"]
        for r in extract_features(media, n_features=4).collect()
    }
    raw = {r["media_id"]: bytes(r["data"]) for r in media.collect()}
    for mid, blob in raw.items():
        arr = decode_png(blob).astype(np.float64).ravel()
        exp = [float(c.mean()) for c in np.array_split(arr, 4)]
        assert got[mid] == exp
        # and differs from the byte-level fallback on the encoded blob
        b = np.frombuffer(blob, dtype=np.uint8).astype(np.float64)
        fallback = [float(c.mean()) for c in np.array_split(b, 4)]
        assert got[mid] != fallback


def test_image_dhash_near_pairs(spark):
    """dHash over real PNG payloads (stdlib decode path): perturbed
    twins land within a small hamming distance, unrelated images far
    apart; undecodable payloads hash NULL."""
    import numpy as np

    from oteldb_spark.sources.multimodal import image_dhash, phash_near_pairs
    from oteldb_spark.sources.png_codec import encode_png

    rng = np.random.default_rng(123)
    base = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    twin = base.copy()
    twin[:2, :2] = 255 - twin[:2, :2]  # tiny local perturbation
    other = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    rows = [
        (0, "image", bytes(encode_png(base)), None),
        (1, "image", bytes(encode_png(twin)), None),
        (2, "image", bytes(encode_png(other)), None),
        (3, "image", b"not an image", None),
    ]
    from oteldb_spark.sources.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    hashes = image_dhash(media)
    got = {r.media_id: r.dhash for r in hashes.collect()}
    assert got[3] is None
    assert got[0] is not None and got[0] == got[0]
    pairs = {
        (r.media_a, r.media_b): r.hamming
        for r in phash_near_pairs(
            hashes.filter(hashes.dhash.isNotNull()), max_hamming=6
        ).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] <= 6
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_phash_near_pairs_blocking_lossless(spark):
    """The pigeonhole band-blocked join finds EXACTLY the brute-force
    pair set (no pair within max_hamming can differ in every one of
    the max_hamming+1 disjoint bands), and the plan is an equi-join —
    no cartesian product."""
    import random

    from oteldb_spark.sources.multimodal import phash_near_pairs

    rng = random.Random(7)
    hashes = [rng.getrandbits(63) for _ in range(40)]
    # planted near-twins at several hamming distances incl. the boundary
    for d in (0, 1, 6, 10, 11):
        base = hashes[d]
        h = base
        for bit in rng.sample(range(63), d):
            h ^= 1 << bit
        hashes.append(h)
    df = spark.createDataFrame(
        list(enumerate(hashes)), "media_id long, dhash long"
    )
    got = {
        (r.media_a, r.media_b): r.hamming
        for r in phash_near_pairs(df, max_hamming=10).collect()
    }
    want = {}
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            d = bin(hashes[i] ^ hashes[j]).count("1")
            if d <= 10:
                want[(i, j)] = d
    assert got == want
    plan = phash_near_pairs(df, max_hamming=10)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
