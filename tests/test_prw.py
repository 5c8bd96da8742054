"""Prometheus remote-write decode tests: snappy block codec, protobuf
wire walker, exemplar promotion, native-histogram mapping.

Mirrors the reference test strategy in
``prometheusremotewrite/remotewrite_test.go`` and
``prw_to_metrics_test.go``.
"""

from __future__ import annotations

import pytest

from oteldb_spark.sources import prw


# --- snappy ------------------------------------------------------------------


def test_snappy_roundtrip():
    data = b"hello world " * 1000 + bytes(range(256))
    assert prw.snappy_decompress(prw.snappy_compress(data)) == data


def test_snappy_copy_tags():
    # hand-crafted stream exercising back-references, including an
    # overlapping copy (RLE-style): literal "abcd", then copy len=8
    # offset=4 → "abcdabcdabcd"
    compressed = bytes(
        [12]  # uvarint decompressed length = 12
        + [3 << 2]  # literal, len 4
        + list(b"abcd")
        + [((8 - 4) << 2) | 1, 4]  # 1-byte-offset copy: len 8, offset 4
    )
    assert prw.snappy_decompress(compressed) == b"abcdabcdabcd"


def test_snappy_two_byte_offset_copy():
    prefix = bytes(range(200)) * 2  # 400 bytes
    compressed = bytearray(prw._enc_uvarint(410))
    # literal of 400 bytes (2-byte length form)
    compressed += bytes([61 << 2]) + (399).to_bytes(2, "little") + prefix
    # copy len 10 from offset 400
    compressed += bytes([(9 << 2) | 2]) + (400).to_bytes(2, "little")
    assert prw.snappy_decompress(bytes(compressed)) == prefix + prefix[:10]


def test_snappy_bad_offset_raises():
    bad = bytes([4, 0 << 2, ord("x"), (4 << 2) | 1, 9])  # offset 9 > len 1
    with pytest.raises(ValueError):
        prw.snappy_decompress(bad)


# --- protobuf / WriteRequest -------------------------------------------------


def _roundtrip(series: list[bytes]) -> list[dict]:
    return prw.decode_write_request(prw.encode_write_request(series))


def test_write_request_roundtrip_samples():
    ts = prw.encode_time_series(
        {"__name__": "http_requests_total", "job": "api", "code": "200"},
        [(1.0, 1000), (2.5, 2000)],
    )
    out = _roundtrip([ts])
    assert len(out) == 1
    assert out[0]["labels"] == {
        "__name__": "http_requests_total",
        "job": "api",
        "code": "200",
    }
    assert out[0]["samples"] == [(1.0, 1000), (2.5, 2000)]


def test_suffix_typing_matches_reference():
    # suffix.go: sum/count/total → cumulative; max stays gauge;
    # seconds/bytes are unit tokens, also recognized second-to-last
    cases = {
        "http_requests_total": ("sum", ""),
        "process_cpu_seconds_total": ("sum", "seconds"),
        "go_alloc_bytes_total": ("sum", "bytes"),
        "request_duration_seconds": ("gauge", "seconds"),
        "response_size_bytes_max": ("gauge", "bytes"),
        "queue_depth_sum": ("sum", ""),
        "queue_depth_count": ("sum", ""),
        "node_load1": ("gauge", ""),
        "up": ("gauge", ""),
        "a_total": ("gauge", ""),  # <3 parts: no suffix parsing
    }
    for name, want in cases.items():
        assert prw.metric_type_and_unit(name) == want, name


def test_points_drop_old_samples():
    ts = prw.encode_time_series(
        {"__name__": "m_total"}, [(1.0, 500), (2.0, 1500), (3.0, 2500)]
    )
    pts = list(prw.series_points(_roundtrip([ts]), min_ts_ms=1500))
    assert [(p["value"], p["ts_ms"]) for p in pts] == [(2.0, 1500), (3.0, 2500)]
    # None keeps everything (gate determinism)
    assert len(list(prw.series_points(_roundtrip([ts])))) == 3


def test_missing_name_label_raises():
    ts = prw.encode_time_series({"job": "api"}, [(1.0, 1000)])
    with pytest.raises(ValueError, match="__name__"):
        list(prw.series_points(_roundtrip([ts])))


# --- exemplars ---------------------------------------------------------------


def test_exemplar_trace_span_promotion():
    good_trace = "0123456789abcdef0123456789abcdef"
    good_span = "0123456789abcdef"
    ex = prw.encode_exemplar(
        {"trace_id": good_trace, "span_id": good_span, "user": "u1"},
        0.25,
        1234,
    )
    ts = prw.encode_time_series(
        {"__name__": "lat_seconds"}, [(0.25, 1234)], exemplars=[ex]
    )
    (row,) = list(prw.series_exemplars(_roundtrip([ts])))
    assert row["trace_id"] == good_trace
    assert row["span_id"] == good_span
    assert row["ex_labels"]["user"] == "u1"
    assert row["value"] == 0.25 and row["ts_ms"] == 1234


def test_exemplar_malformed_ids_not_promoted():
    # reference only promotes well-formed hex of exactly 16/8 bytes
    ex = prw.encode_exemplar(
        {"trace_id": "zznothex", "span_id": "abc"}, 1.0, 1
    )
    ts = prw.encode_time_series(
        {"__name__": "m"}, [(1.0, 1)], exemplars=[ex]
    )
    (row,) = list(prw.series_exemplars(_roundtrip([ts])))
    assert row["trace_id"] == "" and row["span_id"] == ""
    # but the label itself is kept, like FilteredAttributes
    assert row["ex_labels"]["trace_id"] == "zznothex"


# --- native histograms -------------------------------------------------------


def test_native_histogram_delta_accumulation():
    # deltas [2, 1, -1] → absolute counts [2, 3, 2] (mapExpBuckets)
    h = prw.encode_histogram(
        count=7,
        sum_=21.5,
        schema=3,
        zero_count=0,
        zero_threshold=2**-128,
        positive_offset=-2,
        positive_deltas=[2, 1, -1],
        ts_ms=5000,
    )
    ts = prw.encode_time_series(
        {"__name__": "lat_hist", "job": "api"}, [], histograms=[h]
    )
    (row,) = list(prw.series_exp_histograms(_roundtrip([ts])))
    assert row["count"] == 7
    assert row["sum"] == 21.5
    assert row["scale"] == 3
    assert row["positive_offset"] == -2
    assert row["positive_counts"] == [2, 3, 2]
    assert row["ts_ms"] == 5000
    assert row["labels"] == {"job": "api"}


# --- Spark ingest path -------------------------------------------------------


def test_prw_points_on_executors(spark):
    ts1 = prw.encode_time_series(
        {"__name__": "http_req_total", "svc": "a"}, [(1.0, 100), (2.0, 200)]
    )
    ts2 = prw.encode_time_series(
        {"__name__": "proc_mem_bytes", "svc": "b"}, [(512.0, 100)]
    )
    payloads = [
        (prw.encode_write_request([ts1]),),
        (prw.encode_write_request([ts2]),),
    ]
    df = spark.createDataFrame(payloads, "payload binary")
    rows = {
        (r["name"], r["mtype"], r["unit"], r["labels"]["svc"], r["ts_ms"], r["value"])
        for r in prw.prw_points(df).collect()
    }
    assert rows == {
        ("http_req_total", "sum", "", "a", 100, 1.0),
        ("http_req_total", "sum", "", "a", 200, 2.0),
        ("proc_mem_bytes", "gauge", "bytes", "b", 100, 512.0),
    }
