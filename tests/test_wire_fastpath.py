"""Differential tests for the canonical-layout wire fast paths (r12).

The decode hot loops (`prw._decode_timeseries`, `prw._label_fast`,
`prw._sample_fast`, `otlp_pb.decode_any_value`, `otlp_pb._decode_kv`,
`otlp_pb._decode_number_point`) dispatch on the single-byte tags the
encoders emit and bail to the generic ``_wire_fields`` walkers on any
other layout.  These tests pin fast == generic on randomized canonical
payloads AND on hand-built non-canonical layouts (reordered fields,
multi-byte length varints, unknown trailing fields), so the fast paths
can never change what a payload decodes to.
"""

from __future__ import annotations

import random
import struct

from oteldb_spark.sources import otlp_pb as pb
from oteldb_spark.sources import pprof
from oteldb_spark.sources import prw


def _decode_write_request_generic(data: bytes) -> list[dict]:
    """The pre-r12 generic decode loop, kept here as the referee."""
    series = []
    for fno, _, val in prw._wire_fields(data):
        if fno != 1:
            continue
        ts: dict = {"labels": {}, "samples": [], "exemplars": [], "histograms": []}
        for sfno, _, sval in prw._wire_fields(val):
            if sfno == 1:
                k, v = prw._decode_label(sval)
                ts["labels"][k] = v
            elif sfno == 2:
                ts["samples"].append(prw._decode_sample(sval))
            elif sfno == 3:
                ts["exemplars"].append(prw._decode_exemplar_generic(sval))
            elif sfno == 4:
                ts["histograms"].append(prw._decode_histogram_generic(sval))
        series.append(ts)
    return series


def test_prw_fastpath_matches_generic_fuzz():
    rng = random.Random(1234)
    for trial in range(100):
        series = []
        for i in range(rng.randrange(1, 6)):
            labels = {
                "__name__": f"m_{i}",
                "long": "x" * rng.randrange(0, 300),  # multi-byte len varint
                "uni": "é" * (i % 3),
                "empty": "",
            }
            samples = [
                (rng.random() if rng.random() < 0.9 else float("nan"),
                 rng.randrange(0, 2**41))
                for _ in range(rng.randrange(0, 5))
            ]
            series.append(
                prw.encode_time_series(
                    labels,
                    samples,
                    exemplars=[prw.encode_exemplar({"trace_id": "t"}, 1.5, 9)]
                    if i % 3 == 0
                    else (),
                    histograms=[
                        prw.encode_histogram(
                            count=4, sum_=2.0, schema=3, zero_count=1,
                            zero_threshold=1e-9, positive_offset=-1,
                            positive_deltas=[2, -1], ts_ms=77,
                        )
                    ]
                    if i % 4 == 0
                    else (),
                )
            )
        body = prw.encode_write_request(series)
        assert repr(prw.decode_write_request(body)) == repr(
            _decode_write_request_generic(prw.snappy_decompress(body))
        ), trial


def test_prw_fastpath_noncanonical_layouts():
    # label with value before name; sample with unknown trailing field;
    # timeseries with an unknown field; sample without timestamp
    lbl_rev = prw._enc_len(2, b"val") + prw._enc_len(1, b"name")
    assert prw._label_fast(lbl_rev) == prw._decode_label(lbl_rev) == ("name", "val")

    smp_trail = (
        prw._tag(1, 1) + struct.pack("<d", 3.5)
        + prw._tag(2, 0) + prw._enc_uvarint(42)
        + prw._tag(9, 0) + prw._enc_uvarint(7)  # unknown field 9
    )
    assert prw._sample_fast(smp_trail) == prw._decode_sample(smp_trail) == (3.5, 42)

    smp_nots = prw._tag(1, 1) + struct.pack("<d", 2.0)
    assert prw._sample_fast(smp_nots) == prw._decode_sample(smp_nots) == (2.0, 0)

    ts = prw.encode_time_series({"__name__": "m"}, [(1.0, 5)])
    ts_unknown = prw._tag(9, 0) + prw._enc_uvarint(3) + ts
    body = prw.encode_write_request([ts_unknown])
    assert prw.decode_write_request(body) == _decode_write_request_generic(
        prw.snappy_decompress(body)
    )

    # metadata (field 3) interleaved before a series — skipped by both
    raw = prw._enc_len(3, b"\x0a\x01x") + prw._enc_len(1, ts)
    assert prw.decode_write_request(raw, compressed=False) == (
        _decode_write_request_generic(raw)
    )


def test_otlp_any_value_and_kv_fastpath():
    rng = random.Random(99)
    cases = [
        pb.enc_any_string(""),
        pb.enc_any_string("s" * 200 + "é"),  # multi-byte len varint
        pb.enc_any_int(-42),
        pb.enc_any_double(0.25),
        pb._tag(2, 0) + pb._enc_uvarint(1),  # boolValue
        pb._enc_len(7, b"\x01\xff"),  # bytesValue
        pb._enc_len(
            5, pb._enc_len(1, pb.enc_any_string("a")) + pb._enc_len(1, pb.enc_any_int(2))
        ),  # arrayValue
    ]
    for av in cases:
        kv = pb.enc_kv("k" * rng.randrange(1, 160), av)
        assert pb._decode_kv(kv) == pb._decode_kv_generic(kv)
    # key-only KV, and value-before-key (non-canonical order)
    kv_only = pb._enc_len(1, b"justkey")
    assert pb._decode_kv(kv_only) == pb._decode_kv_generic(kv_only)
    kv_rev = pb._enc_len(2, pb.enc_any_string("v")) + pb._enc_len(1, b"rk")
    assert pb._decode_kv(kv_rev) == pb._decode_kv_generic(kv_rev)


def test_otlp_kv_inplace_fastpath():
    # _kv_fast parses the KV at [p, end) of a PARENT buffer; for every
    # AnyValue kind it must either equal _decode_kv(slice) or return
    # None (caller falls back).  Canonical string KVs must actually
    # take the in-place path.
    cases = [
        ("k", pb.enc_any_string("v")),
        ("k" * 150, pb.enc_any_string("s" * 200 + "é")),  # multi-byte lens
        ("k", pb.enc_any_string("")),
        ("i", pb.enc_any_int(-42)),
        ("d", pb.enc_any_double(0.25)),
        ("b", pb._tag(2, 0) + pb._enc_uvarint(1)),  # boolValue
        ("y", pb._enc_len(7, b"\x01\xff")),  # bytesValue
        (
            "a",
            pb._enc_len(
                5,
                pb._enc_len(1, pb.enc_any_string("a"))
                + pb._enc_len(1, pb.enc_any_int(2)),
            ),
        ),  # arrayValue — inner 0x0A must not be mistaken for stringValue
    ]
    for key, av in cases:
        kv = pb.enc_kv(key, av)
        parent = b"\xff\x00" + kv + b"\x0a\x34"  # arbitrary neighbors
        got = pb._kv_fast(parent, 2, 2 + len(kv))
        assert got is None or got == pb._decode_kv(kv), key
    # canonical string KV must engage the fast path
    kv = pb.enc_kv("svc", pb.enc_any_string("api"))
    assert pb._kv_fast(b"Z" + kv, 1, 1 + len(kv)) == {
        "key": "svc",
        "value": {"stringValue": "api"},
    }
    # key-only KV
    kv_only = pb._enc_len(1, b"justkey")
    assert pb._kv_fast(kv_only, 0, len(kv_only)) == pb._decode_kv(kv_only)
    # value-before-key (non-canonical order) → None, fallback handles it
    kv_rev = pb._enc_len(2, pb.enc_any_string("v")) + pb._enc_len(1, b"rk")
    assert pb._kv_fast(kv_rev, 0, len(kv_rev)) is None


def test_otlp_metric_inline_walk():
    rng = random.Random(77)
    pt = lambda i: pb.enc_number_point(  # noqa: E731
        time_ns=i, value=float(i), attrs={"u": str(i)}
    )
    hpt = pb.enc_histogram_point(
        time_ns=5, bucket_counts=[1, 2, 3], explicit_bounds=[0.5, 1.5], sum_=7.0
    )
    ept = pb.enc_exp_histogram_point(
        time_ns=9, count=4, sum_=2.5, scale=3, zero_count=1,
        positive_offset=-1, positive_counts=[2, 1],
    )
    metrics = [
        pb.enc_gauge_metric("g", "", [pt(i) for i in range(rng.randrange(1, 200))]),
        pb.enc_sum_metric("s", "1", [pt(i) for i in range(150)]),
        pb.enc_sum_metric("s2", "1", [pt(1)], monotonic=False),
        pb.enc_histogram_metric("h", "ms", [hpt]),
        pb.enc_exp_histogram_metric("e", "s", [ept]),
        # summary (field 11): minimal dataPoint, same decoder both paths
        pb._enc_len(1, b"sm") + pb._enc_len(11, pb._enc_len(1, pb._enc_fixed64(3, 123))),
        # empty gauge; name with multi-byte len varint
        pb._enc_len(1, b"n" * 200) + pb._enc_len(5, b""),
    ]
    for i, m in enumerate(metrics):
        assert pb._decode_metric(m) == pb._decode_metric_generic(m), i
    # non-canonical layouts → whole-buffer bail to the generic walker:
    # description (field 2), metadata (field 12), unknown varint field,
    # unknown subfield inside sum
    base = pb.enc_gauge_metric("g", "", [pt(1)])
    for extra in (
        pb._enc_len(2, b"desc"),
        pb._enc_len(12, b"\x0a\x01x"),
        pb._tag(14, 0) + pb._enc_uvarint(3),
    ):
        buf = base + extra
        assert pb._decode_metric(buf) == pb._decode_metric_generic(buf)
    odd_sum = pb._enc_len(1, b"s") + pb._enc_len(
        7, pb._enc_len(1, pt(1)) + pb._enc_len(4, b"zz")  # unknown field 4
    )
    assert pb._decode_metric(odd_sum) == pb._decode_metric_generic(odd_sum)
    # isMonotonic BEFORE dataPoints (non-canonical order, still inline-able)
    rev_sum = pb._enc_len(1, b"s") + pb._enc_len(
        7, pb._tag(3, 0) + pb._enc_uvarint(1) + pb._enc_len(1, pt(1))
    )
    assert pb._decode_metric(rev_sum) == pb._decode_metric_generic(rev_sum)


def test_otlp_number_point_fastpath():
    rng = random.Random(5)
    for trial in range(100):
        kw = dict(time_ns=rng.randrange(0, 2**62))
        if rng.random() < 0.5:
            kw["value"] = rng.random() * 1e6
        else:
            kw["value"], kw["as_int"] = rng.randrange(-(2**40), 2**40), True
        if rng.random() < 0.4:
            kw["attrs"] = {"a": "v", "b" * 140: "w"}
        if rng.random() < 0.2:
            kw["exemplars"] = [pb.enc_exemplar(time_ns=1, value=2.5)]
        p = pb.enc_number_point(**kw)
        assert pb._decode_number_point(p) == pb._decode_number_point_generic(p), trial

    # startTimeUnixNano (field 2, fixed64) is not on the fast-tag list →
    # whole-buffer bail to the generic walker; flags (field 8, varint) too
    p = pb._enc_fixed64(2, 111) + pb.enc_number_point(time_ns=9, value=1.0)
    assert pb._decode_number_point(p) == pb._decode_number_point_generic(p)
    p2 = pb.enc_number_point(time_ns=9, value=1.0) + pb._tag(8, 0) + pb._enc_uvarint(1)
    assert pb._decode_number_point(p2) == pb._decode_number_point_generic(p2)


def test_otlp_span_fastpath():
    rng = random.Random(21)
    for trial in range(100):
        kw = dict(
            trace_id=bytes(rng.randrange(256) for _ in range(16)),
            span_id=bytes(rng.randrange(256) for _ in range(8)),
            name="op-" + "x" * rng.randrange(0, 200),  # multi-byte len varint
            kind=rng.randrange(0, 6) if rng.random() < 0.8 else 200,  # 2-byte varint
            start_ns=rng.randrange(0, 2**62),
            end_ns=rng.randrange(0, 2**62),
            status_code=rng.randrange(0, 3),
            status_message="err" if trial % 5 == 0 else "",
        )
        if rng.random() < 0.6:
            kw["parent_span_id"] = bytes(rng.randrange(256) for _ in range(8))
        if rng.random() < 0.7:
            kw["attrs"] = {"http.method": "GET", "k" * 150: "v"}
        s = pb.enc_span(**kw)
        assert pb._decode_span(s) == pb._decode_span_generic(s), trial

    # unknown fields (events=11, droppedAttributesCount=10/varint, flags=16/
    # fixed32) are not on the fast-tag list → whole-buffer bail to generic
    base = pb.enc_span(
        trace_id=b"\x01" * 16, span_id=b"\x02" * 8, name="n", start_ns=1, end_ns=2
    )
    for extra in (
        pb._enc_len(11, b"\x0a\x01x"),  # events
        pb._tag(10, 0) + pb._enc_uvarint(3),  # droppedAttributesCount
        pb._tag(16, 5) + b"\x01\x00\x00\x00",  # flags, fixed32
    ):
        buf = base + extra
        assert pb._decode_span(buf) == pb._decode_span_generic(buf)
    # non-canonical order: name before ids
    rev = pb._enc_len(5, b"nm") + pb._enc_len(1, b"\x03" * 16)
    assert pb._decode_span(rev) == pb._decode_span_generic(rev)


def test_otlp_log_record_fastpath():
    rng = random.Random(31)
    for trial in range(100):
        kw = dict(
            time_ns=rng.randrange(0, 2**62),
            severity_number=rng.choice([1, 9, 17, 200]),  # incl. 2-byte varint
            severity_text=rng.choice(["", "INFO", "WARN" * 60]),
            body="msg " + "y" * rng.randrange(0, 250),
        )
        if rng.random() < 0.6:
            kw["attrs"] = {"k8s.pod": "p1", "long" * 40: "w"}
        if rng.random() < 0.4:
            kw["trace_id"] = bytes(rng.randrange(256) for _ in range(16))
            kw["span_id"] = bytes(rng.randrange(256) for _ in range(8))
        if rng.random() < 0.3:
            kw["observed_ns"] = rng.randrange(0, 2**62)
        r = pb.enc_log_record(**kw)
        assert pb._decode_log_record(r) == pb._decode_log_record_generic(r), trial

    # unknown field (droppedAttributesCount=7/varint, eventName=12/len) →
    # whole-buffer bail; non-canonical order (body before time) → bail too
    base = pb.enc_log_record(time_ns=5, body="b")
    for extra in (
        pb._tag(7, 0) + pb._enc_uvarint(2),
        pb._enc_len(12, b"evt"),
    ):
        buf = base + extra
        assert pb._decode_log_record(buf) == pb._decode_log_record_generic(buf)
    rev = pb._enc_len(5, pb.enc_any_string("body")) + pb._enc_fixed64(1, 9)
    assert pb._decode_log_record(rev) == pb._decode_log_record_generic(rev)


def test_pprof_sample_fastpath():
    rng = random.Random(41)
    # canonical packed encodings, incl. multi-byte varints and signed values
    for trial in range(100):
        stacks = [
            (
                [f"fn{rng.randrange(50)}" for _ in range(rng.randrange(1, 6))],
                rng.randrange(-(2**40), 2**40),
            )
            for _ in range(rng.randrange(1, 30))
        ]
        body = pprof.encode_profile(stacks, time_nanos=rng.randrange(0, 2**40))
        p = pprof.decode_profile(body)
        from oteldb_spark.sources.prw import _wire_fields

        for fno, _, val in _wire_fields(body):
            if fno == 2:
                assert pprof._decode_psample(val) == (
                    pprof._decode_psample_generic(val)
                ), trial
        # end-to-end: resolved stacks must round-trip the input
        got = [
            (list(reversed(s["frames_leaf_first"])), s["values"][0])
            for s in p["samples"]
        ]
        assert got == [(st, v) for st, v in stacks], trial

    # unpacked (wt 0) encodings and a labels field (3) → whole-buffer bail
    t = pprof._tag
    u = pprof._enc_uvarint
    unpacked = t(1, 0) + u(7) + t(1, 0) + u(9) + t(2, 0) + u(2**64 - 5)
    assert pprof._decode_psample(unpacked) == pprof._decode_psample_generic(
        unpacked
    ) == {"location_ids": [7, 9], "values": [-5]}
    with_labels = pprof._enc_len(1, u(3)) + pprof._enc_len(3, b"\x08\x01")
    assert pprof._decode_psample(with_labels) == (
        pprof._decode_psample_generic(with_labels)
    )


def test_prw_native_histogram_fastpath():
    rng = random.Random(51)
    for trial in range(100):
        h = prw.encode_histogram(
            count=rng.randrange(0, 2**40),
            sum_=rng.random() * 1e6,
            schema=rng.randrange(-4, 9),  # signed → zigzag
            zero_count=rng.randrange(0, 5),
            zero_threshold=1e-9,
            positive_offset=rng.randrange(-300, 300),  # multi-byte zigzag
            positive_deltas=[
                rng.randrange(-(2**33), 2**33)  # multi-byte packed zigzag
                for _ in range(rng.randrange(0, 40))
            ],
            ts_ms=rng.randrange(0, 2**41),
        )
        if rng.random() < 0.3:  # float count/zero_count (fields 2/7)
            h += prw._tag(2, 1) + struct.pack("<d", 7.0)
            h += prw._tag(7, 1) + struct.pack("<d", 2.0)
        if rng.random() < 0.3:  # negative spans + packed double counts
            h += prw._enc_len(8, prw._tag(1, 0) + prw._enc_zigzag(-3)
                              + prw._tag(2, 0) + prw._enc_uvarint(2))
            h += prw._enc_len(10, struct.pack("<dd", 1.5, 2.5))
        if rng.random() < 0.3:  # reset_hint (field 14)
            h += prw._tag(14, 0) + prw._enc_uvarint(rng.randrange(0, 4))
        assert repr(prw._decode_histogram(h)) == repr(
            prw._decode_histogram_generic(h)
        ), trial

    # non-canonical: unpacked wt-0 delta, unpacked wt-1 count, unknown
    # field, span with unknown subfield → all equal the generic decode
    base = prw.encode_histogram(
        count=4, sum_=2.0, schema=3, zero_count=1, zero_threshold=1e-9,
        positive_offset=-1, positive_deltas=[2, -1], ts_ms=77,
    )
    for extra in (
        prw._tag(12, 0) + prw._enc_zigzag(-9),  # unpacked positive delta
        prw._tag(13, 1) + struct.pack("<d", 3.5),  # unpacked positive count
        prw._tag(16, 0) + prw._enc_uvarint(1),  # unknown field 16
        prw._enc_len(11, prw._tag(1, 0) + prw._enc_zigzag(2)
                     + prw._tag(3, 0) + prw._enc_uvarint(1)),  # odd span
    ):
        buf = base + extra
        assert repr(prw._decode_histogram(buf)) == repr(
            prw._decode_histogram_generic(buf)
        )


def test_prw_exemplar_fastpath():
    rng = random.Random(52)
    for trial in range(50):
        e = prw.encode_exemplar(
            {"trace_id": "t" * rng.randrange(1, 40), "empty": ""},
            rng.random() * 1e6,
            rng.randrange(0, 2**41),
        )
        assert repr(prw._decode_exemplar(e)) == repr(
            prw._decode_exemplar_generic(e)
        ), trial
    # negative timestamp (10-byte two's-complement varint), unknown field
    neg = (prw._tag(2, 1) + struct.pack("<d", 1.5)
           + prw._tag(3, 0) + prw._enc_uvarint((1 << 64) - 7))
    assert prw._decode_exemplar(neg)["timestamp_ms"] == -7
    assert repr(prw._decode_exemplar(neg)) == repr(prw._decode_exemplar_generic(neg))
    unk = neg + prw._tag(9, 0) + prw._enc_uvarint(1)
    assert repr(prw._decode_exemplar(unk)) == repr(prw._decode_exemplar_generic(unk))


def test_otlp_histogram_point_fastpath():
    rng = random.Random(61)
    for trial in range(100):
        nb = rng.randrange(1, 20)
        p = pb.enc_histogram_point(
            time_ns=rng.randrange(0, 2**62),
            bucket_counts=[rng.randrange(0, 2**40) for _ in range(nb + 1)],
            explicit_bounds=[float(k) for k in range(nb)],
            sum_=rng.random() * 1e6,
            attrs={"a": "v", "b" * 140: "w"} if rng.random() < 0.5 else None,
        )
        if rng.random() < 0.3:  # min/max (fields 11/12, not encoder-emitted)
            p += pb._enc_double(11, -1.5) + pb._enc_double(12, 99.5)
        if rng.random() < 0.3:  # startTime + flags: skipped by both walks
            p = pb._enc_fixed64(2, 7) + p + pb._tag(10, 0) + pb._enc_uvarint(1)
        if rng.random() < 0.2:  # exemplars (field 8): ignored by both walks
            p += pb._enc_len(8, pb.enc_exemplar(time_ns=1, value=2.5))
        assert repr(pb._decode_histogram_point(p)) == repr(
            pb._decode_histogram_point_generic(p)
        ), trial

    # unpacked wt-1 bucket count / bound (non-canonical) → whole-buffer
    # bail; unknown field → bail; all must equal the generic decode
    base = pb.enc_histogram_point(
        time_ns=5, bucket_counts=[1, 2], explicit_bounds=[0.5], sum_=3.0
    )
    for extra in (
        pb._enc_fixed64(6, 9),  # unpacked bucketCount, wt 1
        pb._enc_double(7, 2.5),  # unpacked explicitBound, wt 1
        pb._tag(13, 0) + pb._enc_uvarint(3),  # unknown field 13
    ):
        buf = base + extra
        assert repr(pb._decode_histogram_point(buf)) == repr(
            pb._decode_histogram_point_generic(buf)
        )


def test_otlp_exp_histogram_point_fastpath():
    rng = random.Random(71)
    for trial in range(100):
        p = pb.enc_exp_histogram_point(
            time_ns=rng.randrange(0, 2**62),
            count=rng.randrange(0, 2**40),
            sum_=rng.random() * 1e6,
            scale=rng.randrange(-4, 21),  # signed → zigzag varint
            zero_count=rng.randrange(0, 5),
            positive_offset=rng.randrange(-300, 300),  # multi-byte zigzag
            positive_counts=[
                rng.randrange(0, 2**34)  # multi-byte packed varints
                for _ in range(rng.randrange(1, 50))
            ],
            attrs={"etype": f"t{trial % 5}"} if rng.random() < 0.6 else None,
            negative_offset=-2,
            negative_counts=[1, 200, 3] if rng.random() < 0.4 else (),
        )
        if rng.random() < 0.3:  # startTime + flags: skipped by both walks
            p = pb._enc_fixed64(2, 7) + p + pb._tag(10, 0) + pb._enc_uvarint(0)
        if rng.random() < 0.2:  # exemplars (field 11): ignored by both
            p += pb._enc_len(11, pb.enc_exemplar(time_ns=1, value=2.5))
        assert repr(pb._decode_exp_histogram_point(p)) == repr(
            pb._decode_exp_histogram_point_generic(p)
        ), trial

    # unpacked bucket counts (wt 0, tag 0x10) — in-place path handles them
    bk = (
        pb._tag(1, 0) + pb._enc_uvarint(3)  # offset zigzag → -2
        + pb._tag(2, 0) + pb._enc_uvarint(7)
        + pb._tag(2, 0) + pb._enc_uvarint(300)
    )
    assert pb._exp_buckets_fast(bk, 0, len(bk)) == pb._decode_exp_buckets(bk) == {
        "offset": -2,
        "bucketCounts": ["7", "300"],
    }
    # unknown field inside buckets → in-place returns None, caller falls back
    bk_odd = bk + pb._tag(3, 0) + pb._enc_uvarint(1)
    assert pb._exp_buckets_fast(bk_odd, 0, len(bk_odd)) is None
    base = pb.enc_exp_histogram_point(
        time_ns=5, count=4, sum_=2.5, scale=3, zero_count=1,
        positive_offset=-1, positive_counts=[2, 1],
    )
    for extra in (
        pb._enc_len(8, bk_odd),  # buckets with unknown subfield
        pb._enc_double(12, 0.5),  # min (field 12): unknown → bail
        pb._tag(15, 0) + pb._enc_uvarint(3),  # unknown varint field
    ):
        buf = base + extra
        assert repr(pb._decode_exp_histogram_point(buf)) == repr(
            pb._decode_exp_histogram_point_generic(buf)
        )


def test_otlp_exemplar_fastpath():
    rng = random.Random(81)
    for trial in range(100):
        kw = dict(time_ns=rng.randrange(0, 2**62), value=rng.random() * 1e6)
        if rng.random() < 0.5:
            kw["trace_id"] = bytes(rng.randrange(256) for _ in range(16))
            kw["span_id"] = bytes(rng.randrange(256) for _ in range(8))
        if rng.random() < 0.5:
            kw["attrs"] = {"user": "u1", "k" * 140: "w"}
        e = pb.enc_exemplar(**kw)
        if rng.random() < 0.3:  # asInt (field 6, sfixed64), negative too
            e += pb._tag(6, 1) + struct.pack("<q", rng.randrange(-(2**40), 2**40))
        assert repr(pb._decode_exemplar(e)) == repr(
            pb._decode_exemplar_generic(e)
        ), trial

    # non-canonical order (value before time) is still tag-dispatchable;
    # unknown field → whole-buffer bail — both must equal generic
    rev = pb._enc_double(3, 1.5) + pb._enc_fixed64(2, 9)
    assert repr(pb._decode_exemplar(rev)) == repr(pb._decode_exemplar_generic(rev))
    unk = pb.enc_exemplar(time_ns=1, value=2.0) + pb._tag(8, 0) + pb._enc_uvarint(1)
    assert repr(pb._decode_exemplar(unk)) == repr(pb._decode_exemplar_generic(unk))


def test_pprof_profile_walk_skips_unknown_fields():
    # the inline top-level Profile walk must skip unhandled fields of
    # every wiretype exactly like the old generator loop (period_type=10
    # len, period=11 varint, mapping=3 len, keep_frames=8 varint), and
    # handle a multi-byte time_nanos varint
    t = pprof._tag
    u = pprof._enc_uvarint
    body = pprof.encode_profile([(["a", "b"], 7), (["c"], 9)], time_nanos=2**40)
    noise = (
        pprof._enc_len(10, t(1, 0) + u(1) + t(2, 0) + u(2))  # period_type
        + t(11, 0) + u(10_000_000)  # period
        + pprof._enc_len(3, t(1, 0) + u(1))  # mapping
        + t(8, 0) + u(3)  # keep_frames
    )
    assert repr(pprof.decode_profile(noise + body)) == repr(
        pprof.decode_profile(body)
    )
    assert pprof.decode_profile(body)["time_nanos"] == 2**40


def test_pprof_unreferenced_dangling_location_decodes():
    # ADVICE r12: an UNREFERENCED Location whose Line names a function
    # id absent from the function table must not break the decode —
    # the pre-r12 lazy resolution only touched sample-referenced
    # locations, and the memoized resolution must keep that contract
    t = pprof._tag
    u = pprof._enc_uvarint
    body = pprof.encode_profile([(["a", "b"], 7), (["c"], 9)])
    dangling = pprof._enc_len(
        4, t(1, 0) + u(77) + pprof._enc_len(4, t(1, 0) + u(99))
    )
    assert repr(pprof.decode_profile(body + dangling)) == repr(
        pprof.decode_profile(body)
    )


def test_request_kv_memo_matches_unmemoized():
    # decode_{metrics,traces,logs}_request thread a per-request KV memo
    # through the point/span/record walks; the result must be
    # repr-identical to the memo-less per-message decode, on repeated
    # AND all-distinct attr patterns (incl. non-canonical KVs that take
    # the _decode_kv fallback inside the memo branch)
    rng = random.Random(91)
    base = 1_704_067_200_000_000_000
    for trial in range(10):
        mk_attrs = lambda s, i: (  # noqa: E731
            {"cpu": str(s % 8), "instance": "host-3"}  # repeats
            if trial % 2 == 0
            else {"uniq": f"v{s}_{i}"}  # all distinct
        )
        metrics = [
            pb.enc_gauge_metric(
                f"m_{s}", "1",
                [
                    pb.enc_number_point(
                        time_ns=base + i, value=float(i), attrs=mk_attrs(s, i)
                    )
                    for i in range(rng.randrange(1, 8))
                ],
            )
            for s in range(5)
        ]
        pay = pb.enc_metrics_request({"service.name": "node"}, metrics)
        got = pb.decode_metrics_request(pay)
        want = {
            "resourceMetrics": [
                {
                    "resource": pb._decode_resource(
                        next(v for f, _, v in prw._wire_fields(
                            next(v for f, _, v in prw._wire_fields(pay) if f == 1)
                        ) if f == 1)
                    ),
                    "scopeMetrics": [
                        {"metrics": [pb._decode_metric(m) for m in metrics]}
                    ],
                }
            ]
        }
        assert repr(got) == repr(want), trial

    # non-canonical KV (value before key) inside a span: the memo
    # branch must take the _decode_kv fallback and still match
    odd_kv = pb._enc_len(2, pb.enc_any_string("v")) + pb._enc_len(1, b"rk")
    span = pb.enc_span(
        trace_id=b"\x01" * 16, span_id=b"\x02" * 8, name="n",
        start_ns=1, end_ns=2,
    ) + pb._enc_len(9, odd_kv) + pb._enc_len(9, odd_kv)  # repeated → memo hit
    pay = pb.enc_traces_request({"service.name": "api"}, [span, span])
    got = pb.decode_traces_request(pay)
    spans = got["resourceSpans"][0]["scopeSpans"][0]["spans"]
    assert [repr(s) for s in spans] == [repr(pb._decode_span(span))] * 2
    assert spans[0]["attributes"][0] == {"key": "rk", "value": {"stringValue": "v"}}

    # logs: memoized request decode == per-record decode
    recs = [
        pb.enc_log_record(time_ns=base + i, body=f"m{i}", attrs={"k8s.pod": "p1"})
        for i in range(6)
    ]
    pay = pb.enc_logs_request({"service.name": "api"}, recs)
    got = pb.decode_logs_request(pay)
    assert [
        repr(r) for r in got["resourceLogs"][0]["scopeLogs"][0]["logRecords"]
    ] == [repr(pb._decode_log_record(r)) for r in recs]

    # the inline request walks must skip unknown fields at every level
    # (schemaUrl=3 at resource AND scope level, unknown varint at top)
    # exactly like the generator loops did
    for enc, dec, key in (
        (pb.enc_logs_request, pb.decode_logs_request, "resourceLogs"),
        (pb.enc_traces_request, pb.decode_traces_request, "resourceSpans"),
        (pb.enc_metrics_request, pb.decode_metrics_request, "resourceMetrics"),
    ):
        if key == "resourceLogs":
            body = enc({"service.name": "api"}, recs)
        elif key == "resourceSpans":
            body = enc({"service.name": "api"}, [pb.enc_span(
                trace_id=b"\x01" * 16, span_id=b"\x02" * 8, name="n",
                start_ns=1, end_ns=2)])
        else:
            body = enc({"service.name": "api"}, [pb.enc_gauge_metric(
                "g", "", [pb.enc_number_point(time_ns=1, value=2.0)])])
        clean = dec(body)
        # splice schemaUrl into the resource-level message and append
        # top-level noise; both must be ignored
        inner = next(
            v for f, _, v in prw._wire_fields(body) if f == 1
        ) + pb._enc_len(3, b"https://example/schema")
        noisy = pb._enc_len(1, inner) + pb._tag(9, 0) + pb._enc_uvarint(5)
        assert repr(dec(noisy)) == repr(clean), key


def test_prw_points_columnar_min_ts(spark):
    # prw_points inlines series_points' min_ts_ms cutoff in its columnar
    # builder — pin the cutoff behavior end-to-end
    ts = prw.encode_time_series(
        {"__name__": "http_req_total", "svc": "a"},
        [(1.0, 100), (2.0, 200), (3.0, 300)],
    )
    df = spark.createDataFrame([(prw.encode_write_request([ts]),)], "payload binary")
    rows = {
        (r["ts_ms"], r["value"])
        for r in prw.prw_points(df, min_ts_ms=200).collect()
    }
    assert rows == {(200, 2.0), (300, 3.0)}
