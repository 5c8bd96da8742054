"""Prometheus remote-write ingest: snappy + protobuf decode to rows.

The reference receives remote-write over HTTP, snappy-decodes the body
and unmarshals a ``prometheus.WriteRequest`` protobuf, then maps each
TimeSeries to OTLP metric points with suffix-based typing (see
``prometheusremotewrite/remotewrite.go:44`` (DecodeRequest),
``prw_to_metrics.go:32`` (FromTimeSeries) and ``suffix.go:24``
(IsValidSuffix / IsValidCumulativeSuffix / IsValidUnit) in the
reference repo; wire schema ``internal/prompb/types.proto``).

Here the transport is a DataFrame with a ``payload`` binary column —
one row per received request body — and the decode runs on the
executors via ``mapInPandas``: the driver never touches the bytes, so
ingest parallelism is the number of payload partitions.  The same
function works unchanged on a ``readStream`` source (Kafka value
column, file stream), which is the cluster ingest path.

Both codecs are hand-rolled from the public formats (snappy block
format, protobuf wire encoding) — the container has neither
``python-snappy`` nor ``protobuf`` and the formats are small:

* snappy block: uvarint decompressed length, then tagged elements —
  tag&3 == 0 literal (len in high bits, 60..63 escape to 1-4 length
  bytes), 1/2/3 back-references with 1/2/4-byte offsets.
* protobuf: (field_no << 3 | wire_type) varint keys; wire types 0
  (varint), 1 (fixed64), 2 (length-delimited), 5 (fixed32).

Encoders exist so tests and gates can build deterministic fixture
payloads; they are not part of the ingest path.
"""

from __future__ import annotations

import struct
from typing import Iterable, Iterator

# --- snappy block format -----------------------------------------------------


def _uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _enc_uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def snappy_decompress(buf: bytes) -> bytes:
    """Decode the snappy *block* format (the one remote-write uses)."""
    expected, pos = _uvarint(buf, 0)
    out = bytearray()
    n = len(buf)
    while pos < n:
        tag = buf[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nbytes = ln - 59
                ln = int.from_bytes(buf[pos : pos + nbytes], "little")
                pos += nbytes
            ln += 1
            out += buf[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | buf[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(buf[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy: bad copy offset")
        if off >= ln:  # non-overlapping fast path
            start = len(out) - off
            out += out[start : start + ln]
        else:  # overlapping copy repeats recent bytes
            for _ in range(ln):
                out.append(out[-off])
    if len(out) != expected:
        raise ValueError(
            f"snappy: length mismatch (got {len(out)}, want {expected})"
        )
    return bytes(out)


def snappy_compress(data: bytes) -> bytes:
    """Literal-only snappy encoder (valid output, no back-references).

    Fixture/test helper — real senders compress harder, the decoder
    handles both.
    """
    out = bytearray(_enc_uvarint(len(data)))
    pos = 0
    while pos < len(data):
        chunk = data[pos : pos + 65536]
        ln = len(chunk) - 1
        if ln < 60:
            out.append(ln << 2)
        elif ln < 256:
            out.append(60 << 2)
            out.append(ln)
        else:
            out.append(61 << 2)
            out += ln.to_bytes(2, "little")
        out += chunk
        pos += len(chunk)
    return bytes(out)


# --- protobuf wire walker ----------------------------------------------------


def _wire_fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _uvarint(buf, pos)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            val, pos = _uvarint(buf, pos)
        elif wt == 1:
            val = buf[pos : pos + 8]
            pos += 8
        elif wt == 2:
            ln, pos = _uvarint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            val = buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"protobuf: unsupported wire type {wt}")
        yield fno, wt, val


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= 1 << 63 else v


def _f64(raw: bytes) -> float:
    return struct.unpack("<d", raw)[0]


def _packed_varints(raw: bytes | int, wt: int, *, zigzag: bool) -> list[int]:
    if wt == 0:  # unpacked single element
        vals = [raw]
    else:
        vals = []
        pos = 0
        while pos < len(raw):
            v, pos = _uvarint(raw, pos)
            vals.append(v)
    return [_zigzag(v) if zigzag else v for v in vals]


def _packed_doubles(raw: bytes, wt: int) -> list[float]:
    if wt == 1:
        return [_f64(raw)]
    return [
        struct.unpack_from("<d", raw, i)[0] for i in range(0, len(raw), 8)
    ]


def _decode_label(buf: bytes) -> tuple[str, str]:
    name = value = ""
    for fno, _, val in _wire_fields(buf):
        if fno == 1:
            name = val.decode("utf-8")
        elif fno == 2:
            value = val.decode("utf-8")
    return name, value


def _decode_sample(buf: bytes) -> tuple[float, int]:
    value, ts = 0.0, 0
    for fno, _, val in _wire_fields(buf):
        if fno == 1:
            value = _f64(val)
        elif fno == 2:
            ts = _signed64(val)
    return value, ts


def _decode_exemplar_generic(buf: bytes) -> dict:
    out = {"labels": {}, "value": 0.0, "timestamp_ms": 0}
    for fno, _, val in _wire_fields(buf):
        if fno == 1:
            k, v = _decode_label(val)
            out["labels"][k] = v
        elif fno == 2:
            out["value"] = _f64(val)
        elif fno == 3:
            out["timestamp_ms"] = _signed64(val)
    return out


def _decode_exemplar(buf: bytes) -> dict:
    """Inline Exemplar walk over the wire-canonical tags (labels=1/len
    → 0x0A, value=2/double → 0x11, timestamp=3/varint → 0x18); any
    other tag bails to the generic walker for the whole buffer."""
    labels: dict = {}
    out = {"labels": labels, "value": 0.0, "timestamp_ms": 0}
    pos = 0
    n = len(buf)
    while pos < n:
        tag = buf[pos]
        if tag == 0x0A:  # Label
            b = buf[pos + 1]
            if b < 0x80:
                ln, p = b, pos + 2
            else:
                ln, p = _uvarint(buf, pos + 1)
            pos = p + ln
            k, v = _label_fast(buf[p:pos])
            labels[k] = v
        elif tag == 0x11:  # value, double
            out["value"] = struct.unpack_from("<d", buf, pos + 1)[0]
            pos += 9
        elif tag == 0x18:  # timestamp, int64 varint
            b = buf[pos + 1]
            if b < 0x80:
                v, pos = b, pos + 2
            else:
                v, pos = _uvarint(buf, pos + 1)
            out["timestamp_ms"] = _signed64(v)
        else:
            return _decode_exemplar_generic(buf)
    return out


def _decode_bucket_span(buf: bytes) -> tuple[int, int]:
    offset = length = 0
    for fno, _, val in _wire_fields(buf):
        if fno == 1:
            offset = _zigzag(val)
        elif fno == 2:
            length = val
    return offset, length


def _decode_histogram_generic(buf: bytes) -> dict:
    h = {
        "count": 0,
        "sum": 0.0,
        "schema": 0,
        "zero_threshold": 0.0,
        "zero_count": 0,
        "negative_spans": [],
        "negative_deltas": [],
        "negative_counts": [],
        "positive_spans": [],
        "positive_deltas": [],
        "positive_counts": [],
        "reset_hint": 0,
        "timestamp_ms": 0,
    }
    for fno, wt, val in _wire_fields(buf):
        if fno == 1:
            h["count"] = val
        elif fno == 2:
            h["count"] = int(_f64(val))
        elif fno == 3:
            h["sum"] = _f64(val)
        elif fno == 4:
            h["schema"] = _zigzag(val)
        elif fno == 5:
            h["zero_threshold"] = _f64(val)
        elif fno == 6:
            h["zero_count"] = val
        elif fno == 7:
            h["zero_count"] = int(_f64(val))
        elif fno == 8:
            h["negative_spans"].append(_decode_bucket_span(val))
        elif fno == 9:
            h["negative_deltas"] += _packed_varints(val, wt, zigzag=True)
        elif fno == 10:
            h["negative_counts"] += _packed_doubles(val, wt)
        elif fno == 11:
            h["positive_spans"].append(_decode_bucket_span(val))
        elif fno == 12:
            h["positive_deltas"] += _packed_varints(val, wt, zigzag=True)
        elif fno == 13:
            h["positive_counts"] += _packed_doubles(val, wt)
        elif fno == 14:
            h["reset_hint"] = val
        elif fno == 15:
            h["timestamp_ms"] = _signed64(val)
    return h


def _bucket_span_fast(buf: bytes, p: int, end: int) -> tuple[int, int] | None:
    """In-place canonical BucketSpan parse on the parent buffer
    (offset=1/sint32 → 0x08, length=2/varint → 0x10).  Returns None on
    any other layout; the caller slices and falls back."""
    offset = length = 0
    while p < end:
        tag = buf[p]
        if tag == 0x08:
            b = buf[p + 1]
            if b < 0x80:
                v, p = b, p + 2
            else:
                v, p = _uvarint(buf, p + 1)
            offset = (v >> 1) ^ -(v & 1)
        elif tag == 0x10:
            b = buf[p + 1]
            if b < 0x80:
                length, p = b, p + 2
            else:
                length, p = _uvarint(buf, p + 1)
        else:
            return None
    return offset, length


def _decode_histogram(buf: bytes) -> dict:
    """Inline native-Histogram walk over the wire-canonical prompb tags
    (count=1/varint → 0x08, count_float=2 → 0x11, sum=3 → 0x19,
    schema=4/sint32 → 0x20, zero_threshold=5 → 0x29, zero_count=6 →
    0x30, zero_count_float=7 → 0x39, negative spans/deltas/counts =
    8/9/10 len → 0x42/0x4A/0x52, positive spans/deltas/counts =
    11/12/13 len → 0x5A/0x62/0x6A, reset_hint=14 → 0x70, timestamp=15 →
    0x78); packed delta varints unroll in place, packed count doubles
    unpack in one call.  Any other tag (incl. unpacked wt-0/wt-1
    repeated elements) bails to the generic walker."""
    h = {
        "count": 0,
        "sum": 0.0,
        "schema": 0,
        "zero_threshold": 0.0,
        "zero_count": 0,
        "negative_spans": [],
        "negative_deltas": [],
        "negative_counts": [],
        "positive_spans": [],
        "positive_deltas": [],
        "positive_counts": [],
        "reset_hint": 0,
        "timestamp_ms": 0,
    }
    pos = 0
    n = len(buf)
    unpack_from = struct.unpack_from
    while pos < n:
        tag = buf[pos]
        wt = tag & 7
        if wt == 0:  # varint-valued fields
            b = buf[pos + 1]
            if b < 0x80:
                v, pos = b, pos + 2
            else:
                v, pos = _uvarint(buf, pos + 1)
            if tag == 0x08:
                h["count"] = v
            elif tag == 0x20:
                h["schema"] = (v >> 1) ^ -(v & 1)
            elif tag == 0x30:
                h["zero_count"] = v
            elif tag == 0x70:
                h["reset_hint"] = v
            elif tag == 0x78:
                h["timestamp_ms"] = _signed64(v)
            else:
                return _decode_histogram_generic(buf)
        elif wt == 1:  # fixed64/double-valued fields
            if tag == 0x19:
                h["sum"] = unpack_from("<d", buf, pos + 1)[0]
            elif tag == 0x29:
                h["zero_threshold"] = unpack_from("<d", buf, pos + 1)[0]
            elif tag == 0x11:
                h["count"] = int(unpack_from("<d", buf, pos + 1)[0])
            elif tag == 0x39:
                h["zero_count"] = int(unpack_from("<d", buf, pos + 1)[0])
            else:
                return _decode_histogram_generic(buf)
            pos += 9
        elif wt == 2:  # length-delimited fields
            b = buf[pos + 1]
            if b < 0x80:
                ln, p = b, pos + 2
            else:
                ln, p = _uvarint(buf, pos + 1)
            pos = p + ln
            if tag == 0x62 or tag == 0x4A:  # packed sint64 deltas
                out = h["positive_deltas" if tag == 0x62 else "negative_deltas"]
                append = out.append
                q = p
                while q < pos:
                    b = buf[q]
                    if b < 0x80:
                        append((b >> 1) ^ -(b & 1))
                        q += 1
                    else:
                        v, q = _uvarint(buf, q)
                        append((v >> 1) ^ -(v & 1))
            elif tag == 0x5A or tag == 0x42:  # BucketSpan
                sp = _bucket_span_fast(buf, p, pos)
                if sp is None:
                    sp = _decode_bucket_span(buf[p:pos])
                h["positive_spans" if tag == 0x5A else "negative_spans"].append(sp)
            elif tag == 0x6A or tag == 0x52:  # packed double counts
                if ln & 7:
                    return _decode_histogram_generic(buf)
                h["positive_counts" if tag == 0x6A else "negative_counts"] += (
                    list(unpack_from(f"<{ln >> 3}d", buf, p))
                )
            else:
                return _decode_histogram_generic(buf)
        else:
            return _decode_histogram_generic(buf)
    return h


def _label_fast(buf: bytes) -> tuple[str, str]:
    """Canonical-layout Label decode: 0x0A <len> name [0x12 <len> value].
    Any other layout falls back to the generic walker."""
    n = len(buf)
    if n and buf[0] == 0x0A:
        b = buf[1]
        if b < 0x80:
            ln, pos = b, 2
        else:
            ln, pos = _uvarint(buf, 1)
        end = pos + ln
        if end <= n:
            name = buf[pos:end]
            if end == n:
                return name.decode("utf-8"), ""
            if buf[end] == 0x12:
                b = buf[end + 1]
                if b < 0x80:
                    ln2, pos2 = b, end + 2
                else:
                    ln2, pos2 = _uvarint(buf, end + 1)
                if pos2 + ln2 == n:
                    return (
                        name.decode("utf-8"),
                        buf[pos2 : pos2 + ln2].decode("utf-8"),
                    )
    return _decode_label(buf)


def _sample_fast(buf: bytes) -> tuple[float, int]:
    """Canonical-layout Sample decode: 0x09 <le double> [0x10 <varint ts>].
    Falls back to the generic walker on any other layout."""
    n = len(buf)
    if n >= 9 and buf[0] == 0x09:
        value = struct.unpack_from("<d", buf, 1)[0]
        if n == 9:
            return value, 0
        if buf[9] == 0x10:
            ts = 0
            shift = 0
            pos = 10
            while pos < n:
                b = buf[pos]
                pos += 1
                ts |= (b & 0x7F) << shift
                if not b & 0x80:
                    if pos == n:
                        return value, _signed64(ts)
                    break
                shift += 7
    return _decode_sample(buf)


def _skip_generic(buf: bytes, pos: int) -> int:
    """Skip one (key, value) at ``pos``; returns the next position."""
    key, p = _uvarint(buf, pos)
    wt = key & 7
    if wt == 0:
        _, p = _uvarint(buf, p)
        return p
    if wt == 1:
        return p + 8
    if wt == 2:
        ln, p = _uvarint(buf, p)
        return p + ln
    if wt == 5:
        return p + 4
    raise ValueError(f"protobuf: unsupported wire type {wt}")


def _decode_timeseries(buf: bytes) -> dict:
    """Inline TimeSeries walk — the decode hot loop (one call per
    series, ~(labels+samples) single-byte-tag dispatches inside).
    Profiled against the generic ``_wire_fields`` generator walk:
    the generator machinery was ~60% of decode time.  The canonical
    Sample (0x09 double [0x10 varint ts]) and Label (0x0A name
    [0x12 value]) layouts are parsed in place on the parent buffer —
    no sub-buffer slice, no call — with any other layout handed to
    the per-message fast/generic decoders on a slice."""
    labels: dict = {}
    samples: list = []
    exemplars: list = []
    histograms: list = []
    pos = 0
    n = len(buf)
    unpack_from = struct.unpack_from
    while pos < n:
        tag = buf[pos]
        if tag == 0x12:  # field 2: Sample (the hot repeated field)
            b = buf[pos + 1]
            if b < 0x80:
                ln, p = b, pos + 2
            else:
                ln, p = _uvarint(buf, pos + 1)
            pos = p + ln
            # in-place canonical Sample parse
            if ln >= 9 and buf[p] == 0x09:
                value = unpack_from("<d", buf, p + 1)[0]
                q = p + 9
                if q == pos:
                    samples.append((value, 0))
                    continue
                if buf[q] == 0x10:
                    ts = 0
                    shift = 0
                    q += 1
                    while q < pos:
                        b = buf[q]
                        q += 1
                        ts |= (b & 0x7F) << shift
                        if not b & 0x80:
                            break
                        shift += 7
                    else:
                        samples.append(_decode_sample(buf[p:pos]))
                        continue
                    if q == pos:
                        samples.append(
                            (
                                value,
                                ts
                                if ts < 0x8000000000000000
                                else ts - 0x10000000000000000,
                            )
                        )
                        continue
            samples.append(_sample_fast(buf[p:pos]))
        elif tag == 0x0A:  # field 1: Label
            b = buf[pos + 1]
            if b < 0x80:
                ln, p = b, pos + 2
            else:
                ln, p = _uvarint(buf, pos + 1)
            pos = p + ln
            # in-place canonical Label parse
            if ln and buf[p] == 0x0A:
                b = buf[p + 1]
                if b < 0x80:
                    ke, q = p + 2 + b, p + 2
                else:
                    b, q = _uvarint(buf, p + 1)
                    ke = q + b
                if ke == pos:
                    labels[buf[q:ke].decode("utf-8")] = ""
                    continue
                if ke < pos and buf[ke] == 0x12:
                    b = buf[ke + 1]
                    if b < 0x80:
                        ve, vq = ke + 2 + b, ke + 2
                    else:
                        b, vq = _uvarint(buf, ke + 1)
                        ve = vq + b
                    if ve == pos:
                        labels[buf[q:ke].decode("utf-8")] = buf[
                            vq:ve
                        ].decode("utf-8")
                        continue
            k, v = _label_fast(buf[p:pos])
            labels[k] = v
        elif tag == 0x1A:  # field 3: Exemplar
            b = buf[pos + 1]
            if b < 0x80:
                ln, p = b, pos + 2
            else:
                ln, p = _uvarint(buf, pos + 1)
            pos = p + ln
            exemplars.append(_decode_exemplar(buf[p:pos]))
        elif tag == 0x22:  # field 4: Histogram
            b = buf[pos + 1]
            if b < 0x80:
                ln, p = b, pos + 2
            else:
                ln, p = _uvarint(buf, pos + 1)
            pos = p + ln
            histograms.append(_decode_histogram(buf[p:pos]))
        else:
            pos = _skip_generic(buf, pos)
    return {
        "labels": labels,
        "samples": samples,
        "exemplars": exemplars,
        "histograms": histograms,
    }


def decode_write_request(data: bytes, *, compressed: bool = True) -> list[dict]:
    """Decode a remote-write body into a list of TimeSeries dicts."""
    if compressed:
        data = snappy_decompress(data)
    series = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos] == 0x0A:  # field 1: TimeSeries
            b = data[pos + 1]
            if b < 0x80:
                ln, p = b, pos + 2
            else:
                ln, p = _uvarint(data, pos + 1)
            pos = p + ln
            series.append(_decode_timeseries(data[p:pos]))
        else:  # 3 = metadata, ignored like the reference
            pos = _skip_generic(data, pos)
    return series


# --- suffix typing (reference suffix.go) -------------------------------------

_VALID_SUFFIX = {"max", "sum", "count", "total"}
_CUMULATIVE_SUFFIX = {"sum", "count", "total"}
_VALID_UNIT = {"seconds", "bytes"}


def metric_type_and_unit(name: str) -> tuple[str, str]:
    """(type, unit) from the metric-name suffixes.

    Mirrors FromTimeSeries: with at least two '_'-separated parts, the
    last token can be a type suffix (sum/count/total → cumulative sum;
    max keeps gauge) with the one before optionally a unit, or itself
    a unit token.
    """
    parts = name.split("_")
    if len(parts) < 3:
        return "gauge", ""
    s2 = parts[-1]
    s1 = parts[-2]
    if s2 in _VALID_SUFFIX:
        unit = s1 if s1 in _VALID_UNIT else ""
        mtype = "sum" if s2 in _CUMULATIVE_SUFFIX else "gauge"
        return mtype, unit
    if s2 in _VALID_UNIT:
        return "gauge", s2
    return "gauge", ""


def series_points(
    series: Iterable[dict], *, min_ts_ms: int | None = None
) -> Iterator[dict]:
    """TimeSeries dicts → flat point rows (reference FromTimeSeries).

    ``min_ts_ms`` is the time-threshold cutoff (the reference drops
    samples older than now - 24h by default); pass None to keep all —
    gates do, for determinism.
    """
    for ts in series:
        labels = dict(ts["labels"])
        name = labels.pop("__name__", None)
        if name is None:
            raise ValueError("label __name__ not found")
        mtype, unit = metric_type_and_unit(name)
        for value, t_ms in ts["samples"]:
            if min_ts_ms is not None and t_ms < min_ts_ms:
                continue
            yield {
                "name": name,
                "mtype": mtype,
                "unit": unit,
                "labels": labels,
                "ts_ms": t_ms,
                "value": value,
            }


def series_exemplars(series: Iterable[dict]) -> Iterator[dict]:
    """Exemplar rows with trace/span promotion (prw_to_metrics.go:179)."""
    for ts in series:
        labels = dict(ts["labels"])
        name = labels.pop("__name__", "")
        for ex in ts["exemplars"]:
            ex_labels = dict(ex["labels"])
            trace_id = ex_labels.get("trace_id", "")
            span_id = ex_labels.get("span_id", "")
            # promotion only for well-formed hex ids (16 / 8 bytes)
            if len(trace_id) != 32 or _not_hex(trace_id):
                trace_id = ""
            if len(span_id) != 16 or _not_hex(span_id):
                span_id = ""
            yield {
                "name": name,
                "labels": labels,
                "ex_labels": ex_labels,
                "value": ex["value"],
                "ts_ms": ex["timestamp_ms"],
                "trace_id": trace_id,
                "span_id": span_id,
            }


def series_exp_histograms(series: Iterable[dict]) -> Iterator[dict]:
    """Native-histogram rows; delta-form buckets are re-accumulated to
    absolute counts like mapExpBuckets (prw_to_metrics.go:238)."""
    for ts in series:
        labels = dict(ts["labels"])
        name = labels.pop("__name__", "")
        for h in ts["histograms"]:
            yield {
                "name": name,
                "labels": labels,
                "ts_ms": h["timestamp_ms"],
                "count": h["count"],
                "sum": h["sum"],
                "scale": h["schema"],
                "zero_count": h["zero_count"],
                "zero_threshold": h["zero_threshold"],
                "positive_offset": (
                    h["positive_spans"][0][0] if h["positive_spans"] else 0
                ),
                "positive_counts": _bucket_counts(
                    h["positive_deltas"], h["positive_counts"]
                ),
                "negative_offset": (
                    h["negative_spans"][0][0] if h["negative_spans"] else 0
                ),
                "negative_counts": _bucket_counts(
                    h["negative_deltas"], h["negative_counts"]
                ),
            }


def _bucket_counts(deltas: list[int], counts: list[float]) -> list[int]:
    if counts:
        return [int(c) for c in counts]
    out = []
    cur = 0
    for d in deltas:
        cur += d
        out.append(cur)
    return out


def _not_hex(s: str) -> bool:
    try:
        int(s, 16)
        return False
    except ValueError:
        return True


# --- Spark ingest path -------------------------------------------------------

POINT_SCHEMA = (
    "name string, mtype string, unit string, labels map<string,string>,"
    " ts_ms long, value double"
)

EXEMPLAR_SCHEMA = (
    "name string, labels map<string,string>, ex_labels map<string,string>,"
    " value double, ts_ms long, trace_id string, span_id string"
)

HISTOGRAM_SCHEMA = (
    "name string, labels map<string,string>, ts_ms long, count long,"
    " sum double, scale int, zero_count long, zero_threshold double,"
    " positive_offset int, positive_counts array<long>,"
    " negative_offset int, negative_counts array<long>"
)


def _map_payloads(extract, schema_cols):
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            rows = []
            for payload in pdf["payload"]:
                rows.extend(extract(decode_write_request(bytes(payload))))
            yield pd.DataFrame(rows, columns=schema_cols)

    return fn


def prw_points(payloads, *, min_ts_ms: int | None = None):
    """payload-bytes DataFrame → point rows, decoded on executors.

    Works identically for batch and ``readStream`` inputs — the
    streaming receiver is this applied to the transport's value
    column.

    The points path is the ingest-throughput row, so it builds pandas
    columns directly instead of going through ``series_points``'s
    dict-per-row protocol (measured: column build 0.024s vs dict rows
    0.082s + 0.043s → 0.034s frame construction per 64k points,
    single-core).  Semantics identical to ``series_points``
    (same name/label/suffix handling, same ``min_ts_ms`` cutoff).
    """
    import pandas as pd

    cols = ["name", "mtype", "unit", "labels", "ts_ms", "value"]

    def fn(batches):
        for pdf in batches:
            out: dict = {k: [] for k in cols}
            names, mtypes, units = out["name"], out["mtype"], out["unit"]
            lbls, tss, vals = out["labels"], out["ts_ms"], out["value"]
            for payload in pdf["payload"]:
                for ts in decode_write_request(bytes(payload)):
                    labels = dict(ts["labels"])
                    name = labels.pop("__name__", None)
                    if name is None:
                        raise ValueError("label __name__ not found")
                    mtype, unit = metric_type_and_unit(name)
                    for value, t_ms in ts["samples"]:
                        if min_ts_ms is not None and t_ms < min_ts_ms:
                            continue
                        names.append(name)
                        mtypes.append(mtype)
                        units.append(unit)
                        lbls.append(labels)
                        tss.append(t_ms)
                        vals.append(value)
            yield pd.DataFrame(out, columns=cols)

    return payloads.select("payload").mapInPandas(fn, schema=POINT_SCHEMA)


def prw_exemplars(payloads):
    fn = _map_payloads(
        series_exemplars,
        ["name", "labels", "ex_labels", "value", "ts_ms", "trace_id", "span_id"],
    )
    return payloads.select("payload").mapInPandas(fn, schema=EXEMPLAR_SCHEMA)


def prw_exp_histograms(payloads):
    fn = _map_payloads(
        series_exp_histograms,
        [
            "name",
            "labels",
            "ts_ms",
            "count",
            "sum",
            "scale",
            "zero_count",
            "zero_threshold",
            "positive_offset",
            "positive_counts",
            "negative_offset",
            "negative_counts",
        ],
    )
    return payloads.select("payload").mapInPandas(fn, schema=HISTOGRAM_SCHEMA)


# --- encoders (fixtures/tests only) ------------------------------------------


def _tag(fno: int, wt: int) -> bytes:
    return _enc_uvarint(fno << 3 | wt)


def _enc_len(fno: int, payload: bytes) -> bytes:
    return _tag(fno, 2) + _enc_uvarint(len(payload)) + payload


def _enc_zigzag(v: int) -> bytes:
    return _enc_uvarint((v << 1) ^ (v >> 63))


def encode_label(name: str, value: str) -> bytes:
    return _enc_len(1, name.encode()) + _enc_len(2, value.encode())


def encode_sample(value: float, ts_ms: int) -> bytes:
    return _tag(1, 1) + struct.pack("<d", value) + _tag(2, 0) + _enc_uvarint(ts_ms)


def encode_exemplar(labels: dict, value: float, ts_ms: int) -> bytes:
    out = b"".join(_enc_len(1, encode_label(k, v)) for k, v in labels.items())
    out += _tag(2, 1) + struct.pack("<d", value)
    out += _tag(3, 0) + _enc_uvarint(ts_ms)
    return out


def encode_histogram(
    *,
    count: int,
    sum_: float,
    schema: int,
    zero_count: int,
    zero_threshold: float,
    positive_offset: int,
    positive_deltas: list[int],
    ts_ms: int,
) -> bytes:
    out = _tag(1, 0) + _enc_uvarint(count)
    out += _tag(3, 1) + struct.pack("<d", sum_)
    out += _tag(4, 0) + _enc_zigzag(schema)
    out += _tag(5, 1) + struct.pack("<d", zero_threshold)
    out += _tag(6, 0) + _enc_uvarint(zero_count)
    span = _tag(1, 0) + _enc_zigzag(positive_offset)
    span += _tag(2, 0) + _enc_uvarint(len(positive_deltas))
    out += _enc_len(11, span)
    out += _enc_len(12, b"".join(_enc_zigzag(d) for d in positive_deltas))
    out += _tag(15, 0) + _enc_uvarint(ts_ms)
    return out


def encode_time_series(
    labels: dict,
    samples: list[tuple[float, int]],
    *,
    exemplars: list[bytes] = (),
    histograms: list[bytes] = (),
) -> bytes:
    out = b"".join(_enc_len(1, encode_label(k, v)) for k, v in labels.items())
    out += b"".join(_enc_len(2, encode_sample(v, t)) for v, t in samples)
    out += b"".join(_enc_len(3, e) for e in exemplars)
    out += b"".join(_enc_len(4, h) for h in histograms)
    return out


def encode_write_request(series: list[bytes], *, compress: bool = True) -> bytes:
    body = b"".join(_enc_len(1, s) for s in series)
    return snappy_compress(body) if compress else body
