"""OTLP protobuf wire ingest — the reference's PRIMARY ingest path.

The reference receives OTLP protobuf over gRPC/HTTP via the embedded
collector (``internal/otelreceiver/receiver.go:47-90``) and hands the
decoded pdata to the signal consumers.  Here the transport is a
DataFrame with a ``payload`` binary column (one row per
Export*ServiceRequest body) and the wire decode runs executor-side in
``mapInPandas`` — the same split as ``sources/prw.py``, whose
hand-rolled protobuf walker this module reuses (the OTLP proto is a
public format; field numbers below are from opentelemetry-proto).

Decode strategy: wire bytes → the OTLP/JSON encoding (hex ids,
stringified uint64 nanos — the spec's canonical JSON mapping), then
through the EXISTING ``from_json`` + flatten path of ``sources/otlp.py``.
One flattener serves both encodings, so protobuf ingest inherits every
downstream behavior (histogram/summary explosion, series hashing,
service materialization) already gated for JSON.

Encoders exist for deterministic fixtures only — not the ingest path.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .prw import (
    _enc_uvarint,
    _f64,
    _signed64,
    _skip_generic,
    _uvarint,
    _wire_fields,
    _zigzag,
)

# --- wire → OTLP/JSON dicts --------------------------------------------------


def _u64(raw: bytes) -> int:
    return struct.unpack("<Q", raw)[0]


def _i64(raw: bytes) -> int:
    return struct.unpack("<q", raw)[0]


def decode_any_value(buf: bytes) -> dict:
    """AnyValue → its OTLP/JSON object ({"stringValue": ...} etc.)."""
    # canonical stringValue fast path (0x0A <len> utf8) — the dominant
    # attr value shape on the wire; other kinds take the generic walk
    n = len(buf)
    if n and buf[0] == 0x0A:
        b = buf[1]
        if b < 0x80:
            ln, pos = b, 2
        else:
            ln, pos = _uvarint(buf, 1)
        if pos + ln == n:
            return {"stringValue": buf[pos:].decode("utf-8")}
    for fno, wt, val in _wire_fields(buf):
        if fno == 1:
            return {"stringValue": val.decode("utf-8")}
        if fno == 2:
            return {"boolValue": bool(val)}
        if fno == 3:
            return {"intValue": str(_signed64(val))}
        if fno == 4:
            return {"doubleValue": _f64(val)}
        if fno == 5:  # ArrayValue{values=1}
            return {
                "arrayValue": {
                    "values": [
                        decode_any_value(v)
                        for f, _, v in _wire_fields(val)
                        if f == 1
                    ]
                }
            }
        if fno == 6:  # KeyValueList{values=1}
            return {
                "kvlistValue": {
                    "values": [
                        _decode_kv(v) for f, _, v in _wire_fields(val) if f == 1
                    ]
                }
            }
        if fno == 7:
            return {"bytesValue": val.hex()}
    return {}


def _decode_kv_generic(buf: bytes) -> dict:
    key, value = "", {}
    for fno, _, val in _wire_fields(buf):
        if fno == 1:
            key = val.decode("utf-8")
        elif fno == 2:
            value = decode_any_value(val)
    return {"key": key, "value": value}


def _decode_kv(buf: bytes) -> dict:
    # canonical KeyValue layout: 0x0A <len> key [0x12 <len> AnyValue];
    # anything else falls back to the generic walker
    n = len(buf)
    if n and buf[0] == 0x0A:
        b = buf[1]
        if b < 0x80:
            ln, pos = b, 2
        else:
            ln, pos = _uvarint(buf, 1)
        end = pos + ln
        if end <= n:
            key = buf[pos:end].decode("utf-8")
            if end == n:
                return {"key": key, "value": {}}
            if buf[end] == 0x12:
                b = buf[end + 1]
                if b < 0x80:
                    ln2, p2 = b, end + 2
                else:
                    ln2, p2 = _uvarint(buf, end + 1)
                if p2 + ln2 == n:
                    return {"key": key, "value": decode_any_value(buf[p2:])}
    return _decode_kv_generic(buf)


def _kv_fast(buf: bytes, p: int, end: int) -> dict | None:
    """In-place canonical KeyValue parse on the parent buffer
    (``0x0A <len> key [0x12 <len> AnyValue]``), with the dominant
    AnyValue shape (stringValue: ``0x0A <len> utf8``) parsed in place
    too — no sub-buffer slice, no nested call.  Returns None on any
    other layout; the caller slices and falls back to ``_decode_kv``,
    so non-canonical inputs decode exactly as before."""
    if p + 1 >= end or buf[p] != 0x0A:
        return None
    b = buf[p + 1]
    if b < 0x80:
        q = p + 2
        ke = q + b
    else:
        b, q = _uvarint(buf, p + 1)
        ke = q + b
    if ke == end:
        return {"key": buf[q:ke].decode("utf-8"), "value": {}}
    if ke + 1 >= end or buf[ke] != 0x12:
        return None
    b = buf[ke + 1]
    if b < 0x80:
        vq = ke + 2
        ve = vq + b
    else:
        b, vq = _uvarint(buf, ke + 1)
        ve = vq + b
    if ve != end:
        return None
    key = buf[q:ke].decode("utf-8")
    if ve - vq >= 2 and buf[vq] == 0x0A:
        b = buf[vq + 1]
        if b < 0x80:
            sq = vq + 2
            se = sq + b
        else:
            b, sq = _uvarint(buf, vq + 1)
            se = sq + b
        if se == ve:
            return {
                "key": key,
                "value": {"stringValue": buf[sq:se].decode("utf-8")},
            }
    return {"key": key, "value": decode_any_value(buf[vq:ve])}


def _decode_attrs(fields, attr_fno: int) -> list[dict]:
    return [_decode_kv(v) for f, _, v in fields if f == attr_fno]


def _decode_scope(buf: bytes) -> dict:
    out = {"name": "", "version": ""}
    for fno, _, val in _wire_fields(buf):
        if fno == 1:
            out["name"] = val.decode("utf-8")
        elif fno == 2:
            out["version"] = val.decode("utf-8")
    return out


def _decode_resource(buf: bytes) -> dict:
    return {"attributes": _decode_attrs(_wire_fields(buf), 1)}


# -- logs (collector_logs.proto / logs.proto field numbers) --


def _decode_log_record_generic(buf: bytes) -> dict:
    rec: dict = {"attributes": []}
    for fno, wt, val in _wire_fields(buf):
        if fno == 1:
            rec["timeUnixNano"] = str(_u64(val))
        elif fno == 2:
            rec["severityNumber"] = val
        elif fno == 3:
            rec["severityText"] = val.decode("utf-8")
        elif fno == 5:
            rec["body"] = decode_any_value(val)
        elif fno == 6:
            rec["attributes"].append(_decode_kv(val))
        elif fno == 9:
            rec["traceId"] = val.hex()
        elif fno == 10:
            rec["spanId"] = val.hex()
        elif fno == 11:
            rec["observedTimeUnixNano"] = str(_u64(val))
    return rec


def _decode_log_record(buf: bytes, memo: dict | None = None) -> dict:
    """Inline LogRecord walk — the logs-decode hot loop.

    Single-byte-tag dispatch over the wire-canonical (fno, wt) pairs
    (time=1/fixed64 → 0x09, severityNumber=2/varint → 0x10,
    severityText=3/len → 0x1A, body=5/len → 0x2A, attrs=6/len → 0x32,
    traceId=9/len → 0x4A, spanId=10/len → 0x52, observedTime=11/fixed64
    → 0x59); any other tag bails to the generic walker for the whole
    buffer, so exotic encodings decode exactly as before."""
    rec: dict = {"attributes": []}
    attrs = rec["attributes"]
    pos = 0
    n = len(buf)
    unpack_from = struct.unpack_from
    while pos < n:
        tag = buf[pos]
        if tag == 0x09:  # timeUnixNano, fixed64
            rec["timeUnixNano"] = str(unpack_from("<Q", buf, pos + 1)[0])
            pos += 9
        elif tag == 0x10:  # severityNumber, varint
            b = buf[pos + 1]
            if b < 0x80:
                rec["severityNumber"] = b
                pos += 2
            else:
                rec["severityNumber"], pos = _uvarint(buf, pos + 1)
        elif tag in (0x1A, 0x2A, 0x32, 0x4A, 0x52):  # len-delimited
            b = buf[pos + 1]
            if b < 0x80:
                ln, p2 = b, pos + 2
            else:
                ln, p2 = _uvarint(buf, pos + 1)
            pos = p2 + ln
            if tag == 0x32:
                if memo is None:
                    kv = _kv_fast(buf, p2, pos)
                    attrs.append(
                        _decode_kv(buf[p2:pos]) if kv is None else kv
                    )
                else:
                    # per-request KV memo (see _decode_number_point)
                    raw = buf[p2:pos]
                    kv = memo.get(raw)
                    if kv is None:
                        kv = _kv_fast(buf, p2, pos)
                        if kv is None:
                            kv = _decode_kv(raw)
                        memo[raw] = kv
                    attrs.append(kv)
            elif tag == 0x2A:
                rec["body"] = decode_any_value(buf[p2:pos])
            elif tag == 0x1A:
                rec["severityText"] = buf[p2:pos].decode("utf-8")
            elif tag == 0x4A:
                rec["traceId"] = buf[p2:pos].hex()
            else:
                rec["spanId"] = buf[p2:pos].hex()
        elif tag == 0x59:  # observedTimeUnixNano, fixed64
            rec["observedTimeUnixNano"] = str(unpack_from("<Q", buf, pos + 1)[0])
            pos += 9
        else:
            return _decode_log_record_generic(buf)
    return rec


def _len_field(buf: bytes, pos: int) -> tuple[int, int]:
    """Start/end of the len-delimited payload whose tag is at ``pos``."""
    b = buf[pos + 1]
    if b < 0x80:
        p = pos + 2
        return p, p + b
    ln, p = _uvarint(buf, pos + 1)
    return p, p + ln


def decode_logs_request(data: bytes) -> dict:
    """ExportLogsServiceRequest bytes → OTLP/JSON-shaped dict.

    Inline request/resource/scope walks — one tag dispatch per record
    instead of a generator resume each (resourceLogs=1 → 0x0A;
    resource=1 → 0x0A, scopeLogs=2 → 0x12; scope=1 → 0x0A,
    logRecords=2 → 0x12).  Unknown fields (e.g. schemaUrl) skip
    generically, like the generator loops did."""
    resource_logs = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos] != 0x0A:  # not resourceLogs: skip, like the old loop
            pos = _skip_generic(data, pos)
            continue
        p, pos = _len_field(data, pos)
        entry: dict = {"resource": {"attributes": []}, "scopeLogs": []}
        memo: dict = {}  # per-request KV memo (see _decode_number_point)
        while p < pos:
            tag = data[p]
            if tag == 0x0A:  # resource
                q, p = _len_field(data, p)
                entry["resource"] = _decode_resource(data[q:p])
            elif tag == 0x12:  # scopeLogs
                q, p = _len_field(data, p)
                sl: dict = {"scope": {"name": "", "version": ""}, "logRecords": []}
                recs = sl["logRecords"]
                while q < p:
                    t2 = data[q]
                    if t2 == 0x12:  # logRecords
                        q2, q = _len_field(data, q)
                        recs.append(_decode_log_record(data[q2:q], memo))
                    elif t2 == 0x0A:  # scope
                        q2, q = _len_field(data, q)
                        sl["scope"] = _decode_scope(data[q2:q])
                    else:
                        q = _skip_generic(data, q)
                entry["scopeLogs"].append(sl)
            else:
                p = _skip_generic(data, p)
        resource_logs.append(entry)
    return {"resourceLogs": resource_logs}


# -- traces (trace.proto) --


def _decode_status(buf: bytes) -> dict:
    out = {"code": 0, "message": ""}
    for fno, _, val in _wire_fields(buf):
        if fno == 2:
            out["message"] = val.decode("utf-8")
        elif fno == 3:
            out["code"] = val
    return out


def _decode_span_generic(buf: bytes) -> dict:
    span: dict = {"attributes": [], "status": {"code": 0, "message": ""}}
    for fno, _, val in _wire_fields(buf):
        if fno == 1:
            span["traceId"] = val.hex()
        elif fno == 2:
            span["spanId"] = val.hex()
        elif fno == 4:
            span["parentSpanId"] = val.hex()
        elif fno == 5:
            span["name"] = val.decode("utf-8")
        elif fno == 6:
            span["kind"] = val
        elif fno == 7:
            span["startTimeUnixNano"] = str(_u64(val))
        elif fno == 8:
            span["endTimeUnixNano"] = str(_u64(val))
        elif fno == 9:
            span["attributes"].append(_decode_kv(val))
        elif fno == 15:
            span["status"] = _decode_status(val)
    return span


def _decode_span(buf: bytes, memo: dict | None = None) -> dict:
    """Inline Span walk — the traces-decode hot loop.

    Single-byte-tag dispatch over the wire-canonical (fno, wt) pairs
    (traceId=1 → 0x0A, spanId=2 → 0x12, parentSpanId=4 → 0x22,
    name=5 → 0x2A, kind=6/varint → 0x30, start=7/fixed64 → 0x39,
    end=8/fixed64 → 0x41, attrs=9 → 0x4A, status=15 → 0x7A); any
    other tag bails to the generic walker for the whole buffer, so
    exotic encodings decode exactly as before."""
    span: dict = {"attributes": [], "status": {"code": 0, "message": ""}}
    attrs = span["attributes"]
    pos = 0
    n = len(buf)
    unpack_from = struct.unpack_from
    while pos < n:
        tag = buf[pos]
        if tag in (0x0A, 0x12, 0x22, 0x2A, 0x4A, 0x7A):  # len-delimited
            b = buf[pos + 1]
            if b < 0x80:
                ln, p2 = b, pos + 2
            else:
                ln, p2 = _uvarint(buf, pos + 1)
            pos = p2 + ln
            if tag == 0x4A:
                if memo is None:
                    kv = _kv_fast(buf, p2, pos)
                    attrs.append(
                        _decode_kv(buf[p2:pos]) if kv is None else kv
                    )
                else:
                    # per-request KV memo (see _decode_number_point)
                    raw = buf[p2:pos]
                    kv = memo.get(raw)
                    if kv is None:
                        kv = _kv_fast(buf, p2, pos)
                        if kv is None:
                            kv = _decode_kv(raw)
                        memo[raw] = kv
                    attrs.append(kv)
            elif tag == 0x0A:
                span["traceId"] = buf[p2:pos].hex()
            elif tag == 0x12:
                span["spanId"] = buf[p2:pos].hex()
            elif tag == 0x2A:
                span["name"] = buf[p2:pos].decode("utf-8")
            elif tag == 0x22:
                span["parentSpanId"] = buf[p2:pos].hex()
            else:
                span["status"] = _decode_status(buf[p2:pos])
        elif tag == 0x39:  # startTimeUnixNano, fixed64
            span["startTimeUnixNano"] = str(unpack_from("<Q", buf, pos + 1)[0])
            pos += 9
        elif tag == 0x41:  # endTimeUnixNano, fixed64
            span["endTimeUnixNano"] = str(unpack_from("<Q", buf, pos + 1)[0])
            pos += 9
        elif tag == 0x30:  # kind, varint
            b = buf[pos + 1]
            if b < 0x80:
                span["kind"] = b
                pos += 2
            else:
                span["kind"], pos = _uvarint(buf, pos + 1)
        else:
            return _decode_span_generic(buf)
    return span


def decode_traces_request(data: bytes) -> dict:
    """ExportTraceServiceRequest bytes → OTLP/JSON-shaped dict.

    Inline request/resource/scope walks (resourceSpans=1 → 0x0A;
    resource=1 → 0x0A, scopeSpans=2 → 0x12; spans=2 → 0x12) — one tag
    dispatch per span instead of a generator resume each; unknown
    fields skip generically, like the generator loops did."""
    resource_spans = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos] != 0x0A:  # not resourceSpans: skip, like the old loop
            pos = _skip_generic(data, pos)
            continue
        p, pos = _len_field(data, pos)
        entry: dict = {"resource": {"attributes": []}, "scopeSpans": []}
        memo: dict = {}  # per-request KV memo (see _decode_number_point)
        while p < pos:
            tag = data[p]
            if tag == 0x0A:  # resource
                q, p = _len_field(data, p)
                entry["resource"] = _decode_resource(data[q:p])
            elif tag == 0x12:  # scopeSpans
                q, p = _len_field(data, p)
                ss: dict = {"spans": []}
                spans = ss["spans"]
                while q < p:
                    if data[q] == 0x12:  # spans
                        q2, q = _len_field(data, q)
                        spans.append(_decode_span(data[q2:q], memo))
                    else:
                        q = _skip_generic(data, q)
                entry["scopeSpans"].append(ss)
            else:
                p = _skip_generic(data, p)
        resource_spans.append(entry)
    return {"resourceSpans": resource_spans}


# -- metrics (metrics.proto) --


def _decode_exemplar_generic(buf: bytes) -> dict:
    # metrics.proto Exemplar: filtered_attributes=7, time=2 fixed64,
    # as_double=3, span_id=4, trace_id=5, as_int=6 sfixed64
    e: dict = {"filteredAttributes": []}
    for fno, _, val in _wire_fields(buf):
        if fno == 2:
            e["timeUnixNano"] = str(_u64(val))
        elif fno == 3:
            e["asDouble"] = _f64(val)
        elif fno == 4:
            e["spanId"] = val.hex()
        elif fno == 5:
            e["traceId"] = val.hex()
        elif fno == 6:
            e["asInt"] = str(_i64(val))
        elif fno == 7:
            e["filteredAttributes"].append(_decode_kv(val))
    return e


def _decode_exemplar(buf: bytes) -> dict:
    """Inline Exemplar walk over the wire-canonical tags (time=2/fixed64
    → 0x11, asDouble=3 → 0x19, spanId=4/len → 0x22, traceId=5/len →
    0x2A, asInt=6/sfixed64 → 0x31, filteredAttributes=7/len → 0x3A);
    any other tag bails to the generic walker for the whole buffer."""
    e: dict = {"filteredAttributes": []}
    attrs = e["filteredAttributes"]
    pos = 0
    n = len(buf)
    unpack_from = struct.unpack_from
    while pos < n:
        tag = buf[pos]
        if tag == 0x11:  # timeUnixNano, fixed64
            e["timeUnixNano"] = str(unpack_from("<Q", buf, pos + 1)[0])
            pos += 9
        elif tag == 0x19:  # asDouble
            e["asDouble"] = unpack_from("<d", buf, pos + 1)[0]
            pos += 9
        elif tag == 0x31:  # asInt, sfixed64
            e["asInt"] = str(unpack_from("<q", buf, pos + 1)[0])
            pos += 9
        elif tag == 0x22 or tag == 0x2A:  # spanId / traceId
            b = buf[pos + 1]
            if b < 0x80:
                ln, p2 = b, pos + 2
            else:
                ln, p2 = _uvarint(buf, pos + 1)
            pos = p2 + ln
            e["spanId" if tag == 0x22 else "traceId"] = buf[p2:pos].hex()
        elif tag == 0x3A:  # filteredAttributes
            b = buf[pos + 1]
            if b < 0x80:
                ln, p2 = b, pos + 2
            else:
                ln, p2 = _uvarint(buf, pos + 1)
            pos = p2 + ln
            kv = _kv_fast(buf, p2, pos)
            attrs.append(_decode_kv(buf[p2:pos]) if kv is None else kv)
        else:
            return _decode_exemplar_generic(buf)
    return e


def _decode_number_point_generic(buf: bytes) -> dict:
    p: dict = {"attributes": [], "exemplars": []}
    for fno, _, val in _wire_fields(buf):
        if fno == 3:
            p["timeUnixNano"] = str(_u64(val))
        elif fno == 4:
            p["asDouble"] = _f64(val)
        elif fno == 5:
            p["exemplars"].append(_decode_exemplar(val))
        elif fno == 6:
            p["asInt"] = str(_i64(val))
        elif fno == 7:
            p["attributes"].append(_decode_kv(val))
    return p


def _decode_number_point(buf: bytes, memo: dict | None = None) -> dict:
    """Inline NumberDataPoint walk — the metrics-decode hot loop.

    Single-byte-tag dispatch over the wire-canonical (fno, wt) pairs
    (time=3/fixed64 → 0x19, asDouble=4/fixed64 → 0x21, asInt=6/fixed64
    → 0x31, exemplars=5/len → 0x2A, attrs=7/len → 0x3A); any other tag
    bails to the generic ``_wire_fields`` walker for the whole buffer,
    so exotic encodings decode exactly as before."""
    p: dict = {"attributes": [], "exemplars": []}
    attrs = p["attributes"]
    exemplars = p["exemplars"]
    pos = 0
    n = len(buf)
    unpack_from = struct.unpack_from
    while pos < n:
        tag = buf[pos]
        if tag == 0x19:  # timeUnixNano, fixed64
            p["timeUnixNano"] = str(unpack_from("<Q", buf, pos + 1)[0])
            pos += 9
        elif tag == 0x21:  # asDouble
            p["asDouble"] = unpack_from("<d", buf, pos + 1)[0]
            pos += 9
        elif tag == 0x31:  # asInt, sfixed64
            p["asInt"] = str(unpack_from("<q", buf, pos + 1)[0])
            pos += 9
        elif tag == 0x3A:  # attributes
            b = buf[pos + 1]
            if b < 0x80:
                ln, p2 = b, pos + 2
            else:
                ln, p2 = _uvarint(buf, pos + 1)
            pos = p2 + ln
            if memo is None:
                kv = _kv_fast(buf, p2, pos)
                attrs.append(_decode_kv(buf[p2:pos]) if kv is None else kv)
            else:
                # per-request memo: attribute byte-patterns repeat
                # across the points of a payload (shared dimensions),
                # so a dict hit replaces the re-parse.  The dicts are
                # read-only downstream (_attr_map copies into label
                # maps), so sharing one object per pattern is safe.
                raw = buf[p2:pos]
                kv = memo.get(raw)
                if kv is None:
                    kv = _kv_fast(buf, p2, pos)
                    if kv is None:
                        kv = _decode_kv(raw)
                    memo[raw] = kv
                attrs.append(kv)
        elif tag == 0x2A:  # exemplars
            b = buf[pos + 1]
            if b < 0x80:
                ln, p2 = b, pos + 2
            else:
                ln, p2 = _uvarint(buf, pos + 1)
            pos = p2 + ln
            exemplars.append(_decode_exemplar(buf[p2:pos]))
        else:
            return _decode_number_point_generic(buf)
    return p


def _packed_fixed64(raw, wt) -> list[int]:
    if wt == 1:
        return [_u64(raw)]
    return [struct.unpack_from("<Q", raw, i)[0] for i in range(0, len(raw), 8)]


def _packed_f64(raw, wt) -> list[float]:
    if wt == 1:
        return [_f64(raw)]
    return [struct.unpack_from("<d", raw, i)[0] for i in range(0, len(raw), 8)]


def _decode_histogram_point_generic(buf: bytes) -> dict:
    p: dict = {"attributes": [], "bucketCounts": [], "explicitBounds": []}
    for fno, wt, val in _wire_fields(buf):
        if fno == 3:
            p["timeUnixNano"] = str(_u64(val))
        elif fno == 4:
            p["count"] = str(_u64(val))
        elif fno == 5:
            p["sum"] = _f64(val)
        elif fno == 6:
            p["bucketCounts"] += [str(c) for c in _packed_fixed64(val, wt)]
        elif fno == 7:
            p["explicitBounds"] += _packed_f64(val, wt)
        elif fno == 9:
            p["attributes"].append(_decode_kv(val))
        elif fno == 11:
            p["min"] = _f64(val)
        elif fno == 12:
            p["max"] = _f64(val)
    return p


def _decode_histogram_point(buf: bytes) -> dict:
    """Inline HistogramDataPoint walk over the wire-canonical tags
    (startTime=2/fixed64 → 0x11 skipped, time=3 → 0x19, count=4 →
    0x21, sum=5 → 0x29, bucketCounts=6/packed-len → 0x32,
    explicitBounds=7/packed-len → 0x3A, exemplars=8/len → 0x42 skipped,
    attributes=9/len → 0x4A, flags=10/varint → 0x50 skipped, min=11 →
    0x59, max=12 → 0x61); skipped fields are the ones the generic walk
    also ignores.  Any other tag (incl. unpacked wt-1 counts/bounds)
    bails to the generic walker for the whole buffer."""
    p: dict = {"attributes": [], "bucketCounts": [], "explicitBounds": []}
    attrs = p["attributes"]
    pos = 0
    n = len(buf)
    unpack_from = struct.unpack_from
    while pos < n:
        tag = buf[pos]
        if tag == 0x32 or tag == 0x3A or tag == 0x4A or tag == 0x42:
            b = buf[pos + 1]
            if b < 0x80:
                ln, p2 = b, pos + 2
            else:
                ln, p2 = _uvarint(buf, pos + 1)
            pos = p2 + ln
            if tag == 0x32:  # bucketCounts, packed fixed64
                if ln & 7:
                    return _decode_histogram_point_generic(buf)
                p["bucketCounts"] += [
                    str(c) for c in unpack_from(f"<{ln >> 3}Q", buf, p2)
                ]
            elif tag == 0x3A:  # explicitBounds, packed double
                if ln & 7:
                    return _decode_histogram_point_generic(buf)
                p["explicitBounds"] += list(
                    unpack_from(f"<{ln >> 3}d", buf, p2)
                )
            elif tag == 0x4A:  # attributes
                kv = _kv_fast(buf, p2, pos)
                attrs.append(_decode_kv(buf[p2:pos]) if kv is None else kv)
            # 0x42 exemplars: skipped, like the generic walk
        elif tag == 0x19:  # timeUnixNano
            p["timeUnixNano"] = str(unpack_from("<Q", buf, pos + 1)[0])
            pos += 9
        elif tag == 0x21:  # count, fixed64
            p["count"] = str(unpack_from("<Q", buf, pos + 1)[0])
            pos += 9
        elif tag == 0x29:  # sum
            p["sum"] = unpack_from("<d", buf, pos + 1)[0]
            pos += 9
        elif tag == 0x59:  # min
            p["min"] = unpack_from("<d", buf, pos + 1)[0]
            pos += 9
        elif tag == 0x61:  # max
            p["max"] = unpack_from("<d", buf, pos + 1)[0]
            pos += 9
        elif tag == 0x11:  # startTimeUnixNano: skipped, like generic
            pos += 9
        elif tag == 0x50:  # flags varint: skipped, like generic
            b = buf[pos + 1]
            if b < 0x80:
                pos += 2
            else:
                _, pos = _uvarint(buf, pos + 1)
        else:
            return _decode_histogram_point_generic(buf)
    return p


def _decode_summary_point(buf: bytes) -> dict:
    p: dict = {"attributes": [], "quantileValues": []}
    for fno, _, val in _wire_fields(buf):
        if fno == 3:
            p["timeUnixNano"] = str(_u64(val))
        elif fno == 4:
            p["count"] = str(_u64(val))
        elif fno == 5:
            p["sum"] = _f64(val)
        elif fno == 6:
            q = {"quantile": 0.0, "value": 0.0}
            for f2, _, v2 in _wire_fields(val):
                if f2 == 1:
                    q["quantile"] = _f64(v2)
                elif f2 == 2:
                    q["value"] = _f64(v2)
            p["quantileValues"].append(q)
        elif fno == 7:
            p["attributes"].append(_decode_kv(val))
    return p


def _decode_exp_buckets(buf: bytes) -> dict:
    out = {"offset": 0, "bucketCounts": []}
    for fno, wt, val in _wire_fields(buf):
        if fno == 1:
            out["offset"] = _zigzag(val)
        elif fno == 2:
            if wt == 0:
                out["bucketCounts"].append(str(val))
            else:
                pos = 0
                while pos < len(val):
                    v, pos = _uvarint(val, pos)
                    out["bucketCounts"].append(str(v))
    return out


def _exp_buckets_fast(buf: bytes, p: int, end: int) -> dict | None:
    """In-place canonical Buckets parse on the parent buffer
    (offset=1/sint32-varint → 0x08, bucketCounts=2 packed-varint →
    0x12 or unpacked → 0x10).  Returns None on any other layout; the
    caller slices and falls back to the generic decoder."""
    offset = 0
    counts: list = []
    append = counts.append
    while p < end:
        tag = buf[p]
        if tag == 0x12:  # packed bucketCounts
            b = buf[p + 1]
            if b < 0x80:
                ln, q = b, p + 2
            else:
                ln, q = _uvarint(buf, p + 1)
            p = q + ln
            while q < p:
                b = buf[q]
                if b < 0x80:
                    append(str(b))
                    q += 1
                else:
                    v, q = _uvarint(buf, q)
                    append(str(v))
        elif tag == 0x08:  # offset, sint32
            b = buf[p + 1]
            if b < 0x80:
                v, p = b, p + 2
            else:
                v, p = _uvarint(buf, p + 1)
            offset = (v >> 1) ^ -(v & 1)
        elif tag == 0x10:  # unpacked single bucket count
            b = buf[p + 1]
            if b < 0x80:
                append(str(b))
                p += 2
            else:
                v, p = _uvarint(buf, p + 1)
                append(str(v))
        else:
            return None
    return {"offset": offset, "bucketCounts": counts}


def _decode_exp_histogram_point_generic(buf: bytes) -> dict:
    p: dict = {"attributes": []}
    for fno, _, val in _wire_fields(buf):
        if fno == 1:
            p["attributes"].append(_decode_kv(val))
        elif fno == 3:
            p["timeUnixNano"] = str(_u64(val))
        elif fno == 4:
            p["count"] = str(_u64(val))
        elif fno == 5:
            p["sum"] = _f64(val)
        elif fno == 6:
            p["scale"] = _zigzag(val)
        elif fno == 7:
            p["zeroCount"] = str(_u64(val))
        elif fno == 8:
            p["positive"] = _decode_exp_buckets(val)
        elif fno == 9:
            p["negative"] = _decode_exp_buckets(val)
    return p


def _decode_exp_histogram_point(buf: bytes) -> dict:
    """Inline ExponentialHistogramDataPoint walk over the wire-canonical
    tags (attributes=1/len → 0x0A, startTime=2/fixed64 → 0x11 skipped,
    time=3 → 0x19, count=4 → 0x21, sum=5 → 0x29, scale=6/sint32 → 0x30,
    zeroCount=7/fixed64 → 0x39, positive=8/len → 0x42, negative=9/len →
    0x4A, flags=10/varint → 0x50 skipped, exemplars=11/len → 0x5A
    skipped); skipped fields are the ones the generic walk also
    ignores.  Any other tag bails to the generic walker."""
    p: dict = {"attributes": []}
    attrs = p["attributes"]
    pos = 0
    n = len(buf)
    unpack_from = struct.unpack_from
    while pos < n:
        tag = buf[pos]
        if tag == 0x0A or tag == 0x42 or tag == 0x4A or tag == 0x5A:
            b = buf[pos + 1]
            if b < 0x80:
                ln, p2 = b, pos + 2
            else:
                ln, p2 = _uvarint(buf, pos + 1)
            pos = p2 + ln
            if tag == 0x0A:  # attributes
                kv = _kv_fast(buf, p2, pos)
                attrs.append(_decode_kv(buf[p2:pos]) if kv is None else kv)
            elif tag == 0x5A:  # exemplars: skipped, like the generic walk
                pass
            else:  # positive / negative buckets
                bk = _exp_buckets_fast(buf, p2, pos)
                p["positive" if tag == 0x42 else "negative"] = (
                    _decode_exp_buckets(buf[p2:pos]) if bk is None else bk
                )
        elif tag == 0x19:  # timeUnixNano
            p["timeUnixNano"] = str(unpack_from("<Q", buf, pos + 1)[0])
            pos += 9
        elif tag == 0x21:  # count, fixed64
            p["count"] = str(unpack_from("<Q", buf, pos + 1)[0])
            pos += 9
        elif tag == 0x29:  # sum
            p["sum"] = unpack_from("<d", buf, pos + 1)[0]
            pos += 9
        elif tag == 0x39:  # zeroCount, fixed64
            p["zeroCount"] = str(unpack_from("<Q", buf, pos + 1)[0])
            pos += 9
        elif tag == 0x30:  # scale, sint32
            b = buf[pos + 1]
            if b < 0x80:
                v, pos = b, pos + 2
            else:
                v, pos = _uvarint(buf, pos + 1)
            p["scale"] = (v >> 1) ^ -(v & 1)
        elif tag == 0x11:  # startTimeUnixNano: skipped, like generic
            pos += 9
        elif tag == 0x50:  # flags varint: skipped, like generic
            b = buf[pos + 1]
            if b < 0x80:
                pos += 2
            else:
                _, pos = _uvarint(buf, pos + 1)
        else:
            return _decode_exp_histogram_point_generic(buf)
    return p


def _decode_metric_generic(buf: bytes) -> dict:
    m: dict = {"name": "", "unit": ""}
    for fno, _, val in _wire_fields(buf):
        if fno == 1:
            m["name"] = val.decode("utf-8")
        elif fno == 3:
            m["unit"] = val.decode("utf-8")
        elif fno == 5:  # gauge
            m["gauge"] = {
                "dataPoints": [
                    _decode_number_point(v)
                    for f, _, v in _wire_fields(val)
                    if f == 1
                ]
            }
        elif fno == 7:  # sum
            s: dict = {"dataPoints": [], "isMonotonic": False}
            for f2, _, v2 in _wire_fields(val):
                if f2 == 1:
                    s["dataPoints"].append(_decode_number_point(v2))
                elif f2 == 3:
                    s["isMonotonic"] = bool(v2)
            m["sum"] = s
        elif fno == 9:  # histogram
            m["histogram"] = {
                "dataPoints": [
                    _decode_histogram_point(v)
                    for f, _, v in _wire_fields(val)
                    if f == 1
                ]
            }
        elif fno == 10:  # exponential histogram
            m["exponentialHistogram"] = {
                "dataPoints": [
                    _decode_exp_histogram_point(v)
                    for f, _, v in _wire_fields(val)
                    if f == 1
                ]
            }
        elif fno == 11:  # summary
            m["summary"] = {
                "dataPoints": [
                    _decode_summary_point(v)
                    for f, _, v in _wire_fields(val)
                    if f == 1
                ]
            }
    return m


def _decode_metric(buf: bytes, memo: dict | None = None) -> dict:
    """Inline Metric walk — one tag dispatch per field instead of the
    generic generator walk (the generator resume per dataPoint was the
    remaining per-point overhead at the Metric level).

    Wire-canonical tags: name=1 → 0x0A, unit=3 → 0x1A, gauge=5 → 0x2A,
    sum=7 → 0x3A, histogram=9 → 0x4A, exponentialHistogram=10 → 0x52,
    summary=11 → 0x5A; inside the data submessages: dataPoints=1 →
    0x0A, aggregationTemporality=2 → 0x10 varint (skipped, like the
    generic walk), isMonotonic=3 → 0x18 varint (sum only).  Any other
    layout bails to the generic walker for the whole buffer, so exotic
    encodings decode exactly as before."""
    m: dict = {"name": "", "unit": ""}
    pos = 0
    n = len(buf)
    while pos < n:
        tag = buf[pos]
        if tag not in _METRIC_TAGS:
            return _decode_metric_generic(buf)
        b = buf[pos + 1]
        if b < 0x80:
            ln, p = b, pos + 2
        else:
            ln, p = _uvarint(buf, pos + 1)
        pos = p + ln
        if tag == 0x0A:
            m["name"] = buf[p:pos].decode("utf-8")
        elif tag == 0x1A:
            m["unit"] = buf[p:pos].decode("utf-8")
        elif tag == 0x2A or tag == 0x3A:
            pts: list = []
            num: dict = {"dataPoints": pts}
            if tag == 0x3A:
                num["isMonotonic"] = False
            q = p
            while q < pos:
                t2 = buf[q]
                if t2 == 0x0A:
                    b2 = buf[q + 1]
                    if b2 < 0x80:
                        ln2, p2 = b2, q + 2
                    else:
                        ln2, p2 = _uvarint(buf, q + 1)
                    q = p2 + ln2
                    pts.append(_decode_number_point(buf[p2:q], memo))
                elif t2 == 0x18 and tag == 0x3A:
                    v, q = _uvarint(buf, q + 1)
                    num["isMonotonic"] = bool(v)
                elif t2 == 0x10:  # aggregationTemporality — skipped
                    _, q = _uvarint(buf, q + 1)
                else:
                    return _decode_metric_generic(buf)
            m["gauge" if tag == 0x2A else "sum"] = num
        else:  # histogram / exponentialHistogram / summary
            key, dec = _METRIC_SUB[tag]
            pts = []
            q = p
            while q < pos:
                t2 = buf[q]
                if t2 == 0x0A:
                    b2 = buf[q + 1]
                    if b2 < 0x80:
                        ln2, p2 = b2, q + 2
                    else:
                        ln2, p2 = _uvarint(buf, q + 1)
                    q = p2 + ln2
                    pts.append(dec(buf[p2:q]))
                elif t2 == 0x10:  # aggregationTemporality — skipped
                    _, q = _uvarint(buf, q + 1)
                else:
                    return _decode_metric_generic(buf)
            m[key] = {"dataPoints": pts}
    return m


_METRIC_TAGS = frozenset((0x0A, 0x1A, 0x2A, 0x3A, 0x4A, 0x52, 0x5A))
_METRIC_SUB = {
    0x4A: ("histogram", _decode_histogram_point),
    0x52: ("exponentialHistogram", _decode_exp_histogram_point),
    0x5A: ("summary", _decode_summary_point),
}


def decode_metrics_request(data: bytes) -> dict:
    """ExportMetricsServiceRequest bytes → OTLP/JSON-shaped dict.

    Inline request/resource/scope walks (resourceMetrics=1 → 0x0A;
    resource=1 → 0x0A, scopeMetrics=2 → 0x12; metrics=2 → 0x12) — one
    tag dispatch per metric instead of a generator resume each;
    unknown fields skip generically, like the generator loops did."""
    resource_metrics = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos] != 0x0A:  # not resourceMetrics: skip, like old loop
            pos = _skip_generic(data, pos)
            continue
        p, pos = _len_field(data, pos)
        entry: dict = {"resource": {"attributes": []}, "scopeMetrics": []}
        memo: dict = {}  # per-request KV memo (see _decode_number_point)
        while p < pos:
            tag = data[p]
            if tag == 0x0A:  # resource
                q, p = _len_field(data, p)
                entry["resource"] = _decode_resource(data[q:p])
            elif tag == 0x12:  # scopeMetrics
                q, p = _len_field(data, p)
                sm: dict = {"metrics": []}
                mets = sm["metrics"]
                while q < p:
                    if data[q] == 0x12:  # metrics
                        q2, q = _len_field(data, q)
                        mets.append(_decode_metric(data[q2:q], memo))
                    else:
                        q = _skip_generic(data, q)
                entry["scopeMetrics"].append(sm)
            else:
                p = _skip_generic(data, p)
        resource_metrics.append(entry)
    return {"resourceMetrics": resource_metrics}


# --- Spark ingest path -------------------------------------------------------

_DECODERS = {
    "logs": decode_logs_request,
    "traces": decode_traces_request,
    "metrics": decode_metrics_request,
}


def pb_to_json(payloads: DataFrame, kind: str) -> DataFrame:
    """payload-bytes frame → one OTLP/JSON string per request, decoded
    on the executors (mapInPandas, Arrow-batched).  Batch and
    ``readStream`` inputs both work — this is the receiver."""
    import json

    import pandas as pd

    decode = _DECODERS[kind]

    def fn(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "json": [
                        json.dumps(decode(bytes(p))) for p in pdf["payload"]
                    ]
                }
            )

    return payloads.select("payload").mapInPandas(fn, schema="json string")


def pb_logs_via_json(payloads: DataFrame) -> DataFrame:
    """Reference path (wire → OTLP/JSON → shared flattener); kept as
    the semantic cross-check for the direct decode."""
    from .otlp import OTLP_LOGS_SCHEMA, flatten_otlp_logs

    raw = pb_to_json(payloads, "logs").select(
        F.from_json("json", OTLP_LOGS_SCHEMA).alias("r")
    ).select("r.*")
    return flatten_otlp_logs(raw)


def pb_spans_via_json(payloads: DataFrame) -> DataFrame:
    from .otlp import OTLP_TRACES_SCHEMA, flatten_otlp_spans

    raw = pb_to_json(payloads, "traces").select(
        F.from_json("json", OTLP_TRACES_SCHEMA).alias("r")
    ).select("r.*")
    # the pinned-equality contract with the direct wire decode covers
    # the shared span columns; the JSON flattener additionally carries
    # span events (TraceQL event: intrinsics) which the wire path does
    # not decode
    return flatten_otlp_spans(raw).drop("events")


def _utc_date(ts_ns):
    import datetime as _dt

    if ts_ns is None:
        return None
    return _dt.datetime.fromtimestamp(
        (ts_ns // 1000) / 1e6, tz=_dt.timezone.utc
    ).date()


def _logs_rows(d: dict):
    """Decoded ExportLogsServiceRequest dict → flat record tuples,
    reproducing flatten_otlp_logs exactly."""
    for rl in d.get("resourceLogs", []):
        res = _attr_map((rl.get("resource") or {}).get("attributes"))
        svc = res.get("service.name", "unknown_service")
        ns = res.get("service.namespace", "")
        for sl in rl.get("scopeLogs", []):
            scope = sl.get("scope") or {}
            for r in sl.get("logRecords", []):
                ts = r.get("timeUnixNano")
                ts = int(ts) if ts is not None else None
                obs = r.get("observedTimeUnixNano")
                obs = int(obs) if obs is not None else ts
                yield (
                    ts,
                    obs,
                    r.get("severityText"),
                    r.get("severityNumber"),
                    r.get("traceId"),
                    r.get("spanId"),
                    (r.get("body") or {}).get("stringValue"),
                    _attr_map(r.get("attributes")),
                    res,
                    scope.get("name"),
                    scope.get("version"),
                    svc,
                    ns,
                    _utc_date(ts),
                )


_LOG_ROW_SCHEMA = (
    "timestamp_ns long, observed_ns long, severity_text string,"
    " severity_number long, trace_id string, span_id string, body string,"
    " attrs map<string,string>, resource_attrs map<string,string>,"
    " scope_name string, scope_version string, service_name string,"
    " service_namespace string, date date"
)


def pb_logs(payloads: DataFrame) -> DataFrame:
    """OTLP protobuf log payloads → flat log records, decoded DIRECTLY
    to rows on the executors (no JSON round-trip); equality with the
    shared-flattener path is pinned by test_otlp_pb.py."""
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            rows = []
            for payload in pdf["payload"]:
                rows.extend(_logs_rows(decode_logs_request(bytes(payload))))
            yield pd.DataFrame(
                rows,
                columns=[
                    "timestamp_ns", "observed_ns", "severity_text",
                    "severity_number", "trace_id", "span_id", "body",
                    "attrs", "resource_attrs", "scope_name",
                    "scope_version", "service_name", "service_namespace",
                    "date",
                ],
            )

    return payloads.select("payload").mapInPandas(fn, schema=_LOG_ROW_SCHEMA)


def _spans_rows(d: dict):
    """Decoded ExportTraceServiceRequest dict → flat span tuples,
    reproducing flatten_otlp_spans (materialized duration, date)."""
    for rs in d.get("resourceSpans", []):
        res = _attr_map((rs.get("resource") or {}).get("attributes"))
        svc = res.get("service.name", "unknown_service")
        for ss in rs.get("scopeSpans", []):
            for s in ss.get("spans", []):
                start = s.get("startTimeUnixNano")
                start = int(start) if start is not None else None
                end = s.get("endTimeUnixNano")
                end = int(end) if end is not None else None
                dur = (
                    end - start if start is not None and end is not None
                    else None
                )
                status = s.get("status") or {}
                yield (
                    s.get("traceId"),
                    s.get("spanId"),
                    s.get("parentSpanId"),
                    s.get("name"),
                    s.get("kind"),
                    start,
                    end,
                    dur,
                    status.get("code"),
                    status.get("message"),
                    _attr_map(s.get("attributes")),
                    res,
                    svc,
                    _utc_date(start),
                )


_SPAN_ROW_SCHEMA = (
    "trace_id string, span_id string, parent_span_id string, name string,"
    " kind long, start_ns long, end_ns long, duration_ns long,"
    " status_code long, status_message string, attrs map<string,string>,"
    " resource_attrs map<string,string>, service_name string, date date"
)


def pb_spans(payloads: DataFrame) -> DataFrame:
    """OTLP protobuf trace payloads → flat span rows, decoded DIRECTLY
    to rows on the executors; equality with the shared-flattener path
    is pinned by test_otlp_pb.py."""
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            rows = []
            for payload in pdf["payload"]:
                rows.extend(_spans_rows(decode_traces_request(bytes(payload))))
            yield pd.DataFrame(
                rows,
                columns=[
                    "trace_id", "span_id", "parent_span_id", "name",
                    "kind", "start_ns", "end_ns", "duration_ns",
                    "status_code", "status_message", "attrs",
                    "resource_attrs", "service_name", "date",
                ],
            )

    return payloads.select("payload").mapInPandas(fn, schema=_SPAN_ROW_SCHEMA)


def pb_metrics_via_json(payloads: DataFrame) -> DataFrame:
    """Reference path: wire → OTLP/JSON → the shared from_json
    flattener.  Semantically authoritative; kept as the cross-check
    for the direct row decode below (test_otlp_pb.py asserts
    equality on a mixed fixture)."""
    from .otlp import OTLP_METRICS_SCHEMA, flatten_otlp_metrics

    raw = pb_to_json(payloads, "metrics").select(
        F.from_json("json", OTLP_METRICS_SCHEMA).alias("r")
    ).select("r.*")
    return flatten_otlp_metrics(raw)


def _jnum(v: float) -> str:
    """Double → string the way Spark/Java ``Double.toString`` renders a
    cast (the via-JSON flattener goes through Spark's double→string
    cast, so the direct wire decode must match it byte-for-byte):

    - ``NaN`` / ``Infinity`` / ``-Infinity`` spellings;
    - plain decimal only when ``1e-3 <= |v| < 1e7`` (Python ``repr``
      stays plain up to 1e16 and down to 1e-4, so e.g. 2e7 must render
      ``2.0E7`` not ``20000000.0`` and 1.2e-4 must render ``1.2E-4``);
    - otherwise computerized scientific notation ``d.dddEn`` with one
      digit before the point and at least one after.

    Digits: Python's shortest-round-trip digits agree with the JDK
    everywhere EXCEPT exact-integer doubles in [2^54, 2^63), where
    Java 17's legacy FloatingDecimal prints the exact integer digits
    rounded by an "insignificant trailing digits" count (floor of
    log10 of the power-of-two gap below the ulp) instead of the
    shortest form — e.g. 1.7033882668101804e18 renders as
    1.70338826681018035E18.  We replicate that branch exactly
    (fuzz-verified against Spark's double→string cast on 3k random
    bit-pattern doubles)."""
    import math as _math
    import struct as _struct

    v = float(v)
    if _math.isnan(v):
        return "NaN"
    if _math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    sign = "-" if _math.copysign(1.0, v) < 0 else ""
    a = abs(v)
    if a == 0.0:
        return sign + "0.0"

    bits = _struct.unpack("<Q", _struct.pack("<d", a))[0]
    biased = (bits >> 52) & 0x7FF
    mant = bits & ((1 << 52) - 1)
    if biased > 0:
        fract = mant | (1 << 52)
        bin_exp = biased - 1023
    else:  # subnormal — always goes through the shortest path below
        fract, bin_exp = mant, -1022

    if 54 <= bin_exp <= 62 and biased > 0:
        # Legacy-FloatingDecimal long shortcut: the value is an exact
        # integer; print its exact digits minus the insignificant tail.
        lval = fract << (bin_exp - 52)
        # digits of 2^(bin_exp - 54) that cannot affect the value
        insig = int(_math.floor((bin_exp - 54) * _math.log10(2.0)))
        if insig > 0:
            pow10 = 10**insig
            residue = lval % pow10
            lval //= pow10
            if residue >= pow10 // 2:
                lval += 1
        ds = str(lval)
        digits = ds.rstrip("0") or "0"
        e10 = len(ds) + insig - 1
    else:
        s = repr(a)
        if "e" in s:
            ms, exps = s.split("e")
            exp = int(exps)
        else:
            ms, exp = s, 0
        ip, _, fp = ms.partition(".")
        alldig = ip + fp
        digits = alldig.lstrip("0")
        lead_zeros = len(alldig) - len(digits)
        # value = digits[0].digits[1:] * 10^e10
        e10 = len(ip) - 1 - lead_zeros + exp
        digits = digits.rstrip("0") or "0"

    if -3 <= e10 < 7:
        if e10 >= 0:
            intpart = digits[: e10 + 1].ljust(e10 + 1, "0")
            frac = digits[e10 + 1 :] or "0"
            return f"{sign}{intpart}.{frac}"
        return f"{sign}0.{'0' * (-e10 - 1)}{digits}"
    frac = digits[1:] or "0"
    return f"{sign}{digits[0]}.{frac}E{e10}"


def _attr_str(value: dict) -> str | None:
    """AnyValue JSON object → label string, mirroring
    otlp._attrs_to_map's coalesce (string, int-as-string, double cast,
    bool cast)."""
    if "stringValue" in value:
        return value["stringValue"]
    if "intValue" in value:
        return value["intValue"]
    if "doubleValue" in value:
        return _jnum(value["doubleValue"])
    if "boolValue" in value:
        return "true" if value["boolValue"] else "false"
    return None


def _attr_map(attrs: list) -> dict:
    out = {}
    for kv in attrs or []:
        s = _attr_str(kv.get("value") or {})
        if s is not None:
            out[kv["key"]] = s
    return out


def _fmt_bound_py(v: float) -> str:
    import math as _math

    if v == _math.floor(v):
        return str(int(v))
    return _jnum(v)


def _metrics_rows(d: dict):
    """Decoded ExportMetricsServiceRequest dict → flat point tuples,
    reproducing flatten_otlp_metrics exactly (sum/gauge pass-through;
    histogram → _sum/_min/_max/_count + cumulative _bucket series with
    le labels and the le=+Inf bucket; summary → _count/_sum +
    per-quantile series).  Runs executor-side inside pb_metrics."""
    for rm in d.get("resourceMetrics", []):
        res = _attr_map((rm.get("resource") or {}).get("attributes"))
        for sm in rm.get("scopeMetrics", []):
            for m in sm.get("metrics", []):
                name, unit = m.get("name", ""), m.get("unit", "")
                num = m.get("sum") or m.get("gauge")
                if num is not None:
                    mono = bool(m.get("sum", {}).get("isMonotonic", False))
                    for p in num.get("dataPoints", []):
                        v = p.get("asDouble")
                        if v is None and p.get("asInt") is not None:
                            v = float(p["asInt"])
                        yield (
                            name, unit, mono, _attr_map(p.get("attributes")),
                            res, int(p["timeUnixNano"]), v, "",
                        )
                h = m.get("histogram")
                if h is not None:
                    for p in h.get("dataPoints", []):
                        labels = _attr_map(p.get("attributes"))
                        ts = int(p["timeUnixNano"])
                        counts = [int(c) for c in p.get("bucketCounts", [])]
                        total = float(sum(counts))
                        for suffix, key, mapping in (
                            ("_sum", "sum", "histogram_sum"),
                            ("_min", "min", "histogram_min"),
                            ("_max", "max", "histogram_max"),
                        ):
                            if p.get(key) is not None:
                                yield (
                                    name + suffix, "", False, labels, res,
                                    ts, float(p[key]), mapping,
                                )
                        if p.get("count") is not None:
                            yield (
                                name + "_count", "", False, labels, res,
                                ts, float(p["count"]), "histogram_count",
                            )
                        cum = 0
                        for i, bound in enumerate(p.get("explicitBounds", [])):
                            cum += counts[i] if i < len(counts) else 0
                            yield (
                                name + "_bucket", unit, False,
                                {**labels, "le": _fmt_bound_py(bound)},
                                res, ts, float(cum), "histogram_bucket",
                            )
                        yield (
                            name + "_bucket", unit, False,
                            {**labels, "le": "+Inf"}, res, ts, total,
                            "histogram_bucket",
                        )
                s = m.get("summary")
                if s is not None:
                    for p in s.get("dataPoints", []):
                        labels = _attr_map(p.get("attributes"))
                        ts = int(p["timeUnixNano"])
                        if p.get("count") is not None:
                            yield (
                                name + "_count", "", False, labels, res,
                                ts, float(p["count"]), "summary_count",
                            )
                        if p.get("sum") is not None:
                            yield (
                                name + "_sum", "", False, labels, res,
                                ts, float(p["sum"]), "summary_sum",
                            )
                        for q in p.get("quantileValues", []):
                            yield (
                                name, unit, False,
                                {**labels,
                                 "quantile": _fmt_bound_py(q["quantile"])},
                                res, ts, q["value"], "summary_quantile",
                            )


_METRIC_ROW_SCHEMA = (
    "name string, unit string, is_monotonic boolean,"
    " labels map<string,string>, resource_attrs map<string,string>,"
    " ts_ns long, value double, mapping string"
)


def pb_metrics(payloads: DataFrame) -> DataFrame:
    """OTLP protobuf metric payloads → flat point rows, decoded
    DIRECTLY to rows on the executors (no JSON round-trip — the
    wire walk emits tuples and only the series hash runs JVM-side).
    ~20× the via-JSON throughput at ingest rates; equality with the
    shared-flattener path is pinned by test_otlp_pb.py."""
    import pandas as pd

    from .otlp import series_key

    def fn(batches):
        for pdf in batches:
            rows = []
            for payload in pdf["payload"]:
                rows.extend(_metrics_rows(decode_metrics_request(bytes(payload))))
            yield pd.DataFrame(
                rows,
                columns=[
                    "name", "unit", "is_monotonic", "labels",
                    "resource_attrs", "ts_ns", "value", "mapping",
                ],
            )

    out = payloads.select("payload").mapInPandas(fn, schema=_METRIC_ROW_SCHEMA)
    return out.withColumn(
        "series_hash", series_key(F.col("name"), F.col("labels"))
    )


def pb_exemplars(payloads: DataFrame) -> DataFrame:
    """OTLP protobuf metric payloads → exemplar rows (the exemplars
    table, chstorage/schema.go:19)."""
    from .otlp import OTLP_METRICS_SCHEMA, flatten_otlp_exemplars

    raw = pb_to_json(payloads, "metrics").select(
        F.from_json("json", OTLP_METRICS_SCHEMA).alias("r")
    ).select("r.*")
    return flatten_otlp_exemplars(raw)


def pb_exp_histograms(payloads: DataFrame) -> DataFrame:
    """OTLP protobuf metric payloads → exponential-histogram native
    state rows (bucket arrays at ANY scale, decode at query time)."""
    from .otlp import OTLP_METRICS_SCHEMA, flatten_otlp_exp_histograms

    raw = pb_to_json(payloads, "metrics").select(
        F.from_json("json", OTLP_METRICS_SCHEMA).alias("r")
    ).select("r.*")
    return flatten_otlp_exp_histograms(raw)


# --- encoders (fixtures/tests only) ------------------------------------------


def _tag(fno: int, wt: int) -> bytes:
    return _enc_uvarint(fno << 3 | wt)


def _enc_len(fno: int, payload: bytes) -> bytes:
    return _tag(fno, 2) + _enc_uvarint(len(payload)) + payload


def _enc_fixed64(fno: int, v: int) -> bytes:
    return _tag(fno, 1) + struct.pack("<Q", v)


def _enc_double(fno: int, v: float) -> bytes:
    return _tag(fno, 1) + struct.pack("<d", v)


def enc_any_string(s: str) -> bytes:
    return _enc_len(1, s.encode())


def enc_any_int(v: int) -> bytes:
    return _tag(3, 0) + _enc_uvarint(v & ((1 << 64) - 1))


def enc_any_double(v: float) -> bytes:
    return _enc_double(4, v)


def enc_kv(key: str, any_value: bytes) -> bytes:
    return _enc_len(1, key.encode()) + _enc_len(2, any_value)


def enc_resource(attrs: dict[str, str]) -> bytes:
    # Resource.attributes = repeated KeyValue (field 1): each KV is its
    # own length-delimited submessage
    return b"".join(
        _enc_len(1, enc_kv(k, enc_any_string(v))) for k, v in attrs.items()
    )


def enc_log_record(
    *,
    time_ns: int,
    severity_number: int = 9,
    severity_text: str = "INFO",
    body: str = "",
    attrs: dict[str, str] | None = None,
    trace_id: bytes = b"",
    span_id: bytes = b"",
    observed_ns: int | None = None,
) -> bytes:
    out = _enc_fixed64(1, time_ns)
    out += _tag(2, 0) + _enc_uvarint(severity_number)
    out += _enc_len(3, severity_text.encode())
    out += _enc_len(5, enc_any_string(body))
    for k, v in (attrs or {}).items():
        out += _enc_len(6, enc_kv(k, enc_any_string(v)))
    if trace_id:
        out += _enc_len(9, trace_id)
    if span_id:
        out += _enc_len(10, span_id)
    if observed_ns is not None:
        out += _enc_fixed64(11, observed_ns)
    return out


def enc_logs_request(
    resource_attrs: dict[str, str],
    records: list[bytes],
    *,
    scope_name: str = "test",
    scope_version: str = "1",
) -> bytes:
    scope = _enc_len(1, scope_name.encode()) + _enc_len(2, scope_version.encode())
    sl = _enc_len(1, scope) + b"".join(_enc_len(2, r) for r in records)
    rl = _enc_len(1, enc_resource(resource_attrs)) + _enc_len(2, sl)
    return _enc_len(1, rl)


def enc_span(
    *,
    trace_id: bytes,
    span_id: bytes,
    parent_span_id: bytes = b"",
    name: str,
    kind: int = 2,
    start_ns: int,
    end_ns: int,
    attrs: dict[str, str] | None = None,
    status_code: int = 0,
    status_message: str = "",
) -> bytes:
    out = _enc_len(1, trace_id) + _enc_len(2, span_id)
    if parent_span_id:
        out += _enc_len(4, parent_span_id)
    out += _enc_len(5, name.encode())
    out += _tag(6, 0) + _enc_uvarint(kind)
    out += _enc_fixed64(7, start_ns) + _enc_fixed64(8, end_ns)
    for k, v in (attrs or {}).items():
        out += _enc_len(9, enc_kv(k, enc_any_string(v)))
    status = _enc_len(2, status_message.encode()) + _tag(3, 0) + _enc_uvarint(
        status_code
    )
    out += _enc_len(15, status)
    return out


def enc_traces_request(resource_attrs: dict[str, str], spans: list[bytes]) -> bytes:
    ss = b"".join(_enc_len(2, s) for s in spans)
    rs = _enc_len(1, enc_resource(resource_attrs)) + _enc_len(2, ss)
    return _enc_len(1, rs)


def enc_exemplar(
    *,
    time_ns: int,
    value: float,
    trace_id: bytes = b"",
    span_id: bytes = b"",
    attrs: dict[str, str] | None = None,
) -> bytes:
    out = _enc_fixed64(2, time_ns) + _enc_double(3, value)
    if span_id:
        out += _enc_len(4, span_id)
    if trace_id:
        out += _enc_len(5, trace_id)
    for k, v in (attrs or {}).items():
        out += _enc_len(7, enc_kv(k, enc_any_string(v)))
    return out


def enc_number_point(
    *, time_ns: int, value: float | int, attrs: dict[str, str] | None = None,
    as_int: bool = False, exemplars: list[bytes] = ()
) -> bytes:
    out = _enc_fixed64(3, time_ns)
    if as_int:
        out += _tag(6, 1) + struct.pack("<q", int(value))
    else:
        out += _enc_double(4, float(value))
    for e in exemplars:
        out += _enc_len(5, e)
    for k, v in (attrs or {}).items():
        out += _enc_len(7, enc_kv(k, enc_any_string(v)))
    return out


def enc_gauge_metric(name: str, unit: str, points: list[bytes]) -> bytes:
    g = b"".join(_enc_len(1, p) for p in points)
    return _enc_len(1, name.encode()) + _enc_len(3, unit.encode()) + _enc_len(5, g)


def enc_sum_metric(
    name: str, unit: str, points: list[bytes], *, monotonic: bool = True
) -> bytes:
    s = b"".join(_enc_len(1, p) for p in points)
    s += _tag(2, 0) + _enc_uvarint(2)  # cumulative
    s += _tag(3, 0) + _enc_uvarint(1 if monotonic else 0)
    return _enc_len(1, name.encode()) + _enc_len(3, unit.encode()) + _enc_len(7, s)


def enc_histogram_point(
    *,
    time_ns: int,
    bucket_counts: list[int],
    explicit_bounds: list[float],
    sum_: float,
    attrs: dict[str, str] | None = None,
) -> bytes:
    out = _enc_fixed64(3, time_ns)
    out += _enc_fixed64(4, sum(bucket_counts))
    out += _enc_double(5, sum_)
    out += _enc_len(6, b"".join(struct.pack("<Q", c) for c in bucket_counts))
    out += _enc_len(7, b"".join(struct.pack("<d", b) for b in explicit_bounds))
    for k, v in (attrs or {}).items():
        out += _enc_len(9, enc_kv(k, enc_any_string(v)))
    return out


def enc_histogram_metric(name: str, unit: str, points: list[bytes]) -> bytes:
    h = b"".join(_enc_len(1, p) for p in points)
    h += _tag(2, 0) + _enc_uvarint(2)
    return _enc_len(1, name.encode()) + _enc_len(3, unit.encode()) + _enc_len(9, h)


def enc_exp_histogram_point(
    *,
    time_ns: int,
    count: int,
    sum_: float,
    scale: int,
    zero_count: int,
    positive_offset: int,
    positive_counts: list[int],
    attrs: dict[str, str] | None = None,
    negative_offset: int = 0,
    negative_counts: list[int] = (),
) -> bytes:
    out = b"".join(
        _enc_len(1, enc_kv(k, enc_any_string(v))) for k, v in (attrs or {}).items()
    )
    out += _enc_fixed64(3, time_ns)
    out += _enc_fixed64(4, count)
    out += _enc_double(5, sum_)
    out += _tag(6, 0) + _enc_uvarint(((scale << 1) ^ (scale >> 63)) & ((1 << 64) - 1))
    out += _enc_fixed64(7, zero_count)
    pos = _tag(1, 0) + _enc_uvarint(
        ((positive_offset << 1) ^ (positive_offset >> 63)) & ((1 << 64) - 1)
    )
    pos += _enc_len(2, b"".join(_enc_uvarint(c) for c in positive_counts))
    out += _enc_len(8, pos)
    if negative_counts:
        neg = _tag(1, 0) + _enc_uvarint(
            ((negative_offset << 1) ^ (negative_offset >> 63)) & ((1 << 64) - 1)
        )
        neg += _enc_len(2, b"".join(_enc_uvarint(c) for c in negative_counts))
        out += _enc_len(9, neg)
    return out


def enc_exp_histogram_metric(name: str, unit: str, points: list[bytes]) -> bytes:
    h = b"".join(_enc_len(1, p) for p in points)
    h += _tag(2, 0) + _enc_uvarint(2)
    return _enc_len(1, name.encode()) + _enc_len(3, unit.encode()) + _enc_len(10, h)


def enc_metrics_request(
    resource_attrs: dict[str, str], metrics: list[bytes]
) -> bytes:
    sm = b"".join(_enc_len(2, m) for m in metrics)
    rm = _enc_len(1, enc_resource(resource_attrs)) + _enc_len(2, sm)
    return _enc_len(1, rm)
