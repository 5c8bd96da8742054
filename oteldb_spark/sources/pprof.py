"""pprof protobuf profile ingest → stack-sample rows → distributed
flamegraph fold.

The reference ingests pprof sample protos and merges them into a
flamegraph tree (``internal/profilestorage/flametree.go:8-26``,
``profileqlengine/engine.go:75-127``).  The pprof wire format is the
public ``profile.proto``: samples reference location ids (leaf
first), locations reference functions through line entries, names
live in a string table.  The decode reuses the hand-rolled protobuf
walker from ``sources/prw.py`` and runs executor-side in
``mapInPandas``; the flamegraph merge is a per-prefix explode +
groupBy — Spark's shape of the reference's tree fold, linear in
(samples × stack depth), no driver tree build until render time.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .prw import (
    _enc_uvarint,
    _signed64,
    _skip_generic,
    _uvarint,
    _wire_fields,
)


def _packed_u64(raw, wt) -> list[int]:
    if wt == 0:
        return [raw]
    out, pos = [], 0
    while pos < len(raw):
        v, pos = _uvarint(raw, pos)
        out.append(v)
    return out


def _decode_psample_generic(buf: bytes) -> dict:
    loc_ids: list[int] = []
    values: list[int] = []
    for f2, w2, v2 in _wire_fields(buf):
        if f2 == 1:
            loc_ids += _packed_u64(v2, w2)
        elif f2 == 2:
            values += [_signed64(x) for x in _packed_u64(v2, w2)]
    return {"location_ids": loc_ids, "values": values}


def _decode_psample(buf: bytes) -> dict:
    """Inline Sample walk — the pprof-decode hot loop.

    Single-byte-tag dispatch over the canonical packed encodings
    (location_id=1/len → 0x0A, value=2/len → 0x12) with the packed
    varints unrolled in place; any other tag (e.g. unpacked varint
    fields, labels=3) bails to the generic walker for the whole
    buffer, so exotic encodings decode exactly as before."""
    loc_ids: list[int] = []
    values: list[int] = []
    pos = 0
    n = len(buf)
    while pos < n:
        tag = buf[pos]
        if tag == 0x0A or tag == 0x12:
            b = buf[pos + 1]
            if b < 0x80:
                ln, p = b, pos + 2
            else:
                ln, p = _uvarint(buf, pos + 1)
            end = p + ln
            out = loc_ids if tag == 0x0A else values
            while p < end:
                b = buf[p]
                p += 1
                if b < 0x80:
                    out.append(b)
                else:
                    # multi-byte varint unrolled in place (no call)
                    v = b & 0x7F
                    shift = 7
                    b = buf[p]
                    p += 1
                    while b & 0x80:
                        v |= (b & 0x7F) << shift
                        shift += 7
                        b = buf[p]
                        p += 1
                    out.append(v | (b << shift))
            pos = end
        else:
            return _decode_psample_generic(buf)
    if values:
        values = [_signed64(x) if x >= 1 << 63 else x for x in values]
    return {"location_ids": loc_ids, "values": values}


def decode_profile(data: bytes) -> dict:
    """pprof Profile bytes → {sample_types, samples, stacks resolved
    to function names (leaf first, as stored)}."""
    strings: list[str] = []
    functions: dict[int, int] = {}  # id → name string index
    locations: dict[int, list[int]] = {}  # id → function ids (leaf line first)
    samples: list[dict] = []
    sample_types: list[tuple[int, int]] = []
    time_nanos = 0
    # Inline top-level Profile walk — one tag dispatch per field instead
    # of a generator resume per sample/location/function/string.  The
    # walk's semantics are skip-unknown (like the generator loop), so
    # unhandled fields of any wiretype are skipped generically rather
    # than bailed on: sample_type=1 → 0x0A, sample=2 → 0x12,
    # location=4 → 0x22, function=5 → 0x2A, string_table=6 → 0x32,
    # time_nanos=9 → 0x48 varint.
    pos = 0
    n = len(data)
    append_sample = samples.append
    while pos < n:
        tag = data[pos]
        if tag in (0x0A, 0x12, 0x22, 0x2A, 0x32):  # len-delimited
            b = data[pos + 1]
            if b < 0x80:
                ln, p = b, pos + 2
            else:
                ln, p = _uvarint(data, pos + 1)
            pos = p + ln
            if tag == 0x12:  # Sample{location_id=1, value=2}
                append_sample(_decode_psample(data[p:pos]))
            elif tag == 0x32:  # string table entry
                strings.append(data[p:pos].decode("utf-8"))
            elif tag == 0x22:  # Location{id=1, line=4 → Line{function_id=1}}
                lid = 0
                fids: list[int] = []
                for f2, _, v2 in _wire_fields(data[p:pos]):
                    if f2 == 1:
                        lid = v2
                    elif f2 == 4:
                        for f3, _, v3 in _wire_fields(v2):
                            if f3 == 1:
                                fids.append(v3)
                locations[lid] = fids
            elif tag == 0x2A:  # Function{id=1, name=2}
                fid = name_idx = 0
                for f2, _, v2 in _wire_fields(data[p:pos]):
                    if f2 == 1:
                        fid = v2
                    elif f2 == 2:
                        name_idx = _signed64(v2)
                functions[fid] = name_idx
            else:  # ValueType{type=1, unit=2}
                t = u = 0
                for f2, _, v2 in _wire_fields(data[p:pos]):
                    if f2 == 1:
                        t = _signed64(v2)
                    elif f2 == 2:
                        u = _signed64(v2)
                sample_types.append((t, u))
        elif tag == 0x48:  # time_nanos, varint
            b = data[pos + 1]
            if b < 0x80:
                v, pos = b, pos + 2
            else:
                v, pos = _uvarint(data, pos + 1)
            time_nanos = _signed64(v)
        else:  # any other field: skip generically, like the old loop
            pos = _skip_generic(data, pos)

    # resolve each distinct location once, not once per sample frame —
    # but LAZILY, only for sample-referenced locations (ADVICE r12: an
    # eager comprehension over every Location raised on profiles whose
    # UNREFERENCED locations carry dangling function ids / name
    # indices, which the pre-r12 lazy path decoded fine)
    loc_names: dict[int, list[str]] = {}
    empty: list[str] = []

    resolved = []
    for s in samples:
        # pprof stores leaf-first; inlined frames within a location are
        # also leaf-first line entries
        frames: list[str] = []
        for lid in s["location_ids"]:
            names = loc_names.get(lid)
            if names is None:
                fids = locations.get(lid)
                names = (
                    [strings[functions[f]] for f in fids]
                    if fids is not None
                    else empty
                )
                loc_names[lid] = names
            frames += names
        resolved.append({"frames_leaf_first": frames, "values": s["values"]})
    return {
        "sample_types": [
            (strings[t] if t < len(strings) else "",
             strings[u] if u < len(strings) else "")
            for t, u in sample_types
        ],
        "samples": resolved,
        "time_nanos": time_nanos,
    }


def profile_rows(data: bytes, value_index: int = 0) -> Iterator[dict]:
    """Decoded samples → rows (stack root-first, value)."""
    p = decode_profile(data)
    st, su = (
        p["sample_types"][value_index] if p["sample_types"] else ("", "")
    )
    for s in p["samples"]:
        yield {
            "stack": list(reversed(s["frames_leaf_first"])),
            "value": s["values"][value_index] if s["values"] else 0,
            "sample_type": st,
            "unit": su,
            "time_ns": p["time_nanos"],
        }


SAMPLE_SCHEMA = (
    "stack array<string>, value long, sample_type string, unit string,"
    " time_ns long"
)


def pprof_samples(payloads: DataFrame, value_index: int = 0) -> DataFrame:
    """payload-bytes frame → stack-sample rows, decoded on executors."""
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            rows = []
            for payload in pdf["payload"]:
                rows.extend(profile_rows(bytes(payload), value_index))
            yield pd.DataFrame(
                rows,
                columns=["stack", "value", "sample_type", "unit", "time_ns"],
            )

    return payloads.select("payload").mapInPandas(fn, schema=SAMPLE_SCHEMA)


def flame_nodes(samples: DataFrame, sep: str = ">") -> DataFrame:
    """Stack samples → flamegraph node rows (stack-prefix, self,
    total) — the distributed form of FlameTree: ``total`` is the
    subtree value, ``self`` the value of samples ending exactly
    there.  One explode (samples × depth) + one groupBy."""
    depth = F.size("stack")
    prefixes = F.transform(
        F.sequence(F.lit(1), depth),
        lambda i: F.struct(
            F.array_join(F.slice("stack", F.lit(1), i), sep).alias("node"),
            (i == depth).alias("is_leaf"),
            i.alias("depth"),
        ),
    )
    e = samples.select(F.explode(prefixes).alias("p"), "value")
    return (
        e.groupBy(F.col("p.node").alias("stack"))
        .agg(
            F.sum(F.when(F.col("p.is_leaf"), F.col("value")).otherwise(0))
            .cast("long")
            .alias("self"),
            F.sum("value").cast("long").alias("total"),
            F.min("p.depth").cast("int").alias("depth"),
        )
    )


# --- encoder (fixtures/tests only) -------------------------------------------


def _tag(fno: int, wt: int) -> bytes:
    return _enc_uvarint(fno << 3 | wt)


def _enc_len(fno: int, payload: bytes) -> bytes:
    return _tag(fno, 2) + _enc_uvarint(len(payload)) + payload


def encode_profile(
    stacks: list[tuple[list[str], int]],
    *,
    sample_type: tuple[str, str] = ("cpu", "nanoseconds"),
    time_nanos: int = 0,
) -> bytes:
    """Build a pprof Profile from (root-first stack, value) pairs."""
    strings: list[str] = [""]  # index 0 must be ""

    def sidx(s: str) -> int:
        try:
            return strings.index(s)
        except ValueError:
            strings.append(s)
            return len(strings) - 1

    func_ids: dict[str, int] = {}
    loc_ids: dict[str, int] = {}
    functions: list[bytes] = []
    locations: list[bytes] = []

    def loc_for(name: str) -> int:
        if name not in loc_ids:
            if name not in func_ids:
                fid = len(func_ids) + 1
                func_ids[name] = fid
                functions.append(
                    _enc_len(
                        5,
                        _tag(1, 0)
                        + _enc_uvarint(fid)
                        + _tag(2, 0)
                        + _enc_uvarint(sidx(name)),
                    )
                )
            lid = len(loc_ids) + 1
            loc_ids[name] = lid
            line = _tag(1, 0) + _enc_uvarint(func_ids[name])
            locations.append(
                _enc_len(4, _tag(1, 0) + _enc_uvarint(lid) + _enc_len(4, line))
            )
        return loc_ids[name]

    sample_bytes = []
    for stack, value in stacks:
        lids = [loc_for(n) for n in reversed(stack)]  # leaf first
        s = _enc_len(1, b"".join(_enc_uvarint(l) for l in lids))
        s += _enc_len(2, _enc_uvarint(value & ((1 << 64) - 1)))
        sample_bytes.append(_enc_len(2, s))

    vt = (
        _tag(1, 0)
        + _enc_uvarint(sidx(sample_type[0]))
        + _tag(2, 0)
        + _enc_uvarint(sidx(sample_type[1]))
    )
    out = _enc_len(1, vt)
    out += b"".join(sample_bytes)
    out += b"".join(locations)
    out += b"".join(functions)
    out += b"".join(_enc_len(6, s.encode()) for s in strings)
    if time_nanos:
        out += _tag(9, 0) + _enc_uvarint(time_nanos)
    return out
