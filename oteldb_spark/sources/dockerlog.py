"""Docker container log source — the daemon's multiplexed stream
format decoded executor-side.

The reference attaches to the Docker daemon and iterates the
multiplexed log stream as a LogQL input
(``internal/dockerlog/daemonlog.go``): 8-byte frame headers (stream
type byte, big-endian frame length) around ``<RFC3339Nano ts>
<message>`` lines.  Here the same wire format decodes in Arrow
batches over ``mapInPandas`` — captured stream blobs land in a binary
column (collector file, object store), executors walk the frames, and
the rows feed the regular ``LogSource``.  Like the remote-write path,
nothing touches the driver.
"""

from __future__ import annotations

import struct
from datetime import datetime, timezone
from typing import Iterable, Iterator

_STREAMS = {0: "stdin", 1: "stdout", 2: "stderr"}
_SYSTEMERR = 3

ROW_SCHEMA = "ts_us long, ts_ns long, stream string, body string"


def _rfc3339_to_ns(raw: str) -> int:
    """RFC3339Nano → ns epoch (1-9 fractional digits, Z or offset)."""
    base, _, frac = raw.partition(".")
    tz = ""
    if frac:
        for i, ch in enumerate(frac):
            if not ch.isdigit():
                tz = frac[i:]
                frac = frac[:i]
                break
    else:
        for sep in ("Z", "+", "-"):
            # timezone suffix on the seconds part (search after date)
            idx = base.find(sep, 10)
            if idx != -1:
                tz = base[idx:]
                base = base[:idx]
                break
    dt = datetime.fromisoformat(base + (tz or "Z").replace("Z", "+00:00"))
    secs = int(dt.astimezone(timezone.utc).timestamp())
    ns = int((frac + "000000000")[:9]) if frac else 0
    return secs * 1_000_000_000 + ns


def _ns_to_rfc3339(ts_ns: int) -> str:
    secs, ns = divmod(ts_ns, 1_000_000_000)
    dt = datetime.fromtimestamp(secs, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S") + f".{ns:09d}Z"


def encode_docker_stream(
    entries: Iterable[tuple[int, int, str]]
) -> bytes:
    """Fixture/test encoder: (stream type, ts_ns, line) → multiplexed
    frames (the daemon's write side)."""
    out = bytearray()
    for typ, ts_ns, line in entries:
        payload = f"{_ns_to_rfc3339(ts_ns)} {line}".encode()
        out += bytes([typ, 0, 0, 0]) + struct.pack(">I", len(payload))
        out += payload
    return bytes(out)


def parse_docker_stream(data: bytes) -> Iterator[dict]:
    """Walk multiplexed frames → row dicts (daemonlog.go parseNext:
    truncated trailing headers end the stream gracefully; systemerr
    frames raise)."""
    pos = 0
    n = len(data)
    while pos + 8 <= n:
        typ = data[pos]
        size = struct.unpack_from(">I", data, pos + 4)[0]
        frame = data[pos + 8 : pos + 8 + size]
        if len(frame) < size:
            break
        pos += 8 + size
        if typ == _SYSTEMERR:
            raise ValueError(f"daemon log stream error: {frame!r}")
        raw_ts, _, line = frame.decode("utf-8", "replace").partition(" ")
        ts_ns = _rfc3339_to_ns(raw_ts)
        yield {
            "ts_us": ts_ns // 1_000,
            "ts_ns": ts_ns,
            "stream": _STREAMS.get(typ, f"unknown type {typ}"),
            "body": line,
        }


def docker_stream_rows(payloads):
    """binary `payload` column of captured streams → log rows,
    decoded on executors in Arrow batches."""

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for blob in pdf["payload"]:
                rows.extend(parse_docker_stream(bytes(blob)))
            yield pd.DataFrame(
                rows, columns=["ts_us", "ts_ns", "stream", "body"]
            )

    return payloads.select("payload").mapInPandas(fn, schema=ROW_SCHEMA)
