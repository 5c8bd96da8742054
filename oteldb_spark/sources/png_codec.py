"""Pure-stdlib PNG encode/decode (zlib + struct only).

The container has no image libraries, but PNG's format needs nothing
beyond zlib (RFC 2083): signature, IHDR, IDAT (deflate of per-scanline
filtered bytes), IEND.  This makes the multimodal decode branch
genuinely testable here instead of forever import-guarded — a real
PIL, when present, still takes priority (it covers JPEG etc.).

Supported: bit depth 8, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), no interlace, all five scanline filters.  That is the
entirety of what the encoder side emits and what the synthetic
fixtures need; anything else raises ValueError so callers fall back to
the byte-level path.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr, filter_choice: "int | None" = None) -> bytes:
    """HxW (gray), HxWx1, HxWx3 (RGB) or HxWx4 (RGBA) uint8 → PNG.

    ``filter_choice`` forces one scanline filter type (0–4) for every
    row; default cycles row_index % 5 so a decode round-trip exercises
    every filter path.
    """
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bpp = c  # bytes per pixel at depth 8
    raw = bytearray()
    prev = np.zeros((w * c,), dtype=np.uint8)
    for y in range(h):
        line = a[y].reshape(-1)
        ft = (y % 5) if filter_choice is None else filter_choice
        if ft == 0:
            filt = line
        elif ft == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.uint8), line[:-bpp]])
            filt = (line.astype(np.int16) - left).astype(np.uint8)
        elif ft == 2:  # Up
            filt = (line.astype(np.int16) - prev).astype(np.uint8)
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.uint8), line[:-bpp]])
            avg = (left.astype(np.int16) + prev.astype(np.int16)) // 2
            filt = (line.astype(np.int16) - avg).astype(np.uint8)
        else:  # Paeth
            left = np.concatenate([np.zeros(bpp, np.uint8), line[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
            filt = (
                line.astype(np.int16)
                - _paeth(left.astype(np.int16), prev.astype(np.int16), upleft.astype(np.int16))
            ).astype(np.uint8)
        raw.append(ft)
        raw.extend(filt.tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a, b, c):
    """Paeth predictor, vectorized (RFC 2083 §6.6)."""
    import numpy as np

    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def is_png(data: bytes) -> bool:
    return data[:8] == _SIG


def decode_png(data: bytes):
    """PNG bytes → HxWxC uint8 ndarray (C = 1, 2, 3 or 4).

    Raises ValueError on anything outside the supported subset
    (depth 8, no interlace, color types 0/2/4/6)."""
    import numpy as np

    if not is_png(data):
        raise ValueError("not a PNG signature")
    pos = 8
    width = height = None
    color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated chunk")
        pos += 12 + length  # skip CRC
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("unsupported PNG variant")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    c = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * c
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros((stride,), dtype=np.int16)
    bpp = c
    for y in range(height):
        off = y * (stride + 1)
        ft = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).astype(
            np.int16
        )
        if ft == 0:
            rec = line
        elif ft == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ft in (1, 3, 4):
            # Sub/Average/Paeth need the just-reconstructed left pixel:
            # walk pixel-groups left→right (vector over channels)
            rec = np.zeros((stride,), dtype=np.int16)
            for x in range(0, stride, bpp):
                left = rec[x - bpp : x] if x else np.zeros(bpp, np.int16)
                up = prev[x : x + bpp]
                upleft = prev[x - bpp : x] if x else np.zeros(bpp, np.int16)
                cur = line[x : x + bpp]
                if ft == 1:
                    rec[x : x + bpp] = (cur + left) & 0xFF
                elif ft == 3:
                    rec[x : x + bpp] = (cur + (left + up) // 2) & 0xFF
                else:
                    rec[x : x + bpp] = (cur + _paeth(left, up, upleft)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ft}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(height, width, c)
