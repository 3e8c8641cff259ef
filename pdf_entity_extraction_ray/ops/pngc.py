"""Pure-numpy/stdlib baseline PNG codec (no Pillow dependency).

Decoder: 8-bit greyscale / RGB / RGBA (color types 0, 2, 6),
non-interlaced, all five scanline filters (None/Sub/Up/Average/Paeth),
multi-IDAT, via stdlib ``zlib`` + numpy unfiltering.  Sub and Up rows
unfilter fully vectorized (Sub is a per-lane modular cumsum); Average and
Paeth rows take a per-byte loop — acceptable because encoders emit them
rarely for synthetic content and the decode stage is an actor-pool
``map_batches`` leaf, not a shuffle.  Unsupported shapes raise
``NotImplementedError`` naming the exact gap (16-bit, palette, Adam7).

Encoder (for deterministic test payloads): 8-bit RGB/greyscale, a fixed
or per-row-cycling filter choice, single zlib IDAT.  Bitstream-legal —
output round-trips through any compliant decoder.

Reference for parity intent: the reference repo treats documents as
opaque inputs and never decodes rasters; this module exists because a
100 TB web corpus's image column is overwhelmingly jpeg/png and the
multimodal stages (ops/multimodal.py) need a real in-sandbox decode path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        yield ctype, body
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IEND":
            return


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 array (C=1 grey, 3 RGB, 4 RGBA)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise NotImplementedError(f"only 8-bit PNG supported (got depth={bit_depth})")
    if color_type == 3:
        raise NotImplementedError("palette (indexed) PNG not supported")
    if color_type not in _CHANNELS:
        raise ValueError(f"invalid PNG color type {color_type}")
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG not supported")

    channels = _CHANNELS[color_type]
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")

    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:].astype(np.int64)  # headroom for modular arithmetic
    out = np.zeros((height, stride), dtype=np.int64)
    bpp = channels  # bytes per pixel at depth 8

    for y in range(height):
        f = int(filters[y])
        cur = rows[y]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int64)
        if f == 0:  # None
            out[y] = cur
        elif f == 1:  # Sub: per-lane modular cumsum, fully vectorized
            for lane in range(bpp):
                out[y, lane::bpp] = np.cumsum(cur[lane::bpp]) & 0xFF
        elif f == 2:  # Up: vector add
            out[y] = (cur + prev) & 0xFF
        elif f == 3:  # Average: sequential in x
            row = out[y]
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth: sequential in x
            row = out[y]
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                ul = int(prev[x - bpp]) if x >= bpp else 0
                row[x] = (cur[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter {f} on row {y}")
    return out.astype(np.uint8).reshape(height, width, channels)


# ---------------------------------------------------------------------------
# Encoder (test-payload synthesis)


def _filter_row(f: int, cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    cur = cur.astype(np.int64)
    prev = prev.astype(np.int64)
    left = np.zeros_like(cur)
    left[bpp:] = cur[:-bpp]
    ul = np.zeros_like(prev)
    ul[bpp:] = prev[:-bpp]
    if f == 0:
        return cur & 0xFF
    if f == 1:
        return (cur - left) & 0xFF
    if f == 2:
        return (cur - prev) & 0xFF
    if f == 3:
        return (cur - ((left + prev) >> 1)) & 0xFF
    if f == 4:
        p = left + prev - ul
        pa_, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
        pred = np.where((pa_ <= pb) & (pa_ <= pc), left, np.where(pb <= pc, prev, ul))
        return (cur - pred) & 0xFF
    raise ValueError(f"invalid filter {f}")


def encode_png(img: np.ndarray, filter_mode: str = "none") -> bytes:
    """(H, W) or (H, W, C) uint8 -> PNG bytes.  ``filter_mode``: one of
    ``none|sub|up|average|paeth`` (fixed per row) or ``cycle`` (row y uses
    filter y % 5 — exercises every decoder branch in one payload)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    flat = img.reshape(h, w * c)
    modes = {"none": 0, "sub": 1, "up": 2, "average": 3, "paeth": 4}
    lines = bytearray()
    prev = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        f = (y % 5) if filter_mode == "cycle" else modes[filter_mode]
        lines.append(f)
        lines.extend(_filter_row(f, flat[y], prev, c).astype(np.uint8).tobytes())
        prev = flat[y]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + chunk(b"IEND", b"")
    )
