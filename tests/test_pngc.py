"""Spec-behavior tests for the pure-numpy/stdlib PNG codec (ops/pngc).

The decoder must be a faithful baseline PNG implementation, not merely
the inverse of our encoder: an externally hand-assembled bitstream
decodes correctly, every scanline-filter branch is exercised, and the
declared gaps (16-bit, palette, Adam7) raise by name.
"""

import struct
import zlib

import numpy as np
import pytest

from pdf_entity_extraction_ray.ops.pngc import decode_png, encode_png


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png(w, h, depth, color_type, interlace, scanlines: bytes) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace))
        + _chunk(b"IDAT", zlib.compress(scanlines))
        + _chunk(b"IEND", b"")
    )


def test_roundtrip_every_filter_and_colortype():
    rng = np.random.default_rng(11)
    for shape in [(16, 16, 3), (7, 31, 3), (9, 4, 1), (8, 8, 4), (5, 5, 2)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for mode in ("none", "sub", "up", "average", "paeth", "cycle"):
            assert np.array_equal(decode_png(encode_png(img, mode)), img), (shape, mode)


def test_hand_assembled_bitstream():
    """Externally constructed 2x2 RGB PNG (filter 0 + filter 2/Up rows) —
    proves the decoder reads the real format, not just our encoder's."""
    row0 = bytes([0, 255, 0, 0, 0, 255, 0])           # None: red, green
    row1 = bytes([2, 0, 0, 255, 255, 0, 0])           # Up:   red+blue, green+red... mod 256
    img = decode_png(_png(2, 2, 8, 2, 0, row0 + row1))
    assert img.tolist() == [
        [[255, 0, 0], [0, 255, 0]],
        [[255, 0, 255], [255, 255, 0]],
    ]


def test_multiple_idat_chunks_concatenate():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    data = encode_png(img)
    # split the single IDAT into two
    sig, rest = data[:8], data[8:]
    chunks = []
    pos = 0
    while pos < len(rest):
        (length,) = struct.unpack(">I", rest[pos : pos + 4])
        ctype = rest[pos + 4 : pos + 8]
        body = rest[pos + 8 : pos + 8 + length]
        chunks.append((ctype, body))
        pos += 12 + length
    out = sig
    for ctype, body in chunks:
        if ctype == b"IDAT":
            mid = len(body) // 2
            out += _chunk(b"IDAT", body[:mid]) + _chunk(b"IDAT", body[mid:])
        else:
            out += _chunk(ctype, body)
    assert np.array_equal(decode_png(out), img)


def test_declared_gaps_raise_by_name():
    scan = bytes([0, 0, 0, 0])
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_png(_png(1, 1, 16, 2, 0, bytes([0] + [0] * 6)))
    with pytest.raises(NotImplementedError, match="palette"):
        decode_png(_png(1, 1, 8, 3, 0, bytes([0, 0])))
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_png(_png(1, 1, 8, 2, 1, scan))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a" + b"\x00" * 32)


def test_bit_determinism():
    img = np.random.default_rng(3).integers(0, 256, (20, 20, 3), dtype=np.uint8)
    assert encode_png(img, "cycle") == encode_png(img, "cycle")
