"""Spec-behavior tests for the ISO-BMFF (MP4) container codec (ops/mp4c)
and the MJPEG decode path through the multimodal frame sampler."""

import struct

import numpy as np
import pytest

from pdf_entity_extraction_ray.ops.jpegc import decode_jpeg, encode_jpeg
from pdf_entity_extraction_ray.ops.mp4c import decode_mp4_samples, encode_mp4_mjpeg


def _mp4(n_frames=6, w=24, h=16, delta=125, seed=3):
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n_frames)]
    jpegs = [encode_jpeg(f, quality=85) for f in frames]
    return jpegs, encode_mp4_mjpeg(jpegs, w, h, frame_delta_ms=delta)


def test_sample_roundtrip_and_tables():
    jpegs, mp4 = _mp4()
    info = decode_mp4_samples(mp4)
    assert info["codec"] == "jpeg"
    assert (info["width"], info["height"]) == (24, 16)
    assert info["timescale"] == 1000
    assert info["sample_times"] == [0, 125, 250, 375, 500, 625]
    assert info["samples"] == jpegs  # byte-exact demux
    img = decode_jpeg(info["samples"][2])
    assert img.shape == (16, 24, 3)


def test_non_mjpeg_codec_raises_by_name():
    _, mp4 = _mp4(n_frames=2)
    # surgically rewrite the stsd sample-entry fourcc (inside moov, after
    # the stsd full-box header + entry_count), never touching mdat bytes
    idx = mp4.rindex(b"stsd")
    entry_fourcc = idx + 4 + 4 + 4 + 4  # ver/flags + entry_count + entry size
    assert mp4[entry_fourcc : entry_fourcc + 4] == b"jpeg"
    bad = mp4[:entry_fourcc] + b"avc1" + mp4[entry_fourcc + 4 :]
    with pytest.raises(NotImplementedError, match="avc1"):
        decode_mp4_samples(bad)


def test_not_an_mp4_rejected():
    with pytest.raises(ValueError):
        decode_mp4_samples(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(ValueError):
        decode_mp4_samples(b"")


def test_uniform_stsz_and_co64_paths():
    """Decoder must honor the uniform-size stsz form and 64-bit chunk
    offsets (co64) — a from-scratch hand-assembled file (independent of
    the encoder's table choices)."""
    from pdf_entity_extraction_ray.ops.mp4c import _box, _full

    jpegs, _ = _mp4(n_frames=3)
    size = max(len(j) for j in jpegs)
    padded = [j + b"\x00" * (size - len(j)) for j in jpegs]

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom")
    mdat = _box(b"mdat", b"".join(padded))
    mdat_offset = len(ftyp) + 8

    entry = (
        b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
        + struct.pack(">HH", 24, 16) + struct.pack(">II", 0x480000, 0x480000)
        + b"\x00" * 4 + struct.pack(">H", 1) + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
    )
    stbl = _box(
        b"stbl",
        _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"jpeg", entry))
        + _full(b"stts", 0, 0, struct.pack(">III", 1, 3, 100))
        + _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 3, 1))
        + _full(b"stsz", 0, 0, struct.pack(">II", size, 3))          # uniform
        + _full(b"co64", 0, 0, struct.pack(">IQ", 1, mdat_offset)),  # 64-bit
    )
    minf = _box(b"minf", _full(b"vmhd", 0, 1, b"\x00" * 8) + stbl)
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"V\x00")
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, 1000, 300, 0x55C4, 0))
    trak = _box(b"trak", _box(b"mdia", mdhd + hdlr + minf))
    moov = _box(b"moov", trak)

    info = decode_mp4_samples(ftyp + mdat + moov)
    assert [len(s) for s in info["samples"]] == [size] * 3
    assert info["samples"] == padded
    assert info["sample_times"] == [0, 100, 200]


def test_mp4_rows_flow_through_frame_sampler_hash_exact():
    import pyarrow as pa

    from pdf_entity_extraction_ray.ops.multimodal import (
        _RAW_H,
        _RAW_W,
        MP4_VIDEO,
        FrameSampler,
        mp4_frames_at,
        synthesize_media_batch,
    )

    media = synthesize_media_batch(pa.table({"id": pa.array(range(30), pa.int64())}))
    mp4s = media.filter(pa.compute.equal(media.column("mime"), MP4_VIDEO))
    assert mp4s.num_rows >= 4
    out = FrameSampler(every_ms=250)(media)
    got = {
        (m, o): p
        for m, o, p in zip(
            out.column("media_id").to_pylist(),
            out.column("frame_ms").to_pylist(),
            out.column("frame_payload").to_pylist(),
        )
    }
    for mid, payload in zip(
        mp4s.column("media_id").to_pylist(), mp4s.column("payload").to_pylist()
    ):
        want = mp4_frames_at(payload, 250)
        assert [t for t, _ in want] == [0, 250, 500, 750]
        for t, frame in want:
            assert got[(mid, t)] == frame  # byte-exact vs single-process
            assert len(frame) == _RAW_W * _RAW_H * 3
