"""Minimal pure-stdlib ISO-BMFF (MP4) container codec for MJPEG video.

Real web video is an MP4 *container* around per-sample codec payloads.
This module implements the container layer for real — box parsing, the
sample tables (stsd/stts/stsc/stsz/stco|co64), chunk-offset arithmetic —
and pairs with the in-repo baseline JPEG codec (ops/jpegc) for the
per-frame payloads, so an ``video/mp4`` column flows through the Ray
multimodal stages with NO import-gated step:

  mp4 bytes -> sample table walk -> per-sample jpeg bytes -> jpegc decode
  -> (H, W, 3) frames

Sample entries other than motion-JPEG (``jpeg``/``mjpa``/``MJPG``) raise
``NotImplementedError`` naming the codec fourcc — an avc1/hev1 bitstream
needs an entropy-coded video decoder a real cluster would load per actor.

Encoder (test-payload synthesis): one video track, one chunk, fixed
per-frame duration — bitstream-legal ISO BMFF (ftyp + mdat + moov with
full sample tables) that standard demuxers accept.
"""

from __future__ import annotations

import struct

MJPEG_FOURCCS = {"jpeg", "mjpa", "MJPG"}


# ---------------------------------------------------------------------------
# box plumbing


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for the boxes in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        fourcc = data[pos + 4 : pos + 8]
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
            body = pos + 8
        else:
            body = pos + 8
        if size < 8 or pos + size > end:
            raise ValueError(f"malformed mp4 box {fourcc!r} at {pos}")
        yield fourcc, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, path: list[bytes]) -> tuple[int, int]:
    """(body_start, body_end) of the first box at the given nesting path."""
    for fourcc, body, box_end in _walk(data, start, end):
        if fourcc == path[0]:
            if len(path) == 1:
                return body, box_end
            return _find(data, body, box_end, path[1:])
    raise ValueError(f"mp4 box {b'/'.join(path)!r} not found")


# ---------------------------------------------------------------------------
# decoder


def decode_mp4_samples(data: bytes) -> dict:
    """Parse the sample tables of the first video track.

    Returns ``{"codec", "width", "height", "timescale", "sample_times"
    (track-timescale units), "samples" (list[bytes])}``.  Non-MJPEG sample
    entries raise NotImplementedError naming the fourcc."""
    if len(data) < 16:
        raise ValueError("not an mp4 (too short)")
    try:
        _find(data, 0, len(data), [b"ftyp"])
    except ValueError:
        raise ValueError("not an mp4 (no ftyp box)") from None
    moov_s, moov_e = _find(data, 0, len(data), [b"moov"])

    # first trak with a video handler
    stbl_s = stbl_e = None
    timescale = 1000
    for fourcc, body, box_end in _walk(data, moov_s, moov_e):
        if fourcc != b"trak":
            continue
        try:
            hdlr_s, _ = _find(data, body, box_end, [b"mdia", b"hdlr"])
        except ValueError:
            continue
        if data[hdlr_s + 8 : hdlr_s + 12] != b"vide":
            continue
        mdhd_s, _ = _find(data, body, box_end, [b"mdia", b"mdhd"])
        version = data[mdhd_s]
        timescale = struct.unpack(
            ">I", data[mdhd_s + (20 if version else 12) : mdhd_s + (24 if version else 16)]
        )[0]
        stbl_s, stbl_e = _find(data, body, box_end, [b"mdia", b"minf", b"stbl"])
        break
    if stbl_s is None:
        raise ValueError("mp4 has no video track")

    def full_body(path: list[bytes], optional: bool = False):
        try:
            s, e = _find(data, stbl_s, stbl_e, path)
        except ValueError:
            if optional:
                return None
            raise
        return s + 4, e  # skip version+flags

    # stsd: codec + dimensions
    s, _ = full_body([b"stsd"])
    fourcc = data[s + 8 : s + 12].decode("latin1")
    if fourcc not in MJPEG_FOURCCS:
        raise NotImplementedError(
            f"mp4 sample entry {fourcc!r}: only motion-JPEG tracks decode here; "
            "an avc1/hev1 track needs a real video codec loaded per actor"
        )
    entry = s + 12  # inside the VisualSampleEntry
    width, height = struct.unpack(">HH", data[entry + 24 : entry + 28])

    # stsz: sample sizes
    s, _ = full_body([b"stsz"])
    uniform, count = struct.unpack(">II", data[s : s + 8])
    sizes = (
        [uniform] * count
        if uniform
        else list(struct.unpack(f">{count}I", data[s + 8 : s + 8 + 4 * count]))
    )

    # stco / co64: chunk offsets
    co = full_body([b"stco"], optional=True)
    if co is not None:
        s, _ = co
        (n_chunks,) = struct.unpack(">I", data[s : s + 4])
        offsets = list(struct.unpack(f">{n_chunks}I", data[s + 4 : s + 4 + 4 * n_chunks]))
    else:
        s, _ = full_body([b"co64"])
        (n_chunks,) = struct.unpack(">I", data[s : s + 4])
        offsets = list(struct.unpack(f">{n_chunks}Q", data[s + 4 : s + 4 + 8 * n_chunks]))

    # stsc: samples per chunk (runs of chunks)
    s, _ = full_body([b"stsc"])
    (n_runs,) = struct.unpack(">I", data[s : s + 4])
    runs = [
        struct.unpack(">III", data[s + 4 + 12 * i : s + 16 + 12 * i]) for i in range(n_runs)
    ]

    # stts: per-sample durations -> cumulative times
    s, _ = full_body([b"stts"])
    (n_tt,) = struct.unpack(">I", data[s : s + 4])
    times: list[int] = []
    t = 0
    for i in range(n_tt):
        cnt, delta = struct.unpack(">II", data[s + 4 + 8 * i : s + 12 + 8 * i])
        for _ in range(cnt):
            times.append(t)
            t += delta

    # walk chunks -> per-sample absolute offsets
    samples: list[bytes] = []
    sample_i = 0
    for chunk_i, chunk_off in enumerate(offsets):
        per = next(
            (spc for first, spc, _desc in reversed(runs) if chunk_i + 1 >= first),
            runs[0][1],
        )
        pos = chunk_off
        for _ in range(per):
            if sample_i >= count:
                break
            size = sizes[sample_i]
            samples.append(data[pos : pos + size])
            pos += size
            sample_i += 1
    if sample_i != count:
        raise ValueError(f"mp4 sample walk found {sample_i} of {count} samples")
    return {
        "codec": fourcc,
        "width": int(width),
        "height": int(height),
        "timescale": timescale,
        "sample_times": times[:count],
        "samples": samples,
    }


# ---------------------------------------------------------------------------
# encoder (deterministic test payloads)


def encode_mp4_mjpeg(
    jpeg_samples: list[bytes], width: int, height: int,
    frame_delta_ms: int = 100, timescale: int = 1000,
) -> bytes:
    """Wrap per-frame baseline-JPEG payloads as a one-track, one-chunk
    ISO BMFF file ('jpeg' sample entry, constant frame duration)."""
    n = len(jpeg_samples)
    duration = n * frame_delta_ms

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat_payload = b"".join(jpeg_samples)
    mdat = _box(b"mdat", mdat_payload)
    mdat_offset = len(ftyp) + 8  # absolute file offset of the first sample

    entry = (
        b"\x00" * 6 + struct.pack(">H", 1)            # reserved + data_ref_index
        + b"\x00" * 16                                 # pre_defined / reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)       # 72 dpi fixed 16.16
        + b"\x00" * 4 + struct.pack(">H", 1)           # reserved + frame_count
        + b"\x00" * 32                                 # compressorname
        + struct.pack(">Hh", 24, -1)                   # depth, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"jpeg", entry))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, frame_delta_ms))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(s)) for s in jpeg_samples),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, mdat_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    url = _full(b"url ", 0, 1, b"")  # self-contained
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)

    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"Video\x00")
    mdhd = _full(
        b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0)
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)

    tkhd = _full(
        b"tkhd", 0, 3,
        struct.pack(">III", 0, 0, 1) + b"\x00" * 4 + struct.pack(">I", duration)
        + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
