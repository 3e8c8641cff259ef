"""Multimodal columns: opaque ``binary`` payloads + typed metadata,
processed by actor-pool ``map_batches`` stages.

Two payload classes:

* RAW formats — ``image/x-raw-rgb8`` (H*W*3 uint8), ``audio/x-raw-pcm16``
  (mono int16 PCM), ``video/x-raw-rgb8-seq`` (concatenated raw frames) —
  get REAL numpy kernels: channel statistics + luminance histogram,
  nearest-neighbor resize, per-frame RMS / zero-crossing rate, true frame
  slicing.  No external libraries needed; fully tested against
  hand-computed values.
* CONTAINER formats decodable with the STDLIB — ``image/bmp``
  (uncompressed 24-bit, struct-parsed) and ``audio/wav`` (PCM16 via the
  ``wave`` module) — are decoded for REAL and feed the same numpy
  kernels as the raw formats (round-trip tested: encode raw -> container
  -> identical features).
* COMPRESSED JPEG (``image/jpeg``) — decoded for REAL by the pure-numpy
  baseline decoder in ``ops/jpegc.py`` (canonical Huffman from the
  file's DHT, 4:4:4/4:2:0, restart markers); the dominant web image
  format is a first-class decode path here, hash-exact against a
  single-process gold.  Progressive JPEGs raise NotImplementedError
  (jpegc names the gap).
* COMPRESSED PNG (``image/png``) — decoded for REAL by the stdlib-zlib +
  numpy codec in ``ops/pngc.py`` (8-bit grey/RGB/RGBA, all five scanline
  filters); 16-bit/palette/interlaced raise NotImplementedError (pngc
  names the gap).
* MP4 VIDEO (``video/mp4``) — the ISO-BMFF container layer is demuxed
  for REAL (``ops/mp4c``: box walk + stsd/stts/stsc/stsz/stco sample
  tables) and motion-JPEG samples decode through ``ops/jpegc``; tracks
  in entropy-coded codecs (avc1/hev1) raise NotImplementedError naming
  the fourcc — a real cluster loads that decoder per actor.  Every
  format the multimodal oracle synthesizes now takes a real decode
  path; the ``fake=True`` stand-in remains only for formats absent from
  the corpus (e.g. webp).

Batch-size guidance: payload columns dominate memory; callers should pass
``batch_size`` such that ``batch_size * max_payload * concurrency`` fits
the worker heap (SURVEY §4 memory-aware sizing).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),        # -1 when unknown / not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

RAW_IMAGE = "image/x-raw-rgb8"
RAW_AUDIO = "audio/x-raw-pcm16"
RAW_VIDEO = "video/x-raw-rgb8-seq"
BMP_IMAGE = "image/bmp"
WAV_AUDIO = "audio/wav"
JPEG_IMAGE = "image/jpeg"
PNG_IMAGE = "image/png"
MP4_VIDEO = "video/mp4"

_JPEG_QUALITY = 85  # synthesized-jpeg encode quality (deterministic)

AUDIO_SAMPLE_RATE = 8000  # samples/s for raw PCM payloads

_RAW_W, _RAW_H = 16, 12   # synthesized raw image dims
_RAW_FRAMES = 8           # synthesized raw video frame count


def _raw_image_payload(i: int, w: int = _RAW_W, h: int = _RAW_H) -> bytes:
    """Deterministic raw RGB8 array: per-id gradient + channel offsets."""
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(w - 1, 1) + i * 7) % 256
    g = (yy * 255 // max(h - 1, 1) + i * 13) % 256
    b = ((xx + yy) * 11 + i) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8).tobytes()


def _raw_audio_payload(i: int, duration_ms: int = 1000) -> bytes:
    """Deterministic mono PCM16: a sine whose frequency depends on the id."""
    n = AUDIO_SAMPLE_RATE * duration_ms // 1000
    t = np.arange(n, dtype=np.float64) / AUDIO_SAMPLE_RATE
    freq = 110.0 + 13.0 * (i % 17)
    wave = np.sin(2 * np.pi * freq * t) * 0.5
    return (wave * 32767).astype(np.int16).tobytes()


def _raw_video_payload(i: int, frames: int = _RAW_FRAMES) -> bytes:
    return b"".join(_raw_image_payload(i * 31 + f) for f in range(frames))


def mp4_frames_at(payload: bytes, every_ms: int) -> list[tuple[int, bytes]]:
    """Demux an MJPEG MP4 and decode one frame per ``every_ms`` boundary:
    (frame_ms, raw RGB8 bytes) rows.  Shared by the Ray FrameSampler stage
    and the single-process gold writer."""
    from .jpegc import decode_jpeg
    from .mp4c import decode_mp4_samples

    info = decode_mp4_samples(payload)
    ms_per_unit = 1000.0 / max(info["timescale"], 1)
    out: list[tuple[int, bytes]] = []
    next_at = 0.0
    for t, sample in zip(info["sample_times"], info["samples"]):
        tm = t * ms_per_unit
        if tm + 1e-9 >= next_at:
            out.append((int(tm), decode_jpeg(sample).tobytes()))
            next_at = tm + every_ms
    return out


def _mp4_video_payload(i: int, frames: int = _RAW_FRAMES) -> bytes:
    """The same deterministic frames as :func:`_raw_video_payload`, carried
    as a real motion-JPEG MP4 (ops/mp4c container + ops/jpegc samples)."""
    from .jpegc import encode_jpeg
    from .mp4c import encode_mp4_mjpeg

    arrs = [
        decode_raw_rgb8(_raw_image_payload(i * 31 + f), _RAW_W, _RAW_H)
        for f in range(frames)
    ]
    jpegs = [encode_jpeg(a, quality=_JPEG_QUALITY) for a in arrs]
    return encode_mp4_mjpeg(jpegs, _RAW_W, _RAW_H, frame_delta_ms=1000 // frames)


def synthesize_media_batch(batch: pa.Table) -> pa.Table:
    """Deterministic RAW media rows from an ``id`` column: the kernels that
    consume these are REAL (numpy over raw arrays), so the whole media path
    is exercised end-to-end without any decode library."""
    ids = batch.column("id").to_pylist()
    kinds = ["image", "audio", "video"]
    payloads, mimes, widths, heights, durs = [], [], [], [], []
    for i in ids:
        kind = kinds[i % 3]
        if kind == "image":
            # image rows cycle raw -> jpeg -> png so BOTH compressed decode
            # paths (jpegc, pngc) are oracle-covered; jpegs alternate
            # 4:4:4 / 4:2:0, pngs use the per-row-cycling filter mode
            # (every unfilter branch in one payload)
            phase = (i // 3) % 3
            if phase == 1:
                from .jpegc import encode_jpeg, encode_jpeg_progressive

                raw = decode_raw_rgb8(_raw_image_payload(i), _RAW_W, _RAW_H)
                sub = "4:2:0" if (i // 6) % 2 else "4:4:4"
                # alternate baseline / progressive (SOF2) so BOTH entropy
                # layouts are oracle-covered; (i//9)%2 flips per jpeg row,
                # crossing the subsampling cycle -> all four combos appear
                enc = encode_jpeg_progressive if (i // 9) % 2 else encode_jpeg
                payloads.append(enc(raw, quality=_JPEG_QUALITY, subsampling=sub))
                mimes.append(JPEG_IMAGE)
            elif phase == 2:
                from .pngc import encode_png

                raw = decode_raw_rgb8(_raw_image_payload(i), _RAW_W, _RAW_H)
                payloads.append(encode_png(raw, filter_mode="cycle"))
                mimes.append(PNG_IMAGE)
            else:
                payloads.append(_raw_image_payload(i))
                mimes.append(RAW_IMAGE)
            widths.append(_RAW_W)
            heights.append(_RAW_H)
            durs.append(-1)
        elif kind == "audio":
            payloads.append(_raw_audio_payload(i))
            mimes.append(RAW_AUDIO)
            widths.append(-1)
            heights.append(-1)
            durs.append(1000)
        else:
            # video rows alternate raw frame sequences and real MJPEG MP4s
            # so the container+codec decode path is oracle-covered
            if (i // 3) % 2 == 1:
                payloads.append(_mp4_video_payload(i))
                mimes.append(MP4_VIDEO)
            else:
                payloads.append(_raw_video_payload(i))
                mimes.append(RAW_VIDEO)
            widths.append(_RAW_W)
            heights.append(_RAW_H)
            durs.append(1000)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array([kinds[i % 3] for i in ids], pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "duration_ms": pa.array(durs, pa.int32()),
        }
    )


def write_gold_media(out_dir: str, n: int = 300, every_ms: int = 250) -> None:
    """Single-process gold tables for the driver-visible multimodal
    oracles: expected image features (integer ppm — the repo's float-hash
    trick) and expected sampled frame rows, computed WITHOUT Ray from the
    same deterministic id-derived payloads the queries synthesize.

    What the oracle proves (the same standard as the kg gold tables): the
    distributed actor-pool execution — batching, filtering, schema,
    parallelism — reproduces the single-process reference bit-for-bit."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    img_id, img_ppm, img_bytes = [], [], []
    frm_id, frm_off, frm_pay = [], [], []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            phase = (i // 3) % 3  # raw/jpeg/png, mirroring synthesize_media_batch
            if phase == 1:
                from .jpegc import decode_jpeg, encode_jpeg, encode_jpeg_progressive

                raw = decode_raw_rgb8(_raw_image_payload(i), _RAW_W, _RAW_H)
                sub = "4:2:0" if (i // 6) % 2 else "4:4:4"
                enc = encode_jpeg_progressive if (i // 9) % 2 else encode_jpeg
                payload = enc(raw, quality=_JPEG_QUALITY, subsampling=sub)
                feats = rgb8_features(decode_jpeg(payload))
            elif phase == 2:
                from .pngc import decode_png, encode_png

                raw = decode_raw_rgb8(_raw_image_payload(i), _RAW_W, _RAW_H)
                payload = encode_png(raw, filter_mode="cycle")
                feats = rgb8_features(decode_png(payload))
            else:
                payload = _raw_image_payload(i)
                feats = rgb8_features(decode_raw_rgb8(payload, _RAW_W, _RAW_H))
            img_id.append(i)
            img_ppm.append([int(x) for x in np.round(np.asarray(feats) * 1e6)])
            img_bytes.append(len(payload))
        elif kind == "video":
            if (i // 3) % 2 == 1:  # mp4 rows, mirroring synthesize_media_batch
                for tm, frame in mp4_frames_at(_mp4_video_payload(i), every_ms):
                    frm_id.append(i)
                    frm_off.append(tm)
                    frm_pay.append(frame)
            else:
                payload = _raw_video_payload(i)
                frame_bytes = _RAW_W * _RAW_H * 3
                n_frames = len(payload) // frame_bytes
                frame_dur = max(1000, 1) / max(n_frames, 1)
                step = max(1, int(round(every_ms / frame_dur)))
                for f in range(0, n_frames, step):
                    frm_id.append(i)
                    frm_off.append(int(f * frame_dur))
                    frm_pay.append(payload[f * frame_bytes : (f + 1) * frame_bytes])
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array(img_id, pa.int64()),
                "features_ppm": pa.array(img_ppm, pa.list_(pa.int64())),
                "n_bytes": pa.array(img_bytes, pa.int64()),
            }
        ),
        os.path.join(out_dir, "gold_image_features.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array(frm_id, pa.int64()),
                "frame_ms": pa.array(frm_off, pa.int32()),
                "frame_payload": pa.array(frm_pay, pa.binary()),
            }
        ),
        os.path.join(out_dir, "gold_frames.parquet"),
    )


def decode_raw_rgb8(payload: bytes, width: int, height: int) -> np.ndarray:
    """raw RGB8 payload -> (H, W, 3) uint8 array (zero-copy view + reshape)."""
    return np.frombuffer(payload, dtype=np.uint8).reshape(height, width, 3)


# --------------------------------------------------------------------------
# stdlib container codecs: BMP (struct) and WAV (wave module) — REAL decode
# paths with no external dependency; jpeg/png decode via ops/jpegc and
# ops/pngc (also dependency-free); only mp4 stays import-gated


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> uncompressed 24-bit bottom-up BMP bytes."""
    import struct

    h, w, _ = img.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    stride = row + pad
    data_size = stride * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + data_size, 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    bgr = img[:, :, ::-1]
    rows = [bgr[y].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)]
    return header + dib + b"".join(rows)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> (H, W, 3) uint8 RGB (handles row padding
    and bottom-up layout).  Raises NotImplementedError for compressed or
    non-24-bit BMPs (those would need a real image library)."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    w = struct.unpack_from("<i", payload, 18)[0]
    h = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (got bpp={bpp}, comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    arr = (
        np.frombuffer(payload, np.uint8, stride * h, off)
        .reshape(h, stride)[:, : w * 3]
        .reshape(h, w, 3)
    )
    if bottom_up:
        arr = arr[::-1]
    return arr[:, :, ::-1].copy()  # BGR -> RGB


def encode_wav(pcm16: bytes, rate: int = AUDIO_SAMPLE_RATE) -> bytes:
    """Mono PCM16 bytes -> RIFF/WAV bytes (stdlib ``wave``)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm16)
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[bytes, int]:
    """RIFF/WAV bytes -> (mono PCM16 bytes, sample rate).  Stereo or
    non-16-bit WAVs raise NotImplementedError."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getnchannels() != 1 or f.getsampwidth() != 2:
            raise NotImplementedError("only mono PCM16 WAV")
        return f.readframes(f.getnframes()), f.getframerate()


def rgb8_features(img: np.ndarray) -> list[float]:
    """REAL image features: per-channel mean + std (scaled to [0,1]) and a
    10-bin luminance histogram (mass-normalized) — 16 dims."""
    f = img.astype(np.float64)
    means = f.mean(axis=(0, 1)) / 255.0
    stds = f.std(axis=(0, 1)) / 255.0
    lum = f @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(lum, bins=10, range=(0.0, 255.0))
    hist = hist / lum.size
    return [*means.tolist(), *stds.tolist(), *hist.tolist()]


class ImageFeatureExtractor:
    """Actor-pool stage: image payload -> 16-dim feature vector.

    Raw RGB8 payloads take the REAL numpy kernel; compressed mimes need a
    decoder loaded once per actor in ``__init__`` — import-gated, with
    ``fake=True`` substituting a content-derived stand-in so mixed-format
    corpora still flow."""

    FEATURE_DIM = 16

    def __init__(self, fake: bool = True):
        self.fake = fake

    def _fake_features(self, payload: bytes) -> list[float]:
        digest = hashlib.blake2b(payload, digest_size=self.FEATURE_DIM * 4).digest()
        arr = np.frombuffer(digest, dtype=np.uint32).astype(np.float64)
        return (arr / np.float64(2**32)).tolist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep = pa.compute.equal(batch.column("kind"), pa.scalar("image"))
        images = batch.filter(keep)
        feats = []
        for payload, mime, w, h in zip(
            images.column("payload").to_pylist(),
            images.column("mime").to_pylist(),
            images.column("width").to_pylist(),
            images.column("height").to_pylist(),
        ):
            if mime == RAW_IMAGE:
                feats.append(rgb8_features(decode_raw_rgb8(payload, w, h)))
            elif mime == BMP_IMAGE:
                feats.append(rgb8_features(decode_bmp(payload)))  # real stdlib decode
            elif mime == JPEG_IMAGE:
                from .jpegc import decode_jpeg

                feats.append(rgb8_features(decode_jpeg(payload)))  # real numpy decode
            elif mime == PNG_IMAGE:
                from .pngc import decode_png

                img = decode_png(payload)
                if img.shape[2] != 3:  # grey/alpha variants -> RGB view
                    img = np.repeat(img[:, :, :1], 3, axis=2)
                feats.append(rgb8_features(img))  # real stdlib-zlib decode
            elif self.fake:
                feats.append(self._fake_features(payload))
            else:
                raise NotImplementedError(
                    f"decoding {mime} requires PIL/torchvision (absent here); "
                    "load the decoder in __init__ on a real cluster or pass fake=True"
                )
        return pa.table(
            {
                "media_id": images.column("media_id"),
                "features": pa.array(feats, pa.list_(pa.float64())),
                "n_bytes": pa.compute.binary_length(images.column("payload")).cast(pa.int64()),
            }
        )


class ImageResizer:
    """Actor-pool stage: image payload -> resized payload + new dims.

    Raw RGB8 images are resized for REAL (nearest-neighbor via numpy index
    maps — exact and deterministic); compressed mimes are import-gated."""

    def __init__(self, width: int = 32, height: int = 32, fake: bool = True):
        self.width = width
        self.height = height
        self.fake = fake

    def _resize_raw(self, payload: bytes, w: int, h: int) -> bytes:
        img = decode_raw_rgb8(payload, w, h)
        ys = (np.arange(self.height) * h) // self.height
        xs = (np.arange(self.width) * w) // self.width
        return img[ys[:, None], xs[None, :], :].tobytes()

    def _fake_resize(self, payload: bytes) -> bytes:
        target = self.width * self.height * 3
        digest = hashlib.blake2b(payload, digest_size=32).digest()
        return (digest * (target // len(digest) + 1))[:target]

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep = pa.compute.equal(batch.column("kind"), pa.scalar("image"))
        images = batch.filter(keep)
        payloads, mimes = [], []
        for payload, mime, w, h in zip(
            images.column("payload").to_pylist(),
            images.column("mime").to_pylist(),
            images.column("width").to_pylist(),
            images.column("height").to_pylist(),
        ):
            if mime == RAW_IMAGE:
                payloads.append(self._resize_raw(payload, w, h))
                mimes.append(RAW_IMAGE)
            elif mime == BMP_IMAGE:
                img = decode_bmp(payload)
                payloads.append(self._resize_raw(img.tobytes(), img.shape[1], img.shape[0]))
                mimes.append(RAW_IMAGE)
            elif mime == JPEG_IMAGE:
                from .jpegc import decode_jpeg

                img = decode_jpeg(payload)
                payloads.append(self._resize_raw(img.tobytes(), img.shape[1], img.shape[0]))
                mimes.append(RAW_IMAGE)
            elif mime == PNG_IMAGE:
                from .pngc import decode_png

                img = decode_png(payload)
                if img.shape[2] != 3:
                    img = np.repeat(img[:, :, :1], 3, axis=2)
                payloads.append(self._resize_raw(img.tobytes(), img.shape[1], img.shape[0]))
                mimes.append(RAW_IMAGE)
            elif self.fake:
                payloads.append(self._fake_resize(payload))
                mimes.append(mime)
            else:
                raise NotImplementedError(
                    f"resizing {mime} requires PIL/opencv (absent here)"
                )
        n = images.num_rows
        return pa.table(
            {
                "media_id": images.column("media_id"),
                "payload": pa.array(payloads, pa.binary()),
                "mime": pa.array(mimes, pa.string()),
                "width": pa.array([self.width] * n, pa.int32()),
                "height": pa.array([self.height] * n, pa.int32()),
            }
        )


class AudioFeatureExtractor:
    """Actor-pool stage: audio payload -> frame-level feature rows (one row
    per ``frame_ms`` window).

    Raw PCM16 gets the REAL kernel: per-frame RMS (normalized) and
    zero-crossing rate — the standard energy/voicing pair.  Compressed
    audio is import-gated / fakeable."""

    def __init__(self, frame_ms: int = 100, fake: bool = True):
        self.frame_ms = frame_ms
        self.fake = fake

    def _pcm16_frames(
        self, payload: bytes, rate: int = AUDIO_SAMPLE_RATE
    ) -> list[tuple[int, float, float]]:
        pcm = np.frombuffer(payload, dtype=np.int16).astype(np.float64) / 32768.0
        spf = rate * self.frame_ms // 1000
        out = []
        for k in range(0, len(pcm) - spf + 1, spf):
            frame = pcm[k : k + spf]
            rms = float(np.sqrt(np.mean(frame * frame)))
            zcr = float(np.mean(np.abs(np.diff(np.signbit(frame).astype(np.int8)))))
            out.append((k * 1000 // rate, rms, zcr))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep = pa.compute.equal(batch.column("kind"), pa.scalar("audio"))
        audio = batch.filter(keep)
        out_id, out_frame, out_feat = [], [], []
        for mid, payload, mime, dur in zip(
            audio.column("media_id").to_pylist(),
            audio.column("payload").to_pylist(),
            audio.column("mime").to_pylist(),
            audio.column("duration_ms").to_pylist(),
        ):
            if mime == RAW_AUDIO:
                for off, rms, zcr in self._pcm16_frames(payload):
                    out_id.append(mid)
                    out_frame.append(off)
                    out_feat.append([rms, zcr])
            elif mime == WAV_AUDIO:
                pcm, rate = decode_wav(payload)  # real stdlib decode
                for off, rms, zcr in self._pcm16_frames(pcm, rate):
                    out_id.append(mid)
                    out_frame.append(off)
                    out_feat.append([rms, zcr])
            elif self.fake:
                for off in range(0, max(dur, 0), self.frame_ms):
                    seed = hashlib.blake2b(
                        payload + off.to_bytes(4, "little"), digest_size=8
                    ).digest()
                    vals = (np.frombuffer(seed, dtype=np.uint32) / np.float64(2**32)).tolist()
                    out_id.append(mid)
                    out_frame.append(off)
                    out_feat.append(vals)
            else:
                raise NotImplementedError(
                    f"decoding {mime} requires soundfile/librosa (absent here)"
                )
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_ms": pa.array(out_frame, pa.int32()),
                "features": pa.array(out_feat, pa.list_(pa.float64())),
            }
        )


class FrameSampler:
    """Actor-pool stage: video payload -> sampled frame rows.

    Raw frame sequences are sliced for REAL (every ``every_ms`` worth of
    frames, each emitted as its raw RGB8 payload); compressed video keeps
    the offset-arithmetic contract (frame_ms rows, no payload)."""

    def __init__(self, every_ms: int = 250):
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep = pa.compute.equal(batch.column("kind"), pa.scalar("video"))
        videos = batch.filter(keep)
        out_id, out_off, out_frame = [], [], []
        for mid, payload, mime, w, h, dur in zip(
            videos.column("media_id").to_pylist(),
            videos.column("payload").to_pylist(),
            videos.column("mime").to_pylist(),
            videos.column("width").to_pylist(),
            videos.column("height").to_pylist(),
            videos.column("duration_ms").to_pylist(),
        ):
            if mime == RAW_VIDEO and w > 0 and h > 0:
                frame_bytes = w * h * 3
                n_frames = len(payload) // frame_bytes
                frame_dur = max(dur, 1) / max(n_frames, 1)
                step = max(1, int(round(self.every_ms / frame_dur)))
                for f in range(0, n_frames, step):
                    out_id.append(mid)
                    out_off.append(int(f * frame_dur))
                    out_frame.append(payload[f * frame_bytes : (f + 1) * frame_bytes])
            elif mime == MP4_VIDEO:
                # real container demux (ops/mp4c sample tables) + real
                # per-sample jpeg decode; emitted frames are raw RGB8,
                # exactly like the RAW_VIDEO branch's
                for tm, frame in mp4_frames_at(payload, self.every_ms):
                    out_id.append(mid)
                    out_off.append(tm)
                    out_frame.append(frame)
            else:
                for off in range(0, max(dur, 0), self.every_ms):
                    out_id.append(mid)
                    out_off.append(off)
                    out_frame.append(b"")
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_ms": pa.array(out_off, pa.int32()),
                "frame_payload": pa.array(out_frame, pa.binary()),
            }
        )
