"""Multimodal-column plumbing: opaque ``binary`` payloads + typed metadata,
processed by actor-pool ``map_batches`` stages.

The decode kernels themselves are STUBBED (no image/audio libraries in this
environment): :class:`ImageFeatureExtractor` raises ``NotImplementedError``
unless ``fake=True``, in which case a deterministic content-derived fake
(blake2b of the bytes -> pseudo-features) stands in.  Everything around the
kernel — schema, batch sizing, actor lifecycle, output layout — is real and
tested, so swapping in a real decoder is a one-function change.

Batch-size guidance: payload columns dominate memory; callers should pass
``batch_size`` such that ``batch_size * max_payload * concurrency`` fits the
worker heap (SURVEY §4 memory-aware sizing).
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


def synthesize_media_batch(batch: pa.Table, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media rows from an ``id`` column (for tests/bench:
    the Ray-side plumbing is real; the payloads are content-derived noise)."""
    ids = batch.column("id").to_pylist()
    payloads = []
    for i in ids:
        seed = hashlib.blake2b(f"media:{i}".encode(), digest_size=32).digest()
        reps = payload_bytes // len(seed) + 1
        payloads.append((seed * reps)[:payload_bytes])
    kinds = ["image", "audio", "video"]
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array([kinds[i % 3] for i in ids], pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(
                [{"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}[kinds[i % 3]] for i in ids],
                pa.string(),
            ),
            "width": pa.array([64 if i % 3 == 0 else -1 for i in ids], pa.int32()),
            "height": pa.array([64 if i % 3 == 0 else -1 for i in ids], pa.int32()),
            "duration_ms": pa.array([-1 if i % 3 == 0 else 1000 for i in ids], pa.int32()),
        }
    )


class ImageFeatureExtractor:
    """Actor-pool stage: image payload -> feature vector.

    ``__init__`` is where a real model would load (once per actor);
    ``__call__`` handles one Arrow batch.  With ``fake=True`` the features
    are a deterministic function of the payload bytes (testable plumbing);
    with ``fake=False`` it raises — no image library is available here.
    """

    FEATURE_DIM = 16

    def __init__(self, fake: bool = True):
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "real image decoding requires PIL/torchvision (not in this environment); "
                "construct with fake=True for the deterministic stand-in"
            )

    def _features(self, payload: bytes) -> list[float]:
        digest = hashlib.blake2b(payload, digest_size=self.FEATURE_DIM * 4).digest()
        arr = np.frombuffer(digest, dtype=np.uint32).astype(np.float64)
        return (arr / np.float64(2**32)).tolist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep = pa.compute.equal(batch.column("kind"), pa.scalar("image"))
        images = batch.filter(keep)
        feats = [self._features(p) for p in images.column("payload").to_pylist()]
        return pa.table(
            {
                "media_id": images.column("media_id"),
                "features": pa.array(feats, pa.list_(pa.float64())),
                "n_bytes": pa.compute.binary_length(images.column("payload")).cast(pa.int64()),
            }
        )


class FrameSampler:
    """Actor-pool stage: video payload -> deterministic frame-offset rows
    (the real sampler would decode; the offset arithmetic and exploded
    output layout are the engine-side contract)."""

    def __init__(self, every_ms: int = 250):
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep = pa.compute.equal(batch.column("kind"), pa.scalar("video"))
        videos = batch.filter(keep)
        out_id, out_off = [], []
        for mid, dur in zip(
            videos.column("media_id").to_pylist(), videos.column("duration_ms").to_pylist()
        ):
            for off in range(0, max(dur, 0), self.every_ms):
                out_id.append(mid)
                out_off.append(off)
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_ms": pa.array(out_off, pa.int32()),
            }
        )


class ImageResizer:
    """Actor-pool stage: image payload -> resized payload + new dims.

    With ``fake=True`` (default; no image libs here) the "resize" is a
    deterministic payload transform (content-derived bytes at the target
    size) and the metadata update is real — the engine-side contract
    (schema, dims, batch flow) a real PIL/opencv kernel would drop into.
    """

    def __init__(self, width: int = 32, height: int = 32, fake: bool = True):
        if not fake:
            raise NotImplementedError(
                "real image resizing requires PIL/opencv (not in this environment)"
            )
        self.width = width
        self.height = height

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep = pa.compute.equal(batch.column("kind"), pa.scalar("image"))
        images = batch.filter(keep)
        target = self.width * self.height * 3
        payloads = []
        for p in images.column("payload").to_pylist():
            digest = hashlib.blake2b(p, digest_size=32).digest()
            payloads.append((digest * (target // len(digest) + 1))[:target])
        n = images.num_rows
        return pa.table(
            {
                "media_id": images.column("media_id"),
                "payload": pa.array(payloads, pa.binary()),
                "mime": images.column("mime"),
                "width": pa.array([self.width] * n, pa.int32()),
                "height": pa.array([self.height] * n, pa.int32()),
            }
        )


class AudioFeatureExtractor:
    """Actor-pool stage: audio payload -> frame-level feature rows
    (exploded: one row per 100ms frame).  Deterministic fake kernel; the
    exploded output layout and duration arithmetic are the real contract."""

    FEATURE_DIM = 8

    def __init__(self, frame_ms: int = 100, fake: bool = True):
        if not fake:
            raise NotImplementedError(
                "real audio decoding requires soundfile/librosa (not in this environment)"
            )
        self.frame_ms = frame_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep = pa.compute.equal(batch.column("kind"), pa.scalar("audio"))
        audio = batch.filter(keep)
        out_id, out_frame, out_feat = [], [], []
        for mid, payload, dur in zip(
            audio.column("media_id").to_pylist(),
            audio.column("payload").to_pylist(),
            audio.column("duration_ms").to_pylist(),
        ):
            for off in range(0, max(dur, 0), self.frame_ms):
                seed = hashlib.blake2b(
                    payload + off.to_bytes(4, "little"), digest_size=self.FEATURE_DIM * 4
                ).digest()
                feats = (np.frombuffer(seed, dtype=np.uint32) / np.float64(2**32)).tolist()
                out_id.append(mid)
                out_frame.append(off)
                out_feat.append(feats)
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_ms": pa.array(out_frame, pa.int32()),
                "features": pa.array(out_feat, pa.list_(pa.float64())),
            }
        )
