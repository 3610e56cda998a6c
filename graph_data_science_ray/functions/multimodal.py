"""Multimodal (image/audio/video) column stages.

Binary payloads are opaque ``binary`` columns with typed metadata
(mime, width/height or sample rate, ...). Decode / feature-extract /
resize / frame-sample are actor-pool map_batches stages: the expensive
library/model load happens once per actor in ``__init__``, batches
stream through ``__call__`` with SMALL batch sizes (large rows).

The image/audio codec libraries are not available in this container, so
the decode kernels are STUBS behind try-imports: `strict=True` raises
NotImplementedError at the decode step; the default deterministic-fake
mode hashes the payload into a fixed-shape feature vector so the
Ray-side plumbing (schema, batch sizing, actor signature, output
layout) is real and tested end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

FEATURE_DIM = 64


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a decoded-content embedding."""
    h = hashlib.blake2b(payload, digest_size=8 * ((dim + 7) // 8)).digest()
    raw = np.frombuffer(h, dtype=np.uint8)[: dim].astype(np.float64)
    return (raw - 127.5) / 127.5


class ImageFeatureExtractor:
    """binary image column → fixed-dim feature vector column.

    Real pipeline shape: __init__ loads the decoder + model ONCE per
    actor; __call__ decodes and embeds a small batch. Here decode is
    stubbed (no PIL/cv2 in the container)."""

    def __init__(self, dim: int = FEATURE_DIM, strict: bool = False):
        self.dim = dim
        self.strict = strict
        try:  # pragma: no cover - not installed in this container
            import PIL.Image  # noqa: F401
            self.decoder = "pil"
        except ImportError:
            self.decoder = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder is None and self.strict:
            raise NotImplementedError(
                "image decode requires PIL/cv2 (not in this container); "
                "run with strict=False for the deterministic fake")
        feats = [_fake_feature(p, self.dim)
                 for p in batch["payload"].to_pylist()]
        return pa.table({
            "item_id": batch["item_id"],
            "feature": pa.array([f.tolist() for f in feats],
                                type=pa.list_(pa.float64())),
        })


class AudioFrameSampler:
    """binary audio column → sampled frame descriptors (stubbed decode).

    Emits one row per sampled frame: (item_id, frame_idx, frame_sig) —
    the fan-out layout a real frame sampler produces."""

    def __init__(self, frames_per_item: int = 4, strict: bool = False):
        self.frames = frames_per_item
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "audio decode requires an audio codec (not in container)")
        ids, fidx, sigs = [], [], []
        for item_id, payload in zip(batch["item_id"].to_pylist(),
                                    batch["payload"].to_pylist()):
            n = len(payload)
            for f in range(self.frames):
                lo = (n * f) // self.frames
                hi = (n * (f + 1)) // self.frames
                ids.append(item_id)
                fidx.append(f)
                sigs.append(hashlib.blake2b(payload[lo:hi],
                                            digest_size=8).hexdigest())
        return pa.table({
            "item_id": pa.array(ids, type=pa.int64()),
            "frame_idx": pa.array(fidx, type=pa.int64()),
            "frame_sig": pa.array(sigs, type=pa.string()),
        })


class BinaryStatsExtractor:
    """binary column → content-independent stats (n_bytes, mean_byte,
    n_distinct_bytes). Unlike the decode stubs this stage needs no
    codec, so the multimodal plumbing — opaque binary payloads, actor
    pool, small batches, typed output schema — is exercised and
    ORACLE-CHECKED end-to-end (q_multimodal_binary_stats)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_n, out_mean, out_dist = [], [], []
        for p in batch["payload"].to_pylist():
            a = np.frombuffer(p, dtype=np.uint8)
            out_n.append(len(a))
            out_mean.append(float(a.sum()) / len(a) if len(a) else 0.0)
            out_dist.append(int(len(np.unique(a))))
        return pa.table({
            "item_id": batch["item_id"],
            "n_bytes": pa.array(out_n, type=pa.int64()),
            "mean_byte": pa.array(np.round(np.asarray(out_mean), 6),
                                  type=pa.float64()),
            "n_distinct_bytes": pa.array(out_dist, type=pa.int64()),
        })


def binary_stats(items: rd.Dataset, concurrency=(1, 4),
                 batch_size: int = 64) -> rd.Dataset:
    """(item_id, n_bytes, mean_byte, n_distinct_bytes) over an opaque
    binary column — the real (non-stub) multimodal stage."""
    return items.map_batches(
        BinaryStatsExtractor, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency)


def extract_image_features(items: rd.Dataset, dim: int = FEATURE_DIM,
                           concurrency=(1, 4),
                           batch_size: int = 64) -> rd.Dataset:
    """Small batch_size: binary rows are large; batch × concurrency must
    fit the worker heap."""
    return items.map_batches(
        ImageFeatureExtractor, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_kwargs={"dim": dim},
        batch_size=batch_size, concurrency=concurrency)


def sample_audio_frames(items: rd.Dataset, frames_per_item: int = 4,
                        concurrency=(1, 4),
                        batch_size: int = 64) -> rd.Dataset:
    return items.map_batches(
        AudioFrameSampler, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_kwargs={"frames_per_item": frames_per_item},
        batch_size=batch_size, concurrency=concurrency)


def synthesize_binary_items(n: int, seed: int = 42,
                            payload_bytes: int = 2048) -> pa.Table:
    """Deterministic opaque-binary test fixture (item_id, mime, payload)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, payload_bytes,
                             dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "item_id": pa.array(np.arange(n, dtype=np.int64)),
        "mime": pa.array(["image/png" if i % 2 == 0 else "audio/wav"
                          for i in range(n)], type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
    })
