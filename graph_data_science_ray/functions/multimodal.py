"""Multimodal (image/audio/video) column stages.

Binary payloads are opaque ``binary`` columns with typed metadata
(mime, width/height or sample rate, ...). Decode / feature-extract /
resize / frame-sample are actor-pool map_batches stages: the expensive
library/model load happens once per actor in ``__init__``, batches
stream through ``__call__`` with SMALL batch sizes (large rows).

Decode is REAL for the two container-format families a stdlib-only
environment can parse (r5):

- **BMP** (24-bit uncompressed, the Windows ``BITMAPINFOHEADER``
  layout): ``decode_bmp`` struct-parses the 54-byte header and
  reassembles the pixel array from the bottom-up, 4-byte-row-padded
  BGR plane with one NumPy reshape — no PIL/cv2 needed.
- **WAV** (PCM16): ``decode_wav`` parses the RIFF container with the
  stdlib ``wave`` module and views the frames as an int16 array.
- **PNG** (8-bit gray/RGB/RGBA, non-interlaced): ``decode_png``
  walks the chunk stream (CRC-verified), inflates the IDAT payload
  with stdlib ``zlib`` and reverses the five scanline filters —
  None/Sub/Up fully vectorized (Sub is a per-channel cumsum mod 256),
  Average/Paeth as per-row scans (their left-neighbor dependence is
  inherently sequential). ``encode_png`` cycles all five filter types
  across rows by default so a decode round-trip exercises every
  unfilter path.

Formats that genuinely need external codecs (JPEG DCT, MP3)
keep the documented stub behavior: ``strict=True`` raises
NotImplementedError at the decode step; the default deterministic-fake
mode hashes the payload into a fixed-shape feature vector so the
Ray-side plumbing stays testable for those mimes too.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib

import numpy as np
import pyarrow as pa
import ray.data as rd

FEATURE_DIM = 64


# ---------------------------------------------------------------------------
# stdlib-only codecs (real decode paths)
# ---------------------------------------------------------------------------

def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit uncompressed BMP bytes
    (BITMAPINFOHEADER, bottom-up rows, 4-byte row padding)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("encode_bmp expects (H, W, 3) RGB")
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    # RGB → BGR, top-down → bottom-up, pad each row to a 4-byte multiple
    plane = np.zeros((h, stride), dtype=np.uint8)
    plane[:, :row_bytes] = px[::-1, :, ::-1].reshape(h, row_bytes)
    data = plane.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(data), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → (H, W, 3) uint8 RGB array.

    Parses the real container: magic, pixel-data offset, signed height
    (negative = top-down), bpp/compression validation, 4-byte row
    padding."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression})")
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    plane = np.frombuffer(payload, dtype=np.uint8, count=h * stride,
                          offset=offset).reshape(h, stride)
    px = plane[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    if h_signed > 0:  # bottom-up storage (the common case)
        px = px[::-1]
    return np.ascontiguousarray(px)


def encode_wav(samples: np.ndarray, sample_rate: int = 8000,
               n_channels: int = 1) -> bytes:
    """int16 PCM samples (interleaved if multi-channel) → WAV bytes."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int, int]:
    """WAV bytes → (int16 sample array, sample_rate, n_channels).

    Real RIFF parse via the stdlib ``wave`` module; PCM16 only."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError(
                f"only PCM16 WAV supported (sampwidth={w.getsampwidth()})")
        rate = w.getframerate()
        nch = w.getnchannels()
        frames = w.readframes(w.getnframes())
    return np.frombuffer(frames, dtype="<i2"), rate, nch


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def encode_png(pixels: np.ndarray,
               filters: list[int] | None = None) -> bytes:
    """(H, W, 3|4) uint8 (RGB/RGBA) or (H, W) uint8 gray → PNG bytes.

    Real container: IHDR/IDAT/IEND chunks with CRC32s, zlib-deflated
    filtered scanlines. ``filters`` picks the per-row filter type
    (0..4); the default cycles through all five so decoders see every
    unfilter path. Filtering itself is vectorized per row."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise ValueError("encode_png expects gray, RGB or RGBA pixels")
    if filters is None:
        filters = [r % 5 for r in range(h)]
    raw = bytearray()
    zero_row = np.zeros((w, c), dtype=np.int64)
    prev = zero_row
    for r in range(h):
        row = px[r].astype(np.int64)
        left = np.vstack([np.zeros((1, c), np.int64), row[:-1]])
        up = prev
        ul = np.vstack([np.zeros((1, c), np.int64), prev[:-1]])
        f = int(filters[r]) % 5
        if f == 0:
            out = row
        elif f == 1:
            out = row - left
        elif f == 2:
            out = row - up
        elif f == 3:
            out = row - (left + up) // 2
        else:  # Paeth
            p = left + up - ul
            pa_, pb_, pc_ = abs(p - left), abs(p - up), abs(p - ul)
            pred = np.where((pa_ <= pb_) & (pa_ <= pc_), left,
                            np.where(pb_ <= pc_, up, ul))
            out = row - pred
        raw.append(f)
        raw += (out & 255).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (H, W, C) uint8 array (C = 1 gray / 3 RGB / 4 RGBA).

    Real stdlib-only decode: chunk walk with CRC32 verification, zlib
    inflate, scanline unfiltering. 8-bit depth, non-interlaced only
    (palette/16-bit/Adam7 would need real spec work, not a codec lib,
    but aren't needed by any fixture)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos, idat, hdr = 8, [], None
    while pos + 8 <= len(payload):
        length, typ = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8: pos + 8 + length]
        crc = struct.unpack_from(">I", payload, pos + 8 + length)[0]
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + length
    if hdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = hdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit non-interlaced PNG supported (depth={depth}, "
            f"interlace={interlace})")
    c = _PNG_CHANNELS.get(color_type)
    if c is None:
        raise NotImplementedError(
            f"unsupported PNG color type {color_type}")
    stride = 1 + w * c
    rows = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8,
                         count=h * stride).reshape(h, stride)
    out = np.empty((h, w * c), dtype=np.uint8)
    prev = np.zeros(w * c, dtype=np.int64)
    for r in range(h):
        f = int(rows[r, 0])
        cur = rows[r, 1:].astype(np.int64)
        if f == 0:
            rec = cur
        elif f == 1:
            # Sub: rec[x] = cur[x] + rec[x-c] — a per-channel running
            # sum; cumsum in int64 then &255 == iterated mod-256 adds
            rec = (np.cumsum(cur.reshape(w, c), axis=0) & 255).reshape(-1)
        elif f == 2:
            rec = (cur + prev) & 255
        elif f in (3, 4):
            rec = np.empty(w * c, dtype=np.int64)
            for i in range(w * c):
                a = rec[i - c] if i >= c else 0
                b = prev[i]
                if f == 3:
                    rec[i] = (cur[i] + (a + b) // 2) & 255
                else:
                    cc = prev[i - c] if i >= c else 0
                    p = a + b - cc
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                    pred = (a if pa_ <= pb_ and pa_ <= pc_
                            else b if pb_ <= pc_ else cc)
                    rec[i] = (cur[i] + pred) & 255
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[r] = rec
        prev = rec
    return out.reshape(h, w, c)


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a decoded-content embedding."""
    h = hashlib.blake2b(payload, digest_size=8 * ((dim + 7) // 8)).digest()
    raw = np.frombuffer(h, dtype=np.uint8)[: dim].astype(np.float64)
    return (raw - 127.5) / 127.5


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-dispatched real decode → (H, W, C) uint8 (BMP or PNG)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    raise NotImplementedError(
        "unrecognized image container (BMP and PNG decode are real; "
        "JPEG needs an external codec)")


class ImageStatsExtractor:
    """binary BMP/PNG column → per-image decoded-content stats. REAL
    decode (struct header parse / zlib inflate + NumPy pixel
    reassembly); oracle-checked via q_multimodal_image_stats and
    q_multimodal_png_stats, whose fixture pixels are closed-form
    functions the SQL replays. Means cover the first three channels
    (RGB); an RGBA alpha plane still participates in the scanline
    filters, so a wrong alpha decode corrupts the RGB means too."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, mr, mg, mb = [], [], [], [], []
        for p in batch["payload"].to_pylist():
            px = decode_image(p)
            if px.shape[2] == 1:
                px = np.repeat(px, 3, axis=2)
            h, w, _ = px.shape
            ws.append(w)
            hs.append(h)
            sums = px[:, :, :3].reshape(-1, 3).sum(axis=0, dtype=np.int64)
            cnt = max(h * w, 1)
            mr.append(sums[0] / cnt)
            mg.append(sums[1] / cnt)
            mb.append(sums[2] / cnt)
        return pa.table({
            "item_id": batch["item_id"],
            "width": pa.array(ws, type=pa.int64()),
            "height": pa.array(hs, type=pa.int64()),
            "mean_r": pa.array(np.round(np.asarray(mr), 6)),
            "mean_g": pa.array(np.round(np.asarray(mg), 6)),
            "mean_b": pa.array(np.round(np.asarray(mb), 6)),
        })


class AudioStatsExtractor:
    """binary WAV column → per-clip decoded-content stats (header
    fields prove the container parse; mean/rms/peak prove the PCM
    decode). Oracle-checked via q_multimodal_audio_stats."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rates, nchs, ns, means, rmss, peaks = [], [], [], [], [], []
        for p in batch["payload"].to_pylist():
            samples, rate, nch = decode_wav(p)
            s = samples.astype(np.int64)
            n = max(len(s), 1)
            rates.append(rate)
            nchs.append(nch)
            ns.append(len(s))
            means.append(s.sum() / n)
            rmss.append(float(np.sqrt((s * s).sum() / n)))
            peaks.append(int(np.abs(s).max()) if len(s) else 0)
        return pa.table({
            "item_id": batch["item_id"],
            "sample_rate": pa.array(rates, type=pa.int64()),
            "n_channels": pa.array(nchs, type=pa.int64()),
            "n_samples": pa.array(ns, type=pa.int64()),
            "mean_sample": pa.array(np.round(np.asarray(means), 6)),
            "rms": pa.array(np.round(np.asarray(rmss), 6)),
            "peak": pa.array(peaks, type=pa.int64()),
        })


class ImageFeatureExtractor:
    """binary image column → fixed-dim feature vector column.

    Real pipeline shape: __init__ loads the decoder + model ONCE per
    actor; __call__ decodes and embeds a small batch. BMP and PNG
    payloads get REAL decode (grid-pooled luma feature over the
    decoded pixels); other formats fall back to PIL if present, else
    the deterministic fake (or NotImplementedError with strict=True)."""

    def __init__(self, dim: int = FEATURE_DIM, strict: bool = False):
        self.dim = dim
        self.strict = strict
        # the per-actor one-time setup: probe optional decoders and
        # precompute the pooling grid size
        try:  # pragma: no cover - not installed in this container
            import PIL.Image  # noqa: F401
            self.decoder = "pil"
        except ImportError:
            self.decoder = None
        self.grid = max(1, int(np.sqrt(dim)))

    def _decoded_feature(self, payload: bytes) -> np.ndarray:
        """grid×grid pooled luma means over the decoded pixels, scaled
        to [-1, 1] — a real (if simple) content embedding."""
        px = decode_image(payload).astype(np.float64)
        if px.shape[2] == 1:
            luma = px[:, :, 0]
        else:
            luma = (px[:, :, 0] * 0.299 + px[:, :, 1] * 0.587
                    + px[:, :, 2] * 0.114)
        h, w = luma.shape
        g = self.grid
        ys = np.linspace(0, h, g + 1).astype(np.int64)
        xs = np.linspace(0, w, g + 1).astype(np.int64)
        out = np.empty(g * g, dtype=np.float64)
        for i in range(g):
            for j in range(g):
                cell = luma[ys[i]:max(ys[i + 1], ys[i] + 1),
                            xs[j]:max(xs[j + 1], xs[j] + 1)]
                out[i * g + j] = cell.mean() if cell.size else 0.0
        feat = np.zeros(self.dim, dtype=np.float64)
        feat[: g * g] = out / 127.5 - 1.0
        return feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for p in batch["payload"].to_pylist():
            if p[:2] == b"BM" or p[:8] == _PNG_SIG:
                feats.append(self._decoded_feature(p))
            elif self.decoder is None and self.strict:
                raise NotImplementedError(
                    "non-BMP/PNG image decode requires PIL/cv2 (not in "
                    "this container); run with strict=False for the "
                    "deterministic fake")
            else:
                feats.append(_fake_feature(p, self.dim))
        return pa.table({
            "item_id": batch["item_id"],
            "feature": pa.array([f.tolist() for f in feats],
                                type=pa.list_(pa.float64())),
        })


class AudioFrameSampler:
    """binary audio column → sampled frame descriptors.

    Emits one row per sampled frame. WAV payloads get REAL decode: the
    PCM stream is split into frames_per_item equal windows and each
    frame reports its rms + peak over the actual samples (frame_sig is
    the hash of the sample bytes). Non-WAV payloads keep the stub
    byte-window behavior (rms/peak null) or raise with strict=True."""

    def __init__(self, frames_per_item: int = 4, strict: bool = False):
        self.frames = frames_per_item
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, sigs, rmss, peaks = [], [], [], [], []
        for item_id, payload in zip(batch["item_id"].to_pylist(),
                                    batch["payload"].to_pylist()):
            if payload[:4] == b"RIFF":
                samples, _rate, _nch = decode_wav(payload)
                n = len(samples)
                s64 = samples.astype(np.int64)
                for f in range(self.frames):
                    lo = (n * f) // self.frames
                    hi = (n * (f + 1)) // self.frames
                    win = s64[lo:hi]
                    ids.append(item_id)
                    fidx.append(f)
                    sigs.append(hashlib.blake2b(
                        samples[lo:hi].tobytes(), digest_size=8).hexdigest())
                    rmss.append(float(np.sqrt((win * win).mean()))
                                if len(win) else 0.0)
                    peaks.append(int(np.abs(win).max()) if len(win) else 0)
                continue
            if self.strict:
                raise NotImplementedError(
                    "non-WAV audio decode requires an audio codec "
                    "(not in container)")
            n = len(payload)
            for f in range(self.frames):
                lo = (n * f) // self.frames
                hi = (n * (f + 1)) // self.frames
                ids.append(item_id)
                fidx.append(f)
                sigs.append(hashlib.blake2b(payload[lo:hi],
                                            digest_size=8).hexdigest())
                rmss.append(None)
                peaks.append(None)
        return pa.table({
            "item_id": pa.array(ids, type=pa.int64()),
            "frame_idx": pa.array(fidx, type=pa.int64()),
            "frame_sig": pa.array(sigs, type=pa.string()),
            "rms": pa.array(rmss, type=pa.float64()),
            "peak": pa.array(peaks, type=pa.int64()),
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


def _mm_cpus() -> float:
    from ..stages.resources import stage_cpus
    return stage_cpus("multimodal")


def binary_stats(items: rd.Dataset, concurrency=(1, 4),
                 batch_size: int = 64) -> rd.Dataset:
    """(item_id, n_bytes, mean_byte, n_distinct_bytes) over an opaque
    binary column — the real (non-stub) multimodal stage."""
    return items.map_batches(
        BinaryStatsExtractor, batch_format="pyarrow", zero_copy_batch=True,
        num_cpus=_mm_cpus(), batch_size=batch_size, concurrency=concurrency)


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


def image_stats(items: rd.Dataset, concurrency=(1, 4),
                batch_size: int = 64) -> rd.Dataset:
    """(item_id, width, height, mean_r, mean_g, mean_b) — REAL BMP
    decode over an opaque binary column."""
    return items.map_batches(
        ImageStatsExtractor, batch_format="pyarrow", zero_copy_batch=True,
        num_cpus=_mm_cpus(), batch_size=batch_size, concurrency=concurrency)


def audio_stats(items: rd.Dataset, concurrency=(1, 4),
                batch_size: int = 64) -> rd.Dataset:
    """(item_id, sample_rate, n_channels, n_samples, mean_sample, rms,
    peak) — REAL WAV decode over an opaque binary column."""
    return items.map_batches(
        AudioStatsExtractor, batch_format="pyarrow", zero_copy_batch=True,
        num_cpus=_mm_cpus(), batch_size=batch_size, concurrency=concurrency)


# ---------------------------------------------------------------------------
# closed-form media fixtures — deterministic pixel/sample formulas keyed by
# item_id, so a SQL oracle can replay the decoded-content stats exactly
# (the payload itself is a REAL container: encode → decode round trip)
# ---------------------------------------------------------------------------

def synthetic_image_pixels(item_id: int) -> np.ndarray:
    """(h, w, 3) uint8 with w = 8 + id%9, h = 8 + id%7 (w varies the
    BMP row padding across items) and channel formulas the oracle
    replays: r=(id*7+3x+5y)&255, g=(id*11+2x+7y)&255,
    b=(id*13+5x+2y)&255."""
    i = int(item_id)
    w = 8 + i % 9
    h = 8 + i % 7
    y, x = np.mgrid[0:h, 0:w]
    r = (i * 7 + 3 * x + 5 * y) & 255
    g = (i * 11 + 2 * x + 7 * y) & 255
    b = (i * 13 + 5 * x + 2 * y) & 255
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def synthetic_image_pixels_rgba(item_id: int) -> np.ndarray:
    """(h, w, 4) uint8 RGBA for the PNG fixture with w = 8 + id%11,
    h = 8 + id%5 (different dims than the BMP fixture so the filter
    row cycle and scanline widths differ) and channel formulas the
    oracle replays: r=(id*5+2x+3y)&255, g=(id*9+4x+y)&255,
    b=(id*17+x+6y)&255, a=(id*3+x+2y)&255. Alpha participates in the
    scanline filters, so a wrong alpha unfilter corrupts the RGB
    means the oracle checks."""
    i = int(item_id)
    w = 8 + i % 11
    h = 8 + i % 5
    y, x = np.mgrid[0:h, 0:w]
    r = (i * 5 + 2 * x + 3 * y) & 255
    g = (i * 9 + 4 * x + y) & 255
    b = (i * 17 + x + 6 * y) & 255
    a = (i * 3 + x + 2 * y) & 255
    return np.stack([r, g, b, a], axis=2).astype(np.uint8)


def synthetic_wav_samples(item_id: int) -> np.ndarray:
    """int16 PCM with n = 400 + (id%41)*8 samples and
    s_t = ((id*7919 + t*104729) & 65535) - 32768 — exact in int64 both
    sides (DuckDB BIGINT / NumPy)."""
    i = int(item_id)
    n = 400 + (i % 41) * 8
    t = np.arange(n, dtype=np.int64)
    return (((i * 7919 + t * 104729) & 65535) - 32768).astype(np.int16)


def synthesize_media_batch(ids: np.ndarray, kind: str) -> pa.Table:
    """(item_id, payload) with real BMP/WAV container bytes per id —
    the distributed fixture stage (map_batches over an id column)."""
    if kind == "bmp":
        payloads = [encode_bmp(synthetic_image_pixels(i)) for i in ids]
    elif kind == "png":
        # default filter cycle: every item taller than 4 rows ships all
        # five scanline filter types through the decoder
        payloads = [encode_png(synthetic_image_pixels_rgba(i)) for i in ids]
    elif kind == "wav":
        payloads = [encode_wav(synthetic_wav_samples(i)) for i in ids]
    else:
        raise ValueError(f"unknown media kind {kind!r}")
    return pa.table({
        "item_id": pa.array(np.asarray(ids, dtype=np.int64)),
        "payload": pa.array(payloads, type=pa.binary()),
    })


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
