"""Dependency-free PNG writing.

The display path of this framework: device → host (``jax.device_get``) →
PNG bytes. Replaces the reference's CUDA↔OpenGL zero-copy window
(torchwindow/, no TPU analogue — SURVEY.md §2.6) for headless rendering;
the interactive viewer (ray_marching_tpu.viewer) streams these frames.

Pure numpy + zlib: no PIL/torchvision dependency.
"""

from __future__ import annotations

import struct
import zlib
from pathlib import Path

import numpy as np


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(image: np.ndarray, level: int = 6) -> bytes:
    """Encode an (H, W, {1,3,4}) uint8 or float[0,1] array as PNG bytes.

    ``level`` is the zlib effort: 6 (default) for files on disk, 1 for
    latency-sensitive streams (the live viewer: ~4× faster encode for
    ~1.3× the bytes — the right trade when a frame is drawn once)."""
    image = _to_uint8(np.asarray(image))
    h, w, c = image.shape
    colour_type = {1: 0, 3: 2, 4: 6}[c]
    header = struct.pack(">IIBBBBB", w, h, 8, colour_type, 0, 0, 0)
    # Filter byte 0 (None) per scanline, inserted vectorized (the
    # per-row Python join dominated encode time at 1440×900).
    filt = np.zeros((h, 1 + w * c), np.uint8)
    filt[:, 1:] = image.reshape(h, w * c)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", header)
        + _chunk(b"IDAT", zlib.compress(filt.tobytes(), level))
        + _chunk(b"IEND", b"")
    )


def _to_uint8(image: np.ndarray) -> np.ndarray:
    if image.dtype != np.uint8:
        image = (np.clip(np.nan_to_num(image, nan=0.0), 0.0, 1.0) * 255.0
                 + 0.5).astype(np.uint8)
    if image.ndim == 2:
        image = image[:, :, None]
    return image


def write_apng(path, frames, fps: float = 30.0, num_plays: int = 0) -> Path:
    """Write an animated PNG from an iterable of (H, W, {1,3,4}) frames.

    Dependency-free animation export for orbit/turntable demos (the
    framework's offline counterpart to the reference's live window) —
    APNG plays in every browser and most viewers, needs no ffmpeg, and
    reuses the PNG scanline encoder. ``num_plays=0`` loops forever. All
    frames must share shape and channel count.
    """
    frames = [_to_uint8(np.asarray(f)) for f in frames]
    if not frames:
        raise ValueError("write_apng needs at least one frame")
    h, w, c = frames[0].shape
    for f in frames:
        if f.shape != (h, w, c):
            raise ValueError(f"frame shape {f.shape} != {(h, w, c)}")
    colour_type = {1: 0, 3: 2, 4: 6}[c]
    delay_den = 1000
    delay_num = max(1, round(delay_den / fps))

    def scanlines(img):
        return zlib.compress(
            b"".join(b"\x00" + img[row].tobytes() for row in range(h)), 6
        )

    out = [
        b"\x89PNG\r\n\x1a\n",
        _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, colour_type, 0, 0, 0)),
        _chunk(b"acTL", struct.pack(">II", len(frames), num_plays)),
    ]
    seq = 0
    for i, f in enumerate(frames):
        fctl = struct.pack(
            ">IIIIIHHBB", seq, w, h, 0, 0, delay_num, delay_den, 0, 0
        )
        out.append(_chunk(b"fcTL", fctl))
        seq += 1
        data = scanlines(f)
        if i == 0:  # first frame doubles as the still image
            out.append(_chunk(b"IDAT", data))
        else:
            out.append(_chunk(b"fdAT", struct.pack(">I", seq) + data))
            seq += 1
    out.append(_chunk(b"IEND", b""))
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(b"".join(out))
    return path


def write_png(path, image) -> Path:
    """Write an image array (jax or numpy, (H,W,C) or (N,H,W,C)) to PNG.

    A leading camera axis is averaged away, mirroring the reference app's
    ``images.mean(dim=0)`` display reduction (main.py:78-84).
    """
    image = np.asarray(image)
    if image.ndim == 4:
        # Keep uint8 frames uint8: the camera mean promotes to float, and
        # encode_png interprets non-uint8 input as [0, 1] — without the
        # round-trip every 0-255 value would clip to white.
        was_uint8 = image.dtype == np.uint8
        image = image.mean(axis=0)
        if was_uint8:
            image = (image + 0.5).astype(np.uint8)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(encode_png(image))
    return path
