"""Deterministic image codecs + PSNR — the multimodal invariant layer.

The container has no image libraries (no PIL/libjpeg), so per the build brief
the *codec* is a deterministic stand-in while the Ray-side plumbing (binary
columns, decode actor stages, PSNR verification) is real:

- ``raw``: header + raw uint8 RGB bytes (lossless).
- ``qz``:  quantize each channel to 6 bits (value -> (v >> 2 << 2) + 2), a
  "lossy" codec with max per-pixel error 2 → worst-case PSNR
  20·log10(255/2) ≈ 42.1 dB, satisfying the ≥40 dB invariant from
  BASELINE.json's ``input_hint`` by construction while still exercising a
  real decoded-pixel comparison.

Real-format decode (JPEG/PNG) is stubbed behind ``NotImplementedError``.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"LRIM"
_HEADER = struct.Struct("<4sHHB3s")  # magic, w, h, fmt code, pad
_FMT_CODES = {"raw": 0, "qz": 1}
_FMT_NAMES = {v: k for k, v in _FMT_CODES.items()}


def encode_image(pixels: np.ndarray, fmt: str = "raw") -> bytes:
    """Encode an (h, w, 3) uint8 array into our container format."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("pixels must be (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    if fmt == "raw":
        payload = pixels.tobytes()
    elif fmt == "qz":
        payload = (((pixels >> 2) << 2) + 2).astype(np.uint8).tobytes()
    elif fmt in ("jpeg", "png"):
        raise NotImplementedError(
            f"real {fmt} codecs are unavailable in this environment; "
            "use 'raw' or 'qz'"
        )
    else:
        raise ValueError(f"unknown fmt {fmt!r}")
    return _HEADER.pack(MAGIC, w, h, _FMT_CODES[fmt], b"\x00" * 3) + payload


def decode_image(data: bytes) -> tuple[np.ndarray, str]:
    """Decode container bytes → ((h, w, 3) uint8, fmt name)."""
    magic, w, h, code, _ = _HEADER.unpack_from(data, 0)
    if magic != MAGIC:
        raise ValueError("bad image magic; real-format decode is stubbed here")
    fmt = _FMT_NAMES[code]
    pixels = np.frombuffer(data, dtype=np.uint8, offset=_HEADER.size)
    return pixels.reshape(h, w, 3).copy(), fmt


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)


def psnr_batch(flat_a: np.ndarray, flat_b: np.ndarray, sizes: np.ndarray) -> np.ndarray:
    """Vectorized PSNR over concatenated flat pixel buffers, split by sizes."""
    diff = flat_a.astype(np.float64) - flat_b.astype(np.float64)
    sq = diff * diff
    bounds = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
    sums = np.add.reduceat(sq, bounds[:-1])
    mse = sums / np.maximum(sizes, 1)
    with np.errstate(divide="ignore"):
        out = 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)
    return np.where(mse == 0, np.inf, out)


def reference_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic ground-truth pixels for a synthetic image id.

    Uses a seeded PCG64 stream keyed on the id so any stage can regenerate the
    reference decode independently (no shared state, retry-safe).
    """
    seed = np.frombuffer(image_id.encode()[:16].ljust(16, b"\0"), dtype=np.uint64)
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
