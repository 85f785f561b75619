"""Perceptual image hashes (pure numpy, no Ray).

Two standard public constructions over a grayscale image:

- ``ahash64``: 8×8 grid mean-threshold (average hash) — cheap, exact-dup
  and brightness-shift robust, weak to contrast changes.
- ``phash64``: 32×32 resample → 2-D DCT-II → low-frequency 8×8 block
  (DC dropped) → median threshold (pHash) — robust to uniform
  brightness AND contrast changes (both are affine in DCT space and the
  median threshold is affine-invariant), weak only to geometric edits.

Both return a non-negative int64-safe Python int (bit 63 unused by
``phash64``; ``ahash64`` uses the same packing as the engine's image
feature stage — kept bit-identical to the pre-refactor inline code).
"""

from __future__ import annotations

import numpy as np


def ahash64(gray: np.ndarray) -> int:
    """Average hash: stride-downsample to ≤8×8, threshold on the mean."""
    small = gray[:: max(gray.shape[0] // 8, 1),
                 :: max(gray.shape[1] // 8, 1)][:8, :8]
    bits = (small > small.mean()).ravel()
    val = np.uint64(0)
    for b in np.flatnonzero(bits):
        val |= np.uint64(1) << np.uint64(int(b))
    return int(val)


def _dct_basis(n: int = 32) -> np.ndarray:
    k = np.arange(n, dtype=np.float64)[:, None]
    i = np.arange(n, dtype=np.float64)[None, :]
    return np.cos(np.pi * (i + 0.5) * k / n)


_DCT32 = _dct_basis(32)


def phash64(gray: np.ndarray) -> int:
    """DCT perceptual hash: nearest-index resample to 32×32 (deterministic
    for any input size), DCT-II by basis matmul, median-threshold the
    8×8 low-frequency block without its DC term (63 bits)."""
    h, w = gray.shape
    yi = (np.arange(32) * h) // 32
    xi = (np.arange(32) * w) // 32
    g = gray[np.ix_(yi, xi)].astype(np.float64)
    t = _DCT32 @ g @ _DCT32.T
    block = t[:8, :8].ravel()[1:]
    bits = block > np.median(block)
    val = np.uint64(0)
    for b in np.flatnonzero(bits):
        val |= np.uint64(1) << np.uint64(int(b))
    return int(val)


def _pack_bits_batch(bits: np.ndarray) -> np.ndarray:
    """(n, k<=64) bool → uint64 rows, bit i = column i (the scalar
    functions' packing order)."""
    k = bits.shape[1]
    weights = (np.uint64(1) << np.arange(k, dtype=np.uint64))[None, :]
    return (bits.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)


def ahash64_batch(gray: np.ndarray) -> np.ndarray:
    """Batched :func:`ahash64` over a uniform-shape (n, h, w) stack —
    bit-identical to the scalar loop (parity-tested): same strided
    downsample, same dtype path for the mean, same packing."""
    n, h, w = gray.shape
    small = gray[:, :: max(h // 8, 1), :: max(w // 8, 1)][:, :8, :8]
    flat = small.reshape(n, -1)
    bits = flat > flat.mean(axis=1)[:, None]
    return _pack_bits_batch(bits)


def phash64_batch(gray: np.ndarray) -> np.ndarray:
    """Batched :func:`phash64` over a uniform-shape (n, h, w) stack —
    bit-identical (same float64 resample, batched DCT matmuls hit the
    same BLAS kernel per slice, same median threshold and packing)."""
    n, h, w = gray.shape
    yi = (np.arange(32) * h) // 32
    xi = (np.arange(32) * w) // 32
    g = gray[:, yi][:, :, xi].astype(np.float64)
    t = np.matmul(np.matmul(_DCT32, g), _DCT32.T)
    block = t[:, :8, :8].reshape(n, 64)[:, 1:]
    bits = block > np.median(block, axis=1)[:, None]
    return _pack_bits_batch(bits)
