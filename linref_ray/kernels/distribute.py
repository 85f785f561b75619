"""Sliding-window ``distribute`` kernel (per contiguous group).

Reimplements the reference's banded smoothing aggregator
(linref ``events/relate.py:1292-1521``): each source event's relation share is
spread to the ±``decay_size`` *positional* neighbors of its matched target
rows (row offsets in the collection's sorted order — NOT measure distance),
scaled by a decay function, optionally multiplied by target lengths, then
normalized so each source's total distributed share is 1.0, and finally
multiplied by the source data values and summed per target.

Because cross-group shares are zeroed by the reference
(``relate.py:1480-1491``) and rows are group-contiguous, processing one group
at a time with edge padding is exactly equivalent — which is what makes this
operator per-route parallel. The partition contract (route-atomic groups,
documented in :mod:`linref_ray.relate`) is what a salted shuffle must respect.
"""

from __future__ import annotations

import numpy as np

from linref_ray.kernels.decay import DecayFunction, resolve_decay


def distribute_group(
    ti: np.ndarray,
    si: np.ndarray,
    w: np.ndarray,
    n_targets: int,
    n_sources: int,
    data: np.ndarray,
    target_lengths: np.ndarray | None = None,
    decay_size: int = 0,
    decay_func: str | DecayFunction = "linear",
    direction: str = "both",
    length_normalize: bool = True,
) -> np.ndarray:
    """Distribute source data to target rows of ONE group.

    ``(ti, si, w)``: relation pairs (target row, source row, share) within the
    group, target rows in sorted route order. ``data``: ``(n_sources, k)``
    source values. Returns ``(n_targets, k)``.

    Dense per-group implementation: group = one route (or route shard), so
    ``n_targets × n_sources`` is bounded by the partitioning, unlike the
    reference's whole-dataset matrix which needed column chunking
    (``relate.py:1453-1460``).
    """
    fn = resolve_decay(decay_func, decay_size)
    if fn(0) != 1:
        raise ValueError("Decay function must return a scale of 1.0 for step 0.")
    data = np.asarray(data, dtype=np.float64)
    if data.ndim == 1:
        data = data.reshape(-1, 1)
    arr = np.zeros((n_targets, n_sources), dtype=np.float64)
    arr[ti, si] = w

    distributed = arr.copy()
    for step in range(1, min(decay_size + 1, n_targets)):
        scale = fn(step)
        if direction in ("forward", "forw", "both"):
            # Row i receives the share of row i+step (``relate.py:1476``).
            distributed[:-step, :] += arr[step:, :] * scale
        if direction in ("backward", "back", "both"):
            distributed[step:, :] += arr[:-step, :] * scale

    if length_normalize:
        if target_lengths is None:
            raise ValueError("target_lengths required when length_normalize")
        distributed *= np.asarray(target_lengths, dtype=np.float64).reshape(-1, 1)

    denom = distributed.sum(axis=0)
    safe = np.where(denom == 0, np.inf, denom)
    distributed /= safe
    return distributed @ data
