"""Decay functions for the ``distribute`` sliding-window aggregator.

Reimplements the reference decay family (linref ``events/relate.py:2281-2387``)
as plain callables: weight(0) = 1, weights for steps 1..decay_size follow the
named shape. The gaussian variant uses the standard normal pdf evaluated at
``3 * step / decay_size`` normalized by pdf(0) — written out explicitly since
scipy is not available here.
"""

from __future__ import annotations

import numpy as np


class DecayFunction:
    def __init__(self, decay_size: int):
        if decay_size < 0:
            raise ValueError("Decay size must be non-negative.")
        self.decay_size = decay_size

    @property
    def decay_cap(self) -> float:
        return self.decay_size + 1

    def __call__(self, distance: float) -> float:
        if self.decay_size == 0:
            return 1.0
        if distance < 0:
            raise ValueError("Distance must be non-negative.")
        if distance == 0:
            return 1.0
        return self.decay(distance)

    def decay(self, distance: float) -> float:
        raise NotImplementedError


class LinearDecay(DecayFunction):
    def decay(self, distance):
        return 1.0 - (distance / self.decay_cap)


class ExponentialDecay(DecayFunction):
    def decay(self, distance):
        return float(np.exp(-5 * (distance / self.decay_cap)))


class GaussianDecay(DecayFunction):
    def decay(self, distance):
        # pdf(x)/pdf(0) = exp(-x^2/2) with x = 3*distance/decay_size.
        x = distance / self.decay_size * 3.0
        return float(np.exp(-0.5 * x * x))


class FlatDecay(DecayFunction):
    def decay(self, distance):
        return 1.0


def resolve_decay(decay_func, decay_size: int) -> DecayFunction:
    if isinstance(decay_func, DecayFunction):
        return decay_func
    if decay_func in ("linear", "lin"):
        return LinearDecay(decay_size)
    if decay_func in ("exponential", "exp"):
        return ExponentialDecay(decay_size)
    if decay_func in ("gaussian", "gauss"):
        return GaussianDecay(decay_size)
    if decay_func in ("flat", "none", None):
        return FlatDecay(decay_size)
    raise ValueError(
        "Invalid decay function; must be one of 'linear', 'exponential', "
        "'gaussian', 'flat' or a DecayFunction instance."
    )
