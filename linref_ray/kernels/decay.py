"""Neighbor-weight falloff for the ``distribute`` sliding-window aggregator.

The falloff family matches the reference numerically (linref
``events/relate.py:2281-2387`` — step 0 always weighs 1.0, steps
1..decay_size follow the named shape), expressed here as scale functions
produced by small factories rather than a class hierarchy. The gaussian
variant is the standard normal pdf at ``3·step/decay_size`` normalized by
pdf(0), written out explicitly since scipy is absent from this
environment.
"""

from __future__ import annotations

import numpy as np


class DecayFunction:
    """A step→weight falloff: ``fn(0) == 1.0``, shape applies beyond."""

    __slots__ = ("name", "steps", "_scale")

    def __init__(self, name: str, steps: int, scale):
        if steps < 0:
            raise ValueError("decay window size must be non-negative")
        self.name = name
        self.steps = steps
        self._scale = scale

    def __call__(self, distance: float) -> float:
        if distance < 0:
            raise ValueError("neighbor distance must be non-negative")
        if distance == 0 or self.steps == 0:
            return 1.0
        return float(self._scale(distance, self.steps))

    def __repr__(self) -> str:
        return f"<decay {self.name}({self.steps})>"


def _linear_falloff(steps: int) -> DecayFunction:
    # Straight line from 1 at step 0 down to 1/(steps+1) at the window edge.
    return DecayFunction(
        "linear", steps, lambda d, s: 1.0 - d / (s + 1.0)
    )


def _exponential_falloff(steps: int) -> DecayFunction:
    return DecayFunction(
        "exponential", steps, lambda d, s: np.exp(-5.0 * d / (s + 1.0))
    )


def _gaussian_falloff(steps: int) -> DecayFunction:
    # pdf(x)/pdf(0) = exp(-x²/2) with x = 3·d/steps (the window edge sits
    # three standard deviations out).
    return DecayFunction(
        "gaussian", steps,
        lambda d, s: np.exp(-0.5 * (3.0 * d / s) ** 2),
    )


def _flat_falloff(steps: int) -> DecayFunction:
    return DecayFunction("flat", steps, lambda d, s: 1.0)


_DECAY_FACTORIES = {
    "linear": _linear_falloff,
    "lin": _linear_falloff,
    "exponential": _exponential_falloff,
    "exp": _exponential_falloff,
    "gaussian": _gaussian_falloff,
    "gauss": _gaussian_falloff,
    "flat": _flat_falloff,
    "none": _flat_falloff,
    None: _flat_falloff,
}


def resolve_decay(decay_func, decay_size: int) -> DecayFunction:
    """Name / None / instance → :class:`DecayFunction`."""
    if isinstance(decay_func, DecayFunction):
        return decay_func
    try:
        return _DECAY_FACTORIES[decay_func](decay_size)
    except KeyError:
        raise ValueError(
            f"no decay shape named {decay_func!r} (have: linear, "
            "exponential, gaussian, flat, or a DecayFunction instance)"
        ) from None
