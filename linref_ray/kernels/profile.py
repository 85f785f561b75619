"""Overlay weight shaping along normalized event positions.

A *shape* assigns relative weight ``f(u)`` to the normalized position
``u ∈ [0, 1]`` along a source event; profile-weighted overlay then uses the
definite integral of ``f`` over the overlapped sub-range in place of the
plain length fraction. Every shape is expressed through its antiderivative
``F`` (with ``F(0) = 0`` and ``F(1) = 1``, so a full-event overlap weighs
exactly 1), which is also what makes window-clipped weights additive across
salted measure buckets — the invariant the salted overlay path relies on.

The shape functions match the reference's profile math numerically (linref
``events/profile.py`` — parity required for byte-equal overlay results);
the implementation is closure-based rather than a class-per-shape
hierarchy.
"""

from __future__ import annotations

import numpy as np


class ShapeProfile:
    """A weight shape bundled as (value, antiderivative) closures.

    ``shape(u)`` evaluates the density; ``shape.integral(lo, hi)`` is the
    definite integral — the only method the overlay kernel calls.
    """

    __slots__ = ("name", "_value", "_accum")

    def __init__(self, name: str, value, accum):
        self.name = name
        self._value = value
        self._accum = accum

    def __call__(self, u):
        u = np.asarray(u, dtype=np.float64)
        if ((u < 0.0) | (u > 1.0)).any():
            raise ValueError(
                f"shape position outside the unit range for {self.name!r}"
            )
        return self._value(u)

    def integral(self, lo, hi):
        lo = np.asarray(lo, dtype=np.float64)
        hi = np.asarray(hi, dtype=np.float64)
        return self._accum(hi) - self._accum(lo)

    def __repr__(self) -> str:
        return f"<shape {self.name}>"


def _flat_shape() -> ShapeProfile:
    # f(u) = 1: the default length-fraction weighting.
    return ShapeProfile("uniform", lambda u: np.ones_like(u), lambda u: u)


def _peak_shape() -> ShapeProfile:
    # Linear rise to a center peak and back: f(u) = 4u rising, 4(1-u)
    # falling (area-normalized).
    def value(u):
        return np.where(u < 0.5, 4.0 * u, 4.0 * (1.0 - u))

    def accum(u):
        return np.where(u < 0.5, 2.0 * u * u, 4.0 * u - 2.0 * u * u - 1.0)

    return ShapeProfile("triangular", value, accum)


def _dome_shape() -> ShapeProfile:
    # Smooth quadratic dome: f(u) = 6u(1-u); F(u) = u²(3 - 2u).
    return ShapeProfile(
        "parabolic",
        lambda u: 6.0 * u * (1.0 - u),
        lambda u: u * u * (3.0 - 2.0 * u),
    )


def _ramped_shape(ramp: float = 0.25) -> ShapeProfile:
    # Plateau with linear ramps of width ``ramp`` at both ends; plateau
    # height 1/(1-ramp) normalizes the area to 1.
    if not (0.0 < ramp <= 0.5):
        raise ValueError(
            f"trapezoid ramp width must lie in (0, 0.5], got {ramp}"
        )
    h = 1.0 / (1.0 - ramp)

    def value(u):
        return h * np.clip(np.minimum(u, 1.0 - u) / ramp, 0.0, 1.0)

    def accum(u):
        tail = 1.0 - u
        return np.where(
            u < ramp,
            h * u * u / (2.0 * ramp),
            np.where(
                u <= 1.0 - ramp,
                h * (u - 0.5 * ramp),
                1.0 - h * tail * tail / (2.0 * ramp),
            ),
        )

    return ShapeProfile(f"trapezoidal(ramp={ramp})", value, accum)


PROFILE_REGISTRY = {
    "uniform": _flat_shape,
    "triangular": _peak_shape,
    "parabolic": _dome_shape,
    "trapezoidal": _ramped_shape,
}


def resolve_profile(spec) -> ShapeProfile | None:
    """``None`` → ``None``; a registry name → fresh shape; a
    :class:`ShapeProfile` passes through unchanged."""
    if spec is None:
        return None
    if isinstance(spec, ShapeProfile):
        return spec
    if isinstance(spec, str):
        try:
            return PROFILE_REGISTRY[spec.lower()]()
        except KeyError:
            raise ValueError(
                f"no overlay shape named {spec!r} "
                f"(have: {sorted(PROFILE_REGISTRY)})"
            ) from None
    raise TypeError(
        "overlay profile must be None, a shape name, or a ShapeProfile"
    )
