"""Event value profiles for weighted overlay.

Reimplements the reference's profile math (linref ``events/profile.py``):
closed-form antiderivatives of the uniform / triangular / parabolic /
trapezoidal shape functions, each normalized so the integral over [0, 1] is
1.0. Profiles are plain objects cloudpickled to workers by Ray.
"""

from __future__ import annotations

import numpy as np


class EventProfile:
    """Base profile; subclasses implement ``_integral(a, b)`` on [0,1]."""

    def __call__(self, t):
        t = np.asarray(t, dtype=float)
        if np.any(t < 0) or np.any(t > 1):
            raise ValueError("Profile positions must be in [0, 1].")
        return self._evaluate(t)

    def integral(self, a, b):
        a = np.asarray(a, dtype=float)
        b = np.asarray(b, dtype=float)
        return self._integral(a, b)

    def _evaluate(self, t):
        raise NotImplementedError

    def _integral(self, a, b):
        raise NotImplementedError

    def __repr__(self):
        return f"{self.__class__.__name__}()"


class UniformProfile(EventProfile):
    """f(t) = 1."""

    def _evaluate(self, t):
        return np.ones_like(t)

    def _integral(self, a, b):
        return b - a


class TriangularProfile(EventProfile):
    """Peak at center: f(t) = 4t (t<0.5), 4(1-t) otherwise."""

    def _evaluate(self, t):
        return np.where(t < 0.5, 4.0 * t, 4.0 * (1.0 - t))

    @staticmethod
    def _antideriv(t):
        return np.where(t < 0.5, 2.0 * t**2, -2.0 * t**2 + 4.0 * t - 1.0)

    def _integral(self, a, b):
        return self._antideriv(b) - self._antideriv(a)


class ParabolicProfile(EventProfile):
    """Smooth peak: f(t) = 6t(1-t)."""

    def _evaluate(self, t):
        return 6.0 * t * (1.0 - t)

    @staticmethod
    def _antideriv(t):
        return 3.0 * t**2 - 2.0 * t**3

    def _integral(self, a, b):
        return self._antideriv(b) - self._antideriv(a)


class TrapezoidalProfile(EventProfile):
    """Flat center with linear ramps of width ``ramp`` on each side."""

    def __init__(self, ramp: float = 0.25):
        if not (0 < ramp <= 0.5):
            raise ValueError(f"ramp must satisfy 0 < ramp <= 0.5, got {ramp}")
        self.ramp = ramp
        self._scale = 1.0 / (1.0 - ramp)

    def _evaluate(self, t):
        r = self.ramp
        res = np.where(t < r, t / r, np.where(t > 1.0 - r, (1.0 - t) / r, 1.0))
        return res * self._scale

    def _antideriv(self, t):
        r, s = self.ramp, self._scale
        return np.where(
            t < r,
            s * t**2 / (2.0 * r),
            np.where(
                t <= 1.0 - r,
                s * (t - r / 2.0),
                s * (1.0 - r - (1.0 - t) ** 2 / (2.0 * r)),
            ),
        )

    def _integral(self, a, b):
        return self._antideriv(b) - self._antideriv(a)

    def __repr__(self):
        return f"TrapezoidalProfile(ramp={self.ramp})"


PROFILE_REGISTRY: dict[str, type[EventProfile]] = {
    "uniform": UniformProfile,
    "triangular": TriangularProfile,
    "parabolic": ParabolicProfile,
    "trapezoidal": TrapezoidalProfile,
}


def resolve_profile(profile):
    """None / name / instance → EventProfile | None (``profile.py:228-269``)."""
    if profile is None:
        return None
    if isinstance(profile, EventProfile):
        return profile
    if isinstance(profile, str):
        key = profile.lower()
        if key not in PROFILE_REGISTRY:
            raise ValueError(
                f"Unknown profile {profile!r}; available: {list(PROFILE_REGISTRY)}"
            )
        return PROFILE_REGISTRY[key]()
    raise TypeError("profile must be None, a string, or an EventProfile")
