"""Package-level options (reference ``linref/options.py``).

A single mutable :data:`options` object holds the package default LRS, so
call sites that accept ``lrs=None`` (e.g. :class:`linref_ray.api.Events`)
fall back to a user-configured schema instead of requiring one per call —
the same ergonomics as the reference's ``linref.options.default_lrs`` /
``linref.set_default_lrs``.
"""

from __future__ import annotations

from linref_ray.errors import LRSConfigurationError
from linref_ray.lrs import LRS


class _Options:
    """Mutable package options; see :func:`set_default_lrs`."""

    __slots__ = ("_default_lrs",)

    def __init__(self):
        self.reset()

    @property
    def default_lrs(self) -> LRS:
        return self._default_lrs

    @default_lrs.setter
    def default_lrs(self, value: LRS) -> None:
        if not isinstance(value, LRS):
            raise LRSConfigurationError(
                "default_lrs must be an LRS instance"
            )
        self._default_lrs = value

    def reset(self) -> None:
        """Restore every option to its out-of-the-box value."""
        self._default_lrs = LRS()

    def __repr__(self) -> str:
        return f"linref_ray.options\n  default_lrs: {self._default_lrs!r}"


options = _Options()


def set_default_lrs(lrs: LRS | None = None, **kwargs) -> LRS:
    """Set the package default LRS; builds one from ``**kwargs`` when no
    instance is given. Returns the LRS that was installed."""
    if lrs is None:
        lrs = LRS(**kwargs)
    options.default_lrs = lrs
    return lrs


def get_default_lrs() -> LRS:
    """The LRS used when an API surface is called with ``lrs=None``."""
    return options.default_lrs
