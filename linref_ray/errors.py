"""Engine error taxonomy — parity with the reference's ``linref/errors.py``.

The reference exposes a small exception hierarchy (``linref/errors.py:1-28``:
``LinrefError`` base, LRS configuration/compatibility, geometry/event
topology, M-measure errors, a deprecation warning). The engine mirrors the
names users would catch, with one deliberate difference: every error also
subclasses ``ValueError``, because the engine raised plain ``ValueError``
through round 4 and downstream code (and our own tests) may already catch
that — the taxonomy is additive, never breaking.

``GeometrySyncError``/``RemovedFeatureError`` are not mirrored: the engine
has no shapely geometry column to fall out of sync with (geometry lives in
Arrow ``list<double>`` columns regenerated per kernel) and no pre-1.0
removed surface.
"""

from __future__ import annotations


class LinrefRayError(Exception):
    """Base class for linref_ray engine errors."""


class LRSConfigurationError(LinrefRayError, ValueError):
    """Invalid LRS column mapping or options (bad ``closed`` mode, missing
    mapped columns, a non-LRS default)."""


class LRSCompatibilityError(LinrefRayError, ValueError):
    """Two datasets' LRS mappings cannot be related (mismatched key arity,
    linear vs point shape where a linear side is required)."""


class GeometryMeasureError(LinrefRayError, ValueError):
    """M-enabled geometry violates measure topology (non-monotonic M,
    malformed LINESTRING M WKT, wrong coordinate arity)."""


class EventTopologyError(LinrefRayError, ValueError):
    """Event ranges violate the operation's topological contract
    (e.g. begs > ends where validity is required)."""


class LinrefRayDeprecationWarning(FutureWarning):
    """Warning for deprecated engine features (shown by default, matching
    the reference's ``LinrefDeprecationWarning`` policy)."""
