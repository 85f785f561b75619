"""Error taxonomy (linref_ray.errors) — reference-parity names, and the
backward-compat contract that every engine error is still a ValueError."""

import pytest

from linref_ray.errors import (
    EventTopologyError,
    GeometryMeasureError,
    LinrefRayError,
    LRSCompatibilityError,
    LRSConfigurationError,
)


def test_hierarchy():
    for cls in (LRSConfigurationError, LRSCompatibilityError,
                GeometryMeasureError, EventTopologyError):
        assert issubclass(cls, LinrefRayError)
        assert issubclass(cls, ValueError)  # round-4 compat contract


def test_lrs_configuration_error():
    from linref_ray.lrs import LRS

    with pytest.raises(LRSConfigurationError):
        LRS(closed="bogus")
    with pytest.raises(ValueError):  # still catchable the old way
        LRS(closed="bogus")


def test_set_default_lrs_type_check():
    from linref_ray.options import set_default_lrs

    with pytest.raises(LRSConfigurationError):
        set_default_lrs("not an lrs")


def test_geometry_measure_error():
    from linref_ray.geometry import coords_from_shapely_m, parse_wkt_m

    with pytest.raises(GeometryMeasureError):
        parse_wkt_m("POINT (1 2)")

    class FakeGeom:  # duck-typed shapely LineString with M
        coords = [(0.0, 0.0, 5.0), (1.0, 0.0, 3.0), (2.0, 0.0, 4.0)]

    with pytest.raises(GeometryMeasureError, match="monotonic"):
        coords_from_shapely_m(FakeGeom())
