"""Geometry kernel tests.

Invariants mirrored from reference ``tests/test_geometry.py``: m↔distance
round trips (incl. non-uniform spacing and diagonal lines), adjacent
substrings share exact boundary coordinates (``:341-378``), M always
non-decreasing, zero-length substring handling.
"""

import numpy as np
import pytest

from linref_ray.kernels.geometry import (
    bearing,
    cardinal_direction,
    cumdist,
    distance_to_m,
    interpolate_at_m,
    m_to_distance,
    merge_chains,
    project_point_to_polyline,
    substring_by_distance,
    substring_by_m,
)


@pytest.fixture
def diagonal_line():
    # Non-uniform vertex spacing, diagonal, M not equal to distance.
    xs = np.array([0.0, 3.0, 3.0, 7.0])
    ys = np.array([0.0, 4.0, 8.0, 8.0])
    ms = np.array([0.0, 10.0, 12.0, 20.0])
    return xs, ys, ms


class TestMDistance:
    def test_cumdist(self, diagonal_line):
        xs, ys, _ = diagonal_line
        cd = cumdist(xs, ys)
        assert cd.tolist() == [0.0, 5.0, 9.0, 13.0]

    def test_roundtrip(self, diagonal_line):
        xs, ys, ms = diagonal_line
        cd = cumdist(xs, ys)
        m_q = np.array([0.0, 5.0, 10.0, 11.0, 16.0, 20.0])
        d = m_to_distance(ms, cd, m_q)
        back = distance_to_m(ms, cd, d)
        np.testing.assert_allclose(back, m_q)

    def test_interp_midpoints(self, diagonal_line):
        xs, ys, ms = diagonal_line
        px, py = interpolate_at_m(xs, ys, ms, np.array([5.0]))
        assert px[0] == pytest.approx(1.5)
        assert py[0] == pytest.approx(2.0)

    def test_clamp_out_of_range(self, diagonal_line):
        xs, ys, ms = diagonal_line
        px, py = interpolate_at_m(xs, ys, ms, np.array([-5.0, 100.0]))
        assert (px[0], py[0]) == (0.0, 0.0)
        assert (px[1], py[1]) == (7.0, 8.0)


class TestSubstring:
    def test_adjacent_substrings_share_boundary(self, diagonal_line):
        """Reference ``test_geometry.py:341-378`` invariant."""
        xs, ys, ms = diagonal_line
        coords = np.column_stack([xs, ys])
        c1, m1 = substring_by_distance(coords, ms, 0.0, 6.5)
        c2, m2 = substring_by_distance(coords, ms, 6.5, 13.0)
        np.testing.assert_array_equal(c1[-1], c2[0])
        assert m1[-1] == m2[0]

    def test_m_monotone(self, diagonal_line):
        xs, ys, ms = diagonal_line
        ox, oy, om = substring_by_m(xs, ys, ms, 3.0, 17.0)
        assert np.all(np.diff(om) >= 0)
        assert om[0] == pytest.approx(3.0)
        assert om[-1] == pytest.approx(17.0)

    def test_vertex_snap_dedup(self, diagonal_line):
        xs, ys, ms = diagonal_line
        coords = np.column_stack([xs, ys])
        c, m = substring_by_distance(coords, ms, 5.0, 9.0)
        # Cut exactly at vertices: no duplicated endpoints.
        assert len(c) == 2
        np.testing.assert_allclose(c[0], [3.0, 4.0])
        np.testing.assert_allclose(c[1], [3.0, 8.0])

    def test_zero_length(self, diagonal_line):
        xs, ys, ms = diagonal_line
        coords = np.column_stack([xs, ys])
        c, m = substring_by_distance(coords, ms, 5.0, 5.0)
        assert len(c) == 2
        np.testing.assert_array_equal(c[0], c[1])

    def test_many_matches_scalar_differential(self):
        """substring_by_m_many must be bit-identical to the scalar kernel on
        every range, including vertex-exact cuts, zero-length ranges,
        out-of-range measures and zero-length segments."""
        from linref_ray.kernels.geometry import substring_by_m_many

        rng = np.random.Generator(np.random.PCG64(17))
        for trial in range(20):
            nv = int(rng.integers(2, 12))
            xs = np.cumsum(rng.normal(size=nv))
            ys = np.cumsum(rng.normal(size=nv))
            if trial % 3 == 0 and nv > 3:
                # inject a zero-length segment (duplicate vertex)
                xs[2], ys[2] = xs[1], ys[1]
            ms = np.cumsum(np.abs(rng.normal(size=nv)) * (trial % 4 != 1))
            ms = ms - ms[0]
            lo, hi = ms[0] - 1.0, ms[-1] + 1.0
            nq = 40
            a = rng.uniform(lo, hi, size=nq)
            b = rng.uniform(lo, hi, size=nq)
            m_beg, m_end = np.minimum(a, b), np.maximum(a, b)
            # vertex-exact and degenerate cases
            m_beg[:3] = ms[min(1, nv - 1)]
            m_end[:2] = ms[min(1, nv - 1)]
            m_end[2] = ms[-1]
            ln, fx, fy, fm = substring_by_m_many(xs, ys, ms, m_beg, m_end)
            off = np.concatenate([[0], np.cumsum(ln)])
            for i in range(nq):
                ox, oy, om = substring_by_m(
                    xs, ys, ms, float(m_beg[i]), float(m_end[i])
                )
                s = slice(off[i], off[i + 1])
                np.testing.assert_array_equal(fx[s], ox, err_msg=f"t{trial} q{i}")
                np.testing.assert_array_equal(fy[s], oy)
                np.testing.assert_array_equal(fm[s], om)


class TestProject:
    def test_on_segment(self):
        xs = np.array([0.0, 10.0])
        ys = np.array([0.0, 0.0])
        ms = np.array([0.0, 10.0])
        m, d = project_point_to_polyline(xs, ys, ms, 5.0, 0.05)
        assert m == pytest.approx(5.0)
        assert d == pytest.approx(0.05)

    def test_clamped_to_vertex(self):
        xs = np.array([0.0, 10.0])
        ys = np.array([0.0, 0.0])
        ms = np.array([0.0, 10.0])
        m, d = project_point_to_polyline(xs, ys, ms, 12.0, 1.0)
        assert m == pytest.approx(10.0)
        assert d == pytest.approx(np.sqrt(4 + 1))

    def test_multi_segment_picks_nearest(self):
        xs = np.array([0.0, 10.0, 10.0])
        ys = np.array([0.0, 0.0, 10.0])
        ms = np.array([0.0, 10.0, 20.0])
        m, d = project_point_to_polyline(xs, ys, ms, 9.0, 3.0)
        assert m == pytest.approx(13.0)
        assert d == pytest.approx(1.0)


class TestBearing:
    def test_cardinals(self):
        b = bearing(
            np.array([0.0, 0, 0, 0]),
            np.array([0.0, 0, 0, 0]),
            np.array([0.0, 1, 0, -1]),
            np.array([1.0, 0, -1, 0]),
        )
        np.testing.assert_allclose(b, [0.0, 90.0, 180.0, 270.0])
        assert cardinal_direction(b).tolist() == ["N", "E", "S", "W"]
        assert cardinal_direction(np.array([44.0, 46.0])).tolist() == ["NE", "NE"]


class TestMergeChains:
    def test_simple_chain(self):
        first = np.array([[0.0, 0.0], [10.0, 0.0], [50.0, 50.0]])
        last = np.array([[10.0, 0.0], [20.0, 0.0], [60.0, 50.0]])
        cid, pos = merge_chains(first, last)
        assert cid[0] == cid[1]
        assert cid[2] != cid[0]
        assert pos[0] == 0 and pos[1] == 1

    def test_grow_backward(self):
        # Seed order forces prepend path.
        first = np.array([[10.0, 0.0], [0.0, 0.0]])
        last = np.array([[20.0, 0.0], [10.0, 0.0]])
        cid, pos = merge_chains(first, last)
        assert cid[0] == cid[1]
        assert pos[1] == 0 and pos[0] == 1
