"""Kernel-level parity tests against the reference's hand fixtures.

Fixtures and expected values lifted from linref
``tests/test_events_relate.py`` (canonical overlay pair at ``:23-35``,
normalization fractions at ``:104-128``, closure cases at ``:354-445``) and
``tests/test_events_base.py``. Pure numpy — no Ray session needed.
"""

import numpy as np
import pytest

from linref_ray.kernels.intervals import (
    duplicated_group,
    find_inside_sorted_group,
    intersect_linear_linear_pairs,
    intersect_point_linear_pairs,
    intersect_point_point_pairs,
    modified_edges_sorted,
    overlay_pairs,
)
from linref_ray.kernels.profile import resolve_profile


def pairs_to_dict(li, ri, w=None):
    if w is None:
        return set(zip(li.tolist(), ri.tolist()))
    return {(int(a), int(b)): float(v) for a, b, v in zip(li, ri, w)}


class TestOverlayPairs:
    # Canonical fixture, group 1 only (groups handled by the partitioner).
    L_BEGS = np.array([0.0, 10.0])
    L_ENDS = np.array([10.0, 20.0])
    R_BEGS = np.array([5.0, 15.0])
    R_ENDS = np.array([15.0, 25.0])

    def test_raw(self):
        li, ri, w = overlay_pairs(
            self.L_BEGS, self.L_ENDS, self.R_BEGS, self.R_ENDS, normalize=False
        )
        assert pairs_to_dict(li, ri, w) == {(0, 0): 5.0, (1, 0): 5.0, (1, 1): 5.0}

    def test_normalized_right(self):
        li, ri, w = overlay_pairs(
            self.L_BEGS, self.L_ENDS, self.R_BEGS, self.R_ENDS, norm_by="right"
        )
        assert pairs_to_dict(li, ri, w) == {(0, 0): 0.5, (1, 0): 0.5, (1, 1): 0.5}

    def test_varying_lengths_norm_left(self):
        # ``test_events_relate.py:104-128``: exact fractions 5/12 and 7/12.
        lb = np.array([0.0, 10.0, 20.0])
        le = np.array([10.0, 22.0, 40.0])
        rb = np.array([5.0, 15.0, 30.0])
        re = np.array([15.0, 25.0, 35.0])
        li, ri, w = overlay_pairs(lb, le, rb, re, norm_by="left")
        d = pairs_to_dict(li, ri, w)
        assert d[(0, 0)] == pytest.approx(0.5)
        assert d[(1, 0)] == pytest.approx(5.0 / 12.0)
        assert d[(1, 1)] == pytest.approx(7.0 / 12.0)
        assert d[(2, 1)] == pytest.approx(5.0 / 20.0)

    def test_varying_lengths_norm_right(self):
        lb = np.array([0.0, 10.0, 20.0])
        le = np.array([15.0, 25.0, 35.0])
        rb = np.array([5.0, 20.0, 30.0])
        re = np.array([10.0, 25.0, 40.0])
        li, ri, w = overlay_pairs(lb, le, rb, re, norm_by="right")
        d = pairs_to_dict(li, ri, w)
        assert d[(0, 0)] == pytest.approx(1.0)
        assert d[(1, 1)] == pytest.approx(1.0)
        assert d[(2, 1)] == pytest.approx(1.0)
        assert d[(2, 2)] == pytest.approx(0.5)

    def test_touching_is_not_overlap(self):
        li, ri, w = overlay_pairs(
            np.array([0.0]), np.array([10.0]), np.array([10.0]), np.array([20.0]),
            normalize=False,
        )
        assert len(li) == 0

    def test_zero_length_norm_event(self):
        # Zero-length events never emit overlay pairs (min-length cap → 0).
        li, ri, w = overlay_pairs(
            np.array([0.0]), np.array([10.0]), np.array([5.0]), np.array([5.0]),
            norm_by="right",
        )
        assert len(li) == 0

    def test_window_additivity(self):
        """Salted-bucket invariant: clipped weights sum to the full weight."""
        lb = np.array([0.0, 3.0, 7.0])
        le = np.array([12.0, 9.0, 20.0])
        rb = np.array([1.0, 6.0])
        re = np.array([8.0, 18.0])
        full = pairs_to_dict(*overlay_pairs(lb, le, rb, re, normalize=False))
        acc: dict = {}
        for lo, hi in [(0.0, 5.0), (5.0, 10.0), (10.0, 15.0), (15.0, 20.0)]:
            li, ri, w = overlay_pairs(
                lb, le, rb, re, normalize=False, window=(lo, hi)
            )
            for k, v in pairs_to_dict(li, ri, w).items():
                acc[k] = acc.get(k, 0.0) + v
        assert set(acc) == set(full)
        for k in full:
            assert acc[k] == pytest.approx(full[k])

    def test_window_additivity_profile(self):
        profile = resolve_profile("triangular")
        lb = np.array([0.0, 3.0])
        le = np.array([12.0, 9.0])
        rb = np.array([1.0])
        re = np.array([8.0])
        full = pairs_to_dict(*overlay_pairs(lb, le, rb, re, profile=profile))
        acc: dict = {}
        for lo, hi in [(0.0, 4.0), (4.0, 8.0), (8.0, 12.0)]:
            li, ri, w = overlay_pairs(lb, le, rb, re, profile=profile, window=(lo, hi))
            for k, v in pairs_to_dict(li, ri, w).items():
                acc[k] = acc.get(k, 0.0) + v
        for k in full:
            assert acc[k] == pytest.approx(full[k])


class TestIntersect:
    def test_point_linear_both(self):
        # ``test_events_relate.py:358-378``
        locs = np.array([5.0, 10.0, 15.0, 20.0])
        rb = np.array([0.0, 10.0])
        re = np.array([10.0, 20.0])
        pi, ii = intersect_point_linear_pairs(locs, rb, re, r_closed="both")
        assert pairs_to_dict(pi, ii) == {(0, 0), (1, 0), (1, 1), (2, 1), (3, 1)}

    def test_point_linear_left(self):
        locs = np.array([0.0, 10.0])
        pi, ii = intersect_point_linear_pairs(
            locs, np.array([0.0]), np.array([10.0]), r_closed="left"
        )
        assert pairs_to_dict(pi, ii) == {(0, 0)}

    def test_point_linear_right(self):
        locs = np.array([0.0, 10.0])
        pi, ii = intersect_point_linear_pairs(
            locs, np.array([0.0]), np.array([10.0]), r_closed="right"
        )
        assert pairs_to_dict(pi, ii) == {(1, 0)}

    def test_point_linear_left_mod(self):
        # left_mod: final range of a contiguous run is closed on both sides.
        rb = np.array([0.0, 10.0])
        re = np.array([10.0, 20.0])
        mod = modified_edges_sorted(rb, re, "left_mod")
        assert mod.tolist() == [False, True]
        locs = np.array([10.0, 20.0])
        pi, ii = intersect_point_linear_pairs(
            locs, rb, re, r_closed="left_mod", r_modified=mod
        )
        # 10 hits range2 (left-closed beg); 20 hits range2 end only via mod.
        assert pairs_to_dict(pi, ii) == {(0, 1), (1, 1)}

    def test_point_point(self):
        li, ri = intersect_point_point_pairs(
            np.array([5.0, 10.0, 15.0]), np.array([5.0, 7.0, 15.0])
        )
        assert pairs_to_dict(li, ri) == {(0, 0), (2, 2)}

    def test_linear_linear_strict(self):
        lb = np.array([0.0, 10.0])
        le = np.array([10.0, 20.0])
        rb = np.array([5.0, 10.0])
        re = np.array([15.0, 30.0])
        li, ri = intersect_linear_linear_pairs(
            lb, le, rb, re, l_closed="neither", r_closed="neither",
            enforce_edges=True,
        )
        assert pairs_to_dict(li, ri) == {(0, 0), (1, 0), (1, 1)}

    def test_linear_linear_touching_edges(self):
        # left closed='left', right closed='right': touching at left_beg ==
        # right_end counts (test_begs_ends case).
        lb = np.array([10.0])
        le = np.array([20.0])
        rb = np.array([0.0])
        re = np.array([10.0])
        li, ri = intersect_linear_linear_pairs(
            lb, le, rb, re, l_closed="left", r_closed="right", enforce_edges=True
        )
        assert pairs_to_dict(li, ri) == {(0, 0)}
        li, ri = intersect_linear_linear_pairs(
            lb, le, rb, re, l_closed="left", r_closed="right", enforce_edges=False
        )
        assert len(li) == 0

    def test_linear_linear_left_mod_run_ends(self):
        # Two runs on one route: [0,10)+[10,20) then [30,40). With left_mod,
        # run-final ranges (idx 1 and 2) are both-closed.
        rb = np.array([0.0, 10.0, 30.0])
        re = np.array([10.0, 20.0, 40.0])
        mod = modified_edges_sorted(rb, re, "left_mod")
        assert mod.tolist() == [False, True, True]


class TestFindInsideDuplicated:
    def test_find_inside_strict(self):
        # ``test_events_base.py``: contained events flagged, container not.
        begs = np.array([0.0, 2.0, 5.0])
        ends = np.array([10.0, 4.0, 15.0])
        mask = find_inside_sorted_group(begs, ends)
        assert mask.tolist() == [False, True, False]

    def test_find_inside_edges(self):
        begs = np.array([0.0, 0.0])
        ends = np.array([10.0, 5.0])
        assert find_inside_sorted_group(begs, ends).tolist() == [False, False]
        assert find_inside_sorted_group(begs, ends, enforce_edges=True).tolist() == [
            False,
            True,
        ]

    def test_identical_not_inside(self):
        begs = np.array([0.0, 0.0])
        ends = np.array([10.0, 10.0])
        assert find_inside_sorted_group(
            begs, ends, enforce_edges=True
        ).tolist() == [False, False]

    def test_duplicated(self):
        begs = np.array([0.0, 0.0, 5.0])
        ends = np.array([10.0, 10.0, 15.0])
        assert duplicated_group([begs, ends], "first").tolist() == [
            False,
            True,
            False,
        ]
        assert duplicated_group([begs, ends], "last").tolist() == [
            True,
            False,
            False,
        ]
        assert duplicated_group([begs, ends], "none").tolist() == [
            True,
            True,
            False,
        ]
