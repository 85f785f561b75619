"""Kernel tests for dissolve / resegment / separate / integrate.

Expected values follow the reference semantics in ``events/modify.py`` and
``events/integration.py`` (schematics in the resegment docstring at
``modify.py:306-433``; separate methods at ``modify.py:435-595``).
"""

import numpy as np
import pytest

from linref_ray.kernels.modify import (
    dissolve_sorted,
    integrate_group,
    resegment_rows,
    separate,
)


class TestDissolve:
    def test_basic_runs(self):
        g = np.array([0, 0, 0, 1, 1])
        begs = np.array([0.0, 10.0, 25.0, 0.0, 5.0])
        ends = np.array([10.0, 20.0, 30.0, 5.0, 9.0])
        run_id, first, ob, oe = dissolve_sorted(g, begs, ends)
        # Runs: [0,10)+[10,20) merge; [25,30); [0,5)+[5,9) merge in group 1.
        assert run_id.tolist() == [0, 0, 1, 2, 2]
        assert ob.tolist() == [0.0, 25.0, 0.0]
        assert oe.tolist() == [20.0, 30.0, 9.0]
        assert first.tolist() == [0, 2, 3]

    def test_group_break_even_if_consecutive(self):
        g = np.array([0, 1])
        begs = np.array([0.0, 10.0])
        ends = np.array([10.0, 20.0])
        _, _, ob, oe = dissolve_sorted(g, begs, ends)
        assert ob.tolist() == [0.0, 10.0]


class TestResegment:
    def test_cut(self):
        src, b, e = resegment_rows(np.array([0.0]), np.array([2.5]), 1.0, "cut")
        assert b.tolist() == [0.0, 1.0, 2.0]
        assert e.tolist() == [1.0, 2.0, 2.5]
        assert src.tolist() == [0, 0, 0]

    def test_none_drops_remainder(self):
        src, b, e = resegment_rows(np.array([0.0]), np.array([2.5]), 1.0, "none")
        assert b.tolist() == [0.0, 1.0]
        assert e.tolist() == [1.0, 2.0]

    def test_none_degenerate_short_event(self):
        src, b, e = resegment_rows(np.array([0.0]), np.array([0.4]), 1.0, "none")
        assert b.tolist() == [0.0]
        assert e.tolist() == [0.4]

    def test_left_anchors_last_on_end(self):
        src, b, e = resegment_rows(np.array([0.0]), np.array([2.5]), 1.0, "left")
        assert b.tolist() == [0.0, 1.0, 1.5]
        assert e.tolist() == [1.0, 2.0, 2.5]

    def test_right_extends_past_end(self):
        src, b, e = resegment_rows(np.array([0.0]), np.array([2.5]), 1.0, "right")
        assert b.tolist() == [0.0, 1.0, 2.0]
        assert e.tolist() == [1.0, 2.0, 3.0]

    def test_extend_final_covers_remainder(self):
        src, b, e = resegment_rows(np.array([0.0]), np.array([2.5]), 1.0, "extend")
        assert b.tolist() == [0.0, 1.0]
        assert e.tolist() == [1.0, 2.5]

    def test_balance_small_remainder_extends(self):
        # remainder 0.2 < 0.5 → drop last grid row, extend previous.
        src, b, e = resegment_rows(np.array([0.0]), np.array([2.2]), 1.0, "balance")
        assert b.tolist() == [0.0, 1.0]
        assert e.tolist() == [1.0, 2.2]

    def test_balance_large_remainder_cuts(self):
        src, b, e = resegment_rows(np.array([0.0]), np.array([2.7]), 1.0, "balance")
        assert b.tolist() == [0.0, 1.0, 2.0]
        assert e.tolist() == [1.0, 2.0, 2.7]

    def test_multi_row_vectorized(self):
        src, b, e = resegment_rows(
            np.array([0.0, 100.0]), np.array([2.0, 101.5]), 1.0, "cut"
        )
        assert src.tolist() == [0, 0, 1, 1]
        assert b.tolist() == [0.0, 1.0, 100.0, 101.0]
        assert e.tolist() == [1.0, 2.0, 101.0, 101.5]


class TestSeparate:
    def test_left_method(self):
        g = np.zeros(2, dtype=np.int64)
        b, e = separate(
            g, np.array([0.0, 5.0]), np.array([10.0, 15.0]), method="left"
        )
        assert b.tolist() == [0.0, 10.0]
        assert e.tolist() == [10.0, 15.0]

    def test_right_method(self):
        g = np.zeros(2, dtype=np.int64)
        b, e = separate(
            g, np.array([0.0, 5.0]), np.array([10.0, 15.0]), method="right"
        )
        assert b.tolist() == [0.0, 5.0]
        assert e.tolist() == [5.0, 15.0]

    def test_center_method(self):
        g = np.zeros(2, dtype=np.int64)
        b, e = separate(
            g, np.array([0.0, 5.0]), np.array([10.0, 15.0]), method="center"
        )
        # centers 5 and 10 → midpoint 7.5
        assert e[0] == pytest.approx(7.5)
        assert b[1] == pytest.approx(7.5)

    def test_balanced_center_override(self):
        # Events [0,10],[9,20]: termini midpoint 9.5 is valid, but the center
        # midpoint 9.75 also falls inside the overlap → center overrides
        # (``modify.py:570-575``).
        g = np.zeros(2, dtype=np.int64)
        b, e = separate(
            g, np.array([0.0, 9.0]), np.array([10.0, 20.0]), method="balanced"
        )
        assert e[0] == pytest.approx(9.75)
        assert b[1] == pytest.approx(9.75)

    def test_balanced_termini_only(self):
        # Events [0,10],[9,30]: center midpoint (5+19.5)/2 = 12.25 outside the
        # overlap [9,10] → termini midpoint 9.5 (clamped to centers) is used.
        g = np.zeros(2, dtype=np.int64)
        b, e = separate(
            g, np.array([0.0, 9.0]), np.array([10.0, 30.0]), method="balanced"
        )
        assert e[0] == pytest.approx(9.5)
        assert b[1] == pytest.approx(9.5)

    def test_balanced_large_overlap_uses_centers(self):
        # Overlap [2,10] large: center midpoint (5+6)/2=5.5 inside overlap →
        # overrides termini midpoint.
        g = np.zeros(2, dtype=np.int64)
        b, e = separate(
            g, np.array([0.0, 2.0]), np.array([10.0, 10.0]), method="balanced"
        )
        # second event is NOT eclipsed (end equal → enforce_edges contained?)
        # [2,10] vs [0,10]: beg>cummin(0) and end<=cummax(10) → eclipsed.
        # So it collapses to its center 6.0.
        assert b[1] == pytest.approx(6.0)
        assert e[1] == pytest.approx(6.0)

    def test_exact_duplicates_eliminated(self):
        g = np.zeros(3, dtype=np.int64)
        b, e = separate(
            g, np.array([0.0, 0.0, 20.0]), np.array([10.0, 10.0, 30.0])
        )
        # Duplicate collapses to center (zero length).
        lens = e - b
        assert (lens == 0).sum() == 1
        assert lens[2] == pytest.approx(10.0)

    def test_eclipsed_eliminated(self):
        g = np.zeros(2, dtype=np.int64)
        b, e = separate(g, np.array([0.0, 2.0]), np.array([10.0, 4.0]))
        assert (e - b)[1] == 0.0
        assert b[0] == 0.0 and e[0] == 10.0

    def test_grouped_no_cross_group_split(self):
        g = np.array([0, 1])
        b, e = separate(
            g, np.array([0.0, 5.0]), np.array([10.0, 15.0]), method="left"
        )
        assert b.tolist() == [0.0, 5.0]
        assert e.tolist() == [10.0, 15.0]


class TestIntegrate:
    def test_two_layers(self):
        # Layer A: [0,10); layer B: [5,15). Grid: 0,5,10,15.
        ob, oe, idx, cov = integrate_group(
            [np.array([0.0]), np.array([5.0])],
            [np.array([10.0]), np.array([15.0])],
        )
        assert ob.tolist() == [0.0, 5.0, 10.0]
        assert oe.tolist() == [5.0, 10.0, 15.0]
        assert idx.tolist() == [[0, -1], [0, 0], [-1, 0]]

    def test_gap_dropped_and_filled(self):
        ob, oe, idx, cov = integrate_group(
            [np.array([0.0, 20.0])], [np.array([10.0, 30.0])]
        )
        assert ob.tolist() == [0.0, 20.0]
        ob, oe, idx, cov = integrate_group(
            [np.array([0.0, 20.0])], [np.array([10.0, 30.0])], fill_gaps=True
        )
        assert ob.tolist() == [0.0, 10.0, 20.0]
        assert cov.tolist() == [True, False, True]

    def test_split_at_locs(self):
        ob, oe, idx, cov = integrate_group(
            [np.array([0.0])],
            [np.array([10.0])],
            layer_locs=[np.array([4.0])],
            split_at_locs=True,
        )
        assert ob.tolist() == [0.0, 4.0]
        assert oe.tolist() == [4.0, 10.0]

    def test_first_match_by_original_position(self):
        # Two overlapping events in one layer: argmax picks the first
        # original position, not the first sorted-by-beg one.
        ob, oe, idx, cov = integrate_group(
            [np.array([5.0, 0.0])], [np.array([15.0, 20.0])]
        )
        # Grid: 0,5,15,20. [0,5): only event1(pos1). [5,15): both → pos 0.
        assert idx[:, 0].tolist() == [1, 0, 1]
