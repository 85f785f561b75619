"""Differential property tests: the O(nnz) sweep kernels vs a brute-force
dense implementation of the reference formulas, across the full closure
matrix on seeded random fixtures.

The dense oracle below re-states the published reference math directly
(overlay min-of-four: ``relate.py:2013-2024``; intersect closure tests:
``relate.py:2139-2273``) as an independent implementation — if the sweep's
candidate-pruning (searchsorted + running-max bound) dropped any true pair
or admitted a false one, these sweeps over thousands of random intervals
would catch it.
"""

import numpy as np
import pytest

from linref_ray.kernels.intervals import (
    CLOSED_OPTIONS,
    closed_base,
    closed_mod,
    intersect_linear_linear_pairs,
    intersect_point_linear_pairs,
    modified_edges_sorted,
    overlay_pairs,
)


def random_intervals(rng, n, span=100.0, max_len=15.0, quantize=None):
    begs = rng.uniform(0, span, n)
    lens = rng.uniform(0, max_len, n)
    if quantize:
        begs = np.round(begs / quantize) * quantize
        lens = np.round(lens / quantize) * quantize
    ends = begs + lens
    order = np.lexsort([ends, begs])
    return begs[order], ends[order]


def dense_overlay(lb, le, rb, re):
    lefts = le[:, None] - rb[None, :]
    rights = re[None, :] - lb[:, None]
    overlap = np.minimum(lefts, rights)
    lengths = np.minimum((le - lb)[:, None], (re - rb)[None, :])
    overlap = np.minimum(overlap, lengths)
    return np.clip(overlap, 0, None)


def dense_intersect_ll(lb, le, rb, re, l_closed, r_closed, l_mod, r_mod):
    res = (le[:, None] > rb[None, :]) & (lb[:, None] < re[None, :])
    test_edges = not (
        (l_closed == "neither" or r_closed == "neither")
        or (l_closed == "left" and r_closed == "left")
        or (l_closed == "right" and r_closed == "right")
    )
    if test_edges:
        if (l_closed != "right") and (r_closed != "left"):
            mask = ~res
            if l_closed == "right_mod":
                mask &= l_mod[:, None]
            if r_closed == "left_mod":
                mask &= r_mod[None, :]
            res |= mask & (lb[:, None] == re[None, :])
        if (l_closed != "left") and (r_closed != "right"):
            mask = ~res
            if l_closed == "left_mod":
                mask &= l_mod[:, None]
            if r_closed == "right_mod":
                mask &= r_mod[None, :]
            res |= mask & (le[:, None] == rb[None, :])
    return res


def dense_intersect_pl(locs, rb, re, closed, r_mod):
    base = closed_base(closed)
    if base in ("left", "both"):
        res = locs[:, None] >= rb[None, :]
    else:
        res = locs[:, None] > rb[None, :]
    if base in ("right", "both"):
        res &= locs[:, None] <= re[None, :]
    else:
        res &= locs[:, None] < re[None, :]
    if closed_mod(closed):
        extra = r_mod[None, :] & ~res
        if base == "left":
            res |= extra & (locs[:, None] == re[None, :])
        elif base == "right":
            res |= extra & (locs[:, None] == rb[None, :])
    return res


class TestDifferentialOverlay:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("norm", [None, "left", "right"])
    def test_random_vs_dense(self, seed, norm):
        rng = np.random.default_rng(seed)
        lb, le = random_intervals(rng, 300)
        rb, re = random_intervals(rng, 250)
        dense = dense_overlay(lb, le, rb, re)
        if norm:
            denom = (
                (le - lb)[:, None] if norm == "left" else (re - rb)[None, :]
            )
            dense = dense / np.where(denom == 0, np.inf, denom)
        li, ri, w = overlay_pairs(
            lb, le, rb, re, normalize=norm is not None,
            norm_by=norm or "right",
        )
        sparse = np.zeros_like(dense)
        sparse[li, ri] = w
        np.testing.assert_allclose(sparse, dense, atol=1e-12)

    def test_quantized_touching(self):
        """Integer-quantized intervals: many exact touches/duplicates."""
        rng = np.random.default_rng(7)
        lb, le = random_intervals(rng, 200, quantize=2.0)
        rb, re = random_intervals(rng, 200, quantize=2.0)
        dense = dense_overlay(lb, le, rb, re)
        li, ri, w = overlay_pairs(lb, le, rb, re, normalize=False)
        sparse = np.zeros_like(dense)
        sparse[li, ri] = w
        np.testing.assert_allclose(sparse, dense, atol=1e-12)


class TestDifferentialIntersect:
    @pytest.mark.parametrize("l_closed", CLOSED_OPTIONS)
    @pytest.mark.parametrize("r_closed", CLOSED_OPTIONS)
    def test_linear_linear_all_closures(self, l_closed, r_closed):
        rng = np.random.default_rng(11)
        # Quantized so edge-touch cases actually occur.
        lb, le = random_intervals(rng, 150, quantize=3.0)
        rb, re = random_intervals(rng, 150, quantize=3.0)
        l_mod = modified_edges_sorted(lb, le, l_closed)
        r_mod = modified_edges_sorted(rb, re, r_closed)
        dense = dense_intersect_ll(lb, le, rb, re, l_closed, r_closed,
                                   l_mod, r_mod)
        li, ri = intersect_linear_linear_pairs(
            lb, le, rb, re, l_closed, r_closed, True, l_mod, r_mod
        )
        sparse = np.zeros_like(dense)
        sparse[li, ri] = True
        np.testing.assert_array_equal(sparse, dense)

    @pytest.mark.parametrize("closed", CLOSED_OPTIONS)
    def test_point_linear_all_closures(self, closed):
        rng = np.random.default_rng(13)
        rb, re = random_intervals(rng, 150, quantize=3.0)
        # Half the points exactly on interval edges.
        locs = np.concatenate(
            [
                rng.uniform(0, 120, 100),
                rng.choice(np.concatenate([rb, re]), 100),
            ]
        )
        r_mod = modified_edges_sorted(rb, re, closed)
        dense = dense_intersect_pl(locs, rb, re, closed, r_mod)
        pi, ii = intersect_point_linear_pairs(
            locs, rb, re, closed, True, r_mod
        )
        sparse = np.zeros_like(dense)
        sparse[pi, ii] = True
        np.testing.assert_array_equal(sparse, dense)

    def test_enforce_edges_false(self):
        rng = np.random.default_rng(17)
        lb, le = random_intervals(rng, 150, quantize=3.0)
        rb, re = random_intervals(rng, 150, quantize=3.0)
        dense = (le[:, None] > rb[None, :]) & (lb[:, None] < re[None, :])
        li, ri = intersect_linear_linear_pairs(
            lb, le, rb, re, "left_mod", "right_mod", False,
            modified_edges_sorted(lb, le, "left_mod"),
            modified_edges_sorted(rb, re, "right_mod"),
        )
        sparse = np.zeros_like(dense)
        sparse[li, ri] = True
        np.testing.assert_array_equal(sparse, dense)
