"""Vectorized interval-relation kernels (the per-partition compute core).

These pure-numpy kernels reproduce the relation semantics of the reference
library's dense broadcast kernels (linref ``events/relate.py:1958-2273``) with
an O((n+m)·log + nnz) sorted-sweep formulation instead of an O(n·m) broadcast:
pairs are enumerated with ``np.searchsorted`` against begin-sorted intervals
plus a running-max-of-ends lower bound (the classic interval-join trick used by
pyranges/bioframe), then exact per-pair tests are applied.

Semantics reproduced exactly (reference file:line cited per function):

- overlay weight = ``min(endL, endR) - max(begL, begR)`` clipped at 0, which is
  algebraically identical to the reference's min-of-four formulation
  (``relate.py:2013-2024``), optional normalization by left/right length with
  zero-length denominators mapping to 0 (``relate.py:2072-2084``), and
  optional profile-integral weighting (``relate.py:2034-2071``).
- intersect tests for point×point, point×linear, and linear×linear with the
  full interval-closure matrix, including the ``*_mod`` modified-edge handling
  (``relate.py:2112-2273``; ``modified_edges`` at ``events/base.py:256-283``).

All kernels operate on a *single group* (one route key); multi-group batches
are driven by :func:`iter_group_segments` at the caller. Measures must be
monotonic (beg <= end), mirroring the reference's precondition
(``relate.py:2003-2004``).
"""

from __future__ import annotations

import numpy as np

CLOSED_OPTIONS = ("left", "left_mod", "right", "right_mod", "both", "neither")


def closed_base(closed: str) -> str:
    """Base closure without the ``_mod`` suffix (``events/common.py:9-10``)."""
    return closed[:-4] if closed.endswith("_mod") else closed


def closed_mod(closed: str) -> bool:
    return closed.endswith("_mod")


def iter_group_segments(codes: np.ndarray):
    """Yield ``(start, stop)`` slices of contiguous equal values in ``codes``.

    ``codes`` must be group-contiguous (e.g. output of a lexsort by group).
    """
    n = len(codes)
    if n == 0:
        return
    # Boundaries where the code changes.
    breaks = np.flatnonzero(codes[1:] != codes[:-1]) + 1
    starts = np.concatenate([[0], breaks])
    stops = np.concatenate([breaks, [n]])
    for a, b in zip(starts, stops):
        yield int(a), int(b)


def segmented_cummax(values: np.ndarray, new_seg: np.ndarray) -> np.ndarray:
    """Inclusive running max within segments (Hillis-Steele scan, O(n log n)).

    ``new_seg`` is a bool array, True at each segment start (``new_seg[0]``
    must be True). Unlike a global ``np.maximum.accumulate``, the running max
    resets at every segment boundary.
    """
    out = np.asarray(values).copy()
    n = len(out)
    if n == 0:
        return out
    idx = np.arange(n)
    seg_start = np.maximum.accumulate(np.where(new_seg, idx, 0))
    dist = idx - seg_start
    step = 1
    while step < n:
        take = np.flatnonzero(dist >= step)
        if not len(take):
            break
        out[take] = np.maximum(out[take], out[take - step])
        step <<= 1
    return out


def expand_pieces(
    rb: np.ndarray, re: np.ndarray, cr: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split each [rb_i, re_i] interval at the sorted cut measures ``cr``
    strictly inside it. Returns ``(row_of, piece_beg, piece_end)`` flat
    arrays (the offsets-trick expansion shared by clip/split)."""
    if len(cr) == 0:
        n = len(rb)
        return np.arange(n, dtype=np.int64), rb.copy(), re.copy()
    lo = np.searchsorted(cr, rb, side="right")
    hi = np.searchsorted(cr, re, side="left")
    n_cut = np.maximum(0, hi - lo)
    n_piece = n_cut + 1
    total = int(n_piece.sum())
    cum = np.concatenate([[0], np.cumsum(n_piece)])[:-1]
    local = np.arange(total) - np.repeat(cum, n_piece)  # piece index j
    row_of = np.repeat(np.arange(len(rb), dtype=np.int64), n_piece)
    # piece j spans [edge_j, edge_{j+1}] where edges are rb, cr[lo:hi], re
    cut_idx = np.repeat(lo, n_piece) + local
    pb = np.where(local == 0, rb[row_of], cr[np.maximum(cut_idx - 1, 0)])
    pe = np.where(
        local == np.repeat(n_cut, n_piece),
        re[row_of],
        cr[np.minimum(cut_idx, len(cr) - 1)],
    )
    return row_of, pb, pe


def group_codes(*arrays: np.ndarray) -> np.ndarray:
    """Integer codes for (possibly multi-column) group keys.

    Equal rows across all arrays get equal codes; codes follow sort order.
    """
    if len(arrays) == 1:
        _, codes = np.unique(arrays[0], return_inverse=True)
        return codes
    # Multi-key: factorize each then combine via unique rows.
    cols = [np.unique(a, return_inverse=True)[1] for a in arrays]
    stacked = np.column_stack(cols)
    _, codes = np.unique(stacked, axis=0, return_inverse=True)
    return codes


def _candidate_pairs(
    l_begs: np.ndarray,
    l_ends: np.ndarray,
    r_begs: np.ndarray,
    r_ends: np.ndarray,
    inclusive: bool,
) -> tuple[np.ndarray, np.ndarray]:
    """Enumerate candidate (left_pos, right_pos) pairs within one group.

    ``l_begs`` must be sorted ascending. Candidates for right interval *r* are
    left intervals with ``begL < endR`` (or ``<=`` when inclusive) and within
    the lower bound implied by the running max of left ends (``cummax >= begR``
    guarantees every excluded prefix has ``endL < begR``). False positives
    remain (nested long intervals) and must be filtered by the exact test.
    """
    n = len(l_begs)
    m = len(r_begs)
    if n == 0 or m == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e.copy()
    cummax_ends = np.maximum.accumulate(l_ends)
    if inclusive:
        ub = np.searchsorted(l_begs, r_ends, side="right")
        lb = np.searchsorted(cummax_ends, r_begs, side="left")
    else:
        ub = np.searchsorted(l_begs, r_ends, side="left")
        lb = np.searchsorted(cummax_ends, r_begs, side="right")
    counts = np.maximum(ub - lb, 0)
    total = int(counts.sum())
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e.copy()
    ri = np.repeat(np.arange(m, dtype=np.int64), counts)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    li = (
        np.arange(total, dtype=np.int64)
        - np.repeat(offsets[:-1], counts)
        + np.repeat(lb, counts)
    )
    return li, ri


def overlay_pairs(
    l_begs: np.ndarray,
    l_ends: np.ndarray,
    r_begs: np.ndarray,
    r_ends: np.ndarray,
    normalize: bool = True,
    norm_by: str = "right",
    profile=None,
    window: tuple[float, float] | None = None,
    return_bounds: bool = False,
):
    """Overlay weights for one group: returns ``(left_pos, right_pos, weight)``.

    Mirrors ``relate.py:1958-2086``. Only nonzero-weight pairs are returned —
    the reference stores its dense result as sparse, and every aggregator
    treats absent and explicit-zero entries identically.

    ``window``: optional ``[lo, hi)`` measure window for salted-bucket
    sharding; overlaps are clipped to the window so that summing a pair's
    weight across all buckets reproduces the unsharded weight exactly
    (overlap length and profile integrals are additive over disjoint windows).
    ``l_begs`` must be sorted ascending.
    """
    if norm_by not in ("right", "left"):
        raise ValueError(f"invalid norm_by {norm_by!r}")
    li, ri = _candidate_pairs(l_begs, l_ends, r_begs, r_ends, inclusive=False)
    if len(li) == 0:
        if return_bounds:
            e = np.empty(0, dtype=np.float64)
            return li, ri, e, e.copy(), e.copy()
        return li, ri, np.empty(0, dtype=np.float64)
    ovl_beg = np.maximum(l_begs[li], r_begs[ri])
    ovl_end = np.minimum(l_ends[li], r_ends[ri])
    if window is not None:
        lo, hi = window
        np.maximum(ovl_beg, lo, out=ovl_beg)
        np.minimum(ovl_end, hi, out=ovl_end)
    keep = ovl_end > ovl_beg
    li, ri = li[keep], ri[keep]
    ovl_beg, ovl_end = ovl_beg[keep], ovl_end[keep]
    if not normalize:
        if return_bounds:
            return li, ri, ovl_end - ovl_beg, ovl_beg, ovl_end
        return li, ri, ovl_end - ovl_beg
    if norm_by == "right":
        ev_begs = r_begs[ri]
        ev_lens = r_ends[ri] - ev_begs
    else:
        ev_begs = l_begs[li]
        ev_lens = l_ends[li] - ev_begs
    safe = np.where(ev_lens == 0, np.inf, ev_lens)
    if profile is None:
        weight = (ovl_end - ovl_beg) / safe
    else:
        a = np.clip((ovl_beg - ev_begs) / safe, 0.0, 1.0)
        b = np.clip((ovl_end - ev_begs) / safe, 0.0, 1.0)
        weight = profile.integral(a, b)
    if return_bounds:
        return li, ri, weight, ovl_beg, ovl_end
    return li, ri, weight


def modified_edges_sorted(
    begs: np.ndarray, ends: np.ndarray, closed: str
) -> np.ndarray:
    """Run-boundary mask for ``*_mod`` closures within ONE group.

    Mirrors ``events/base.py:256-283`` + ``next_overlapping(enforce_edges=True)``
    (``base.py:841-877``): for ``left_mod`` the *last* range of each contiguous
    run (next range does not touch/overlap) is modified; for ``right_mod`` the
    *first*. The caller must pass rows in their within-group standard order.
    """
    n = len(begs)
    if n == 0:
        return np.zeros(0, dtype=bool)
    overlapping_next = begs[1:] <= ends[:-1]
    if closed == "left_mod":
        return np.append(~overlapping_next, True)
    if closed == "right_mod":
        return np.concatenate([[True], ~overlapping_next])
    return np.zeros(n, dtype=bool)


def intersect_linear_linear_pairs(
    l_begs: np.ndarray,
    l_ends: np.ndarray,
    r_begs: np.ndarray,
    r_ends: np.ndarray,
    l_closed: str = "right",
    r_closed: str = "right",
    enforce_edges: bool = True,
    l_modified: np.ndarray | None = None,
    r_modified: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Boolean intersect pairs for linear×linear, mirroring ``relate.py:2190-2273``.

    ``l_begs`` must be sorted ascending; ``l_modified``/``r_modified`` are the
    per-side :func:`modified_edges_sorted` masks (required when the closure is
    a ``*_mod`` variant and ``enforce_edges``).
    """
    li, ri = _candidate_pairs(l_begs, l_ends, r_begs, r_ends, inclusive=True)
    if len(li) == 0:
        return li, ri
    lb, le = l_begs[li], l_ends[li]
    rb, re_ = r_begs[ri], r_ends[ri]
    res = (le > rb) & (lb < re_)
    if enforce_edges:
        test_edges = not (
            (l_closed == "neither" or r_closed == "neither")
            or (l_closed == "left" and r_closed == "left")
            or (l_closed == "right" and r_closed == "right")
        )
        if test_edges:
            test_begs_ends = (l_closed != "right") and (r_closed != "left")
            test_ends_begs = (l_closed != "left") and (r_closed != "right")
            if test_begs_ends:
                mask = ~res
                if l_closed == "right_mod":
                    mask &= l_modified[li]
                if r_closed == "left_mod":
                    mask &= r_modified[ri]
                res |= mask & (lb == re_)
            if test_ends_begs:
                mask = ~res
                if l_closed == "left_mod":
                    mask &= l_modified[li]
                if r_closed == "right_mod":
                    mask &= r_modified[ri]
                res |= mask & (le == rb)
    return li[res], ri[res]


def intersect_point_linear_pairs(
    locs: np.ndarray,
    r_begs: np.ndarray,
    r_ends: np.ndarray,
    r_closed: str = "right",
    enforce_edges: bool = True,
    r_modified: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Point-in-interval pairs ``(point_pos, interval_pos)``; ``relate.py:2139-2188``.

    ``r_begs`` must be sorted ascending (intervals play the "left" role in the
    sweep; output order is (point, interval) to match the reference's
    left=points orientation).
    """
    ii, pi = _candidate_pairs(r_begs, r_ends, locs, locs, inclusive=True)
    if len(ii) == 0:
        return pi, ii
    loc = locs[pi]
    rb, re_ = r_begs[ii], r_ends[ii]
    base = closed_base(r_closed)
    if base in ("left", "both"):
        res = loc >= rb
    else:
        res = loc > rb
    if base in ("right", "both"):
        res &= loc <= re_
    else:
        res &= loc < re_
    if closed_mod(r_closed) and enforce_edges:
        mod = r_modified[ii]
        if base == "left":
            res |= mod & ~res & (loc == re_)
        elif base == "right":
            res |= mod & ~res & (loc == rb)
    return pi[res], ii[res]


def intersect_point_point_pairs(
    l_locs: np.ndarray, r_locs: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Exact loc-equality pairs within one group (``relate.py:2112-2137``).

    ``l_locs`` must be sorted ascending.
    """
    lb = np.searchsorted(l_locs, r_locs, side="left")
    ub = np.searchsorted(l_locs, r_locs, side="right")
    counts = ub - lb
    m = len(r_locs)
    ri = np.repeat(np.arange(m, dtype=np.int64), counts)
    total = int(counts.sum())
    offsets = np.concatenate([[0], np.cumsum(counts)])
    li = (
        np.arange(total, dtype=np.int64)
        - np.repeat(offsets[:-1], counts)
        + np.repeat(lb, counts)
    )
    return li, ri


def find_inside_sorted_group(
    begs: np.ndarray, ends: np.ndarray, enforce_edges: bool = False
) -> np.ndarray:
    """Mask of events fully inside another, one group, any input order.

    Semantics of ``events/analyze.py:116-193``: strict = ``beg > other_beg
    AND end < other_end``; ``enforce_edges`` adds the one-shared-edge cases;
    identical events are never inside each other. Implemented with
    searchsorted prefix-max-of-ends (sorted by beg), which — unlike the
    reference's dominance-envelope test — also catches an event nested in an
    *earlier, shorter* container when a later longer interval shares its beg
    (the reference algorithm misses that corner; we implement the stated
    definition exactly, which is what the SQL oracle checks).
    """
    n = len(begs)
    if n <= 1:
        return np.zeros(n, dtype=bool)
    sort_idx = np.lexsort([-(ends - begs), begs])
    inv = np.argsort(sort_idx)
    b = begs[sort_idx]
    e = ends[sort_idx]
    cummax = np.maximum.accumulate(e)
    idx_lt = np.searchsorted(b, b, side="left")  # #events with beg strictly <
    prefix_lt = np.where(idx_lt > 0, cummax[np.maximum(idx_lt - 1, 0)], -np.inf)
    if enforce_edges:
        idx_le = np.searchsorted(b, b, side="right")  # includes ties + self
        prefix_le = cummax[idx_le - 1]
        inside = (prefix_le > e) | ((idx_lt > 0) & (prefix_lt >= e))
    else:
        inside = (idx_lt > 0) & (prefix_lt > e)
    return inside[inv]


def duplicated_group(
    arrays: list[np.ndarray], keep: str = "first"
) -> np.ndarray:
    """Row-duplicate mask over stacked anchor arrays for one group.

    Mirrors ``events/analyze.py:54-88``.
    """
    n = len(arrays[0])
    if n <= 1:
        return np.zeros(n, dtype=bool)
    study = np.column_stack(arrays)
    if keep == "last":
        study = study[::-1]
    _, uindex, ucounts = np.unique(
        study, axis=0, return_index=True, return_counts=True
    )
    kept = uindex if keep in ("first", "last") else uindex[ucounts == 1]
    mask = np.ones(n, dtype=bool)
    mask[kept] = False
    return mask if keep != "last" else mask[::-1]
