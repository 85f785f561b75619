"""Event-engineering kernels: dissolve, resegment, separate.

Pure-numpy, multi-group (group-code driven) reimplementations of the
reference's event modification semantics (linref ``events/modify.py``),
vectorized across groups wherever the math allows so a single kernel call can
process a whole hash partition of routes.
"""

from __future__ import annotations

import numpy as np

from linref_ray.kernels.intervals import find_inside_sorted_group, iter_group_segments

SEGMENT_FILLS = ("none", "cut", "left", "right", "extend", "balance")


def dissolve_sorted(
    gcodes: np.ndarray, begs: np.ndarray, ends: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Merge consecutive ranges (``end[i] == beg[i+1]`` within a group).

    Mirrors ``events/modify.py:6-100`` + ``consecutive_strings``
    (``events/base.py:915-930``): a run breaks where the next row is not
    exactly consecutive or changes group. Input must be sorted by
    (group, beg, end) — the reference's "standard" order.

    Returns ``(run_id_per_row, out_first_row, out_beg, out_end)`` where
    ``out_*`` are per-run arrays and ``out_first_row`` indexes the first input
    row of each run (for carrying group/attr values through).
    """
    n = len(begs)
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), begs.copy(), ends.copy()
    consecutive = (begs[1:] == ends[:-1]) & (gcodes[1:] == gcodes[:-1])
    run_id = np.concatenate([[0], np.cumsum(~consecutive)]).astype(np.int64)
    first = np.concatenate([[0], np.flatnonzero(~consecutive) + 1])
    last = np.concatenate([np.flatnonzero(~consecutive), [n - 1]])
    return run_id, first, begs[first], ends[last]


def resegment_rows(
    begs: np.ndarray,
    ends: np.ndarray,
    length: float = 1.0,
    fill: str = "cut",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split each event into ``length``-sized windows; fully vectorized.

    Mirrors ``events/modify.py:306-433`` including all six end-gap policies
    and the zero-segment degenerate case. Returns ``(src_row, new_begs,
    new_ends)`` where ``src_row`` maps each output row to its input row.
    """
    if fill not in SEGMENT_FILLS:
        raise ValueError(f"'fill' must be one of {SEGMENT_FILLS}")
    if length <= 0:
        raise ValueError("'length' must be positive")
    n = len(begs)
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return e, begs.copy(), ends.copy()
    lengths = ends - begs
    if fill in ("none", "extend"):
        nseg = np.floor(lengths / length).astype(np.int64)
    else:
        nseg = np.ceil(lengths / length).astype(np.int64)

    if fill == "balance":
        # Per-row: if the remainder past the last grid beg is < length/2 and
        # there is more than one segment, drop the last grid row and extend
        # the previous one; else cut (``modify.py:395-403``).
        last_grid_beg = begs + (nseg - 1) * length
        shrink = ((ends - last_grid_beg) < (length / 2)) & (nseg > 1)
        nseg = np.where(shrink, nseg - 1, nseg)
        fill_row = np.where(shrink, 1, 0)  # 1 => extend, 0 => cut
    else:
        fill_row = None

    repeats = np.maximum(nseg, 1)
    src = np.repeat(np.arange(n, dtype=np.int64), repeats)
    offsets = np.concatenate([[0], np.cumsum(repeats)])
    seg_idx = np.arange(offsets[-1], dtype=np.int64) - np.repeat(
        offsets[:-1], repeats
    )
    new_begs = begs[src] + seg_idx * length
    new_ends = new_begs + length
    is_last = seg_idx == (repeats[src] - 1)

    if fill == "balance":
        row_extend = fill_row[src] == 1
        set_end = is_last  # both cut and extend anchor last end on orig end
        set_left_beg = np.zeros_like(is_last)
        _ = row_extend  # behavior identical once nseg adjusted
    elif fill in ("cut", "left", "extend"):
        set_end = is_last
        set_left_beg = is_last if fill == "left" else np.zeros_like(is_last)
    elif fill == "none":
        # Only degenerate rows (nseg == 0) get their single row cut to orig end.
        set_end = is_last & (nseg[src] == 0)
        set_left_beg = np.zeros_like(is_last)
    else:  # right
        set_end = np.zeros_like(is_last)
        set_left_beg = np.zeros_like(is_last)

    new_ends = np.where(set_end, ends[src], new_ends)
    if set_left_beg.any():
        new_begs = np.where(set_left_beg, ends[src] - length, new_begs)
    return src, new_begs, new_ends


def separate(
    gcodes: np.ndarray,
    begs: np.ndarray,
    ends: np.ndarray,
    anchor: str = "centers",
    method: str = "balanced",
) -> tuple[np.ndarray, np.ndarray]:
    """Resolve overlaps between events of ONE collection; any input order.

    Mirrors ``events/modify.py:435-595``: sort by (group, anchor asc, length
    desc); collapse exact duplicates (keep first) and eclipsed ranges to their
    centers; split each adjacent overlapping valid pair at a point chosen by
    ``method`` (``balanced``/``center``/``left``/``right``). Returns updated
    ``(begs, ends)`` aligned to the input order; zero-length rows are the
    eliminated ones (caller drops them for ``drop_short``).
    """
    if anchor not in ("centers", "begs", "ends"):
        raise ValueError("'anchor' must be one of 'centers','begs','ends'")
    if method not in ("balanced", "center", "left", "right"):
        raise ValueError("'method' must be 'balanced','center','left' or 'right'")
    n = len(begs)
    if n <= 1:
        return begs.copy(), ends.copy()
    centers_in = (begs + ends) / 2
    anchor_arr = {"centers": centers_in, "begs": begs, "ends": ends}[anchor]
    lengths = ends - begs
    sort_idx = np.lexsort([-lengths, anchor_arr, gcodes])
    inv = np.argsort(sort_idx)
    g = gcodes[sort_idx]
    b = begs[sort_idx].copy()
    e = ends[sort_idx].copy()
    centers = (b + e) / 2

    # Exact duplicates on (group, beg, end), keep first in sorted order.
    same = np.zeros(n, dtype=bool)
    for a, z in iter_group_segments(g):
        stacked = np.column_stack([b[a:z], e[a:z]])
        _, uindex = np.unique(stacked, axis=0, return_index=True)
        m = np.ones(z - a, dtype=bool)
        m[uindex] = False
        same[a:z] = m
    # Eclipsed (contained) ranges, edge-touching counts (``modify.py:520``).
    eclipsed = np.zeros(n, dtype=bool)
    for a, z in iter_group_segments(g):
        eclipsed[a:z] = find_inside_sorted_group(b[a:z], e[a:z], enforce_edges=True)

    eliminate = same | eclipsed
    b[eliminate] = centers[eliminate]
    e[eliminate] = centers[eliminate]
    valid_idx = np.flatnonzero(~eliminate)

    if len(valid_idx) > 1:
        pair_same_group = g[valid_idx[:-1]] == g[valid_idx[1:]]
        rights = e[valid_idx[:-1]]
        lefts = b[valid_idx[1:]]
        centers_l = centers[valid_idx[:-1]]
        centers_r = centers[valid_idx[1:]]
        overlapping = pair_same_group & (rights > lefts)
        if method == "center":
            mids = (centers_l + centers_r) / 2
            split_mask = overlapping
        elif method == "left":
            mids = rights
            split_mask = overlapping
        elif method == "right":
            mids = lefts
            split_mask = overlapping
        else:  # balanced, ``modify.py:560-579``
            termini_mids = np.clip((rights + lefts) / 2, centers_l, centers_r)
            center_mids = (centers_l + centers_r) / 2
            termini_valid = (
                overlapping & (rights >= termini_mids) & (lefts <= termini_mids)
            )
            center_valid = (
                overlapping & (rights >= center_mids) & (lefts <= center_mids)
            )
            mids = np.where(termini_valid, termini_mids, rights)
            mids = np.where(center_valid, center_mids, mids)
            split_mask = termini_valid | center_valid
        e[valid_idx[:-1]] = np.where(split_mask, mids, rights)
        b[valid_idx[1:]] = np.where(split_mask, mids, lefts)

    return b[inv], e[inv]


def integrate_group_expand(
    layer_begs: list[np.ndarray],
    layer_ends: list[np.ndarray],
    layer_locs: list[np.ndarray] | None = None,
    fill_gaps: bool = False,
    split_at_locs: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """``integrate(expand=True)`` for one group (``integration.py:110-152``):
    each grid interval is duplicated for every combination of matching
    events across layers (cross product; -1 where a layer has no match).

    Returns ``(out_begs, out_ends, indices)`` with one output row per
    combination. Growth is bounded per interval by the product of per-layer
    match counts — stream-emitted per interval.
    """
    import itertools

    ob, oe, idx, _ = integrate_group(
        layer_begs, layer_ends, layer_locs,
        fill_gaps=True, split_at_locs=split_at_locs,
        all_matches=True,
    )
    # idx here is a list (per interval) of per-layer match-lists.
    out_b, out_e, out_idx = [], [], []
    for k in range(len(ob)):
        per_layer = [m if len(m) else np.array([-1]) for m in idx[k]]
        has_match = any(m[0] != -1 or len(m) > 1 for m in per_layer)
        if not fill_gaps and not has_match:
            continue
        for combo in itertools.product(*per_layer):
            out_b.append(ob[k])
            out_e.append(oe[k])
            out_idx.append(combo)
    return (
        np.asarray(out_b, dtype=np.float64),
        np.asarray(out_e, dtype=np.float64),
        np.asarray(out_idx, dtype=np.int64).reshape(len(out_b), len(layer_begs)),
    )


def integrate_group(
    layer_begs: list[np.ndarray],
    layer_ends: list[np.ndarray],
    layer_locs: list[np.ndarray] | None = None,
    fill_gaps: bool = False,
    split_at_locs: bool = False,
    all_matches: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Least-common-interval union of N layers within ONE group.

    Mirrors ``events/integration.py:6-161`` (non-expand path): collect all
    beg/end edges (plus locs when ``split_at_locs``), unique them into a
    consecutive interval grid, then map each interval to the *first* matching
    event per layer (argmax over intersect with ``enforce_edges=False``).

    Returns ``(out_begs, out_ends, indices, covered)`` where ``indices`` is an
    ``(n_intervals, n_layers)`` int array of matched within-layer positions
    (-1 = no match) and ``covered`` marks intervals matched by any layer.
    """
    edges = []
    for i in range(len(layer_begs)):
        edges.append(layer_begs[i])
        edges.append(layer_ends[i])
        if split_at_locs and layer_locs is not None and layer_locs[i] is not None:
            edges.append(layer_locs[i])
    unique_edges = np.unique(np.concatenate(edges))
    out_begs = unique_edges[:-1]
    out_ends = unique_edges[1:]
    k = len(out_begs)
    n_layers = len(layer_begs)
    indices = np.full((k, n_layers), -1, dtype=np.int64)
    match_lists: list[list[np.ndarray]] | None = None
    if all_matches:
        match_lists = [
            [np.empty(0, dtype=np.int64) for _ in range(n_layers)]
            for _ in range(k)
        ]
    for i in range(n_layers):
        lb, le = layer_begs[i], layer_ends[i]
        if len(lb) == 0 or k == 0:
            continue
        order = np.argsort(lb, kind="stable")
        lb_s, le_s = lb[order], le[order]
        # First event (in original layer order) strictly overlapping each grid
        # interval: the reference argmaxes over the boolean intersect row,
        # which returns the first original-position match.
        cummax = np.maximum.accumulate(le_s)
        lo = np.searchsorted(cummax, out_begs, side="right")
        hi = np.searchsorted(lb_s, out_ends, side="left")
        counts = np.maximum(hi - lo, 0)
        ii = np.repeat(np.arange(k, dtype=np.int64), counts)
        offs = np.concatenate([[0], np.cumsum(counts)])
        jj = (
            np.arange(int(counts.sum()), dtype=np.int64)
            - np.repeat(offs[:-1], counts)
            + np.repeat(lo, counts)
        )
        ok = (le_s[jj] > out_begs[ii]) & (lb_s[jj] < out_ends[ii])
        ii, jj = ii[ok], jj[ok]
        orig = order[jj]
        # First original position per interval (and, if requested, the full
        # per-interval match lists for the expand path).
        if len(ii):
            sorter = np.lexsort([orig, ii])
            ii_s, orig_s = ii[sorter], orig[sorter]
            first_mask = np.concatenate([[True], ii_s[1:] != ii_s[:-1]])
            indices[ii_s[first_mask], i] = orig_s[first_mask]
            if all_matches:
                starts = np.flatnonzero(first_mask)
                bounds = np.concatenate([starts, [len(ii_s)]])
                for s, z in zip(bounds[:-1], bounds[1:]):
                    match_lists[ii_s[s]][i] = orig_s[s:z]
    if all_matches:
        covered = (indices >= 0).any(axis=1)
        if not fill_gaps:
            keep = np.flatnonzero(covered)
            out_begs = out_begs[keep]
            out_ends = out_ends[keep]
            match_lists = [match_lists[j] for j in keep]
            covered = np.ones(len(out_begs), dtype=bool)
        return out_begs, out_ends, match_lists, covered
    covered = (indices >= 0).any(axis=1)
    if not fill_gaps:
        out_begs = out_begs[covered]
        out_ends = out_ends[covered]
        indices = indices[covered]
        covered = np.ones(len(out_begs), dtype=bool)
    return out_begs, out_ends, indices, covered
