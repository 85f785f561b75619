"""Pure-numpy M-polyline geometry kernels.

Replaces the reference's shapely-backed ``LineStringM`` layer (linref
``geometry/linestring_m.py``, ``geometry/operations.py``,
``geometry/utilities.py``) with ragged-array kernels that operate directly on
Arrow ``list<double>`` columns (flat value arrays + offsets) — no geometry
objects are ever constructed inside a batch.

A route geometry is ``(xs, ys, ms)`` with one M per vertex, M strictly
non-decreasing (``linestring_m.py:87-91``). Interpolation uses the same
``a + t * (b - a)`` lerp as the reference's ``substring_m_coords``
(``geometry/utilities.py:104-107``) so adjacent substrings share exact
boundary coordinates.
"""

from __future__ import annotations

import numpy as np


def cumdist(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Cumulative chord length per vertex of one polyline."""
    dx = np.diff(xs)
    dy = np.diff(ys)
    out = np.empty(len(xs), dtype=np.float64)
    out[0] = 0.0
    np.cumsum(np.sqrt(dx * dx + dy * dy), out=out[1:])
    return out


def m_to_distance(ms: np.ndarray, cd: np.ndarray, m_query: np.ndarray) -> np.ndarray:
    """Piecewise-linear M → chord distance for one polyline.

    Mirrors ``geometry/operations.py:238-290``: searchsorted segment lookup,
    clipped to valid range, zero-length segments produce prop = 0.
    """
    m_query = np.asarray(m_query, dtype=np.float64)
    idx = np.clip(np.searchsorted(ms, m_query), 1, len(ms) - 1)
    m0, m1 = ms[idx - 1], ms[idx]
    span = m1 - m0
    prop = np.divide(
        m_query - m0, span, out=np.zeros_like(m_query), where=span > 0
    )
    prop = np.clip(prop, 0.0, 1.0)
    return cd[idx - 1] + (cd[idx] - cd[idx - 1]) * prop


def distance_to_m(ms: np.ndarray, cd: np.ndarray, dist: np.ndarray) -> np.ndarray:
    """Chord distance → M for one polyline (``operations.py:100-155``)."""
    dist = np.asarray(dist, dtype=np.float64)
    idx = np.clip(np.searchsorted(cd, dist), 1, len(cd) - 1)
    d0, d1 = cd[idx - 1], cd[idx]
    span = d1 - d0
    prop = np.divide(dist - d0, span, out=np.zeros_like(dist), where=span > 0)
    prop = np.clip(prop, 0.0, 1.0)
    return ms[idx - 1] + (ms[idx] - ms[idx - 1]) * prop


def interpolate_at_m(
    xs: np.ndarray, ys: np.ndarray, ms: np.ndarray, m_query: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(x, y) point at measure M on one polyline (``operations.py:158-203``)."""
    m_query = np.asarray(m_query, dtype=np.float64)
    idx = np.clip(np.searchsorted(ms, m_query), 1, len(ms) - 1)
    m0, m1 = ms[idx - 1], ms[idx]
    span = m1 - m0
    t = np.divide(m_query - m0, span, out=np.zeros_like(m_query), where=span > 0)
    t = np.clip(t, 0.0, 1.0)
    px = xs[idx - 1] + t * (xs[idx] - xs[idx - 1])
    py = ys[idx - 1] + t * (ys[idx] - ys[idx - 1])
    return px, py


def substring_by_distance(
    coords: np.ndarray,
    m: np.ndarray,
    start: float,
    end: float,
    normalized: bool = False,
    tolerance: float = 1e-10,
) -> tuple[np.ndarray, np.ndarray]:
    """Cut a polyline between two chord distances.

    Parity target: ``geometry/utilities.py:59-183`` (``substring_m_coords``) —
    same lerp formulation, ends-only tolerance dedup, zero-length handling —
    so adjacent substrings share exact boundary coordinates
    (asserted by reference ``tests/test_geometry.py:341-378``).
    """
    if start > end:
        raise ValueError("Start value must be less than or equal to end value.")
    diff = np.diff(coords, axis=0)
    seg_len = np.sqrt(np.sum(diff * diff, axis=1))
    cd = np.empty(len(coords), dtype=np.float64)
    cd[0] = 0.0
    np.cumsum(seg_len, out=cd[1:])
    if normalized:
        cd = cd / cd[-1]

    def _interp(distance):
        if distance <= 0:
            return 0, coords[0].copy(), m[0]
        if distance >= cd[-1]:
            return len(cd) - 1, coords[-1].copy(), m[-1]
        idx = int(np.argmax(cd >= distance))
        t = (distance - cd[idx - 1]) / (cd[idx] - cd[idx - 1])
        coord = coords[idx - 1] + t * (coords[idx] - coords[idx - 1])
        m_val = m[idx - 1] + t * (m[idx] - m[idx - 1])
        return idx, coord, m_val

    s_idx, s_coord, s_m = _interp(start)
    e_idx, e_coord, e_m = _interp(end)
    n_mid = max(0, e_idx - s_idx)
    out_c = np.empty((2 + n_mid, coords.shape[1]), dtype=coords.dtype)
    out_m = np.empty(2 + n_mid, dtype=m.dtype)
    out_c[0], out_m[0] = s_coord, s_m
    if n_mid:
        out_c[1 : 1 + n_mid] = coords[s_idx:e_idx]
        out_m[1 : 1 + n_mid] = m[s_idx:e_idx]
    out_c[-1], out_m[-1] = e_coord, e_m

    tol_sq = tolerance * tolerance
    if len(out_c) > 2:
        d = out_c[0] - out_c[1]
        if d @ d <= tol_sq and abs(out_m[0] - out_m[1]) <= tolerance:
            out_c, out_m = out_c[1:], out_m[1:]
    if len(out_c) > 2:
        d = out_c[-1] - out_c[-2]
        if d @ d <= tol_sq and abs(out_m[-1] - out_m[-2]) <= tolerance:
            out_c, out_m = out_c[:-1], out_m[:-1]
    if len(out_c) < 2:
        out_c = np.array([out_c[0], out_c[0]])
        out_m = np.array([out_m[0], out_m[0]])
    return out_c, out_m


def substring_by_m_many(
    xs: np.ndarray,
    ys: np.ndarray,
    ms: np.ndarray,
    m_beg: np.ndarray,
    m_end: np.ndarray,
    tolerance: float = 1e-10,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized :func:`substring_by_m` for MANY [beg, end] ranges on ONE
    polyline: returns ``(lengths, flat_x, flat_y, flat_m)`` where row i's
    substring occupies ``flat_*[off[i] : off[i] + lengths[i]]``
    (``off = cumsum`` of lengths).

    Bit-exact parity with the scalar kernel (same lerp, ends-only tolerance
    dedup, zero-length [v, v] padding) — asserted by a differential test —
    with no per-row Python loop: boundary interpolation, mid-vertex ranges
    and the dedup flags are all computed as arrays, then scattered into one
    flat buffer via the offsets trick.
    """
    m_beg = np.asarray(m_beg, dtype=np.float64)
    m_end = np.asarray(m_end, dtype=np.float64)
    if np.any(m_beg > m_end):
        raise ValueError("Start value must be less than or equal to end value.")
    n = len(m_beg)
    if n == 0:
        z = np.empty(0, dtype=np.float64)
        return np.empty(0, dtype=np.int64), z, z, z
    cd = cumdist(xs, ys)
    d0 = m_to_distance(ms, cd, m_beg)
    d1 = m_to_distance(ms, cd, m_end)

    def interp(d):
        # scalar _interp of substring_by_distance, vectorized
        idx = np.searchsorted(cd, d, side="left")
        idx_c = np.clip(idx, 1, len(cd) - 1)
        span = cd[idx_c] - cd[idx_c - 1]
        t = np.divide(
            d - cd[idx_c - 1], span, out=np.zeros_like(d), where=span > 0
        )
        px = xs[idx_c - 1] + t * (xs[idx_c] - xs[idx_c - 1])
        py = ys[idx_c - 1] + t * (ys[idx_c] - ys[idx_c - 1])
        pm = ms[idx_c - 1] + t * (ms[idx_c] - ms[idx_c - 1])
        lo = d <= 0
        hi = d >= cd[-1]
        idx_out = np.where(lo, 0, np.where(hi, len(cd) - 1, idx_c))
        px = np.where(lo, xs[0], np.where(hi, xs[-1], px))
        py = np.where(lo, ys[0], np.where(hi, ys[-1], py))
        pm = np.where(lo, ms[0], np.where(hi, ms[-1], pm))
        return idx_out, px, py, pm

    s_idx, s_x, s_y, s_m = interp(d0)
    e_idx, e_x, e_y, e_m = interp(d1)
    n_mid = np.maximum(0, e_idx - s_idx)

    tol_sq = tolerance * tolerance
    # First-point dedup (needs an existing mid vertex: out[1] == coords[s_idx])
    has_mid = n_mid >= 1
    si = np.where(has_mid, s_idx, 0)
    dx, dy = s_x - xs[si], s_y - ys[si]
    first_dup = has_mid & (dx * dx + dy * dy <= tol_sq) & (
        np.abs(s_m - ms[si]) <= tolerance
    )
    # Last-point dedup (after a possible first removal there must still be a
    # mid vertex left: out[-2] == coords[e_idx - 1])
    mid_left = n_mid - first_dup.astype(np.int64) >= 1
    ei = np.where(n_mid >= 1, e_idx - 1, 0)
    dx, dy = e_x - xs[ei], e_y - ys[ei]
    last_dup = mid_left & (dx * dx + dy * dy <= tol_sq) & (
        np.abs(e_m - ms[ei]) <= tolerance
    )

    head = (~first_dup).astype(np.int64)
    tail = (~last_dup).astype(np.int64)
    pre_len = head + n_mid + tail
    pad = (pre_len == 1).astype(np.int64)  # degenerate: duplicate the point
    lengths = pre_len + pad
    total = int(lengths.sum())
    off = np.concatenate([[0], np.cumsum(lengths)])[:-1]

    fx = np.empty(total, dtype=np.float64)
    fy = np.empty(total, dtype=np.float64)
    fm = np.empty(total, dtype=np.float64)
    # heads
    hrows = np.flatnonzero(head)
    fx[off[hrows]] = s_x[hrows]
    fy[off[hrows]] = s_y[hrows]
    fm[off[hrows]] = s_m[hrows]
    # mids: flat positions via the repeat/arange offsets trick
    tot_mid = int(n_mid.sum())
    if tot_mid:
        mid_cum = np.concatenate([[0], np.cumsum(n_mid)])[:-1]
        local = np.arange(tot_mid) - np.repeat(mid_cum, n_mid)
        pos = np.repeat(off + head, n_mid) + local
        vidx = np.repeat(s_idx, n_mid) + local
        fx[pos] = xs[vidx]
        fy[pos] = ys[vidx]
        fm[pos] = ms[vidx]
    # tails
    trows = np.flatnonzero(tail)
    tpos = off[trows] + head[trows] + n_mid[trows]
    fx[tpos] = e_x[trows]
    fy[tpos] = e_y[trows]
    fm[tpos] = e_m[trows]
    # degenerate pad: the single surviving point, duplicated
    prows = np.flatnonzero(pad)
    if len(prows):
        fx[off[prows] + 1] = fx[off[prows]]
        fy[off[prows] + 1] = fy[off[prows]]
        fm[off[prows] + 1] = fm[off[prows]]
    return lengths, fx, fy, fm


def substring_by_m(
    xs: np.ndarray,
    ys: np.ndarray,
    ms: np.ndarray,
    m_beg: float,
    m_end: float,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cut a polyline between two M values (M → distance → substring)."""
    cd = cumdist(xs, ys)
    d0, d1 = m_to_distance(ms, cd, np.array([m_beg, m_end]))
    coords = np.column_stack([xs, ys])
    out_c, out_m = substring_by_distance(coords, ms, float(d0), float(d1))
    return out_c[:, 0], out_c[:, 1], out_m


def project_point_to_polyline(
    xs: np.ndarray, ys: np.ndarray, ms: np.ndarray, px: float, py: float
) -> tuple[float, float]:
    """Nearest point on one polyline: returns ``(m_at_projection, distance)``.

    Vectorized over segments: clamp the scalar projection of the point onto
    each segment, take the global min squared distance, then lerp M within the
    winning segment.
    """
    ax, ay = xs[:-1], ys[:-1]
    bx, by = xs[1:], ys[1:]
    vx, vy = bx - ax, by - ay
    seg2 = vx * vx + vy * vy
    t = np.divide(
        (px - ax) * vx + (py - ay) * vy,
        seg2,
        out=np.zeros_like(seg2),
        where=seg2 > 0,
    )
    t = np.clip(t, 0.0, 1.0)
    cx, cy = ax + t * vx, ay + t * vy
    d2 = (px - cx) ** 2 + (py - cy) ** 2
    k = int(np.argmin(d2))
    m_val = ms[k] + t[k] * (ms[k + 1] - ms[k])
    return float(m_val), float(np.sqrt(d2[k]))


def bearing(x0, y0, x1, y1) -> np.ndarray:
    """Bearing in degrees clockwise from north (``utility/direction.py:7-40``)."""
    ang = np.degrees(np.arctan2(np.asarray(x1) - x0, np.asarray(y1) - y0))
    return np.mod(ang, 360.0)


_CARDINAL_8 = ["N", "NE", "E", "SE", "S", "SW", "W", "NW"]
_CARDINAL_4 = ["N", "E", "S", "W"]


def cardinal_direction(bearings: np.ndarray, n: int = 8) -> np.ndarray:
    """Compass label for bearings, 4- or 8-wind (``utility/direction.py:43-76``)."""
    bearings = np.asarray(bearings, dtype=np.float64)
    if n == 8:
        labels, width = _CARDINAL_8, 45.0
    elif n == 4:
        labels, width = _CARDINAL_4, 90.0
    else:
        raise ValueError("n must be 4 or 8")
    idx = (np.floor(np.mod(bearings + width / 2, 360.0) / width)).astype(int)
    return np.asarray(labels, dtype=object)[idx]


def merge_chains(
    first_pts: np.ndarray, last_pts: np.ndarray, tolerance: float = 1e-8
) -> tuple[np.ndarray, np.ndarray]:
    """Order line fragments into contiguous chains by matching termini.

    Mirrors the grow-at-both-ends chaining of ``geometry/merge.py:9-173``:
    starting from an unused fragment, repeatedly append a fragment whose first
    point matches the chain's tail (forward) or whose last point matches the
    chain's head (prepend). Fragments are never reversed (M must stay
    monotonic). Returns ``(chain_id, position_in_chain)`` per fragment.

    O(n²) within a group is acceptable — fragments per route are few.
    """
    n = len(first_pts)
    chain_id = np.full(n, -1, dtype=np.int64)
    pos = np.zeros(n, dtype=np.int64)
    used = np.zeros(n, dtype=bool)

    def _match(pt, candidates_pts):
        d = candidates_pts - pt
        d2 = (d * d).sum(axis=1)
        hits = np.flatnonzero((d2 <= tolerance * tolerance) & ~used)
        return int(hits[0]) if len(hits) else -1

    next_chain = 0
    for seed in range(n):
        if used[seed]:
            continue
        chain = [seed]
        used[seed] = True
        # Grow forward from tail.
        while True:
            j = _match(last_pts[chain[-1]], first_pts)
            if j < 0:
                break
            chain.append(j)
            used[j] = True
        # Grow backward from head.
        while True:
            j = _match(first_pts[chain[0]], last_pts)
            if j < 0:
                break
            chain.insert(0, j)
            used[j] = True
        for p, frag in enumerate(chain):
            chain_id[frag] = next_chain
            pos[frag] = p
        next_chain += 1
    return chain_id, pos
