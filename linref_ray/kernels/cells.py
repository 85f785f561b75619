"""Hierarchical grid-cell spatial index (H3/S2 stand-in), pure numpy.

The reference snaps points to routes with a GEOS STRtree inside geopandas
(``ext/base.py:3056-3171``). At cluster scale we replace the tree with a
cell-keyed index: a square grid at a chosen resolution, cells identified by a
64-bit Morton (Z-order) code — the same public interleaved-bits construction
S2/H3 cell ids are built on. Points map to one cell; route segments map to
every cell their bounding box touches (conservative cover). Joining on the
cell id co-locates candidate (point, segment) pairs.

Layout of a cell id: ``res`` (5 bits, 58..62) | interleaved (ix, iy) Morton
code (58 bits). Coordinates are offset by ``ORIGIN`` so negative coordinates
stay representable.
"""

from __future__ import annotations

import numpy as np

ORIGIN = 1 << 28  # grid index offset applied to ix/iy before encoding
_RES_SHIFT = 58


def cell_size(res: int) -> float:
    """Edge length of a cell at resolution ``res`` (halves per level)."""
    return 2.0 ** (10 - res)


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 29 bits of v so there is a zero bit between each."""
    v = v.astype(np.uint64)
    v &= np.uint64(0x1FFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def encode_cell(ix: np.ndarray, iy: np.ndarray, res: int) -> np.ndarray:
    """Morton-encode integer grid coordinates into uint64 cell ids."""
    ix = np.asarray(ix, dtype=np.int64) + ORIGIN
    iy = np.asarray(iy, dtype=np.int64) + ORIGIN
    code = _part1by1(ix) | (_part1by1(iy) << np.uint64(1))
    return code | (np.uint64(res) << np.uint64(_RES_SHIFT))


def cell_of_points(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    """Cell id containing each (x, y) point."""
    g = cell_size(res)
    ix = np.floor(np.asarray(x, dtype=np.float64) / g).astype(np.int64)
    iy = np.floor(np.asarray(y, dtype=np.float64) / g).astype(np.int64)
    return encode_cell(ix, iy, res)


def grid_of_points(x: np.ndarray, y: np.ndarray, res: int):
    """(ix, iy) integer grid coordinates — SQL-oracle-friendly cell identity."""
    g = cell_size(res)
    ix = np.floor(np.asarray(x, dtype=np.float64) / g).astype(np.int64)
    iy = np.floor(np.asarray(y, dtype=np.float64) / g).astype(np.int64)
    return ix, iy


def _grid_candidates(
    x0: np.ndarray,
    y0: np.ndarray,
    x1: np.ndarray,
    y1: np.ndarray,
    res: int,
    pad: float = 0.0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Ragged bbox→grid expansion: ``(row_index, ix, iy)`` per candidate cell.

    Each input bbox (+pad) emits every grid cell its closed extent touches —
    the conservative candidate set the exact tests below refine.
    """
    g = cell_size(res)
    ix0 = np.floor((np.minimum(x0, x1) - pad) / g).astype(np.int64)
    ix1 = np.floor((np.maximum(x0, x1) + pad) / g).astype(np.int64)
    iy0 = np.floor((np.minimum(y0, y1) - pad) / g).astype(np.int64)
    iy1 = np.floor((np.maximum(y0, y1) + pad) / g).astype(np.int64)
    nx = ix1 - ix0 + 1
    ny = iy1 - iy0 + 1
    counts = nx * ny
    total = int(counts.sum())
    rows = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    offs = np.concatenate([[0], np.cumsum(counts)])
    local = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], counts)
    lx = local % np.repeat(nx, counts)
    ly = local // np.repeat(nx, counts)
    return rows, np.repeat(ix0, counts) + lx, np.repeat(iy0, counts) + ly


def cover_bbox(
    x0: np.ndarray,
    y0: np.ndarray,
    x1: np.ndarray,
    y1: np.ndarray,
    res: int,
    pad: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Cells covering each bbox (+pad): returns ``(row_index, cell_id)`` pairs.

    Vectorized ragged expansion: each input row emits ``nx·ny`` cells.
    """
    rows, ix, iy = _grid_candidates(x0, y0, x1, y1, res, pad)
    return rows, encode_cell(ix, iy, res)


def cover_segments(
    x0: np.ndarray,
    y0: np.ndarray,
    x1: np.ndarray,
    y1: np.ndarray,
    res: int,
    clip_lengths: bool = False,
):
    """EXACT supercover: the grid cells each segment actually intersects.

    This is the raster↔vector assignment primitive (BASELINE.json north
    rule): bbox candidates from :func:`_grid_candidates`, refined by the
    separating-axis test for a segment vs an axis-aligned box.  The x/y
    axes are already satisfied by bbox overlap (a segment's x-projection IS
    its bbox x-extent), leaving only the segment-normal axis: the box
    intersects iff its four corners do not lie strictly on one side of the
    segment's supporting line, i.e. ``min(d) <= 0 <= max(d)`` with
    ``d = dx·(cy−y0) − dy·(cx−x0)``.  Closed-box semantics: a segment
    grazing a cell corner or running along an edge counts for both cells
    (measure-zero for float data).

    With ``clip_lengths=True`` also returns the Liang–Barsky clipped length
    of the segment inside each kept cell (tangential cells clip to 0);
    interior points belong to exactly one cell, so per-segment clip lengths
    sum to the segment length — the conservation law the tests assert.

    Returns ``(row_index, ix, iy)`` or ``(row_index, ix, iy, clip_len)``.
    The arithmetic (operand order included) deliberately mirrors the DuckDB
    oracle in ``__ray_entry__`` so outputs match bitwise.
    """
    x0 = np.asarray(x0, dtype=np.float64)
    y0 = np.asarray(y0, dtype=np.float64)
    x1 = np.asarray(x1, dtype=np.float64)
    y1 = np.asarray(y1, dtype=np.float64)
    rows, ix, iy = _grid_candidates(x0, y0, x1, y1, res)
    g = cell_size(res)
    dx = x1[rows] - x0[rows]
    dy = y1[rows] - y0[rows]
    sx, sy = x0[rows], y0[rows]
    cx0 = ix.astype(np.float64) * g
    cx1 = (ix + 1).astype(np.float64) * g
    cy0 = iy.astype(np.float64) * g
    cy1 = (iy + 1).astype(np.float64) * g
    d00 = dx * (cy0 - sy) - dy * (cx0 - sx)
    d10 = dx * (cy0 - sy) - dy * (cx1 - sx)
    d01 = dx * (cy1 - sy) - dy * (cx0 - sx)
    d11 = dx * (cy1 - sy) - dy * (cx1 - sx)
    dmin = np.minimum(np.minimum(d00, d10), np.minimum(d01, d11))
    dmax = np.maximum(np.maximum(d00, d10), np.maximum(d01, d11))
    keep = (dmin <= 0.0) & (dmax >= 0.0)
    rows, ix, iy = rows[keep], ix[keep], iy[keep]
    if not clip_lengths:
        return rows, ix, iy
    dx, dy, sx, sy = dx[keep], dy[keep], sx[keep], sy[keep]
    cx0, cx1, cy0, cy1 = cx0[keep], cx1[keep], cy0[keep], cy1[keep]
    with np.errstate(divide="ignore", invalid="ignore"):
        tax = (cx0 - sx) / dx
        tbx = (cx1 - sx) / dx
        tay = (cy0 - sy) / dy
        tby = (cy1 - sy) / dy
    # Zero-extent axis: candidate generation already guarantees the segment
    # lies inside the cell's slab on that axis, so the slab never clips.
    zx, zy = dx == 0.0, dy == 0.0
    tlx = np.where(zx, 0.0, np.minimum(tax, tbx))
    thx = np.where(zx, 1.0, np.maximum(tax, tbx))
    tly = np.where(zy, 0.0, np.minimum(tay, tby))
    thy = np.where(zy, 1.0, np.maximum(tay, tby))
    tenter = np.maximum(np.maximum(tlx, tly), 0.0)
    texit = np.minimum(np.minimum(thx, thy), 1.0)
    frac = np.maximum(texit - tenter, 0.0)
    seglen = np.sqrt(dx * dx + dy * dy)
    return rows, ix, iy, frac * seglen
