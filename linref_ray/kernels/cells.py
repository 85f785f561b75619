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
    cells = encode_cell(np.repeat(ix0, counts) + lx, np.repeat(iy0, counts) + ly, res)
    return rows, cells
