"""Exact segment↔cell supercover (raster↔vector assignment) tests.

Ground truth by dense sampling: every cell visited by a dense sample of
points along the segment must be in the cover, and the cover must be a
subset of the conservative bbox cover. Clip lengths must conserve total
segment length (interior points belong to exactly one cell).
"""

import numpy as np
import pyarrow as pa
import pytest

from linref_ray.kernels.cells import (
    cell_of_points,
    cell_size,
    cover_bbox,
    cover_segments,
)

RES = 8  # cell edge 4.0


def _sampled_cells(x0, y0, x1, y1, n=20001):
    t = np.linspace(0.0, 1.0, n)
    px = x0 + t * (x1 - x0)
    py = y0 + t * (y1 - y0)
    return set(zip(*[c.tolist() for c in _grid(px, py)]))


def _grid(x, y):
    g = cell_size(RES)
    return (
        np.floor(np.asarray(x) / g).astype(np.int64),
        np.floor(np.asarray(y) / g).astype(np.int64),
    )


def _rand_segments(n, seed, span=40.0):
    rng = np.random.Generator(np.random.PCG64(seed))
    x0, y0 = rng.uniform(-100, 100, (2, n))
    dx, dy = rng.uniform(-span, span, (2, n))
    return x0, y0, x0 + dx, y0 + dy


def test_supercover_contains_sampled_cells_and_within_bbox():
    x0, y0, x1, y1 = _rand_segments(200, seed=7)
    rows, ix, iy = cover_segments(x0, y0, x1, y1, RES)
    rows_b, cells_b = cover_bbox(x0, y0, x1, y1, RES)
    from linref_ray.kernels.cells import encode_cell

    enc = encode_cell(ix, iy, RES)
    bbox_sets = {}
    for r, c in zip(rows_b.tolist(), cells_b.tolist()):
        bbox_sets.setdefault(r, set()).add(c)
    cover_sets = {}
    for r, c in zip(rows.tolist(), enc.tolist()):
        cover_sets.setdefault(r, set()).add(c)
    for i in range(len(x0)):
        got = {
            (a, b)
            for r, (a, b) in zip(rows.tolist(), zip(ix.tolist(), iy.tolist()))
            if r == i
        }
        want = _sampled_cells(x0[i], y0[i], x1[i], y1[i])
        assert want <= got, f"segment {i}: sampled cells missing from cover"
        assert cover_sets[i] <= bbox_sets[i]


def test_supercover_much_tighter_than_bbox_for_diagonals():
    # A long near-45° diagonal (offset so it never passes through a cell
    # corner): bbox cover is O(n²) cells, supercover O(n).
    x0 = np.array([0.5])
    y0 = np.array([1.7])
    x1 = np.array([160.5])
    y1 = np.array([161.7])
    rows, ix, iy = cover_segments(x0, y0, x1, y1, RES)
    _, cells_b = cover_bbox(x0, y0, x1, y1, RES)
    assert len(ix) < len(cells_b) / 5
    # n cells on each axis → supercover of a diagonal is ~2n-1
    assert len(ix) <= 2 * 41


def test_degenerate_and_axis_aligned():
    x0 = np.array([3.0, 1.0, 5.0])
    y0 = np.array([3.0, 2.0, -10.0])
    x1 = np.array([3.0, 30.0, 5.0])
    y1 = np.array([3.0, 2.0, 10.0])
    rows, ix, iy = cover_segments(x0, y0, x1, y1, RES)
    # point → exactly its own cell
    assert [(a, b) for r, a, b in zip(rows, ix, iy) if r == 0] == [(0, 0)]
    # horizontal → one row of cells
    horiz = [(a, b) for r, a, b in zip(rows, ix, iy) if r == 1]
    assert horiz == [(k, 0) for k in range(0, 8)]
    vert = [(a, b) for r, a, b in zip(rows, ix, iy) if r == 2]
    assert vert == [(1, k) for k in range(-3, 3)]


def test_clip_lengths_conserve_segment_length():
    x0, y0, x1, y1 = _rand_segments(500, seed=11)
    rows, ix, iy, ln = cover_segments(x0, y0, x1, y1, RES, clip_lengths=True)
    total = np.zeros(len(x0))
    np.add.at(total, rows, ln)
    seglen = np.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2)
    np.testing.assert_allclose(total, seglen, rtol=1e-9, atol=1e-9)
    assert (ln >= 0).all()


def test_clip_length_known_diagonal():
    # Unit-slope diagonal across exactly two 4×4 cells, entering at (2,2),
    # crossing the corner-adjacent boundary at (4,4), ending at (6,6).
    rows, ix, iy, ln = cover_segments(
        np.array([2.0]), np.array([2.0]), np.array([6.0]), np.array([6.0]),
        RES, clip_lengths=True,
    )
    got = {(a, b): l for a, b, l in zip(ix.tolist(), iy.tolist(), ln.tolist())}
    # Corner-grazed neighbors (0,1)/(1,0) appear under closed-box semantics
    # but carry zero length; the two traversed cells split √32 evenly.
    nonzero = {k: v for k, v in got.items() if v > 0}
    assert set(nonzero) == {(0, 0), (1, 1)}
    np.testing.assert_allclose(sorted(nonzero.values()), [np.sqrt(8)] * 2)
    assert all(v == 0.0 for k, v in got.items() if k not in nonzero)


def test_segment_cell_cover_dataset(ray_session):
    import ray.data

    from linref_ray.spatial import segment_cell_cover

    x0, y0, x1, y1 = _rand_segments(300, seed=3)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(300, dtype=np.int64)),
            "x0": x0, "y0": y0, "x1": x1, "y1": y1,
        }
    )
    out = segment_cell_cover(
        ray.data.from_arrow(t), RES, keep_cols=("event_id",)
    ).to_pandas()
    rows, ix, iy = cover_segments(x0, y0, x1, y1, RES)
    want = set(zip(rows.tolist(), ix.tolist(), iy.tolist()))
    got = set(zip(out.event_id.tolist(), out.ix.tolist(), out.iy.tolist()))
    assert got == want


def test_route_cell_cover_matches_flat_segments(ray_session):
    from linref_ray.spatial import route_cell_cover
    from linref_ray.synth import make_routes

    routes = make_routes(8, seed=5)
    out = route_cell_cover(routes, RES).to_pandas()
    # Brute force per route
    want = set()
    for rid, xs, ys in zip(
        routes["route_id"].to_pylist(),
        routes["xs"].to_pylist(),
        routes["ys"].to_pylist(),
    ):
        x = np.array(xs)
        y = np.array(ys)
        _, ix, iy = cover_segments(x[:-1], y[:-1], x[1:], y[1:], RES)
        want |= {(rid, a, b) for a, b in zip(ix.tolist(), iy.tolist())}
    got = set(zip(out.route_id, out.ix, out.iy))
    assert got == want


def test_route_cell_cover_mileage_conserves(ray_session):
    from linref_ray.spatial import route_cell_cover
    from linref_ray.synth import make_routes

    routes = make_routes(8, seed=5)
    out = route_cell_cover(routes, RES, clip_lengths=True).to_pandas()
    per_route = out.groupby("route_id").mileage.sum()
    for rid, xs, ys in zip(
        routes["route_id"].to_pylist(),
        routes["xs"].to_pylist(),
        routes["ys"].to_pylist(),
    ):
        x, y = np.array(xs), np.array(ys)
        chord = float(np.sqrt(np.diff(x) ** 2 + np.diff(y) ** 2).sum())
        assert per_route[rid] == pytest.approx(chord, rel=1e-9)


def test_tile_pyramid_levels_conserve_count(ray_session):
    import ray.data

    from linref_ray.spatial import tile_pyramid

    rng = np.random.Generator(np.random.PCG64(23))
    t = pa.table({"x": rng.uniform(-50, 50, 5000), "y": rng.uniform(-50, 50, 5000)})
    out = tile_pyramid(ray.data.from_arrow(t), res=8, levels=3).to_pandas()
    sums = out.groupby("level").n.sum()
    assert set(sums.index) == {0, 1, 2, 3}
    assert (sums == 5000).all()
    # strictly fewer (or equal) cells per coarser level
    cells = out.groupby("level").size()
    assert cells[0] >= cells[1] >= cells[2] >= cells[3]
    # parent relation: every level-1 cell is the shift of some level-0 cell
    l0 = {(a >> 1, b >> 1) for a, b in zip(*out[out.level == 0][["ix", "iy"]].values.T)}
    l1 = set(zip(*out[out.level == 1][["ix", "iy"]].values.T))
    assert l1 == l0


def test_cell_mileage_histogram_conserves_total(ray_session):
    import ray.data

    from linref_ray.spatial import cell_mileage_histogram

    x0, y0, x1, y1 = _rand_segments(400, seed=19)
    t = pa.table({"x0": x0, "y0": y0, "x1": x1, "y1": y1})
    out = cell_mileage_histogram(
        ray.data.from_arrow(t), RES, num_partitions=4
    ).to_pandas()
    total_micro = out.mileage_micro.sum()
    # Each clip length micro-rounds independently; error ≤ 0.5e-6 per pair.
    seglen = np.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2).sum()
    assert abs(total_micro / 1e6 - seglen) < 1e-3
