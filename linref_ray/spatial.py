"""Spatial layer: cell-indexed point→route snapping, tiles, intersections.

Replaces the reference's GEOS STRtree spatial joins (linref
``ext/base.py:3056-3171`` project, ``ext/spatial.py:562-743`` intersection
pairs/nodes) with the engine's cell-keyed design:

- The route network is the SMALL side (routes ≪ points/images at any scale),
  so it is broadcast once: ``build_route_index`` flattens every route into
  per-segment arrays plus a Morton-cell → segment hash, ``ray.put`` ships it
  to the object store once, and ``SnapPoints`` — an actor-pool
  ``map_batches`` class — reads it in ``__init__`` (once per actor, never
  per batch). No shuffle at all for the snap.
- For a route set too large to broadcast, the documented alternative is the
  cell-keyed shuffle (explode routes to cells, join points on cell) — the
  same kernels apply; this module implements the broadcast path as the
  realistic one for the 10^12-image north star.
- Tile histograms are a ``groupby(cell)`` over slim (cell,) rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from linref_ray.kernels.cells import (
    cell_of_points,
    cell_size,
    cover_bbox,
    cover_segments,
)
from linref_ray.kernels.geometry import cumdist
from linref_ray.kernels.intervals import expand_pieces


class RouteIndex:
    """Flattened segment arrays + cell→segments hash for a route network."""

    def __init__(self, routes: pa.Table, res: int = 8, pad: float = 5.0):
        xs = routes["xs"].to_pylist()
        ys = routes["ys"].to_pylist()
        ms = routes["ms"].to_pylist()
        self.route_ids = np.asarray(routes["route_id"].to_pylist())
        ax, ay, bx, by, m0, m1, ridx = [], [], [], [], [], [], []
        for i, (x, y, m) in enumerate(zip(xs, ys, ms)):
            x = np.asarray(x)
            y = np.asarray(y)
            m = np.asarray(m)
            ax.append(x[:-1])
            ay.append(y[:-1])
            bx.append(x[1:])
            by.append(y[1:])
            m0.append(m[:-1])
            m1.append(m[1:])
            ridx.append(np.full(len(x) - 1, i, dtype=np.int64))
        self.ax = np.concatenate(ax)
        self.ay = np.concatenate(ay)
        self.bx = np.concatenate(bx)
        self.by = np.concatenate(by)
        self.m0 = np.concatenate(m0)
        self.m1 = np.concatenate(m1)
        self.ridx = np.concatenate(ridx)
        self.res = res
        self.pad = pad
        rows, cells = cover_bbox(
            self.ax, self.ay, self.bx, self.by, res, pad=pad
        )
        order = np.argsort(cells, kind="stable")
        cells_s = cells[order]
        self._cell_keys, starts = np.unique(cells_s, return_index=True)
        self._cell_offsets = np.concatenate([starts, [len(cells_s)]])
        self._cell_segs = rows[order]

    def candidates(self, cell_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(query_row, segment_id) candidate pairs for an array of cells."""
        pos = np.searchsorted(self._cell_keys, cell_ids)
        pos = np.clip(pos, 0, len(self._cell_keys) - 1)
        hit = self._cell_keys[pos] == cell_ids
        lo = np.where(hit, self._cell_offsets[pos], 0)
        hi = np.where(hit, self._cell_offsets[pos + 1], 0)
        counts = hi - lo
        qi = np.repeat(np.arange(len(cell_ids), dtype=np.int64), counts)
        offs = np.concatenate([[0], np.cumsum(counts)])
        si = (
            np.arange(int(counts.sum()), dtype=np.int64)
            - np.repeat(offs[:-1], counts)
            + np.repeat(lo, counts)
        )
        return qi, self._cell_segs[si]


def build_route_index(
    routes: pa.Table | ray.data.Dataset, res: int = 8, pad: float = 5.0
):
    """Build + broadcast the route index; returns an ObjectRef.

    Routes are collected to the driver — they are the small side by design
    (document: a 1M-segment network is ~100 MB of arrays). ``ray.put`` ONCE;
    every snap actor reads the same object-store copy (zero per-task
    re-shipping).
    """
    if isinstance(routes, ray.data.Dataset):
        routes = pa.concat_tables(
            ray.get(routes.to_arrow_refs()), promote_options="default"
        )
    return ray.put(RouteIndex(routes, res=res, pad=pad))


def _project_candidates(idx: "RouteIndex", x, y, qi, si):
    """Project points onto their candidate segments: (distance, measure).

    Clamped orthogonal projection onto each segment, measure linearly
    interpolated between the segment's m-endpoints — the vectorized heart
    shared by the nearest (``SnapPoints``) and top-k (``KnnRoutes``) stages.
    """
    axp, ayp = idx.ax[si], idx.ay[si]
    vx = idx.bx[si] - axp
    vy = idx.by[si] - ayp
    seg2 = vx * vx + vy * vy
    t = np.divide(
        (x[qi] - axp) * vx + (y[qi] - ayp) * vy,
        seg2,
        out=np.zeros_like(seg2),
        where=seg2 > 0,
    )
    t = np.clip(t, 0.0, 1.0)
    dx = x[qi] - (axp + t * vx)
    dy = y[qi] - (ayp + t * vy)
    d = np.sqrt(dx * dx + dy * dy)
    m = idx.m0[si] + t * (idx.m1[si] - idx.m0[si])
    return d, m


class SnapPoints:
    """Actor-pool ``map_batches`` stage: snap (x, y) points to the nearest
    route within ``buffer``, yielding ``route_id, loc (M), snap_dist``.

    The reference analog is ``df.lr.project`` (``ext/base.py:3056-3171``):
    ``sjoin_nearest(max_distance=buffer)`` + vectorized locate. Nearest-match
    dedup is deterministic: (distance, route index, segment index).
    """

    def __init__(
        self,
        index_ref,
        buffer: float = 5.0,
        x_col: str = "x",
        y_col: str = "y",
        keep_unmatched: bool = False,
        emit_code: bool = False,
    ):
        self.idx: RouteIndex = ray.get(index_ref)
        self.buffer = buffer
        self.x_col = x_col
        self.y_col = y_col
        self.keep_unmatched = keep_unmatched
        # emit_code=True appends ``route_code`` (int32 position in the
        # broadcast index's route order) INSTEAD of the ``route_id`` string
        # — downstream stages that consume the snap inside the same fused
        # pipeline (flagship) stay integer-keyed end to end; the string id
        # only materializes at external boundaries (checkpoints, results).
        self.emit_code = emit_code

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = self.idx
        x = batch[self.x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch[self.y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(x)
        if idx.pad < self.buffer:
            raise ValueError("route index pad must cover the snap buffer")
        cells = cell_of_points(x, y, idx.res)
        qi, si = idx.candidates(cells)
        best_d = np.full(n, np.inf)
        best_m = np.full(n, np.nan)
        best_r = np.full(n, -1, dtype=np.int64)
        if len(qi):
            d, m = _project_candidates(idx, x, y, qi, si)
            # Deterministic argmin per point: (distance, route, segment).
            order = np.lexsort([si, idx.ridx[si], d, qi])
            qi_s = qi[order]
            firsts = np.concatenate([[True], qi_s[1:] != qi_s[:-1]])
            pick = order[firsts]
            ok = d[pick] <= self.buffer
            pick = pick[ok]
            best_d[qi[pick]] = d[pick]
            best_m[qi[pick]] = m[pick]
            best_r[qi[pick]] = idx.ridx[si[pick]]
        matched = best_r >= 0
        if self.emit_code:
            out = batch.append_column(
                "route_code", pa.array(best_r.astype(np.int32))
            )
        else:
            rid = np.where(matched, idx.route_ids[np.maximum(best_r, 0)], None)
            out = batch.append_column("route_id", pa.array(rid, pa.string()))
        out = out.append_column(
            "loc", pa.array(np.where(matched, best_m, np.nan))
        )
        out = out.append_column(
            "snap_dist", pa.array(np.where(matched, best_d, np.nan))
        )
        if not self.keep_unmatched:
            out = out.filter(pa.array(matched))
        return out


def snap_points(
    points: ray.data.Dataset,
    index_ref,
    buffer: float = 5.0,
    x_col: str = "x",
    y_col: str = "y",
    concurrency: int | None = None,
    batch_size: int = 8192,
    keep_unmatched: bool = False,
) -> ray.data.Dataset:
    """The snap stage. Default: stateless tasks — ``ray.get`` of the
    broadcast index is a zero-copy shared-memory read per task (fetched once
    per node), so elastic tasks beat a fixed pool for this cheap kernel.
    Pass ``concurrency`` for an actor pool (right shape when per-worker
    setup is genuinely expensive)."""
    kwargs = dict(
        index_ref=index_ref,
        buffer=buffer,
        x_col=x_col,
        y_col=y_col,
        keep_unmatched=keep_unmatched,
    )
    if concurrency is not None:
        return points.map_batches(
            SnapPoints,
            fn_constructor_kwargs=kwargs,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=(1, concurrency),
            num_cpus=1,
        )

    def fn(batch: pa.Table) -> pa.Table:
        return SnapPoints(**kwargs)(batch)

    return points.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


class KnnRoutes:
    """``map_batches`` stage: the k NEAREST ROUTES per (x, y) point within
    ``buffer`` — the north star's kNN event lookup. Per point: best segment
    per route first (so a route appears at most once), then routes ranked
    by (distance, route index). Emits ``route_id, loc, snap_dist, rank``
    (rank 0 = nearest), one row per (point, matched route).
    """

    def __init__(
        self,
        index_ref,
        k: int = 3,
        buffer: float = 5.0,
        x_col: str = "x",
        y_col: str = "y",
    ):
        self.idx: RouteIndex = ray.get(index_ref)
        self.k = k
        self.buffer = buffer
        self.x_col = x_col
        self.y_col = y_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = self.idx
        if idx.pad < self.buffer:
            raise ValueError("route index pad must cover the snap buffer")
        x = batch[self.x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch[self.y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cells = cell_of_points(x, y, idx.res)
        qi, si = idx.candidates(cells)
        empty = pa.table(
            {
                **{c: batch[c].take(pa.array([], pa.int64()))
                   for c in batch.column_names},
                "route_id": pa.array([], pa.string()),
                "loc": pa.array([], pa.float64()),
                "snap_dist": pa.array([], pa.float64()),
                "rank": pa.array([], pa.int64()),
            }
        )
        if not len(qi):
            return empty
        d, m = _project_candidates(idx, x, y, qi, si)
        r = idx.ridx[si]
        # Best segment per (point, route): deterministic by (d, segment).
        order = np.lexsort([si, d, r, qi])
        qs, rs = qi[order], r[order]
        firsts = np.concatenate(
            [[True], (qs[1:] != qs[:-1]) | (rs[1:] != rs[:-1])]
        )
        best = order[firsts]
        # Rank routes within each point by (distance, route index).
        d2, q2, r2 = d[best], qi[best], r[best]
        order2 = np.lexsort([r2, d2, q2])
        q2s = q2[order2]
        newq = np.concatenate([[True], q2s[1:] != q2s[:-1]])
        starts = np.maximum.accumulate(
            np.where(newq, np.arange(len(q2s)), 0)
        )
        rank = np.arange(len(q2s)) - starts
        keep = (rank < self.k) & (d2[order2] <= self.buffer)
        sel = best[order2[keep]]
        if not len(sel):
            return empty
        out = batch.take(pa.array(qi[sel]))
        out = out.append_column(
            "route_id", pa.array(idx.route_ids[r[sel]], pa.string())
        )
        out = out.append_column("loc", pa.array(m[sel]))
        out = out.append_column("snap_dist", pa.array(d[sel]))
        out = out.append_column("rank", pa.array(rank[keep]))
        return out


def knn_routes(
    points: ray.data.Dataset,
    index_ref,
    k: int = 3,
    buffer: float = 5.0,
    x_col: str = "x",
    y_col: str = "y",
    concurrency: int | None = None,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """Top-k snap stage — same broadcast-index, shuffle-free shape as
    :func:`snap_points`; elastic tasks by default, actor pool on request."""
    kwargs = dict(
        index_ref=index_ref, k=k, buffer=buffer, x_col=x_col, y_col=y_col
    )
    if concurrency is not None:
        return points.map_batches(
            KnnRoutes,
            fn_constructor_kwargs=kwargs,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=(1, concurrency),
            num_cpus=1,
        )

    def fn(batch: pa.Table) -> pa.Table:
        return KnnRoutes(**kwargs)(batch)

    return points.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def routes_within_distance(
    points: ray.data.Dataset,
    index_ref,
    radius: float,
    x_col: str = "x",
    y_col: str = "y",
    concurrency: int | None = None,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """Radius spatial join: EVERY route within ``radius`` of each point
    (not just the k nearest), one row per (point, route) with ``loc``,
    ``snap_dist`` and the deterministic distance ``rank``. Same
    broadcast-index, shuffle-free shape as :func:`snap_points` — the
    candidate cells already bound the search to ``pad ≥ radius``, so
    "unbounded k" costs the same scan as top-k."""
    return knn_routes(
        points, index_ref, k=1 << 62, buffer=radius,
        x_col=x_col, y_col=y_col,
        concurrency=concurrency, batch_size=batch_size,
    )


class EventRangeIndex:
    """Broadcast per-route interval index for point→event-range joins.

    The north-star asymmetry: event ranges are tiny next to the image/point
    stream, so instead of co-shuffling both sides, the event table is built
    into per-route beg-sorted arrays once (driver), shipped via ``ray.put``,
    and every batch of points probes it with the same closure-faithful sweep
    kernel used by the shuffle path (``intersect_point_linear_pairs``). No
    shuffle touches the big side at all.
    """

    def __init__(self, events: pa.Table, closed: str = "left_mod",
                 key_col: str = "route_id", beg_col: str = "beg",
                 end_col: str = "end", id_col: str = "event_id",
                 route_order: np.ndarray | None = None):
        import pandas as pd

        from linref_ray.kernels.intervals import modified_edges_sorted

        df = events.select([key_col, beg_col, end_col, id_col]).to_pandas()
        df = df.sort_values([key_col, beg_col, end_col], kind="stable")
        self.closed = closed
        self.routes: dict = {}
        for rid, g in df.groupby(key_col, sort=False):
            begs = g[beg_col].to_numpy(dtype=np.float64)
            ends = g[end_col].to_numpy(dtype=np.float64)
            self.routes[rid] = (
                begs,
                ends,
                g[id_col].to_numpy(dtype=np.int64),
                modified_edges_sorted(begs, ends, closed),
            )
        # Optional integer-code view: position i in ``route_order`` (the
        # RouteIndex's route array) → that route's interval arrays. Lets
        # :meth:`match_codes` sort int32 codes instead of strings — the
        # string sort was the hottest line of the flagship partial stage.
        self._by_code: list | None = None
        if route_order is not None:
            self._by_code = [self.routes.get(r) for r in route_order]

    def match(self, route_ids: np.ndarray, locs: np.ndarray,
              enforce_edges: bool = True):
        """(point_pos, event_id) matches for a batch of snapped points."""
        from linref_ray.kernels.intervals import intersect_point_linear_pairs

        if len(route_ids) == 0:
            e = np.empty(0, dtype=np.int64)
            return e, e.copy()
        out_p, out_e = [], []
        order = np.argsort(route_ids, kind="stable")
        rids_s = route_ids[order]
        breaks = np.flatnonzero(rids_s[1:] != rids_s[:-1]) + 1
        for a, z in zip(
            np.concatenate([[0], breaks]),
            np.concatenate([breaks, [len(rids_s)]]),
        ):
            entry = self.routes.get(rids_s[a])
            if entry is None:
                continue
            begs, ends, ids, mod = entry
            seg = order[a:z]
            pi, ii = intersect_point_linear_pairs(
                locs[seg], begs, ends, self.closed, enforce_edges, mod
            )
            out_p.append(seg[pi])
            out_e.append(ids[ii])
        if not out_p:
            e = np.empty(0, dtype=np.int64)
            return e, e.copy()
        return np.concatenate(out_p), np.concatenate(out_e)

    def match_codes(self, route_codes: np.ndarray, locs: np.ndarray,
                    enforce_edges: bool = True):
        """(point_pos, event_id) matches keyed by int route codes.

        Same sweep as :meth:`match` but the per-batch group sort runs on
        int32 codes (built with ``route_order=`` at construction).
        """
        from linref_ray.kernels.intervals import intersect_point_linear_pairs

        if self._by_code is None:
            raise ValueError(
                "EventRangeIndex built without route_order — no code view"
            )
        if len(route_codes) == 0:
            e = np.empty(0, dtype=np.int64)
            return e, e.copy()
        out_p, out_e = [], []
        order = np.argsort(route_codes, kind="stable")
        codes_s = route_codes[order]
        breaks = np.flatnonzero(codes_s[1:] != codes_s[:-1]) + 1
        for a, z in zip(
            np.concatenate([[0], breaks]),
            np.concatenate([breaks, [len(codes_s)]]),
        ):
            code = int(codes_s[a])
            entry = (
                self._by_code[code]
                if 0 <= code < len(self._by_code)
                else None
            )
            if entry is None:
                continue
            begs, ends, ids, mod = entry
            seg = order[a:z]
            pi, ii = intersect_point_linear_pairs(
                locs[seg], begs, ends, self.closed, enforce_edges, mod
            )
            out_p.append(seg[pi])
            out_e.append(ids[ii])
        if not out_p:
            e = np.empty(0, dtype=np.int64)
            return e, e.copy()
        return np.concatenate(out_p), np.concatenate(out_e)


def broadcast_event_join_counts(
    points: ray.data.Dataset,
    index_ref,
    route_col: str = "route_id",
    loc_col: str = "loc",
    out_col: str = "n_images",
) -> ray.data.Dataset:
    """Count points per event range via the broadcast index: per-batch probe
    + per-batch partial counts, then one tiny groupby over (event_id)
    partials — the big side never shuffles."""
    from ray.data.aggregate import Sum

    def fn(batch: pa.Table) -> pa.Table:
        idx: EventRangeIndex = ray.get(index_ref)
        rids = np.asarray(batch[route_col].to_pylist())
        locs = batch[loc_col].to_numpy(zero_copy_only=False).astype(np.float64)
        _, eids = idx.match(rids, locs)
        vals, counts = np.unique(eids, return_counts=True)
        return pa.table(
            {
                "event_id": pa.array(vals),
                "__n": pa.array(counts.astype(np.int64)),
            }
        )

    partials = points.map_batches(fn, batch_format="pyarrow", batch_size=16384)
    return (
        partials.repartition(8)
        .groupby("event_id")
        .aggregate(Sum("__n", alias_name=out_col))
    )


def assign_cells(
    ds: ray.data.Dataset,
    res: int,
    x_col: str = "x",
    y_col: str = "y",
    out_col: str = "cell",
    grid_cols: bool = True,
) -> ray.data.Dataset:
    """Add Morton cell id (+ SQL-friendly integer ix/iy) per point."""

    def _set(t: pa.Table, name: str, arr) -> pa.Table:
        i = t.schema.get_field_index(name)
        return t.append_column(name, arr) if i == -1 else t.set_column(i, name, arr)

    def fn(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        out = _set(t, out_col, pa.array(cell_of_points(x, y, res)))
        if grid_cols:
            g = cell_size(res)
            out = _set(out, "ix", pa.array(np.floor(x / g).astype(np.int64)))
            out = _set(out, "iy", pa.array(np.floor(y / g).astype(np.int64)))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def tile_histogram(
    ds: ray.data.Dataset,
    res: int,
    x_col: str = "x",
    y_col: str = "y",
) -> ray.data.Dataset:
    """Per-cell point counts — the raster-tile↔route-segment histogram.

    Select only the tiny (ix, iy) columns before the shuffle.
    """
    with_cells = assign_cells(ds, res, x_col, y_col)

    def partial(t: pa.Table) -> pa.Table:
        # Packed-key combiner (same formulation as the flagship tile path,
        # images.py): grid indices fit in 32 bits, so one np.unique over
        # the packed int64 replaces the pandas groupby round-trip.
        ix = t["ix"].to_numpy(zero_copy_only=False)
        iy = t["iy"].to_numpy(zero_copy_only=False)
        packed = (ix << np.int64(32)) | (iy & np.int64(0xFFFFFFFF))
        _, first, n = np.unique(packed, return_index=True, return_counts=True)
        return pa.table(
            {
                "ix": pa.array(ix[first]),
                "iy": pa.array(iy[first]),
                "__n": pa.array(n.astype(np.int64)),
            }
        )

    # Pre-aggregate per batch (combiner), then a coarse-pid kernel sum —
    # the tile key space is high-cardinality, where Ray's multi-key
    # Aggregate is pathological (see partition.grouped_int_sum).
    from linref_ray.partition import grouped_int_sum

    partials = with_cells.map_batches(partial, batch_format="pyarrow")
    return grouped_int_sum(partials, ("ix", "iy"), "__n", out_col="n")


def tile_pyramid(
    ds: ray.data.Dataset,
    res: int,
    levels: int = 2,
    x_col: str = "x",
    y_col: str = "y",
) -> ray.data.Dataset:
    """Multi-resolution tile rollup: per-cell counts at ``res`` and at
    ``levels`` coarser resolutions, WITHOUT rescanning the points.

    Points are scanned exactly once for the base histogram (whose per-batch
    combiner already collapses the wide input); every coarser level
    aggregates the previous level's (cells ≪ points) rows — parent cell =
    arithmetic-shift of the child grid indices, i.e. floor(ix / 2^k) from
    the base, matching the Morton-prefix parent relation of H3/S2-style
    hierarchies. Output: ``level`` (0 = finest), ``ix, iy, n``.
    """

    def tag(level: int):
        def fn(t: pa.Table) -> pa.Table:
            lv = pa.array(np.full(len(t), level, dtype=np.int64))
            return t.append_column("level", lv)

        return fn

    def parent(t: pa.Table) -> pa.Table:
        ix = t["ix"].to_numpy(zero_copy_only=False) >> np.int64(1)
        iy = t["iy"].to_numpy(zero_copy_only=False) >> np.int64(1)
        return pa.table(
            {"ix": pa.array(ix), "iy": pa.array(iy), "n": t["n"]}
        )

    from linref_ray.partition import grouped_int_sum

    cur = tile_histogram(ds, res, x_col, y_col)
    out = cur.map_batches(tag(0), batch_format="pyarrow")
    for level in range(1, levels + 1):
        cur = grouped_int_sum(
            cur.map_batches(parent, batch_format="pyarrow"),
            ("ix", "iy"), "n",
        )
        out = out.union(cur.map_batches(tag(level), batch_format="pyarrow"))
    return out


def segment_cell_cover(
    ds: ray.data.Dataset,
    res: int,
    x0_col: str = "x0",
    y0_col: str = "y0",
    x1_col: str = "x1",
    y1_col: str = "y1",
    keep_cols: tuple[str, ...] = ("event_id",),
    clip_lengths: bool = False,
    micro: bool = False,
) -> ray.data.Dataset:
    """Raster↔vector assignment: the EXACT grid cells each segment crosses.

    Pure ``map_batches`` ragged expansion (no shuffle): per batch the
    supercover kernel (:func:`linref_ray.kernels.cells.cover_segments`)
    emits one row per (segment, cell) with integer grid coordinates
    ``ix, iy`` — SQL-oracle-friendly cell identity.  With
    ``clip_lengths=True`` each row carries the Liang–Barsky length of the
    segment inside that cell (``clip_len``; ``micro=True`` stores it as
    round-to-9-then-×1e6 int64 so downstream sums are order-independent
    integers — the convention the oracles use).
    """

    def fn(t: pa.Table) -> pa.Table:
        x0 = t[x0_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y0 = t[y0_col].to_numpy(zero_copy_only=False).astype(np.float64)
        x1 = t[x1_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y1 = t[y1_col].to_numpy(zero_copy_only=False).astype(np.float64)
        out = cover_segments(x0, y0, x1, y1, res, clip_lengths=clip_lengths)
        rows, ix, iy = out[:3]
        cols = {c: t[c].take(pa.array(rows)) for c in keep_cols}
        cols["ix"] = pa.array(ix)
        cols["iy"] = pa.array(iy)
        if clip_lengths:
            ln = out[3]
            if micro:
                # Same fixed-point convention as the SQL oracles
                # (__ray_entry__._int_micro_cols): round-half-towards-infinity
                # at 9 digits, then ×1e6 to int64.
                v = pc.round(
                    pa.array(ln), ndigits=9, round_mode="half_towards_infinity"
                )
                v = pc.round(
                    pc.multiply(v, 1e6), ndigits=0,
                    round_mode="half_towards_infinity",
                )
                cols["clip_len"] = pc.cast(v, pa.int64())
            else:
                cols["clip_len"] = pa.array(ln)
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def route_cell_cover(
    routes: pa.Table | ray.data.Dataset,
    res: int,
    clip_lengths: bool = False,
) -> ray.data.Dataset:
    """Cells traversed by each route polyline (exact supercover).

    A route's whole geometry lives in one row, so segments explode and
    dedupe LOCALLY (packed-key ``np.unique`` per row batch) — no shuffle.
    With ``clip_lengths=True`` rows carry per-(route, cell) mileage instead
    (clip lengths summed over the route's segments in that cell).
    """
    if isinstance(routes, pa.Table):
        routes = ray.data.from_arrow(routes)

    def fn(t: pa.Table) -> pa.Table:
        xs = t["xs"].combine_chunks()
        ys = t["ys"].combine_chunks()
        offs = xs.offsets.to_numpy().astype(np.int64)
        fx = xs.values.to_numpy(zero_copy_only=False).astype(np.float64)
        fy = ys.values.to_numpy(zero_copy_only=False).astype(np.float64)
        # Segment (i, i+1) within each polyline: drop each row's last vertex.
        n_vert = np.diff(offs)
        keep = np.ones(len(fx), dtype=bool)
        keep[offs[1:] - 1] = False
        row_of_seg = np.repeat(
            np.arange(len(n_vert), dtype=np.int64), np.maximum(n_vert - 1, 0)
        )
        x0, y0 = fx[keep], fy[keep]
        idx1 = np.flatnonzero(keep) + 1
        x1, y1 = fx[idx1], fy[idx1]
        out = cover_segments(x0, y0, x1, y1, res, clip_lengths=clip_lengths)
        segs, ix, iy = out[:3]
        rows = row_of_seg[segs]
        if len(rows) == 0:
            cols = {
                "route_id": pa.array([], t.schema.field("route_id").type),
                "ix": pa.array([], pa.int64()),
                "iy": pa.array([], pa.int64()),
            }
            if clip_lengths:
                cols["mileage"] = pa.array([], pa.float64())
            return pa.table(cols)
        packed = (
            (rows << np.int64(44))
            | ((ix & np.int64(0x3FFFFF)) << np.int64(22))
            | (iy & np.int64(0x3FFFFF))
        )
        if clip_lengths:
            order = np.argsort(packed, kind="stable")
            packed_s = packed[order]
            firsts = np.concatenate([[True], packed_s[1:] != packed_s[:-1]])
            gid = np.cumsum(firsts) - 1
            mileage = np.zeros(int(gid[-1]) + 1 if len(gid) else 0)
            np.add.at(mileage, gid, out[3][order])
            sel = order[firsts]
            return pa.table(
                {
                    "route_id": t["route_id"].take(pa.array(rows[sel])),
                    "ix": pa.array(ix[sel]),
                    "iy": pa.array(iy[sel]),
                    "mileage": pa.array(mileage),
                }
            )
        _, first = np.unique(packed, return_index=True)
        return pa.table(
            {
                "route_id": t["route_id"].take(pa.array(rows[first])),
                "ix": pa.array(ix[first]),
                "iy": pa.array(iy[first]),
            }
        )

    return routes.map_batches(fn, batch_format="pyarrow")


def cell_mileage_histogram(
    ds: ray.data.Dataset,
    res: int,
    x0_col: str = "x0",
    y0_col: str = "y0",
    x1_col: str = "x1",
    y1_col: str = "y1",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Per-cell total segment mileage — the weighted raster↔vector tile map.

    Clip lengths are micro-rounded to int64 BEFORE any aggregation, so the
    per-batch packed-key combiner and the final tiny ``groupby`` both sum
    integers: the result is independent of batch boundaries and shuffle
    order (bitwise-reproducible, and bitwise vs the SQL oracle).
    """
    pairs = segment_cell_cover(
        ds,
        res,
        x0_col,
        y0_col,
        x1_col,
        y1_col,
        keep_cols=(),
        clip_lengths=True,
        micro=True,
    )

    def partial(t: pa.Table) -> pa.Table:
        ix = t["ix"].to_numpy(zero_copy_only=False)
        iy = t["iy"].to_numpy(zero_copy_only=False)
        ln = t["clip_len"].to_numpy(zero_copy_only=False)
        if len(ix) == 0:
            return pa.table(
                {
                    "ix": pa.array([], pa.int64()),
                    "iy": pa.array([], pa.int64()),
                    "__m": pa.array([], pa.int64()),
                }
            )
        packed = (ix << np.int64(32)) | (iy & np.int64(0xFFFFFFFF))
        order = np.argsort(packed, kind="stable")
        packed_s = packed[order]
        firsts = np.concatenate([[True], packed_s[1:] != packed_s[:-1]])
        gid = np.cumsum(firsts) - 1
        sums = np.zeros(int(gid[-1]) + 1 if len(gid) else 0, dtype=np.int64)
        np.add.at(sums, gid, ln[order])
        sel = order[firsts]
        return pa.table(
            {
                "ix": pa.array(ix[sel]),
                "iy": pa.array(iy[sel]),
                "__m": pa.array(sums),
            }
        )

    from linref_ray.partition import grouped_int_sum

    return grouped_int_sum(
        pairs.map_batches(partial, batch_format="pyarrow"),
        ("ix", "iy"), "__m", out_col="mileage_micro",
        num_partitions=num_partitions,
    )


def intersection_pairs(
    routes: pa.Table, res: int = 8
) -> pa.Table:
    """Route×route crossing points (reference ``ext/spatial.py:562-743``).

    Cell-bucketed candidate generation + exact segment-segment intersection,
    deduped by (i<j) and cell ownership of the intersection point. Runs on
    the driver for a broadcastable network (routes are the small side); the
    same kernel body is reusable inside a cell-keyed ``map_groups`` when the
    network itself is distributed.

    Returns a table ``(route_a, route_b, x, y)``.
    """
    idx = RouteIndex(routes, res=res, pad=0.0)
    rows_a, rows_b = [], []
    xs_out, ys_out = [], []
    # Candidate segment pairs per cell.
    for ci in range(len(idx._cell_keys)):
        lo, hi = idx._cell_offsets[ci], idx._cell_offsets[ci + 1]
        segs = idx._cell_segs[lo:hi]
        if len(segs) < 2:
            continue
        a, b = np.triu_indices(len(segs), k=1)
        sa, sb = segs[a], segs[b]
        keep = idx.ridx[sa] != idx.ridx[sb]
        sa, sb = sa[keep], sb[keep]
        if not len(sa):
            continue
        # Exact segment intersection (vectorized cross products).
        p0x, p0y = idx.ax[sa], idx.ay[sa]
        p1x, p1y = idx.bx[sa], idx.by[sa]
        q0x, q0y = idx.ax[sb], idx.ay[sb]
        q1x, q1y = idx.bx[sb], idx.by[sb]
        rx, ry = p1x - p0x, p1y - p0y
        sx, sy = q1x - q0x, q1y - q0y
        denom = rx * sy - ry * sx
        ok = denom != 0
        t = np.where(
            ok, ((q0x - p0x) * sy - (q0y - p0y) * sx) / np.where(ok, denom, 1), -1
        )
        u = np.where(
            ok, ((q0x - p0x) * ry - (q0y - p0y) * rx) / np.where(ok, denom, 1), -1
        )
        hit = ok & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
        if not hit.any():
            continue
        px = p0x[hit] + t[hit] * rx[hit]
        py = p0y[hit] + t[hit] * ry[hit]
        # Cell-ownership dedup: count the intersection only in its own cell.
        own = cell_of_points(px, py, idx.res) == idx._cell_keys[ci]
        if not own.any():
            continue
        ra = idx.ridx[sa[hit]][own]
        rb = idx.ridx[sb[hit]][own]
        lo_r = np.minimum(ra, rb)
        hi_r = np.maximum(ra, rb)
        rows_a.append(lo_r)
        rows_b.append(hi_r)
        xs_out.append(px[own])
        ys_out.append(py[own])
    if not rows_a:
        return pa.table(
            {
                "route_a": pa.array([], pa.string()),
                "route_b": pa.array([], pa.string()),
                "x": pa.array([], pa.float64()),
                "y": pa.array([], pa.float64()),
            }
        )
    ra = np.concatenate(rows_a)
    rb = np.concatenate(rows_b)
    px = np.concatenate(xs_out)
    py = np.concatenate(ys_out)
    # Dedup identical crossing points reported by touching segments.
    stacked = np.column_stack([ra, rb, np.round(px, 9), np.round(py, 9)])
    _, uniq = np.unique(stacked, axis=0, return_index=True)
    uniq = np.sort(uniq)
    return pa.table(
        {
            "route_a": pa.array(idx.route_ids[ra[uniq]]),
            "route_b": pa.array(idx.route_ids[rb[uniq]]),
            "x": pa.array(px[uniq]),
            "y": pa.array(py[uniq]),
        }
    )


def _cluster_label_distributed(
    ds: ray.data.Dataset,
    local: ray.data.Dataset,
    distinct: ray.data.Dataset,
    link_col: str | None,
    num_partitions: int,
) -> ray.data.Dataset:
    """Scale path for :func:`cluster_events` label assignment: dense ranks
    via :func:`dense_rank_labels` and link edges via
    :func:`linref_ray.graph.connected_components` — the driver never holds
    a per-component structure. Label values are identical to the driver
    path (min-member canonical representative, then dense rank)."""
    from linref_ray.joins import hash_join
    from linref_ray.partition import KEYCOL, PID, add_partition_cols, grouped_distinct

    labels = dense_rank_labels(
        distinct, ("__ckey", "__cpos"), out_col="cluster"
    )

    def key_of(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t["__ckey"], pc.cast(t["__cpos"], pa.string()), "#"
        )
        return t.append_column("__ck2", k).drop_columns(["__ckey", "__cpos"])

    lab2 = labels.map_batches(key_of, batch_format="pyarrow")
    loc2 = local.map_batches(key_of, batch_format="pyarrow")
    out = hash_join(
        loc2, lab2, on="__ck2", how="left", num_partitions=num_partitions
    ).drop_columns(["__ck2"])
    if link_col is None:
        return out

    links = hash_join(
        out.select_columns(["event_id", "cluster"]),
        ds.select_columns(["event_id", link_col]),
        on="event_id", how="left", num_partitions=num_partitions,
    )
    links = links.map_batches(
        lambda t: t.filter(pc.is_valid(t[link_col])), batch_format="pyarrow"
    )
    pairs = grouped_distinct(
        links.select_columns([link_col, "cluster"]), (link_col, "cluster"),
        num_partitions=num_partitions,
    )

    def part(t: pa.Table) -> pa.Table:
        return add_partition_cols(t, (link_col,), num_partitions)

    def star(t: pa.Table) -> pa.Table:
        # One kernel per hash partition: link groups co-locate, so emitting
        # (min cid, cid) star edges per link run is globally complete.
        if len(t) == 0:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                }
            )
        lk = t[KEYCOL].to_numpy(zero_copy_only=False)
        cid = t["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort([cid, lk])
        lks, cids = lk[order], cid[order]
        starts = np.concatenate([[True], lks[1:] != lks[:-1]])
        run_of = np.cumsum(starts) - 1
        mins = cids[np.flatnonzero(starts)]
        return pa.table(
            {
                "id_a": pa.array(mins[run_of]),
                "id_b": pa.array(cids),
            }
        )

    edges = (
        pairs.map_batches(part, batch_format="pyarrow")
        .groupby(PID)
        .map_groups(star, batch_format="pyarrow")
    )
    from linref_ray.graph import connected_components

    cc = connected_components(
        edges, "id_a", "id_b",
        num_partitions=max(num_partitions // 8, 1),
    ).map_batches(
        lambda t: pa.table({"cluster": t["node"], "__rep": t["label"]}),
        batch_format="pyarrow",
    )
    out2 = hash_join(
        out, cc, on="cluster", how="left", num_partitions=num_partitions
    )

    def fill(t: pa.Table) -> pa.Table:
        rep = pc.coalesce(
            pc.cast(t["__rep"], pa.int64()), pc.cast(t["cluster"], pa.int64())
        )
        return t.drop_columns(["__rep", "cluster"]).append_column("__rep", rep)

    out2 = out2.map_batches(fill, batch_format="pyarrow")
    reps = grouped_distinct(
        out2.select_columns(["__rep"]), ("__rep",),
        num_partitions=num_partitions,
    )
    relabel = dense_rank_labels(reps, ("__rep",), out_col="cluster")
    return hash_join(
        out2, relabel, on="__rep", how="left", num_partitions=num_partitions
    ).drop_columns(["__rep"])


@ray.remote
def _block_first_key(tbl: pa.Table, cols: tuple) -> tuple:
    if len(tbl) == 0:
        return None
    return tuple(tbl[c][0].as_py() for c in cols)


@ray.remote
def _block_label(tbl: pa.Table, offset: int, out_col: str) -> pa.Table:
    return tbl.append_column(
        out_col, pa.array(offset + np.arange(len(tbl), dtype=np.int64))
    )


def dense_rank_labels(
    distinct: ray.data.Dataset, cols: tuple[str, ...], out_col: str = "cluster"
) -> ray.data.Dataset:
    """Distributed dense rank 0..k-1 over a DISTINCT-rows dataset ordered by
    ``cols`` ascending — the scale path for global label assignment.

    Range-partitioned ``sort`` (blocks hold disjoint key ranges), then ONE
    tiny driver fetch of per-block (first key, row count) to compute each
    block's exclusive offset; labels are written per block by raw tasks.
    Nothing larger than O(#blocks) touches the driver.
    """
    s = distinct.sort(list(cols)).materialize()
    refs = s.to_arrow_refs()
    firsts = ray.get([_block_first_key.remote(r, tuple(cols)) for r in refs])
    sizes = ray.get([_n_rows.remote(r) for r in refs])
    order = sorted(
        (i for i in range(len(refs)) if firsts[i] is not None),
        key=lambda i: firsts[i],
    )
    out_refs = []
    off = 0
    for i in order:
        out_refs.append(_block_label.remote(refs[i], off, out_col))
        off += sizes[i]
    if not out_refs:
        from linref_ray.joins import _pa_type

        sch = distinct.schema()
        empty = pa.table(
            {
                **{
                    c: pa.array([], _pa_type(sch.types[sch.names.index(c)]))
                    for c in cols
                },
                out_col: pa.array([], pa.int64()),
            }
        )
        return ray.data.from_arrow(empty)
    return ray.data.from_arrow_refs(out_refs)


@ray.remote
def _n_rows(tbl: pa.Table) -> int:
    return len(tbl)


def cluster_events(
    ds: ray.data.Dataset,
    lrs,
    max_gap: float = 0.0,
    link_col: str | None = None,
    num_partitions: int = 64,
    label_mode: str = "auto",
    driver_label_budget: int = 2_000_000,
) -> ray.data.Dataset:
    """Connected components of the extend-by-gap self-overlap graph
    (reference ``ext/base.py:2846-2970``).

    Per-route components are local (computed in one pass inside the relation
    kernel); the edge list is tiny relative to rows, so the cross-partition
    merge is a driver-side union-find over per-route label ranges — the
    documented exception where a global graph op cannot stay shuffle-local.
    Adds a ``cluster`` int64 column.
    """
    from linref_ray.events import extend as extend_op
    from linref_ray.joins import hash_join
    from linref_ray.kernels.intervals import iter_group_segments
    from linref_ray.partition import KEYCOL, PID, add_partition_cols

    ext = extend_op(ds, lrs, max_gap / 2, max_gap / 2)

    def part(t: pa.Table) -> pa.Table:
        return add_partition_cols(
            t, lrs.effective_key_col(t.column_names), num_partitions
        )

    id_col = "event_id"

    def kernel(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "__ckey": pa.array([], pa.string()),
                    "__cpos": pa.array([], pa.int64()),
                }
            )
        key = tbl[KEYCOL].to_numpy(zero_copy_only=False)
        beg = tbl[lrs.beg_col].to_numpy(zero_copy_only=False).astype(np.float64)
        end = tbl[lrs.end_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort([end, beg, key])
        out_key, out_pos, out_id = [], [], []
        for a, z in iter_group_segments(key[order]):
            seg = order[a:z]
            b, e = beg[seg], end[seg]
            # Sorted sweep: new component when beg > running max end
            # (touching counts as connected, matching intersect
            # enforce_edges=True semantics).
            runmax = np.maximum.accumulate(e)
            breaks = np.concatenate([[False], b[1:] > runmax[:-1]])
            comp = np.cumsum(breaks)
            out_id.append(ids[seg])
            out_key.append(np.repeat(key[seg[0]], len(seg)))
            out_pos.append(comp)
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id)),
                "__ckey": pa.array(np.concatenate(out_key)),
                "__cpos": pa.array(np.concatenate(out_pos)),
            }
        )

    local = (
        ext.map_batches(part, batch_format="pyarrow")
        .groupby(PID)
        .map_groups(kernel, batch_format="pyarrow")
    )

    # Assign global ids: (route, local component) → dense int, ordered by
    # (route, comp) — the reference's label convention and the oracle's
    # dense_rank. Two modes, parity-tested:
    #  - 'driver': collect the distinct (route, comp) list and label it in
    #    one pandas pass — right when components ≪ rows (typical).
    #  - 'distributed': dense_rank_labels (range sort + per-block offsets)
    #    + graph.connected_components for link edges — nothing larger than
    #    O(#blocks) reaches the driver. 'auto' gates on the distinct count.
    from linref_ray.partition import grouped_distinct

    if label_mode not in ("auto", "driver", "distributed"):
        raise ValueError("label_mode must be auto|driver|distributed")
    distinct = grouped_distinct(
        local.select_columns(["__ckey", "__cpos"]), ("__ckey", "__cpos"),
        num_partitions=num_partitions,
    ).materialize()  # small (≤ one row per input event); consumed 1-2x
    if label_mode == "auto":
        label_mode = (
            "driver" if distinct.count() <= driver_label_budget
            else "distributed"
        )
    if label_mode == "distributed":
        return _cluster_label_distributed(
            ds, local, distinct, link_col, num_partitions
        )
    ddf = distinct.to_pandas()
    ddf = ddf.sort_values(["__ckey", "__cpos"]).reset_index(drop=True)
    ddf["cluster"] = np.arange(len(ddf), dtype=np.int64)

    if link_col is not None:
        # Cross-group edges from shared link values (``ext/base.py:2941-2962``)
        # — the one truly global graph op. Edge list ≪ rows: collect the
        # distinct (link value → component) pairs, union-find on the driver,
        # rewrite labels (SURVEY §7.5 item 6).
        from linref_ray.joins import hash_join

        links = hash_join(
            local,
            ds.select_columns(["event_id", link_col]),
            on="event_id",
            how="left",
            num_partitions=num_partitions,
        )
        links = links.map_batches(
            lambda t: t.filter(pc.is_valid(t[link_col])),
            batch_format="pyarrow",
        )
        pairs = grouped_distinct(
            links.select_columns([link_col, "__ckey", "__cpos"]),
            (link_col, "__ckey", "__cpos"),
            num_partitions=num_partitions,
        ).to_pandas()
        comp_key = {
            (k, p): i
            for i, (k, p) in enumerate(zip(ddf["__ckey"], ddf["__cpos"]))
        }
        parent = np.arange(len(ddf), dtype=np.int64)

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        pairs = pairs.dropna(subset=[link_col])
        for _, grp in pairs.groupby(link_col, sort=False):
            comps = [
                comp_key[(k, p)]
                for k, p in zip(grp["__ckey"], grp["__cpos"])
            ]
            root = find(comps[0])
            for c in comps[1:]:
                parent[find(c)] = root
        roots = np.array([find(i) for i in range(len(ddf))])
        # Canonicalize each component to its MINIMUM member id — the same
        # convention as graph.connected_components, so the 'distributed'
        # label mode produces identical values (parity-tested).
        mins = np.full(len(ddf), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mins, roots, np.arange(len(ddf), dtype=np.int64))
        _, dense = np.unique(mins[roots], return_inverse=True)
        ddf["cluster"] = dense.astype(np.int64)

    # Attach labels by BROADCAST lookup, not a shuffle join: the label
    # table is already driver-resident (that is what 'driver' mode means),
    # and the hash_join alternative pays a repartition + sort exchange
    # (~3.4 s of pure fixed cost at sf0.1 for ms of compute). Keys hash to
    # int64 for a searchsorted probe; on the (astronomically unlikely)
    # collision the shuffle join handles it instead.
    import pandas as pd

    key_str = (
        ddf["__ckey"].astype(str) + "#" + ddf["__cpos"].astype(str)
    ).to_numpy(dtype=object)
    kh = pd.util.hash_array(key_str)
    if len(np.unique(kh)) == len(kh):
        order = np.argsort(kh)
        lookup_ref = ray.put(
            (kh[order], ddf["cluster"].to_numpy(dtype=np.int64)[order])
        )

        def attach(t: pa.Table) -> pa.Table:
            khs, labs = ray.get(lookup_ref)
            k = pc.binary_join_element_wise(
                t["__ckey"], pc.cast(t["__cpos"], pa.string()), "#"
            )
            h = pd.util.hash_array(
                np.asarray(k.to_pylist(), dtype=object)
            )
            pos = np.clip(np.searchsorted(khs, h), 0, len(khs) - 1)
            if len(h) and not (khs[pos] == h).all():
                raise ValueError(
                    "cluster label lookup miss — labels must cover every "
                    "(route, component) pair by construction"
                )
            return t.drop_columns(["__ckey", "__cpos"]).append_column(
                "cluster", pa.array(labs[pos])
            )

        return local.map_batches(attach, batch_format="pyarrow")

    labels = ray.data.from_pandas(ddf)

    def key_of(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t["__ckey"], pc.cast(t["__cpos"], pa.string()), "#"
        )
        return t.append_column("__ck2", k).drop_columns(["__ckey", "__cpos"])

    lab2 = labels.map_batches(key_of, batch_format="pyarrow")
    loc2 = local.map_batches(key_of, batch_format="pyarrow")
    return hash_join(loc2, lab2, on="__ck2", how="left",
                     num_partitions=num_partitions).drop_columns(["__ck2"])


def intersection_nodes(routes: pa.Table, res: int = 8, ndigits: int = 9) -> pa.Table:
    """Unique crossing nodes with participating routes
    (``ext/spatial.py:673-743``): explode pair intersections, unique by
    rounded coordinates, collect the route set per node."""
    pairs = intersection_pairs(routes, res=res)
    if len(pairs) == 0:
        return pa.table(
            {
                "node_id": pa.array([], pa.int64()),
                "x": pa.array([], pa.float64()),
                "y": pa.array([], pa.float64()),
                "routes": pa.array([], pa.list_(pa.string())),
            }
        )
    x = pairs["x"].to_numpy(zero_copy_only=False)
    y = pairs["y"].to_numpy(zero_copy_only=False)
    key = np.char.add(
        np.round(x, ndigits).astype(str), np.round(y, ndigits).astype(str)
    )
    _, node_of = np.unique(key, return_inverse=True)
    ra = pairs["route_a"].to_pylist()
    rb = pairs["route_b"].to_pylist()
    nodes: dict[int, set] = {}
    coords: dict[int, tuple] = {}
    for i, n in enumerate(node_of):
        nodes.setdefault(int(n), set()).update((ra[i], rb[i]))
        coords[int(n)] = (x[i], y[i])
    ids = sorted(nodes)
    return pa.table(
        {
            "node_id": pa.array(np.arange(len(ids), dtype=np.int64)),
            "x": pa.array([coords[i][0] for i in ids]),
            "y": pa.array([coords[i][1] for i in ids]),
            "routes": pa.array(
                [sorted(nodes[i]) for i in ids], pa.list_(pa.string())
            ),
        }
    )


def _polyline_crossings(xs, ys, ms, line_x, line_y):
    """Measures where one route polyline crosses an OPEN polyline mask
    (same segment×segment solve as :func:`_polygon_crossings`, without the
    ring-closing wrap edge)."""
    if len(line_x) < 2:
        return np.empty(0, dtype=np.float64)
    ax, ay = xs[:-1], ys[:-1]
    bx, by = xs[1:], ys[1:]
    ex0, ey0 = line_x[:-1], line_y[:-1]
    ex1, ey1 = line_x[1:], line_y[1:]
    rx = (bx - ax)[:, None]
    ry = (by - ay)[:, None]
    sx = (ex1 - ex0)[None, :]
    sy = (ey1 - ey0)[None, :]
    denom = rx * sy - ry * sx
    qpx = ex0[None, :] - ax[:, None]
    qpy = ey0[None, :] - ay[:, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (qpx * sy - qpy * sx) / denom
        u = (qpx * ry - qpy * rx) / denom
    hit = (denom != 0) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    si, _ = np.nonzero(hit)
    tt = t[hit]
    return ms[:-1][si] + tt * (ms[1:][si] - ms[:-1][si])


def split_events(
    events: ray.data.Dataset,
    routes: pa.Table,
    masks,
    lrs,
) -> ray.data.Dataset:
    """Split events at arbitrary geometry-mask crossings
    (``ext/base.py:2090-2213``): polygon masks split at their boundary
    rings, polyline masks at intersection points; ALL pieces are kept (use
    :func:`clip_events` for polygon keep-inside/outside filtering).

    ``masks``: iterable of ``("polygon"|"line", xs, ys)`` tuples — the
    shapely-free analog of the reference's Geometry/GeoSeries mask.
    Routes + masks are broadcast in the task closure; the event stream
    never shuffles. Same vectorized per-route expansion as clip_events.
    """
    lookup = {
        rid: (np.asarray(x), np.asarray(y), np.asarray(m))
        for rid, x, y, m in zip(
            routes["route_id"].to_pylist(),
            routes["xs"].to_pylist(),
            routes["ys"].to_pylist(),
            routes["ms"].to_pylist(),
        )
    }
    masks = list(masks)
    if not masks:
        raise ValueError("No valid geometries found in mask.")
    crossings: dict = {}
    for rid, (x, y, m) in lookup.items():
        cuts = []
        for kind, gx, gy in masks:
            gx = np.asarray(gx, dtype=np.float64)
            gy = np.asarray(gy, dtype=np.float64)
            if kind == "polygon":
                cuts.append(_polygon_crossings(x, y, m, gx, gy))
            elif kind == "line":
                cuts.append(_polyline_crossings(x, y, m, gx, gy))
            else:
                raise ValueError(f"unknown mask kind {kind!r}")
        crossings[rid] = np.unique(np.concatenate(cuts)) if cuts else None
    key_c = lrs.key_col[0]
    beg_c, end_c = lrs.beg_col, lrs.end_col

    def fn(t: pa.Table) -> pa.Table:
        rids = np.asarray(t[key_c].to_pylist())
        beg = t[beg_c].to_numpy(zero_copy_only=False).astype(np.float64)
        end = t[end_c].to_numpy(zero_copy_only=False).astype(np.float64)
        rows_out, b_out, e_out = [], [], []
        for rid in np.unique(rids):
            rows = np.flatnonzero(rids == rid)
            cr = crossings.get(rid)
            if cr is None:
                cr = np.empty(0, dtype=np.float64)
            row_of, pb, pe = expand_pieces(beg[rows], end[rows], cr)
            rows_out.append(rows[row_of])
            b_out.append(pb)
            e_out.append(pe)
        if not rows_out:
            return t.slice(0, 0)
        rows_all = np.concatenate(rows_out)
        b_all = np.concatenate(b_out)
        e_all = np.concatenate(e_out)
        srt = np.lexsort([b_all, rows_all])
        rows_all, b_all, e_all = rows_all[srt], b_all[srt], e_all[srt]
        out = t.take(pa.array(rows_all))
        out = out.set_column(
            out.schema.get_field_index(beg_c), beg_c, pa.array(b_all)
        )
        return out.set_column(
            out.schema.get_field_index(end_c), end_c, pa.array(e_all)
        )

    return events.map_batches(fn, batch_format="pyarrow")


def generate_intersections(
    routes: pa.Table,
    expand: bool = True,
    res: int = 8,
    ndigits: int = 9,
) -> pa.Table:
    """Intersection nodes projected onto the LRS
    (``ext/base.py:2972-3054``): compose :func:`intersection_nodes` with a
    measure projection onto every participating route's M-enabled geometry.

    ``expand=True`` emits one row per (node, coincident route) with that
    route's LRS location — the reference's expand semantics; ``expand=False``
    emits one row per node projected onto its first (sorted) route. Same-
    route segment pairs are inherently excluded (route geometry is one
    polyline per key here), matching ``exclude_groups=True``.

    Routes are a broadcast-sized table (the small side, like the snap
    index); nodes ≪ routes, so this finishing step is driver-local.
    """
    from linref_ray.kernels.geometry import project_point_to_polyline

    nodes = intersection_nodes(routes, res=res, ndigits=ndigits)
    lookup = {
        rid: (np.asarray(x), np.asarray(y), np.asarray(m))
        for rid, x, y, m in zip(
            routes["route_id"].to_pylist(),
            routes["xs"].to_pylist(),
            routes["ys"].to_pylist(),
            routes["ms"].to_pylist(),
        )
    }
    out_nid, out_x, out_y, out_rid, out_loc, out_d = [], [], [], [], [], []
    for nid, x, y, rids in zip(
        nodes["node_id"].to_pylist(),
        nodes["x"].to_pylist(),
        nodes["y"].to_pylist(),
        nodes["routes"].to_pylist(),
    ):
        for rid in rids if expand else rids[:1]:
            geom = lookup.get(rid)
            if geom is None:
                continue
            m_val, dist = project_point_to_polyline(*geom, x, y)
            out_nid.append(nid)
            out_x.append(x)
            out_y.append(y)
            out_rid.append(rid)
            out_loc.append(m_val)
            out_d.append(dist)
    return pa.table(
        {
            "node_id": pa.array(out_nid, pa.int64()),
            "x": pa.array(out_x, pa.float64()),
            "y": pa.array(out_y, pa.float64()),
            "route_id": pa.array(out_rid, pa.string()),
            "loc": pa.array(out_loc, pa.float64()),
            "snap_dist": pa.array(out_d, pa.float64()),
        }
    )


def _polygon_crossings(xs, ys, ms, poly_x, poly_y):
    """Measures where one route polyline crosses the polygon boundary."""
    ax, ay = xs[:-1], ys[:-1]
    bx, by = xs[1:], ys[1:]
    ex0, ey0 = poly_x, poly_y
    ex1 = np.roll(poly_x, -1)
    ey1 = np.roll(poly_y, -1)
    rx = (bx - ax)[:, None]
    ry = (by - ay)[:, None]
    sx = (ex1 - ex0)[None, :]
    sy = (ey1 - ey0)[None, :]
    denom = rx * sy - ry * sx
    qpx = ex0[None, :] - ax[:, None]
    qpy = ey0[None, :] - ay[:, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (qpx * sy - qpy * sx) / denom
        u = (qpx * ry - qpy * rx) / denom
    hit = (denom != 0) & (t >= 0) & (t <= 1) & (u >= 0) & (u < 1)
    si, _ = np.nonzero(hit)
    tt = t[hit]
    mm = ms[:-1][si] + tt * (ms[1:][si] - ms[:-1][si])
    return np.unique(mm)


class PolygonIndex:
    """Cell-bucketed broadcast index over MANY polygons — the
    point-in-polygon side of the north star's spatial layer, same design
    as :class:`RouteIndex`: polygons are the small side, so their bbox
    cell covers build once on the driver, ship via ``ray.put``, and every
    point batch probes cells → bbox filter → exact ray-cast. No shuffle
    touches the point stream."""

    def __init__(self, polygons: pa.Table, res: int = 8,
                 id_col: str = "polygon_id", xs_col: str = "xs",
                 ys_col: str = "ys", max_cells: int = 5_000_000):
        self.res = res
        self.ids = np.asarray(polygons[id_col].to_pylist())
        # typed Arrow id array: .take keeps the output schema stable even
        # for empty batches (a numpy object-array round-trip would not)
        self.ids_arrow = polygons[id_col].combine_chunks() if isinstance(
            polygons[id_col], pa.ChunkedArray
        ) else polygons[id_col]
        xs_l = polygons[xs_col].to_pylist()
        ys_l = polygons[ys_col].to_pylist()
        self.px = [np.asarray(x, dtype=np.float64) for x in xs_l]
        self.py = [np.asarray(y, dtype=np.float64) for y in ys_l]
        self.x0 = np.array([x.min() for x in self.px])
        self.x1 = np.array([x.max() for x in self.px])
        self.y0 = np.array([y.min() for y in self.py])
        self.y1 = np.array([y.max() for y in self.py])
        # Guard the cover size BEFORE materializing it: a polygon spanning
        # many grid cells at this res explodes the index (choose a coarser
        # res — candidates are bbox-filtered again before the exact test,
        # so a coarse res costs extra candidates, never correctness).
        g = cell_size(res)
        est = (
            (np.floor(self.x1 / g) - np.floor(self.x0 / g) + 1)
            * (np.floor(self.y1 / g) - np.floor(self.y0 / g) + 1)
        ).sum()
        if est > max_cells:
            raise ValueError(
                f"polygon cell cover would hold ~{int(est)} entries at "
                f"res={res} (> max_cells={max_cells}); use a coarser res"
            )
        rows, cells = cover_bbox(self.x0, self.y0, self.x1, self.y1, res)
        order = np.argsort(cells, kind="stable")
        cells_s = cells[order]
        self._cell_keys, starts = np.unique(cells_s, return_index=True)
        self._cell_offsets = np.concatenate([starts, [len(cells_s)]])
        self._cell_polys = rows[order]

    def candidates(self, cell_ids: np.ndarray):
        """(query_row, polygon_pos) candidate pairs for an array of cells."""
        pos = np.searchsorted(self._cell_keys, cell_ids)
        pos = np.clip(pos, 0, max(len(self._cell_keys) - 1, 0))
        if len(self._cell_keys) == 0:
            e = np.empty(0, np.int64)
            return e, e.copy()
        hit = self._cell_keys[pos] == cell_ids
        lo = np.where(hit, self._cell_offsets[pos], 0)
        hi = np.where(hit, self._cell_offsets[pos + 1], 0)
        counts = hi - lo
        qi = np.repeat(np.arange(len(cell_ids), dtype=np.int64), counts)
        offs = np.concatenate([[0], np.cumsum(counts)])
        si = (
            np.arange(int(counts.sum()), dtype=np.int64)
            - np.repeat(offs[:-1], counts)
            + np.repeat(lo, counts)
        )
        return qi, self._cell_polys[si]


def build_polygon_index(
    polygons: pa.Table | ray.data.Dataset, res: int = 8,
    id_col: str = "polygon_id", xs_col: str = "xs", ys_col: str = "ys",
):
    """Build + broadcast the polygon index; returns an ObjectRef."""
    if isinstance(polygons, ray.data.Dataset):
        polygons = pa.concat_tables(
            ray.get(polygons.to_arrow_refs()), promote_options="default"
        )
    return ray.put(
        PolygonIndex(polygons, res=res, id_col=id_col,
                     xs_col=xs_col, ys_col=ys_col)
    )


def points_in_polygons(
    points: ray.data.Dataset,
    index_ref,
    x_col: str = "x",
    y_col: str = "y",
    out_col: str = "polygon_id",
    batch_size: int = 8192,
    keep_unmatched: bool = False,
) -> ray.data.Dataset:
    """Tag each point with every polygon containing it (one output row per
    (point, containing polygon); points in no polygon drop — semi-join
    semantics, mirroring ``snap_points``. ``keep_unmatched=True`` emits
    uncontained points once with a null ``out_col``).

    Boundary semantics are the ray-cast half-open rule: an edge's lower-y
    endpoint is inside, its upper-y endpoint is not (equivalently, an
    axis-aligned rectangle contains ``[x0, x1) × [y0, y1)``) — the
    standard even-odd convention, deterministic for points on edges.
    """

    def fn(batch: pa.Table) -> pa.Table:
        idx: PolygonIndex = ray.get(index_ref)
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cells = cell_of_points(x, y, idx.res)
        qi, pi = idx.candidates(cells)
        if len(qi):
            keep = (
                (x[qi] >= idx.x0[pi]) & (x[qi] <= idx.x1[pi])
                & (y[qi] >= idx.y0[pi]) & (y[qi] <= idx.y1[pi])
            )
            qi, pi = qi[keep], pi[keep]
        ins = np.zeros(len(qi), dtype=bool)
        for p in np.unique(pi):
            m = pi == p
            ins[m] = _point_in_polygon(x[qi[m]], y[qi[m]], idx.px[p], idx.py[p])
        qi, pi = qi[ins], pi[ins]
        out = batch.take(pa.array(qi))
        out = out.append_column(
            out_col, idx.ids_arrow.take(pa.array(pi))
        )
        if keep_unmatched:
            miss = np.setdiff1d(
                np.arange(len(batch), dtype=np.int64), qi
            )
            rest = batch.take(pa.array(miss))
            rest = rest.append_column(
                out_col, pa.nulls(len(miss), idx.ids_arrow.type)
            )
            out = pa.concat_tables([out, rest])
        return out

    return points.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size
    )


def _point_in_polygon(px, py, poly_x, poly_y):
    """Vectorized ray-casting point-in-polygon."""
    inside = np.zeros(len(px), dtype=bool)
    n = len(poly_x)
    for i in range(n):
        x0, y0 = poly_x[i], poly_y[i]
        x1, y1 = poly_x[(i + 1) % n], poly_y[(i + 1) % n]
        cond = ((y0 > py) != (y1 > py)) & (
            px < (x1 - x0) * (py - y0) / (y1 - y0 + 1e-300) + x0
        )
        inside ^= cond
    return inside


def clip_events(
    events: ray.data.Dataset,
    routes: pa.Table,
    polygon: tuple[np.ndarray, np.ndarray],
    lrs,
    keep: str = "inside",
) -> ray.data.Dataset:
    """Split events at polygon-boundary crossings of their route geometry and
    keep the inside (or outside) pieces (``ext/base.py:2090-2307`` split/clip).

    Routes + polygon are broadcast in the task closure. Total mileage is
    conserved across keep='inside' + keep='outside' (reference clip test
    invariant, ``tests/test_ext_base.py:2251``). Midpoint membership decides
    each piece.
    """
    from linref_ray.kernels.geometry import interpolate_at_m

    poly_x = np.asarray(polygon[0], dtype=np.float64)
    poly_y = np.asarray(polygon[1], dtype=np.float64)
    lookup = {
        rid: (np.asarray(x), np.asarray(y), np.asarray(m))
        for rid, x, y, m in zip(
            routes["route_id"].to_pylist(),
            routes["xs"].to_pylist(),
            routes["ys"].to_pylist(),
            routes["ms"].to_pylist(),
        )
    }
    crossings = {
        rid: _polygon_crossings(x, y, m, poly_x, poly_y)
        for rid, (x, y, m) in lookup.items()
    }
    key_c = lrs.key_col[0]
    beg_c, end_c = lrs.beg_col, lrs.end_col

    def fn(t: pa.Table) -> pa.Table:
        # Vectorized per (batch x route): piece edges come from searchsorted
        # ranges into the route's sorted crossing measures, expanded with the
        # repeat/arange offsets trick; midpoint interpolation and the PIP
        # test run once per route over all pieces (no per-row Python loop).
        rids = np.asarray(t[key_c].to_pylist())
        beg = t[beg_c].to_numpy(zero_copy_only=False).astype(np.float64)
        end = t[end_c].to_numpy(zero_copy_only=False).astype(np.float64)
        rows_out: list[np.ndarray] = []
        b_out: list[np.ndarray] = []
        e_out: list[np.ndarray] = []
        for rid in np.unique(rids):
            geom = lookup.get(rid)
            if geom is None:
                continue
            rows = np.flatnonzero(rids == rid)
            cr = crossings.get(rid)
            if cr is None:
                cr = np.empty(0, dtype=np.float64)
            row_of, pb, pe = expand_pieces(beg[rows], end[rows], cr)
            mids = (pb + pe) / 2
            mx, my = interpolate_at_m(*geom, mids)
            inside = _point_in_polygon(mx, my, poly_x, poly_y)
            want = inside if keep == "inside" else ~inside
            rows_out.append(rows[row_of[want]])
            b_out.append(pb[want])
            e_out.append(pe[want])
        if not rows_out or not sum(len(r) for r in rows_out):
            return t.slice(0, 0)
        rows_all = np.concatenate(rows_out)
        b_all = np.concatenate(b_out)
        e_all = np.concatenate(e_out)
        # Deterministic order: original row, then piece measure.
        srt = np.lexsort([b_all, rows_all])
        rows_all, b_all, e_all = rows_all[srt], b_all[srt], e_all[srt]
        out = t.take(pa.array(rows_all))
        out = out.set_column(
            out.schema.get_field_index(beg_c), beg_c, pa.array(b_all)
        )
        return out.set_column(
            out.schema.get_field_index(end_c), end_c, pa.array(e_all)
        )

    return events.map_batches(fn, batch_format="pyarrow")


def parallel_project(
    src_routes: pa.Table | ray.data.Dataset,
    dst_routes: pa.Table,
    buffer: float = 10.0,
    n_samples: int = 32,
    res: int = 6,
) -> ray.data.Dataset | pa.Table:
    """Line→line conflation (``ext/spatial.py:16-273`` parallel Hausdorff
    projection): match each source polyline to the destination route that
    minimizes the directed Hausdorff distance of ``n_samples`` evenly-spaced
    source points, and report the matched measure range on the destination.

    The destination network is broadcast as a cell-indexed ``RouteIndex``;
    a batch kernel scores every (sample, candidate-route) pair vectorized.
    Returns ``(src_route_id, dst_route_id, hausdorff, m_beg, m_end)``;
    sources with no candidate within ``buffer`` are dropped.
    """
    from linref_ray.kernels.geometry import cumdist as _cumdist

    idx = RouteIndex(dst_routes, res=res, pad=buffer)
    idx_ref = ray.put(idx)

    def fn(t: pa.Table) -> pa.Table:
        index: RouteIndex = ray.get(idx_ref)
        out_src, out_dst, out_h, out_b, out_e = [], [], [], [], []
        for rid, xs, ys in zip(
            t["route_id"].to_pylist(), t["xs"].to_pylist(), t["ys"].to_pylist()
        ):
            x = np.asarray(xs)
            y = np.asarray(ys)
            cd = _cumdist(x, y)
            d = np.linspace(0.0, cd[-1], n_samples)
            pos = np.clip(np.searchsorted(cd, d), 1, len(cd) - 1)
            tt = (d - cd[pos - 1]) / np.maximum(cd[pos] - cd[pos - 1], 1e-12)
            sx = x[pos - 1] + tt * (x[pos] - x[pos - 1])
            sy = y[pos - 1] + tt * (y[pos] - y[pos - 1])
            cells = cell_of_points(sx, sy, index.res)
            qi, si = index.candidates(cells)
            if not len(qi):
                continue
            axp, ayp = index.ax[si], index.ay[si]
            vx, vy = index.bx[si] - axp, index.by[si] - ayp
            seg2 = vx * vx + vy * vy
            u = np.clip(
                np.divide(
                    (sx[qi] - axp) * vx + (sy[qi] - ayp) * vy,
                    seg2,
                    out=np.zeros_like(seg2),
                    where=seg2 > 0,
                ),
                0.0,
                1.0,
            )
            dx = sx[qi] - (axp + u * vx)
            dy = sy[qi] - (ayp + u * vy)
            dist = np.sqrt(dx * dx + dy * dy)
            m = index.m0[si] + u * (index.m1[si] - index.m0[si])
            rids = index.ridx[si]
            # Per (dst_route, sample): min distance + the M at the minimum.
            best: dict[int, np.ndarray] = {}
            best_m: dict[int, np.ndarray] = {}
            for r in np.unique(rids):
                mask = rids == r
                dmin = np.full(n_samples, np.inf)
                mmin = np.full(n_samples, np.nan)
                order = np.lexsort([dist[mask], qi[mask]])
                qv = qi[mask][order]
                firsts = np.concatenate([[True], qv[1:] != qv[:-1]])
                sel = order[firsts]
                dmin[qi[mask][sel]] = dist[mask][sel]
                mmin[qi[mask][sel]] = m[mask][sel]
                best[int(r)] = dmin
                best_m[int(r)] = mmin
            # Directed Hausdorff per candidate; require full coverage within
            # buffer (every sample has a match ≤ buffer).
            scored = [
                (float(dmin.max()), r)
                for r, dmin in ((r, best[r]) for r in best)
                if np.isfinite(dmin).all() and dmin.max() <= buffer
            ]
            if not scored:
                continue
            h, r = min(scored)
            out_src.append(rid)
            out_dst.append(index.route_ids[r])
            out_h.append(h)
            out_b.append(float(np.nanmin(best_m[r])))
            out_e.append(float(np.nanmax(best_m[r])))
        return pa.table(
            {
                "src_route_id": pa.array(out_src, pa.string()),
                "dst_route_id": pa.array(out_dst, pa.string()),
                "hausdorff": pa.array(out_h, pa.float64()),
                "m_beg": pa.array(out_b, pa.float64()),
                "m_end": pa.array(out_e, pa.float64()),
            }
        )

    if isinstance(src_routes, pa.Table):
        return fn(src_routes)
    return src_routes.map_batches(fn, batch_format="pyarrow")
