"""Dataset-level geometry operations over M-polyline list columns.

The geometry schema is three ``list<double>`` columns (xs, ys, ms) — see
``linref_ray.kernels.geometry`` for the kernels. This module adds the
reference's geometry-facing operators as batch transforms:

- WKT codecs for ``LINESTRING M`` (reference ``ext/base.py:2603-2674``,
  ``geometry/utilities.py:42-56``)
- ``build_geom_m`` — impute per-vertex M from [beg, end] proportional to
  chord length (``ext/base.py:991-1036``)
- ``extract_m_values`` — beg/end from first/last M (``ext/base.py:2676-2731``)
- ``cut_geometry`` — substring route geometry to each event's [beg, end]
  (the relation ``cut`` aggregator, ``events/relate.py:1623-1724``)
- ``interpolate_points`` — (x, y) at each point event's loc (relation
  ``interpolate``, ``relate.py:1523-1621``)
- ``add_chaining`` — chain ids from geometric contiguity
  (``ext/base.py:1114-1237``; kernel = ``geometry/merge.py``)
- ``generate_linear_events`` — build an LRS from bare geometry
  (``ext/base.py:1309-1477``)

Route geometry is broadcast (small side) — each kernel gets the route lookup
via a driver-built dict shipped once in the task closure.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray.data

from linref_ray.errors import GeometryMeasureError
from linref_ray.kernels.geometry import (
    cumdist,
    interpolate_at_m,
    merge_chains,
    substring_by_m,
)

_WKT_RE = re.compile(r"^\s*LINESTRING\s+M\s*\((.*)\)\s*$", re.IGNORECASE)


def parse_wkt_m(wkt: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """``LINESTRING M (x y m, …)`` → (xs, ys, ms)."""
    m = _WKT_RE.match(wkt)
    if not m:
        raise GeometryMeasureError(f"not a LINESTRING M WKT: {wkt[:60]!r}")
    triples = [
        [float(v) for v in part.split()] for part in m.group(1).split(",")
    ]
    arr = np.asarray(triples, dtype=np.float64)
    if arr.shape[1] != 3:
        raise GeometryMeasureError("LINESTRING M requires x y m per vertex")
    return arr[:, 0], arr[:, 1], arr[:, 2]


def format_wkt_m(xs, ys, ms) -> str:
    """(xs, ys, ms) → ``LINESTRING M (x y m, …)`` (``ext/base.py:2640-2674``)."""
    pts = ", ".join(
        f"{x:g} {y:g} {m:g}" for x, y, m in zip(xs, ys, ms)
    )
    return f"LINESTRING M ({pts})"


def parse_geom_wkt(ds: ray.data.Dataset, wkt_col: str = "wkt") -> ray.data.Dataset:
    """String WKT column → xs/ys/ms list columns."""

    def fn(t: pa.Table) -> pa.Table:
        xs, ys, ms = [], [], []
        for w in t[wkt_col].to_pylist():
            x, y, m = parse_wkt_m(w)
            xs.append(x.tolist())
            ys.append(y.tolist())
            ms.append(m.tolist())
        lt = pa.list_(pa.float64())
        return (
            t.append_column("xs", pa.array(xs, lt))
            .append_column("ys", pa.array(ys, lt))
            .append_column("ms", pa.array(ms, lt))
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def format_geom_wkt(ds: ray.data.Dataset, out_col: str = "wkt") -> ray.data.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        out = [
            format_wkt_m(x, y, m)
            for x, y, m in zip(
                t["xs"].to_pylist(), t["ys"].to_pylist(), t["ms"].to_pylist()
            )
        ]
        return t.append_column(out_col, pa.array(out))

    return ds.map_batches(fn, batch_format="pyarrow")


def check_exact_geoms(
    ds: ray.data.Dataset,
    wkt_col: str = "wkt",
    if_missing: bool = True,
    out_col: str = "geoms_exact",
) -> ray.data.Dataset:
    """Flag rows whose plain-XY geometry matches the M-typed geometry
    exactly (``ext/base.py:694-709``). In this engine the M geometry IS the
    xs/ys/ms columns, so the check compares the WKT column's vertices to
    xs/ys with zero tolerance (the reference's ``equals_exact(tolerance=0)``).
    Rows with either representation missing get ``if_missing``.
    """
    plain_re = re.compile(r"^\s*LINESTRING\s*\((.*)\)\s*$", re.IGNORECASE)

    def fn(t: pa.Table) -> pa.Table:
        n = len(t)
        have_lists = "xs" in t.column_names and "ys" in t.column_names
        if wkt_col not in t.column_names or not have_lists:
            return t.append_column(
                out_col, pa.array(np.full(n, if_missing, dtype=bool))
            )
        out = np.full(n, if_missing, dtype=bool)
        xs = t["xs"].to_pylist()
        ys = t["ys"].to_pylist()
        for i, w in enumerate(t[wkt_col].to_pylist()):
            if w is None or xs[i] is None:
                continue  # either representation missing → if_missing
            m = plain_re.match(w) or _WKT_RE.match(w)
            if not m:
                # present but not a LINESTRING (or junk): demonstrably NOT
                # an exact match (the reference's equals_exact is False).
                out[i] = False
                continue
            try:
                pts = [
                    [float(v) for v in part.split()[:2]]
                    for part in m.group(1).split(",")
                ]
                arr = np.asarray(pts, dtype=np.float64)
            except (ValueError, IndexError):
                out[i] = False  # malformed vertex text ≠ exact match
                continue
            gx, gy = np.asarray(xs[i]), np.asarray(ys[i])
            out[i] = (
                arr.ndim == 2
                and len(arr) == len(gx)
                and np.array_equal(arr[:, 0], gx)
                and np.array_equal(arr[:, 1], gy)
            )
        return t.append_column(out_col, pa.array(out))

    return ds.map_batches(fn, batch_format="pyarrow")


def coords_from_shapely_m(geom, reverse: bool = False):
    """Convert ONE shapely-style M-enabled geometry to ``(xs, ys, ms)``
    float64 arrays — the struct-ingestion recipe for users arriving from
    the reference's shapely surface (``ext/base.py:3381-3425``).

    Works with any object exposing ``.coords`` yielding ``(x, y, m)`` or
    ``(x, y, z, m)`` tuples — which is exactly shapely ≥ 2.1's LineString
    with M — so no shapely import is required here (the engine itself is
    deliberately shapely-free; geometry lives in Arrow ``list<double>``
    columns). M values must be monotonic non-decreasing; pass
    ``reverse=True`` to accept decreasing-M geometries by reversing them
    (mirroring the reference's ``parse_geoms_m_shapely(reverse=...)``).
    """
    coords = np.asarray(list(geom.coords), dtype=np.float64)
    if coords.ndim != 2 or coords.shape[1] not in (3, 4):
        raise GeometryMeasureError(
            "geometry coords must be (x, y, m) or (x, y, z, m) tuples; "
            f"got shape {coords.shape}"
        )
    xs, ys, ms = coords[:, 0], coords[:, 1], coords[:, -1]
    if np.any(np.diff(ms) < 0):
        if not reverse:
            raise GeometryMeasureError(
                "M values must be monotonic non-decreasing; pass "
                "reverse=True to accept reversed geometries"
            )
        xs, ys, ms = xs[::-1].copy(), ys[::-1].copy(), ms[::-1].copy()
        if np.any(np.diff(ms) < 0):
            raise GeometryMeasureError(
                "M values are not monotonic in either direction"
            )
    return xs, ys, ms


def table_from_shapely_m(
    records: list[dict],
    geom_key: str = "geometry",
    reverse: bool = False,
) -> pa.Table:
    """Driver-side ingestion helper: rows of ``{..., geometry: <shapely-M>}``
    → an Arrow table with ``xs/ys/ms`` ``list<double>`` columns ready for
    ``ray.data.from_arrow`` and every geometry operator in this engine.
    (Per-object Python is inherent to opaque geometry objects — convert
    once at ingest, then everything downstream is vectorized Arrow.)
    """
    if not records:
        raise ValueError("records must be non-empty")
    parsed = [coords_from_shapely_m(r[geom_key], reverse) for r in records]
    cols: dict[str, pa.Array] = {}
    for name in records[0]:
        if name == geom_key:
            continue
        cols[name] = pa.array([r[name] for r in records])
    for i, part in enumerate(("xs", "ys", "ms")):
        cols[part] = pa.array(
            [p[i].tolist() for p in parsed], pa.list_(pa.float64())
        )
    return pa.table(cols)


def build_geom_m(ds: ray.data.Dataset, beg_col="beg", end_col="end") -> ray.data.Dataset:
    """Impute vertex M linearly in chord distance over [beg, end]
    (``ext/base.py:991-1036``; math ``geometry/linestring_m.py:348-372``)."""

    def fn(t: pa.Table) -> pa.Table:
        out_ms = []
        begs = t[beg_col].to_numpy(zero_copy_only=False)
        ends = t[end_col].to_numpy(zero_copy_only=False)
        for x, y, b, e in zip(
            t["xs"].to_pylist(), t["ys"].to_pylist(), begs, ends
        ):
            cd = cumdist(np.asarray(x), np.asarray(y))
            total = cd[-1] if cd[-1] > 0 else 1.0
            out_ms.append((b + (e - b) * cd / total).tolist())
        idx = t.schema.get_field_index("ms")
        arr = pa.array(out_ms, pa.list_(pa.float64()))
        if idx == -1:
            return t.append_column("ms", arr)
        return t.set_column(idx, "ms", arr)

    return ds.map_batches(fn, batch_format="pyarrow")


def extract_m_values(
    ds: ray.data.Dataset, beg_col="beg", end_col="end"
) -> ray.data.Dataset:
    """beg/end ← first/last vertex M (``ext/base.py:2676-2731``)."""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        from linref_ray.events import _list_last

        ms = t["ms"]
        first = pc.list_element(ms, 0)
        last = pa.array(_list_last(ms), pa.float64())
        out = t
        for name, arr in ((beg_col, first), (end_col, last)):
            idx = out.schema.get_field_index(name)
            out = (
                out.append_column(name, arr)
                if idx == -1
                else out.set_column(idx, name, arr)
            )
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def _route_lookup(routes: pa.Table) -> dict:
    return {
        rid: (np.asarray(x), np.asarray(y), np.asarray(m))
        for rid, x, y, m in zip(
            routes["route_id"].to_pylist(),
            routes["xs"].to_pylist(),
            routes["ys"].to_pylist(),
            routes["ms"].to_pylist(),
        )
    }


def cut_geometry(
    events: ray.data.Dataset,
    routes: pa.Table,
    key_col="route_id",
    beg_col="beg",
    end_col="end",
) -> ray.data.Dataset:
    """Substring the route geometry to each event's [beg, end] (relation
    ``cut``): adds xs/ys/ms columns; adjacent events share exact boundary
    coordinates (same lerp as ``substring_m_coords``)."""
    from linref_ray.kernels.geometry import substring_by_m_many

    lookup = _route_lookup(routes)

    def fn(t: pa.Table) -> pa.Table:
        # Vectorized per (batch x route): one substring_by_m_many call per
        # route present in the batch, scattered back to row order via the
        # offsets trick + ListArray.from_arrays (no per-row Python loop).
        n = len(t)
        rids = np.asarray(t[key_col].to_pylist())
        beg = t[beg_col].to_numpy(zero_copy_only=False).astype(np.float64)
        end = t[end_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lengths = np.zeros(n, dtype=np.int64)
        valid = np.zeros(n, dtype=bool)
        parts: list[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = []
        for rid in np.unique(rids):
            geom = lookup.get(rid)
            if geom is None:
                continue
            rows = np.flatnonzero(rids == rid)
            ln, fx, fy, fm = substring_by_m_many(*geom, beg[rows], end[rows])
            lengths[rows] = ln
            valid[rows] = True
            parts.append((rows, fx, fy, fm))
        off = np.concatenate([[0], np.cumsum(lengths)])
        total = int(off[-1])
        gx = np.empty(total, dtype=np.float64)
        gy = np.empty(total, dtype=np.float64)
        gm = np.empty(total, dtype=np.float64)
        for rows, fx, fy, fm in parts:
            ln = lengths[rows]
            loc_cum = np.concatenate([[0], np.cumsum(ln)])[:-1]
            pos = np.repeat(off[rows] - loc_cum, ln) + np.arange(len(fx))
            gx[pos] = fx
            gy[pos] = fy
            gm[pos] = fm
        # A null offset marks that row's list as null (rows with no route).
        if valid.all():
            offsets = pa.array(off, pa.int64())
        else:
            offsets = pa.array(
                off, pa.int64(), mask=np.concatenate([~valid, [False]])
            )

        def lst(v: np.ndarray) -> pa.Array:
            return pa.LargeListArray.from_arrays(
                offsets, pa.array(v, pa.float64())
            ).cast(pa.list_(pa.float64()))

        return (
            t.append_column("xs", lst(gx))
            .append_column("ys", lst(gy))
            .append_column("ms", lst(gm))
        )

    return events.map_batches(fn, batch_format="pyarrow")


def interpolate_points(
    points: ray.data.Dataset,
    routes: pa.Table,
    key_col="route_id",
    loc_col="loc",
) -> ray.data.Dataset:
    """(x, y) at each point event's measure (relation ``interpolate``).

    Vectorized per (batch × route): rows grouped by route inside the batch,
    one searchsorted interpolation per route segment set.
    """
    lookup = _route_lookup(routes)

    def fn(t: pa.Table) -> pa.Table:
        rids = np.asarray(t[key_col].to_pylist())
        locs = t[loc_col].to_numpy(zero_copy_only=False).astype(np.float64)
        x_out = np.full(len(t), np.nan)
        y_out = np.full(len(t), np.nan)
        for rid in np.unique(rids):
            geom = lookup.get(rid)
            if geom is None:
                continue
            mask = rids == rid
            px, py = interpolate_at_m(*geom, locs[mask])
            x_out[mask] = px
            y_out[mask] = py
        return t.append_column("x", pa.array(x_out)).append_column(
            "y", pa.array(y_out)
        )

    return points.map_batches(fn, batch_format="pyarrow")


def add_chaining(
    fragments: ray.data.Dataset,
    key_col: str = "route_id",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Chain ids from geometric contiguity per key (``ext/base.py:1114-1237``):
    fragments whose termini touch join one chain; output adds ``chain`` and
    ``chain_pos`` columns."""
    from linref_ray.partition import KEYCOL, PID, add_partition_cols

    def part(t: pa.Table) -> pa.Table:
        return add_partition_cols(t, (key_col,), num_partitions)

    def kernel(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("chain", pa.array([], pa.int64())).append_column(
                "chain_pos", pa.array([], pa.int64())
            ).drop_columns([PID, KEYCOL])
        keys = np.asarray(t[key_col].to_pylist())
        xs = t["xs"].to_pylist()
        ys = t["ys"].to_pylist()
        first_pts = np.array([[x[0], y[0]] for x, y in zip(xs, ys)])
        last_pts = np.array([[x[-1], y[-1]] for x, y in zip(xs, ys)])
        chain = np.empty(len(t), dtype=np.int64)
        pos = np.empty(len(t), dtype=np.int64)
        base = 0
        for k in np.unique(keys):
            m = keys == k
            cid, cpos = merge_chains(first_pts[m], last_pts[m])
            chain[m] = cid + base
            pos[m] = cpos
            base += cid.max() + 1 if len(cid) else 0
        return (
            t.append_column("chain", pa.array(chain))
            .append_column("chain_pos", pa.array(pos))
            .drop_columns([PID, KEYCOL])
        )

    return (
        fragments.map_batches(part, batch_format="pyarrow")
        .repartition(num_partitions)
        .groupby(PID)
        .map_groups(kernel, batch_format="pyarrow")
    )


def generate_linear_events(
    fragments: ray.data.Dataset,
    key_col: str = "route_id",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Build an LRS from bare geometry (``ext/base.py:1309-1477``): chain
    fragments per key, order them, assign cumulative [beg, end] from chord
    lengths, and impute vertex Ms."""
    chained = add_chaining(fragments, key_col, num_partitions)

    def fn(t: pa.Table) -> pa.Table:
        # Fully vectorized over the flat list buffers: within-row chord
        # cumsum via a global cumsum minus row-start prefixes, then a
        # segmented exclusive prefix of row lengths per (key, chain) for
        # the beg/end assignment — no per-row Python loop.
        if len(t) == 0:
            return (
                t.append_column("beg", pa.array([], pa.float64()))
                .append_column("end", pa.array([], pa.float64()))
                .append_column("ms", pa.array([], pa.list_(pa.float64())))
            )
        key = np.asarray(t[key_col].to_pylist())
        chain = t["chain"].to_numpy(zero_copy_only=False)
        cpos = t["chain_pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort([cpos, chain, key])
        t = t.take(pa.array(order))
        key, chain = key[order], chain[order]

        xs = t["xs"].combine_chunks()
        ys = t["ys"].combine_chunks()
        off = xs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        fx = xs.values.to_numpy(zero_copy_only=False).astype(np.float64)
        fy = ys.values.to_numpy(zero_copy_only=False).astype(np.float64)
        row_len = np.diff(off)
        n_flat = len(fx)
        seg = np.zeros(n_flat, dtype=np.float64)
        if n_flat > 1:
            d = np.sqrt(np.diff(fx) ** 2 + np.diff(fy) ** 2)
            seg[1:] = d
            seg[off[1:-1]] = 0.0  # no distance across row boundaries
        gc = np.cumsum(seg)
        cd_within = gc - np.repeat(gc[off[:-1]], row_len)
        lengths = cd_within[off[1:] - 1]

        from linref_ray.kernels.intervals import group_codes

        g = group_codes(key, chain)
        new_g = np.concatenate([[True], g[1:] != g[:-1]])
        cum = np.cumsum(lengths)
        excl = cum - lengths  # global exclusive prefix
        base = np.repeat(excl[np.flatnonzero(new_g)],
                         np.diff(np.concatenate(
                             [np.flatnonzero(new_g), [len(g)]])))
        beg = excl - base
        end = beg + lengths
        ms_flat = cd_within + np.repeat(beg, row_len)
        ms = pa.ListArray.from_arrays(
            pa.array(off, pa.int32()), pa.array(ms_flat, pa.float64())
        )
        return (
            t.append_column("beg", pa.array(beg))
            .append_column("end", pa.array(end))
            .append_column("ms", ms)
        )

    # Per-(key, chain) cumulative measures need chain-atomic groups — reuse
    # the chained output's partition structure (chain ⊆ key ⊆ partition).
    return chained.map_batches(fn, batch_format="pyarrow", batch_size=None)
