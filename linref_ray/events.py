"""Stateless per-batch event operations (SURVEY §2.2).

Every op here is a zero-copy-Arrow ``map_batches`` transform — no shuffle, no
state, columns not involved pass through untouched. These mirror the
reference's vectorized measure math (linref ``events/modify.py:182-304``,
``ext/base.py:596-638,1239-1307``) expressed as ``pyarrow.compute`` kernels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from linref_ray.lrs import LRS


def _list_last(col) -> np.ndarray:
    """Last element of each list in a list<double> column, via offsets
    (no per-row Python). Lists must be non-empty."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = arr.offsets.to_numpy(zero_copy_only=False)
    vals = arr.values.to_numpy(zero_copy_only=False)
    return vals[offs[1:] - 1]


def _set(tbl: pa.Table, name: str, arr) -> pa.Table:
    idx = tbl.schema.get_field_index(name)
    if idx == -1:
        return tbl.append_column(name, arr)
    return tbl.set_column(idx, name, arr)


def extend(ds: ray.data.Dataset, lrs: LRS, d0: float = 0.0, d1: float = 0.0):
    """beg -= d0, end += d1; point events upgrade to linear
    (``events/modify.py:182-225``)."""

    def fn(t: pa.Table) -> pa.Table:
        if lrs.is_point:
            loc = pc.cast(t[lrs.loc_col], pa.float64())
            t = _set(t, lrs.beg_col or "beg", pc.subtract(loc, d0))
            t = _set(t, lrs.end_col or "end", pc.add(loc, d1))
            return t
        t = _set(t, lrs.beg_col, pc.subtract(pc.cast(t[lrs.beg_col], pa.float64()), d0))
        t = _set(t, lrs.end_col, pc.add(pc.cast(t[lrs.end_col], pa.float64()), d1))
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


def shift(ds: ray.data.Dataset, lrs: LRS, delta: float):
    """All measures += delta (``events/modify.py:227-258``)."""

    def fn(t: pa.Table) -> pa.Table:
        for c in (lrs.beg_col, lrs.end_col, lrs.loc_col):
            if c and c in t.column_names:
                t = _set(t, c, pc.add(pc.cast(t[c], pa.float64()), delta))
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


def round_measures(
    ds: ray.data.Dataset, lrs: LRS, decimals: int = 0, factor: float | None = None
):
    """Round measures to decimals or nearest multiple of ``factor``
    (``events/modify.py:260-304``)."""

    def fn(t: pa.Table) -> pa.Table:
        for c in (lrs.beg_col, lrs.end_col, lrs.loc_col):
            if c and c in t.column_names:
                v = pc.cast(t[c], pa.float64())
                if factor is not None:
                    v = pc.multiply(
                        pc.round(pc.divide(v, factor)), factor
                    )
                else:
                    v = pc.round(v, ndigits=decimals)
                t = _set(t, c, v)
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


def point_to_linear(
    ds: ray.data.Dataset, lrs: LRS, beg_col: str = "beg", end_col: str = "end"
):
    """Copy loc → beg/end columns (``ext/base.py:1239-1307``)."""

    def fn(t: pa.Table) -> pa.Table:
        loc = pc.cast(t[lrs.loc_col], pa.float64())
        t = _set(t, beg_col, loc)
        t = _set(t, end_col, loc)
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


def set_monotonic(ds: ray.data.Dataset, lrs: LRS):
    """Swap beg/end so beg <= end (``events/base.py:657-673``)."""

    def fn(t: pa.Table) -> pa.Table:
        b = pc.cast(t[lrs.beg_col], pa.float64())
        e = pc.cast(t[lrs.end_col], pa.float64())
        t = _set(t, lrs.beg_col, pc.min_element_wise(b, e))
        t = _set(t, lrs.end_col, pc.max_element_wise(b, e))
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


def drop_invalid(ds: ray.data.Dataset, lrs: LRS):
    """Drop rows with nulls in key/measure columns (``ext/base.py:596-638``)."""
    cols = lrs.required_cols()

    def fn(t: pa.Table) -> pa.Table:
        mask = None
        for c in cols:
            v = pc.is_valid(t[c])
            if pa.types.is_floating(t.schema.field(c).type):
                v = pc.and_(v, pc.invert(pc.is_nan(t[c])))
            mask = v if mask is None else pc.and_(mask, v)
        return t.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def select_group(ds: ray.data.Dataset, lrs: LRS, key_value):
    """Filter to one route key (``events/selection.py:146-294``)."""
    values = key_value if isinstance(key_value, tuple) else (key_value,)

    def fn(t: pa.Table) -> pa.Table:
        mask = None
        for c, v in zip(lrs.key_col, values):
            m = pc.equal(t[c], v)
            mask = m if mask is None else pc.and_(mask, m)
        return t.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def drop_group(ds: ray.data.Dataset, lrs: LRS, key_value):
    """Drop one route key's rows (``events/selection.py:271-294``)."""
    values = key_value if isinstance(key_value, tuple) else (key_value,)

    def fn(t: pa.Table) -> pa.Table:
        mask = None
        for c, v in zip(lrs.key_col, values):
            m = pc.equal(t[c], v)
            mask = m if mask is None else pc.and_(mask, m)
        return t.filter(pc.invert(mask))

    return ds.map_batches(fn, batch_format="pyarrow")


def _id_filter(
    ds: ray.data.Dataset, ids, id_col: str, invert: bool = False
) -> ray.data.Dataset:
    """Broadcast semi-join: keep (or drop) rows whose id is in ``ids``.

    The id set is shipped once via ``ray.put`` and probed per batch with a
    vectorized ``is_in`` — the dataset itself never shuffles.
    """
    arr = pa.array(np.unique(np.asarray(list(ids), dtype=np.int64)))
    ref = ray.put(arr)

    def fn(t: pa.Table) -> pa.Table:
        vals = ray.get(ref)
        m = pc.is_in(pc.cast(t[id_col], pa.int64()), value_set=vals)
        if invert:
            m = pc.invert(pc.fill_null(m, False))
        return t.filter(m)

    return ds.map_batches(fn, batch_format="pyarrow")


def select_index(ds: ray.data.Dataset, ids, id_col: str = "event_id"):
    """Select events by id values (``events/selection.py:199-219``)."""
    return _id_filter(ds, ids, id_col)


def drop(ds: ray.data.Dataset, ids, id_col: str = "event_id"):
    """Drop events by id values (``events/selection.py:257-270``)."""
    return _id_filter(ds, ids, id_col, invert=True)


def _sorted_ids(ds: ray.data.Dataset, id_col: str) -> np.ndarray:
    """All ids, ascending. The positional index of a distributed collection
    is defined over id-sorted order (the engine's stable row identity); the
    pull is slim (one int64 column) and is inherently no larger than the
    positional selector the caller already holds.
    """
    import ray as _ray

    parts = _ray.get(ds.select_columns([id_col]).to_arrow_refs())
    ids = np.concatenate(
        [p[id_col].to_numpy(zero_copy_only=False) for p in parts]
    ) if parts else np.empty(0, dtype=np.int64)
    ids = np.sort(ids.astype(np.int64))
    if len(ids) > 1 and (ids[1:] == ids[:-1]).any():
        # Positional selection resolves to an id-set filter, which cannot
        # distinguish rows sharing an id — fail loudly instead of silently
        # selecting every duplicate.
        raise ValueError(
            f"positional selection requires unique {id_col!r} values; "
            "duplicates present"
        )
    return ids


def select_mask(
    ds: ray.data.Dataset, mask, id_col: str = "event_id"
) -> ray.data.Dataset:
    """Select by a boolean mask aligned to id-sorted positional order
    (``events/selection.py:183-197``)."""
    ids = _sorted_ids(ds, id_col)
    mask = np.asarray(mask, dtype=bool)
    if len(mask) != len(ids):
        raise ValueError(
            f"mask length {len(mask)} != collection size {len(ids)}"
        )
    return _id_filter(ds, ids[mask], id_col)


def select_slice(
    ds: ray.data.Dataset, slice_: slice, id_col: str = "event_id"
) -> ray.data.Dataset:
    """Select by positional slice over id-sorted order
    (``events/selection.py:167-181``)."""
    ids = _sorted_ids(ds, id_col)
    return _id_filter(ds, ids[slice_], id_col)


def select(ds: ray.data.Dataset, selector, id_col: str = "event_id"):
    """Generic selector dispatch: slice, boolean mask, or id array
    (``events/selection.py:146-165``)."""
    if isinstance(selector, slice):
        return select_slice(ds, selector, id_col)
    arr = np.asarray(selector)
    if arr.dtype == bool:
        return select_mask(ds, arr, id_col)
    return select_index(ds, arr, id_col)


def lengths(ds: ray.data.Dataset, lrs: LRS, out_col: str = "length"):
    """Derived length column (``events/base.py:125-132``)."""

    def fn(t: pa.Table) -> pa.Table:
        return _set(
            t,
            out_col,
            pc.subtract(
                pc.cast(t[lrs.end_col], pa.float64()),
                pc.cast(t[lrs.beg_col], pa.float64()),
            ),
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def add_bearing(
    ds: ray.data.Dataset,
    xs_col: str = "xs",
    ys_col: str = "ys",
    out_col: str = "bearing",
    cardinal_col: str | None = None,
    n_winds: int = 8,
):
    """First→last vertex bearing + optional compass label
    (``utility/direction.py:7-76``)."""
    from linref_ray.kernels.geometry import bearing, cardinal_direction

    def fn(t: pa.Table) -> pa.Table:
        xs = t[xs_col]
        ys = t[ys_col]
        x0 = pc.list_element(xs, 0).to_numpy(zero_copy_only=False)
        y0 = pc.list_element(ys, 0).to_numpy(zero_copy_only=False)
        xl = _list_last(xs)
        yl = _list_last(ys)
        b = bearing(x0, y0, xl, yl)
        t = _set(t, out_col, pa.array(b))
        if cardinal_col:
            t = _set(
                t, cardinal_col, pa.array(cardinal_direction(b, n_winds))
            )
        return t

    return ds.map_batches(fn, batch_format="pyarrow")
