"""Dataset-level event engineering: dissolve / resegment / separate /
concatenate / integrate / find_inside / duplicated (SURVEY §2.5, §2.7).

Grouped operators follow the engine's one partitioning pattern: hash the
route key into ``__pid`` partitions, ``groupby(PID).map_groups`` with a
multi-route vectorized kernel (one Python call per partition). Resegment is
the exception — a pure stateless row expansion, no shuffle at all.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from linref_ray.kernels.intervals import (
    duplicated_group,
    find_inside_sorted_group,
    group_codes,
    iter_group_segments,
    segmented_cummax as _segmented_cummax,
)
from linref_ray.kernels.modify import (
    dissolve_sorted,
    integrate_group,
    integrate_group_expand,
    resegment_rows,
)
from linref_ray.kernels.modify import separate as separate_kernel
from linref_ray.lrs import LRS
from linref_ray.partition import (
    DEFAULT_NUM_PARTITIONS,
    KEYCOL,
    PID,
    SIDE,
    add_partition_cols,
)


def _np(tbl: pa.Table, col: str) -> np.ndarray:
    return tbl[col].to_numpy(zero_copy_only=False)


def _partitioned(ds: ray.data.Dataset, lrs: LRS, num_partitions: int):
    def fn(t: pa.Table) -> pa.Table:
        return add_partition_cols(
            t, lrs.effective_key_col(t.column_names), num_partitions
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def dissolve(
    ds: ray.data.Dataset,
    lrs: LRS,
    retain: Sequence[str] = (),
    agg_counts: bool = True,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> ray.data.Dataset:
    """Merge consecutive ranges per (key + retain) group.

    Mirrors the accessor dissolve (``ext/base.py:1848-1980`` over
    ``events/modify.py:6-100``): events are standard-sorted within each
    (key, retain) group and exactly-consecutive runs (end == next beg)
    collapse to one row carrying the group columns, run [beg, end], and the
    run's event count.
    """
    retain = tuple(retain)
    beg_c, end_c = lrs.beg_col, lrs.end_col

    def kernel(tbl: pa.Table) -> pa.Table:
        keys = lrs.effective_key_col(tbl.column_names)
        out_cols = list(keys) + list(retain)
        if len(tbl) == 0:
            cols = {c: tbl[c] for c in out_cols if c in tbl.column_names}
            cols[beg_c] = pa.array([], pa.float64())
            cols[end_c] = pa.array([], pa.float64())
            if agg_counts:
                cols["n_events"] = pa.array([], pa.int64())
            return pa.table(cols)
        beg = _np(tbl, beg_c).astype(np.float64)
        end = _np(tbl, end_c).astype(np.float64)
        garrs = [_np(tbl, c) for c in (*keys, *retain)]
        g = group_codes(*garrs)
        order = np.lexsort([end, beg, g])
        run_id, first, ob, oe = dissolve_sorted(
            g[order], beg[order], end[order]
        )
        take = pa.array(order[first])
        cols = {c: tbl[c].take(take) for c in out_cols}
        cols[beg_c] = pa.array(ob)
        cols[end_c] = pa.array(oe)
        if agg_counts:
            counts = np.bincount(run_id, minlength=len(first)).astype(np.int64)
            cols["n_events"] = pa.array(counts)
        return pa.table(cols)

    return (
        _partitioned(ds, lrs, num_partitions)
        .repartition(num_partitions)
        .groupby(PID)
        .map_groups(kernel, batch_format="pyarrow")
    )


def resegment(
    ds: ray.data.Dataset,
    lrs: LRS,
    length: float = 1.0,
    fill: str = "cut",
) -> ray.data.Dataset:
    """Split events into ``length``-sized windows; stateless row expansion.

    Mirrors ``events/modify.py:306-433``; attribute columns are carried
    through the expansion directly (cheaper than the reference's
    merge-back-by-source-index, ``ext/base.py:1764-1765``).
    """

    def fn(t: pa.Table) -> pa.Table:
        beg = _np(t, lrs.beg_col).astype(np.float64)
        end = _np(t, lrs.end_col).astype(np.float64)
        src, nb, ne = resegment_rows(beg, end, length, fill)
        out = t.take(pa.array(src))
        bi = out.schema.get_field_index(lrs.beg_col)
        out = out.set_column(bi, lrs.beg_col, pa.array(nb))
        ei = out.schema.get_field_index(lrs.end_col)
        return out.set_column(ei, lrs.end_col, pa.array(ne))

    return ds.map_batches(fn, batch_format="pyarrow")


def separate(
    ds: ray.data.Dataset,
    lrs: LRS,
    anchor: str = "centers",
    method: str = "balanced",
    drop_short: bool = False,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    id_col: str = "event_id",
) -> ray.data.Dataset:
    """Resolve overlaps within one collection (``events/modify.py:435-595``).

    Ties are broken deterministically: exact duplicates keep the lowest
    ``id_col`` (the reference keeps "first in input order", which is not
    stable under a distributed shuffle; sorting by id inside the partition
    pins it — and lets the SQL oracle express the same choice).
    """

    def kernel(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return tbl.drop_columns([PID, KEYCOL])
        if id_col in tbl.column_names:
            tbl = tbl.take(
                pa.array(np.argsort(_np(tbl, id_col), kind="stable"))
            )
        beg = _np(tbl, lrs.beg_col).astype(np.float64)
        end = _np(tbl, lrs.end_col).astype(np.float64)
        g = group_codes(_np(tbl, KEYCOL))
        nb, ne = separate_kernel(g, beg, end, anchor=anchor, method=method)
        out = tbl
        out = out.set_column(
            out.schema.get_field_index(lrs.beg_col), lrs.beg_col, pa.array(nb)
        )
        out = out.set_column(
            out.schema.get_field_index(lrs.end_col), lrs.end_col, pa.array(ne)
        )
        if drop_short:
            out = out.filter(pa.array(ne - nb > 0))
        return out.drop_columns([PID, KEYCOL])

    return (
        _partitioned(ds, lrs, num_partitions)
        .repartition(num_partitions)
        .groupby(PID)
        .map_groups(kernel, batch_format="pyarrow")
    )


def flag_duplicated(
    ds: ray.data.Dataset,
    lrs: LRS,
    subset: Sequence[str] | None = None,
    keep: str = "first",
    out_col: str = "duplicated",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> ray.data.Dataset:
    """Add a duplicate mask over anchor columns, group-aware
    (``events/analyze.py:4-114``; ``find_same`` = subset (beg, end))."""
    if subset is None:
        subset = [c for c in (lrs.beg_col, lrs.end_col, lrs.loc_col) if c]

    def kernel(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return tbl.append_column(out_col, pa.array([], pa.bool_())).drop_columns(
                [PID, KEYCOL]
            )
        g = group_codes(_np(tbl, KEYCOL))
        arrays = [_np(tbl, c) for c in subset]
        order = np.argsort(g, kind="stable")
        mask = np.zeros(len(tbl), dtype=bool)
        g_s = g[order]
        for a, z in iter_group_segments(g_s):
            seg = order[a:z]
            mask[seg] = duplicated_group([arr[seg] for arr in arrays], keep)
        return tbl.append_column(out_col, pa.array(mask)).drop_columns(
            [PID, KEYCOL]
        )

    return (
        _partitioned(ds, lrs, num_partitions)
        .repartition(num_partitions)
        .groupby(PID)
        .map_groups(kernel, batch_format="pyarrow")
    )


def flag_inside(
    ds: ray.data.Dataset,
    lrs: LRS,
    enforce_edges: bool = False,
    out_col: str = "inside",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> ray.data.Dataset:
    """Add a mask of events fully inside another (``events/analyze.py:116-193``)."""

    def kernel(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return tbl.append_column(out_col, pa.array([], pa.bool_())).drop_columns(
                [PID, KEYCOL]
            )
        g = group_codes(_np(tbl, KEYCOL))
        beg = _np(tbl, lrs.beg_col).astype(np.float64)
        end = _np(tbl, lrs.end_col).astype(np.float64)
        order = np.argsort(g, kind="stable")
        mask = np.zeros(len(tbl), dtype=bool)
        g_s = g[order]
        for a, z in iter_group_segments(g_s):
            seg = order[a:z]
            mask[seg] = find_inside_sorted_group(beg[seg], end[seg], enforce_edges)
        return tbl.append_column(out_col, pa.array(mask)).drop_columns(
            [PID, KEYCOL]
        )

    return (
        _partitioned(ds, lrs, num_partitions)
        .repartition(num_partitions)
        .groupby(PID)
        .map_groups(kernel, batch_format="pyarrow")
    )


def concatenate(*datasets: ray.data.Dataset) -> ray.data.Dataset:
    """Union-all (``events/modify.py:102-180``)."""
    out = datasets[0]
    for d in datasets[1:]:
        out = out.union(d)
    return out


def integrate(
    layers: Sequence[ray.data.Dataset],
    lrs_list: Sequence[LRS],
    fill_gaps: bool = False,
    split_at_locs: bool = False,
    expand: bool = False,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> ray.data.Dataset:
    """n-way least-common-interval union (``events/integration.py:6-161``).

    Output: one row per grid interval with the route key columns, ``beg`` /
    ``end``, and per-layer matched-event ordinal ``ix_<layer>`` (-1 = none;
    ordinals are within-(partition,route) positions in each layer's input
    order — pair with an id column carried per layer for joins).
    """
    n_layers = len(layers)
    key_cols = lrs_list[0].key_col

    prepared = []
    for i, (ds, lrs) in enumerate(zip(layers, lrs_list)):
        def fn(t: pa.Table, i=i, lrs=lrs) -> pa.Table:
            n = len(t)
            cols: dict = {}
            if lrs.is_linear:
                cols["beg"] = pc.cast(t[lrs.beg_col], pa.float64())
                cols["end"] = pc.cast(t[lrs.end_col], pa.float64())
            else:
                cols["beg"] = pa.nulls(n, pa.float64())
                cols["end"] = pa.nulls(n, pa.float64())
            if lrs.loc_col and lrs.loc_col in t.column_names:
                cols["loc"] = pc.cast(t[lrs.loc_col], pa.float64())
            else:
                cols["loc"] = pa.nulls(n, pa.float64())
            out = pa.table(cols)
            for kc in key_cols:
                out = out.append_column(kc, t[kc])
            out = add_partition_cols(out, key_cols, num_partitions, side=i)
            return out

        prepared.append(ds.map_batches(fn, batch_format="pyarrow"))

    def kernel(tbl: pa.Table) -> pa.Table:
        base_cols = {c: [] for c in key_cols}
        begs_out: list[np.ndarray] = []
        ends_out: list[np.ndarray] = []
        idx_out: list[np.ndarray] = []
        key_rows: list[int] = []
        if len(tbl):
            key = _np(tbl, KEYCOL)
            layer = _np(tbl, SIDE)
            beg = _np(tbl, "beg")
            end = _np(tbl, "end")
            loc = _np(tbl, "loc")
            order = np.lexsort([layer, key])
            key_s = key[order]
            layer_s = layer[order]
            for a, z in iter_group_segments(key_s):
                seg = order[a:z]
                lb, le, ll = [], [], []
                for i in range(n_layers):
                    m = seg[layer_s[a:z] == i]
                    b = beg[m]
                    lb.append(b[~np.isnan(b)])
                    e = end[m]
                    le.append(e[~np.isnan(e)])
                    l = loc[m]
                    ll.append(l[~np.isnan(l)])
                if all(len(b) == 0 for b in lb) and all(
                    len(x) == 0 for x in ll
                ):
                    continue
                if expand:
                    ob, oe, idx = integrate_group_expand(
                        lb, le, ll, fill_gaps=fill_gaps,
                        split_at_locs=split_at_locs,
                    )
                else:
                    ob, oe, idx, _ = integrate_group(
                        lb, le, ll, fill_gaps=fill_gaps,
                        split_at_locs=split_at_locs,
                    )
                begs_out.append(ob)
                ends_out.append(oe)
                idx_out.append(idx)
                key_rows.extend([seg[0]] * len(ob))
        if not begs_out:
            cols = {c: pa.array([], tbl.schema.field(c).type) for c in key_cols}
            cols["beg"] = pa.array([], pa.float64())
            cols["end"] = pa.array([], pa.float64())
            for i in range(n_layers):
                cols[f"ix_{i}"] = pa.array([], pa.int64())
            return pa.table(cols)
        take = pa.array(np.asarray(key_rows, dtype=np.int64))
        cols = {c: tbl[c].take(take) for c in key_cols}
        cols["beg"] = pa.array(np.concatenate(begs_out))
        cols["end"] = pa.array(np.concatenate(ends_out))
        allidx = np.vstack(idx_out)
        for i in range(n_layers):
            cols[f"ix_{i}"] = pa.array(allidx[:, i])
        return pa.table(cols)

    return (
        concatenate(*prepared)
        .repartition(num_partitions)
        .groupby(PID)
        .map_groups(kernel, batch_format="pyarrow")
    )


def constrain_to(
    ds: ray.data.Dataset,
    other: ray.data.Dataset,
    lrs: LRS,
    other_lrs: LRS | None = None,
    dissolve_result: bool = False,
    id_col: str = "event_id",
    other_id_col: str = "event_id",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> ray.data.Dataset:
    """Clip events to the coverage domain of a reference layer
    (``ext/base.py:1982-2088``): each event is replaced by its intersections
    with ``other``'s ranges (one row per overlapping piece, original
    ``event_id`` retained as lineage), optionally merged back per source
    event where pieces are consecutive.
    """
    from linref_ray.kernels.intervals import overlay_pairs
    from linref_ray.relate import _prepare_side

    other_lrs = other_lrs or lrs
    lk = lrs.effective_key_col(ds.schema().names)
    rk = other_lrs.effective_key_col(other.schema().names)
    if len(lk) != len(rk):
        raise ValueError(
            f"key level mismatch: events group by {lk}, coverage by {rk} — "
            "a chain_col must be present on both sides (or neither)"
        )
    lp = _prepare_side(ds, lrs, 0, id_col, (), num_partitions, {}, None)
    rp = _prepare_side(
        other, other_lrs, 1, other_id_col, (), num_partitions, {}, None
    )

    def kernel(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "route_key": pa.array([], pa.string()),
                    "beg": pa.array([], pa.float64()),
                    "end": pa.array([], pa.float64()),
                }
            )
        key = _np(tbl, KEYCOL)
        side = _np(tbl, SIDE)
        beg = _np(tbl, "beg")
        end = _np(tbl, "end")
        ids = _np(tbl, "__id")
        order = np.lexsort([end, beg, side, key])
        key_s, side_s = key[order], side[order]
        out_id, out_key, out_b, out_e = [], [], [], []
        for a, z in iter_group_segments(key_s):
            split = a + int(np.searchsorted(side_s[a:z], 1))
            lseg, rseg = order[a:split], order[split:z]
            if not len(lseg) or not len(rseg):
                continue
            li, ri, w, ob, oe = overlay_pairs(
                beg[lseg], end[lseg], beg[rseg], end[rseg],
                normalize=False, return_bounds=True,
            )
            if not len(li):
                continue
            sid = ids[lseg][li]
            if dissolve_result:
                # Merge consecutive clipped pieces per source event.
                srt = np.lexsort([oe, ob, sid])
                sid, ob, oe = sid[srt], ob[srt], oe[srt]
                # Running max of piece ends must reset at each sid boundary:
                # a global cummax lets a prior source's long piece bridge a
                # later source's disjoint pieces into one bogus merged run.
                new_sid = np.concatenate([[True], sid[1:] != sid[:-1]])
                cummax = _segmented_cummax(oe, new_sid)
                consec = (ob[1:] <= cummax[:-1]) & (sid[1:] == sid[:-1])
                first = np.concatenate([[0], np.flatnonzero(~consec) + 1])
                # max end per run (pieces may nest when 'other' self-overlaps)
                run_max = np.maximum.reduceat(oe, first)
                sid, ob, oe = sid[first], ob[first], run_max
            out_id.append(sid)
            out_key.append(np.repeat(key_s[a], len(sid)))
            out_b.append(ob)
            out_e.append(oe)
        if not out_id:
            return kernel(tbl.slice(0, 0))
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id)),
                "route_key": pa.array(np.concatenate(out_key)),
                "beg": pa.array(np.concatenate(out_b)),
                "end": pa.array(np.concatenate(out_e)),
            }
        )

    return (
        lp.union(rp)
        .repartition(num_partitions)
        .groupby(PID)
        .map_groups(kernel, batch_format="pyarrow")
    )


def impute_keys(
    target: ray.data.Dataset,
    source: ray.data.Dataset,
    reduced_lrs: LRS,
    fill_cols: Sequence[str],
    id_col: str = "event_id",
    source_id_col: str = "event_id",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> ray.data.Dataset:
    """Fill missing key columns on ``target`` from the first intersecting
    ``source`` event under a reduced-key LRS (``ext/base.py:1586-1672``)."""
    from linref_ray.joins import hash_join
    from linref_ray.relate import Relation

    rel = Relation(
        target, source, reduced_lrs, reduced_lrs,
        id_col=id_col, right_id_col=source_id_col,
        right_cols=tuple(fill_cols), num_partitions=num_partitions,
    )
    out = target
    for c in fill_cols:
        agg = rel.first(c, target="left", out_col=f"__fill_{c}")
        out = hash_join(out, agg, on=id_col, how="left",
                        num_partitions=num_partitions)

    def fill(t: pa.Table) -> pa.Table:
        for c in fill_cols:
            fc = f"__fill_{c}"
            if c in t.column_names:
                merged = pc.coalesce(t[c], t[fc])
                t = t.set_column(t.schema.get_field_index(c), c, merged)
            else:
                t = t.append_column(c, t[fc])
            t = t.drop_columns([fc])
        return t

    return out.map_batches(fill, batch_format="pyarrow")
