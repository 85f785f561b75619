"""The relation core: overlay / intersect as a distributed pair table.

Replaces the reference's sparse (n_left × n_right) relationship matrix
(linref ``events/relate.py:194-214``, grouped wrapper ``:1821-1919``, chunked
wrapper ``:1921-1956``) with a Ray-Data-native plan:

    left  ─ map_batches(canonicalize + __pid) ─┐
                                               ├─ union ─ groupby(__pid)
    right ─ map_batches(canonicalize + __pid) ─┘        └ map_groups(sweep)
                                                              │
                                               pairs(left_id, right_id, weight,
                                                     route_key, positions,
                                                     carried value cols)

- ONE hash shuffle co-partitions both sides by route key; the per-partition
  kernel handles *all* routes in the partition with vectorized numpy (the
  reference's per-group ``sp.block_diag`` assembly becomes simply "emit pair
  rows") — O(nnz) instead of the reference's O(n·m) dense broadcast.
- Aggregations become ``groupby(target_id)`` over the slim pair table, with
  order-sensitive aggregators using a carried within-route position column.
- Source values are carried through the sweep (``left_cols`` /
  ``right_cols``) so no second join is needed to attach data.
- Skew: for mega-routes pass ``bucket_size`` — rows are replicated into
  measure buckets, the partition key becomes (route, bucket), and overlay
  weights are window-clipped per bucket so bucket contributions sum exactly
  to the unsharded weight (additivity tested at the kernel level). Closure
  ``*_mod`` edge tests need whole-route runs and are not supported on the
  salted path (documented partitioning assumption).

Parity invariants mirrored from ``relate.py``: overlap clipped at 0, zero
length normalization → 0, group mismatch → no pair, profile weights multiply
a has-overlap mask.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

from linref_ray.kernels.intervals import (
    intersect_linear_linear_pairs,
    intersect_point_linear_pairs,
    intersect_point_point_pairs,
    iter_group_segments,
    modified_edges_sorted,
    overlay_pairs,
)
from linref_ray.kernels.profile import resolve_profile
from linref_ray.lrs import LRS
from linref_ray.errors import LRSCompatibilityError
from linref_ray.partition import (
    BUCKET,
    DEFAULT_NUM_PARTITIONS,
    IDCOL,
    KEYCOL,
    PID,
    SIDE,
    add_partition_cols,
    salted_partition_rows,
)

WEIGHT = "weight"
LPOS = "__lpos"
RPOS = "__rpos"
LEFT_ID = "left_id"
RIGHT_ID = "right_id"
ROUTE_KEY = "route_key"


def _prepare_side(
    ds: ray.data.Dataset,
    lrs: LRS,
    side: int,
    id_col: str,
    carry: Sequence[str],
    num_partitions: int,
    carry_schema: dict[str, pa.DataType],
    bucket_size: float | None,
) -> ray.data.Dataset:
    """Canonicalize one side: measures → beg/end/loc, key/pid/side/id cols."""
    is_point = lrs.is_point

    def fn(tbl: pa.Table) -> pa.Table:
        n = len(tbl)
        cols: dict[str, pa.Array | pa.ChunkedArray] = {}
        if is_point:
            loc = pc.cast(tbl[lrs.loc_col], pa.float64())
            cols["beg"] = loc
            cols["end"] = loc
            cols["loc"] = loc
        else:
            cols["beg"] = pc.cast(tbl[lrs.beg_col], pa.float64())
            cols["end"] = pc.cast(tbl[lrs.end_col], pa.float64())
            if lrs.loc_col and lrs.loc_col in tbl.column_names:
                cols["loc"] = pc.cast(tbl[lrs.loc_col], pa.float64())
            else:
                cols["loc"] = pa.nulls(n, pa.float64())
        for name, typ in carry_schema.items():
            if name in carry and name in tbl.column_names:
                cols[name] = pc.cast(tbl[name], typ)
            else:
                cols[name] = pa.nulls(n, typ)
        out = pa.table(cols)
        keys = lrs.effective_key_col(tbl.column_names)
        for kc in keys:
            out = out.append_column(f"__k_{kc}", tbl[kc])
        out = add_partition_cols(
            out,
            tuple(f"__k_{kc}" for kc in keys),
            num_partitions,
            side=side,
        )
        out = out.append_column(IDCOL, pc.cast(tbl[id_col], pa.int64()))
        out = out.drop_columns([f"__k_{kc}" for kc in keys])
        if bucket_size is not None:
            begs = out["beg"].to_numpy(zero_copy_only=False)
            ends = out["end"].to_numpy(zero_copy_only=False)
            keys = out[KEYCOL].to_numpy(zero_copy_only=False)
            rows, buckets, pid = salted_partition_rows(
                begs, ends, keys, bucket_size, num_partitions
            )
            out = out.take(pa.array(rows))
            out = out.set_column(
                out.schema.get_field_index(PID), PID, pa.array(pid)
            )
            out = out.append_column(BUCKET, pa.array(buckets))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def _np(tbl: pa.Table, col: str) -> np.ndarray:
    return tbl[col].to_numpy(zero_copy_only=False)


def _make_sweep_kernel(
    method: str,
    left_lrs: LRS,
    right_lrs: LRS,
    carry_left: Sequence[str],
    carry_right: Sequence[str],
    kwargs: dict,
    bucket_size: float | None,
):
    """Build the per-partition multi-route sweep kernel (pyarrow in/out)."""
    profile = resolve_profile(kwargs.get("profile")) if method == "overlay" else None
    normalize = kwargs.get("normalize", True)
    norm_by = kwargs.get("norm_by", "right")
    enforce_edges = kwargs.get("enforce_edges", True)
    l_point = left_lrs.is_point
    r_point = right_lrs.is_point
    l_closed = left_lrs.closed
    r_closed = right_lrs.closed

    def kernel(tbl: pa.Table) -> pa.Table:
        n = len(tbl)
        empty = {
            LEFT_ID: np.empty(0, np.int64),
            RIGHT_ID: np.empty(0, np.int64),
            ROUTE_KEY: pa.array([], pa.string()),
            WEIGHT: np.empty(0, np.float64),
            LPOS: np.empty(0, np.int64),
            RPOS: np.empty(0, np.int64),
        }
        if n == 0:
            return pa.table(
                {
                    **{k: v for k, v in empty.items()},
                    **{
                        c: pa.nulls(0, tbl.schema.field(c).type)
                        for c in (*carry_left, *carry_right)
                    },
                }
            )
        key = _np(tbl, KEYCOL)
        side = _np(tbl, SIDE)
        beg = _np(tbl, beg_col := "beg")
        end = _np(tbl, "end")
        loc = _np(tbl, "loc")
        buckets = _np(tbl, BUCKET) if bucket_size is not None else None
        # Sort: route (and bucket), then side, then standard (beg, end).
        sort_cols = [end, beg, side, key]
        if buckets is not None:
            sort_cols = [end, beg, side, buckets, key]
        order = np.lexsort(sort_cols)
        key_s = key[order]
        side_s = side[order]
        beg_s = beg[order]
        end_s = end[order]
        loc_s = loc[order]
        bucket_s = buckets[order] if buckets is not None else None

        out_l: list[np.ndarray] = []
        out_r: list[np.ndarray] = []
        out_w: list[np.ndarray] = []
        out_lp: list[np.ndarray] = []
        out_rp: list[np.ndarray] = []
        seg_key = (
            key_s
            if bucket_s is None
            # "#" separator: without it ("1", bucket 12) and ("11", bucket 2)
            # would both encode as "112" and merge segments.
            else np.char.add(
                np.char.add(key_s.astype(str), "#"), bucket_s.astype(str)
            )
        )
        for a, z in iter_group_segments(seg_key):
            split = a + int(np.searchsorted(side_s[a:z], 1))
            ls = slice(a, split)
            rs = slice(split, z)
            nl, nr = split - a, z - split
            if nl == 0 or nr == 0:
                continue
            window = None
            if bucket_s is not None:
                b = float(bucket_s[a]) * bucket_size
                window = (b, b + bucket_size)
            if method == "overlay":
                li, ri, w = overlay_pairs(
                    beg_s[ls], end_s[ls], beg_s[rs], end_s[rs],
                    normalize=normalize, norm_by=norm_by, profile=profile,
                    window=window,
                )
            else:  # intersect — dispatch on point/linear like relate.py:394-412
                if window is not None:
                    raise ValueError(
                        "salted buckets are not supported for intersect "
                        "(closure edge tests need whole-route runs)"
                    )
                if l_point and r_point:
                    li, ri = intersect_point_point_pairs(loc_s[ls], loc_s[rs])
                elif l_point:
                    li, ri = intersect_point_linear_pairs(
                        loc_s[ls], beg_s[rs], end_s[rs], r_closed,
                        enforce_edges,
                        modified_edges_sorted(beg_s[rs], end_s[rs], r_closed),
                    )
                    # kernel returns (point_pos, interval_pos) == (li, ri)
                elif r_point:
                    pi, ii = intersect_point_linear_pairs(
                        loc_s[rs], beg_s[ls], end_s[ls], l_closed,
                        enforce_edges,
                        modified_edges_sorted(beg_s[ls], end_s[ls], l_closed),
                    )
                    li, ri = ii, pi
                else:
                    li, ri = intersect_linear_linear_pairs(
                        beg_s[ls], end_s[ls], beg_s[rs], end_s[rs],
                        l_closed, r_closed, enforce_edges,
                        modified_edges_sorted(beg_s[ls], end_s[ls], l_closed),
                        modified_edges_sorted(beg_s[rs], end_s[rs], r_closed),
                    )
                w = np.ones(len(li), dtype=np.float64)
            if len(li):
                out_l.append(li + a)
                out_r.append(ri + split)
                out_w.append(w)
                out_lp.append(li)
                out_rp.append(ri)
        if not out_l:
            return kernel(tbl.slice(0, 0))
        gl = np.concatenate(out_l)
        gr = np.concatenate(out_r)
        take_l = pa.array(order[gl])
        take_r = pa.array(order[gr])
        cols = {
            LEFT_ID: tbl[IDCOL].take(take_l),
            RIGHT_ID: tbl[IDCOL].take(take_r),
            ROUTE_KEY: tbl[KEYCOL].take(take_l),
            WEIGHT: pa.array(np.concatenate(out_w)),
            LPOS: pa.array(np.concatenate(out_lp)),
            RPOS: pa.array(np.concatenate(out_rp)),
        }
        for c in carry_left:
            cols[c] = tbl[c].take(take_l)
        for c in carry_right:
            cols[c] = tbl[c].take(take_r)
        return pa.table(cols)

    return kernel


class Relation:
    """Distributed analog of the reference's ``EventsRelation``.

    ``target='left'`` aggregates right-side values onto left ids (the
    reference's ``axis=1`` default); ``target='right'`` is ``axis=0``.
    """

    def __init__(
        self,
        left: ray.data.Dataset,
        right: ray.data.Dataset,
        left_lrs: LRS,
        right_lrs: LRS | None = None,
        id_col: str = "event_id",
        right_id_col: str | None = None,
        left_cols: Sequence[str] = (),
        right_cols: Sequence[str] = (),
        num_partitions: int = DEFAULT_NUM_PARTITIONS,
        bucket_size: float | None = None,
    ):
        self.left = left
        self.right = right
        self.left_lrs = left_lrs
        self.right_lrs = right_lrs or left_lrs
        self.id_col = id_col
        self.right_id_col = right_id_col or id_col
        self.left_cols = tuple(left_cols)
        self.right_cols = tuple(right_cols)
        self.num_partitions = num_partitions
        self.bucket_size = bucket_size
        self._cache: dict = {}

    # -- pair builders ----------------------------------------------------
    def _carry_schema(self) -> dict[str, pa.DataType]:
        from linref_ray.joins import _pa_type

        out: dict[str, pa.DataType] = {}
        ls = self.left.schema()
        rs = self.right.schema()
        # Key levels must line up: a declared chain_col present on only one
        # side would canonicalize to keys of different shapes
        # ("route\\x1fchain" vs "route") and silently match NOTHING.
        lk = self.left_lrs.effective_key_col(ls.names)
        rk = self.right_lrs.effective_key_col(rs.names)
        if len(lk) != len(rk):
            raise ValueError(
                f"key level mismatch between relation sides: left groups by "
                f"{lk}, right by {rk} — a chain_col must be present on both "
                "sides (or neither)"
            )
        for c in self.left_cols:
            out[c] = _pa_type(ls.types[ls.names.index(c)])
        for c in self.right_cols:
            out[c] = _pa_type(rs.types[rs.names.index(c)])
        return out

    def _build(self, method: str, **kwargs) -> ray.data.Dataset:
        cache_key = (method, tuple(sorted(kwargs.items())))
        if cache_key in self._cache:
            return self._cache[cache_key]
        carry_schema = self._carry_schema()
        bs = self.bucket_size if method == "overlay" else None
        lp = _prepare_side(
            self.left, self.left_lrs, 0, self.id_col, self.left_cols,
            self.num_partitions, carry_schema, bs,
        )
        rp = _prepare_side(
            self.right, self.right_lrs, 1, self.right_id_col, self.right_cols,
            self.num_partitions, carry_schema, bs,
        )
        kernel = _make_sweep_kernel(
            method, self.left_lrs, self.right_lrs,
            self.left_cols, self.right_cols, kwargs, bs,
        )
        # Coalesce the over-split read/union blocks before the shuffle —
        # the sort-based exchange pays a fixed per-block cost, so tiny
        # blocks dominate wall time (measured 3-4x on sf0.1).
        pairs = (
            lp.union(rp)
            .repartition(self.num_partitions)
            .groupby(PID)
            .map_groups(kernel, batch_format="pyarrow")
        )
        self._cache[cache_key] = pairs
        return pairs

    def _build_partials(
        self, method: str, target: str, value_col: str | None, **kwargs
    ) -> ray.data.Dataset:
        """Aggregation fast path: run the sweep kernel and reduce to
        per-target partials (Σw·v, Σw, n) INSIDE the same map_groups call —
        the pair table never hits the object store and the downstream
        shuffle moves one row per (partition, target) instead of one per
        pair. Used by count/sum/mean (conserve and order-sensitive
        aggregators still need the explicit pair table)."""
        cache_key = ("partials", method, target, value_col,
                     tuple(sorted(kwargs.items())))
        if cache_key in self._cache:
            return self._cache[cache_key]
        carry_schema = self._carry_schema()
        bs = self.bucket_size if method == "overlay" else None
        lp = _prepare_side(
            self.left, self.left_lrs, 0, self.id_col, self.left_cols,
            self.num_partitions, carry_schema, bs,
        )
        rp = _prepare_side(
            self.right, self.right_lrs, 1, self.right_id_col, self.right_cols,
            self.num_partitions, carry_schema, bs,
        )
        base_kernel = _make_sweep_kernel(
            method, self.left_lrs, self.right_lrs,
            self.left_cols, self.right_cols, kwargs, bs,
        )
        tid = LEFT_ID if target == "left" else RIGHT_ID

        def kernel(tbl: pa.Table) -> pa.Table:
            pairs = base_kernel(tbl)
            tids = _np(pairs, tid)
            w = _np(pairs, WEIGHT).astype(np.float64)
            if value_col is not None:
                v = (
                    pc.cast(pairs[value_col], pa.float64())
                    .to_numpy(zero_copy_only=False)
                )
                # NaN source values contribute 0 (SQL-style skip-null; the
                # conserve path applies the same rule — see sum()).
                wv = np.where(np.isnan(v), 0.0, w * v)
            else:
                wv = w
            order = np.argsort(tids, kind="stable")
            t_s = tids[order]
            starts = np.concatenate([[True], t_s[1:] != t_s[:-1]]) if len(
                t_s
            ) else np.zeros(0, dtype=bool)
            first = np.flatnonzero(starts)
            return pa.table(
                {
                    tid: pa.array(t_s[first]),
                    "__wv": pa.array(np.add.reduceat(wv[order], first))
                    if len(first)
                    else pa.array([], pa.float64()),
                    "__w": pa.array(np.add.reduceat(w[order], first))
                    if len(first)
                    else pa.array([], pa.float64()),
                    "__n": pa.array(
                        np.diff(np.concatenate([first, [len(t_s)]])).astype(
                            np.int64
                        )
                    )
                    if len(first)
                    else pa.array([], pa.int64()),
                }
            )

        partials = (
            lp.union(rp)
            .repartition(self.num_partitions)
            .groupby(PID)
            .map_groups(kernel, batch_format="pyarrow")
        )
        self._cache[cache_key] = partials
        return partials

    def _method_name(self, method: str | None) -> str:
        if method is None:
            return (
                "intersect"
                if (self.left_lrs.is_point or self.right_lrs.is_point)
                else "overlay"
            )
        return method

    def overlay(self, normalize=True, norm_by="right", profile=None):
        """Pair table with overlay weights (``relate.py:588-651``)."""
        if self.left_lrs.is_point or self.right_lrs.is_point:
            raise LRSCompatibilityError(
            "overlay requires linear events on both sides"
        )
        return self._build(
            "overlay", normalize=normalize, norm_by=norm_by, profile=profile
        )

    def intersect(self, enforce_edges=True):
        """Boolean intersect pair table (weight = 1.0)."""
        return self._build("intersect", enforce_edges=enforce_edges)

    def _method_pairs(self, method: str | None, **kwargs):
        # Mirrors relate.py:394-412: point events force 'intersect'.
        if method is None:
            method = (
                "intersect"
                if (self.left_lrs.is_point or self.right_lrs.is_point)
                else "overlay"
            )
        if method == "overlay":
            return self.overlay(**kwargs)
        return self.intersect(**kwargs)

    # -- aggregators ------------------------------------------------------
    def _tid(self, target: str) -> tuple[str, str, str]:
        if target == "left":
            return LEFT_ID, RIGHT_ID, RPOS
        if target == "right":
            return RIGHT_ID, LEFT_ID, LPOS
        raise ValueError("target must be 'left' or 'right'")

    def _out_id(self, target: str) -> str:
        return self.id_col if target == "left" else self.right_id_col

    def count(self, target="left", out_col="count", **kwargs):
        tid, _, _ = self._tid(target)
        partials = self._build_partials("intersect", target, None, **kwargs)
        out = (
            partials.repartition(max(self.num_partitions // 2, 4))
            .groupby(tid)
            .aggregate(Sum("__n", alias_name=out_col))
        )
        return out.rename_columns({tid: self._out_id(target)})

    def sum(
        self, col, target="left", method=None, conserve=False,
        out_col=None, **kwargs,
    ):
        """Weighted sum (``relate.py:1023-1099``), incl. ``conserve``."""
        tid, sid, _ = self._tid(target)
        out_col = out_col or f"sum_{col}"
        if not conserve:
            # Fast path: per-partition partial sums, pair table never
            # materialized (value must be a carried column).
            partials = self._build_partials(
                self._method_name(method), target, col, **kwargs
            )
            out = (
                partials.repartition(max(self.num_partitions // 2, 4))
                .groupby(tid)
                .aggregate(Sum("__wv", alias_name=out_col))
            )
            return out.rename_columns({tid: self._out_id(target)})
        pairs = self._method_pairs(method, **kwargs)
        if conserve:
            # Normalize each source event's weights to sum 1.0
            # (``relate.py:1077-1089``). Partitioning by source id makes the
            # per-source totals local — no join needed.
            def norm_kernel(t: pa.Table) -> pa.Table:
                sids = _np(t, sid)
                w = _np(t, WEIGHT).astype(np.float64)
                order = np.argsort(sids, kind="stable")
                sids_s = sids[order]
                starts = np.concatenate([[True], sids_s[1:] != sids_s[:-1]])
                run_start = np.flatnonzero(starts)
                bounds = np.concatenate([run_start, [len(sids_s)]])
                totals = np.add.reduceat(w[order], bounds[:-1])
                run_of = np.cumsum(starts) - 1
                tot_per_row = np.empty(len(w))
                tot_per_row[order] = totals[run_of]
                safe = np.where(tot_per_row == 0, np.inf, tot_per_row)
                out = t.set_column(
                    t.schema.get_field_index(WEIGHT), WEIGHT, pa.array(w / safe)
                )
                return out

            pairs = self._agg_by_target(pairs, sid, norm_kernel)

        def mul(t: pa.Table) -> pa.Table:
            # NaN source values contribute 0, matching the partial-sum fast
            # path above (deliberate SQL-style skip-null semantic; the
            # reference's sparse multiply would propagate NaN instead).
            v = pc.cast(t[col], pa.float64()).to_numpy(zero_copy_only=False)
            w = _np(t, WEIGHT).astype(np.float64)
            wv = np.where(np.isnan(v), 0.0, w * v)
            return t.append_column("__wv", pa.array(wv))

        out = (
            pairs.map_batches(mul, batch_format="pyarrow")
            .repartition(self.num_partitions)
            .groupby(tid)
            .aggregate(Sum("__wv", alias_name=out_col))
        )
        return out.rename_columns({tid: self._out_id(target)})

    def mean(self, col, target="left", method=None, out_col=None, **kwargs):
        """Weighted mean, NaN for no matches (``relate.py:1101-1169``)."""
        tid, _, _ = self._tid(target)
        out_col = out_col or f"mean_{col}"
        partials = self._build_partials(
            self._method_name(method), target, col, **kwargs
        )
        out = (
            partials.repartition(max(self.num_partitions // 2, 4))
            .groupby(tid)
            .aggregate(
                Sum("__wv", alias_name="__num"), Sum("__w", alias_name="__den")
            )
        )

        def div(t: pa.Table) -> pa.Table:
            den = t["__den"].to_numpy(zero_copy_only=False)
            num = t["__num"].to_numpy(zero_copy_only=False)
            val = np.divide(
                num, den, out=np.full(len(t), np.nan), where=den != 0
            )
            return pa.table({tid: t[tid], out_col: pa.array(val)})

        return out.map_batches(div, batch_format="pyarrow").rename_columns(
            {tid: self._out_id(target)}
        )

    def _agg_by_target(self, pairs, tid: str, kernel, num_partitions=None):
        """Partition pairs by hash(tid) and run a multi-target numpy kernel."""
        nparts = num_partitions or self.num_partitions

        def add_pid(t: pa.Table) -> pa.Table:
            import pandas as pd

            h = pd.util.hash_array(t[tid].to_numpy(zero_copy_only=False))
            return t.append_column(
                "__apid", pa.array((h % np.uint64(nparts)).astype(np.int64))
            )

        return (
            pairs.map_batches(add_pid, batch_format="pyarrow")
            .repartition(nparts)
            .groupby("__apid")
            .map_groups(kernel, batch_format="pyarrow")
        )

    def first(self, col, target="left", out_col=None, **kwargs):
        return self._single(col, 0, target, out_col or f"first_{col}", **kwargs)

    def last(self, col, target="left", out_col=None, **kwargs):
        return self._single(col, -1, target, out_col or f"last_{col}", **kwargs)

    def _single(self, col, index, target, out_col, **kwargs):
        """i-th matching value in within-route source order
        (``relate.py:756-878``; order = carried position column)."""
        tid, _, pos_col = self._tid(target)
        pairs = self.intersect(**kwargs)
        id_col = self._out_id(target)

        def kernel(t: pa.Table) -> pa.Table:
            tids = _np(t, tid)
            pos = _np(t, pos_col)
            order = np.lexsort([pos, tids])
            tids_s = tids[order]
            starts = np.concatenate(
                [[True], tids_s[1:] != tids_s[:-1]]
            )
            run_start = np.flatnonzero(starts)
            run_end = np.concatenate([run_start[1:], [len(tids_s)]])
            pick = run_start + index if index >= 0 else run_end + index
            valid = (pick >= run_start) & (pick < run_end)
            take = pa.array(order[pick[valid]])
            return pa.table(
                {
                    id_col: pa.array(tids_s[run_start[valid]]),
                    out_col: t[col].take(take),
                }
            )

        return self._agg_by_target(pairs, tid, kernel)

    def mode(self, col, target="left", method=None, out_col=None, **kwargs):
        """Weight-summed argmax per target; ties → smallest value
        (``relate.py:1171-1290``: argmax over ascending unique values)."""
        tid, _, _ = self._tid(target)
        out_col = out_col or f"mode_{col}"
        pairs = self._method_pairs(method, **kwargs)
        id_col = self._out_id(target)

        def kernel(t: pa.Table) -> pa.Table:
            vals_arr = t[col]
            if isinstance(vals_arr, pa.ChunkedArray):
                vals_arr = vals_arr.combine_chunks()
            valid = pc.is_valid(vals_arr).to_numpy(zero_copy_only=False)
            tids = _np(t, tid)[valid]
            w = _np(t, WEIGHT).astype(np.float64)[valid]
            vals = vals_arr.to_numpy(zero_copy_only=False)[valid]
            if len(tids) == 0:
                return pa.table(
                    {
                        id_col: pa.array([], pa.int64()),
                        out_col: vals_arr.slice(0, 0),
                    }
                )
            # codes ascend with value order (np.unique sorts), so the
            # first-max tie break below == "smallest value wins".
            uniq, codes = np.unique(vals, return_inverse=True)
            order = np.lexsort([codes, tids])
            t_s, c_s, w_s = tids[order], codes[order], w[order]
            starts = np.concatenate(
                [[True], (t_s[1:] != t_s[:-1]) | (c_s[1:] != c_s[:-1])]
            )
            first = np.flatnonzero(starts)
            score = np.add.reduceat(w_s, first)
            g_tid = t_s[first]
            g_code = c_s[first]
            trun = np.concatenate([[True], g_tid[1:] != g_tid[:-1]])
            tfirst = np.flatnonzero(trun)
            tlen = np.diff(np.concatenate([tfirst, [len(g_tid)]]))
            runmax = np.repeat(np.maximum.reduceat(score, tfirst), tlen)
            cand = np.where(
                score == runmax, np.arange(len(score)), len(score)
            )
            best = np.minimum.reduceat(cand, tfirst)  # first max per tid
            return pa.table(
                {
                    id_col: pa.array(g_tid[best]),
                    out_col: pa.array(uniq[g_code[best]]),
                }
            )

        return self._agg_by_target(pairs, tid, kernel)

    def collect_list(
        self, col, target="left", unique=False, out_col=None, **kwargs
    ):
        """All matching values per target as a list column
        (``relate.py:880-967``), in within-route source order."""
        tid, _, pos_col = self._tid(target)
        out_col = out_col or f"{'set' if unique else 'list'}_{col}"
        pairs = self.intersect(**kwargs)
        id_col = self._out_id(target)

        def kernel(t: pa.Table) -> pa.Table:
            tids = _np(t, tid)
            pos = _np(t, pos_col)
            vals = t[col].combine_chunks() if isinstance(
                t[col], pa.ChunkedArray
            ) else t[col]
            order = np.lexsort([pos, tids])
            tids_s = tids[order]
            starts = np.concatenate([[True], tids_s[1:] != tids_s[:-1]])
            run_start = np.flatnonzero(starts)
            offsets = np.concatenate([run_start, [len(tids_s)]]).astype(np.int32)
            taken = vals.take(pa.array(order))
            lists = pa.ListArray.from_arrays(pa.array(offsets), taken)
            out_ids = tids_s[run_start]
            if unique:
                lists = pc.list_distinct(lists)
            return pa.table({id_col: pa.array(out_ids), out_col: lists})

        return self._agg_by_target(pairs, tid, kernel)

    def equal_groups(self) -> ray.data.Dataset:
        """(left_id, right_id) pairs whose group keys are equal
        (``events/relate.py:2088-2110``): the dense boolean matrix of the
        reference, emitted sparse as the within-group cross product. Runs in
        the same co-partition shuffle as the other relations; per-group size
        is O(n·m) pairs — the same cost the reference's dense matrix pays.
        """
        carry_schema = self._carry_schema()
        lp = _prepare_side(
            self.left, self.left_lrs, 0, self.id_col, self.left_cols,
            self.num_partitions, carry_schema, None,
        )
        rp = _prepare_side(
            self.right, self.right_lrs, 1, self.right_id_col,
            self.right_cols, self.num_partitions, carry_schema, None,
        )

        def kernel(tbl: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    LEFT_ID: pa.array([], pa.int64()),
                    RIGHT_ID: pa.array([], pa.int64()),
                }
            )
            if len(tbl) == 0:
                return empty
            key = _np(tbl, KEYCOL)
            side = _np(tbl, SIDE)
            ids = _np(tbl, "__id")
            order = np.lexsort([ids, side, key])
            key_s, side_s = key[order], side[order]
            out_l, out_r = [], []
            for a, z in iter_group_segments(key_s):
                split = a + int(np.searchsorted(side_s[a:z], 1))
                lids = ids[order[a:split]]
                rids = ids[order[split:z]]
                if not len(lids) or not len(rids):
                    continue
                out_l.append(np.repeat(lids, len(rids)))
                out_r.append(np.tile(rids, len(lids)))
            if not out_l:
                return empty
            return pa.table(
                {
                    LEFT_ID: pa.array(np.concatenate(out_l)),
                    RIGHT_ID: pa.array(np.concatenate(out_r)),
                }
            )

        return (
            lp.union(rp)
            .repartition(self.num_partitions)
            .groupby(PID)
            .map_groups(kernel, batch_format="pyarrow")
        )

    def value_counts(self, col, target="left", **kwargs):
        """Long-format (id, value, n) counts (``relate.py:969-1018``).

        (id, value) is high-cardinality, where Ray's multi-key Aggregate
        is pathological (partition.grouped_sums note): partition on the
        int id hash alone — every (id, value) group is then
        partition-local — and count groups in ONE factorize+lexsort
        kernel per partition."""
        import pandas as pd

        tid, _, _ = self._tid(target)
        pairs = self.intersect(**kwargs)
        nparts = self.num_partitions
        val_type = None
        for n, ty in zip(pairs.schema().names, pairs.schema().types):
            if n == col and isinstance(ty, pa.DataType):
                val_type = ty
        if val_type is None:
            val_type = pa.string()

        def add_pid(t: pa.Table) -> pa.Table:
            ids = t[tid].to_numpy(zero_copy_only=False)
            pid = (
                pd.util.hash_array(ids) % np.uint64(nparts)
            ).astype(np.int64)
            return t.append_column("__vpid", pa.array(pid))

        def count_kernel(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    tid: pa.array([], pa.int64()),
                    col: pa.array([], val_type),
                    "n": pa.array([], pa.int64()),
                }
            )
            if len(t) == 0:
                return empty
            ids = t[tid].to_numpy(zero_copy_only=False).astype(np.int64)
            vals = t[col].to_numpy(zero_copy_only=False)
            uniq, codes = np.unique(vals, return_inverse=True)
            order = np.lexsort([codes, ids])
            ids_s, codes_s = ids[order], codes[order]
            first = np.concatenate(
                ([True], (ids_s[1:] != ids_s[:-1])
                 | (codes_s[1:] != codes_s[:-1]))
            )
            starts = np.flatnonzero(first)
            n = np.diff(np.append(starts, len(ids_s)))
            return pa.table(
                {
                    tid: pa.array(ids_s[starts]),
                    col: pc.cast(pa.array(uniq[codes_s[starts]]), val_type),
                    "n": pa.array(n.astype(np.int64)),
                }
            )

        out = (
            pairs.map_batches(add_pid, batch_format="pyarrow")
            .groupby("__vpid")
            .map_groups(count_kernel, batch_format="pyarrow")
        )
        return out.rename_columns({tid: self._out_id(target)})

    def distribute(
        self,
        col=None,
        target="left",
        method=None,
        decay_size=0,
        decay_func="linear",
        direction="both",
        length_normalize=True,
        out_col="distributed",
        **kwargs,
    ):
        """Sliding-window smoothing (``relate.py:1292-1521``).

        Implemented as a dedicated one-shuffle pipeline: targets + sources are
        co-partitioned by route, and the per-route kernel builds the relation
        and runs the banded distribute in one pass. Neighbor semantics are
        row offsets in within-route standard order; routes must not be
        measure-sharded for this operator (route-atomic partitioning).
        ``target='left'`` aggregates right events onto the left index
        (reference ``axis=1``); ``target='right'`` the reverse (``axis=0``).
        """
        from linref_ray.kernels.distribute import distribute_group

        if target not in ("left", "right"):
            raise ValueError("target must be 'left' or 'right'")
        # Reference ``axis``: 1 aggregates right→left (target='left'), 0
        # aggregates left→right (target='right') by transposing the SAME
        # relation matrix and swapping the length vector
        # (``relate.py:1410-1417``). Here the transpose is just a role swap
        # of the (li, ri, w) pair arrays inside each route group.
        tgt_lrs, src_lrs = self.left_lrs, self.right_lrs
        if method is None:
            method = (
                "intersect" if (tgt_lrs.is_point or src_lrs.is_point) else "overlay"
            )
        carry_schema = self._carry_schema()
        lp = _prepare_side(
            self.left, tgt_lrs, 0, self.id_col, self.left_cols,
            self.num_partitions, carry_schema, None,
        )
        rp = _prepare_side(
            self.right, src_lrs, 1, self.right_id_col, self.right_cols,
            self.num_partitions, carry_schema, None,
        )
        tgt_left = target == "left"
        id_col = self.id_col if tgt_left else self.right_id_col
        l_closed, r_closed = tgt_lrs.closed, src_lrs.closed
        l_point, r_point = tgt_lrs.is_point, src_lrs.is_point
        enforce_edges = kwargs.get("enforce_edges", True)
        normalize = kwargs.get("normalize", True)
        norm_by = kwargs.get("norm_by", "right")

        def kernel(tbl: pa.Table) -> pa.Table:
            if len(tbl) == 0:
                return pa.table(
                    {id_col: pa.array([], pa.int64()),
                     out_col: pa.array([], pa.float64())}
                )
            key = _np(tbl, KEYCOL)
            side = _np(tbl, SIDE)
            beg = _np(tbl, "beg")
            end = _np(tbl, "end")
            loc = _np(tbl, "loc")
            ids = _np(tbl, IDCOL)
            data = (
                pc.cast(tbl[col], pa.float64()).to_numpy(zero_copy_only=False)
                if col is not None
                else np.ones(len(tbl))
            )
            # id tiebreak pins the positional (row-offset) neighbor order for
            # targets with identical (beg, end) — deterministic across
            # shuffles and expressible in the SQL oracle's row_number().
            order = np.lexsort([ids, end, beg, side, key])
            out_ids: list[np.ndarray] = []
            out_vals: list[np.ndarray] = []
            key_s = key[order]
            side_s = side[order]
            for a, z in iter_group_segments(key_s):
                seg = order[a:z]
                split = a + int(np.searchsorted(side_s[a:z], 1))
                lseg, rseg = order[a:split], order[split:z]
                tseg, sseg = (lseg, rseg) if tgt_left else (rseg, lseg)
                nt, ns = len(tseg), len(sseg)
                if nt == 0:
                    continue
                if ns == 0:
                    out_ids.append(ids[tseg])
                    out_vals.append(np.zeros(nt))
                    continue
                if method == "overlay":
                    li, ri, w = overlay_pairs(
                        beg[lseg], end[lseg], beg[rseg], end[rseg],
                        normalize=normalize, norm_by=norm_by,
                    )
                else:
                    if l_point and r_point:
                        li, ri = intersect_point_point_pairs(loc[lseg], loc[rseg])
                    elif l_point:
                        # Point targets x linear sources: same dispatch as
                        # _make_sweep_kernel — the generic linear-linear sweep
                        # would treat the degenerate [loc, loc] targets with
                        # strict inequalities + linear closure-edge logic and
                        # drop points sitting on closed interval edges.
                        li, ri = intersect_point_linear_pairs(
                            loc[lseg], beg[rseg], end[rseg], r_closed,
                            enforce_edges,
                            modified_edges_sorted(beg[rseg], end[rseg], r_closed),
                        )
                    elif r_point:
                        pi, ii = intersect_point_linear_pairs(
                            loc[rseg], beg[lseg], end[lseg], l_closed,
                            enforce_edges,
                            modified_edges_sorted(beg[lseg], end[lseg], l_closed),
                        )
                        li, ri = ii, pi
                    else:
                        li, ri = intersect_linear_linear_pairs(
                            beg[lseg], end[lseg], beg[rseg], end[rseg],
                            l_closed, r_closed, enforce_edges,
                            modified_edges_sorted(beg[lseg], end[lseg], l_closed),
                            modified_edges_sorted(beg[rseg], end[rseg], r_closed),
                        )
                    w = np.ones(len(li))
                ti_, si_ = (li, ri) if tgt_left else (ri, li)
                res = distribute_group(
                    ti_, si_, w, nt, ns, data[sseg],
                    target_lengths=end[tseg] - beg[tseg],
                    decay_size=decay_size, decay_func=decay_func,
                    direction=direction, length_normalize=length_normalize,
                )
                out_ids.append(ids[tseg])
                out_vals.append(res[:, 0])
            if not out_ids:
                return kernel(tbl.slice(0, 0))
            return pa.table(
                {
                    id_col: pa.array(np.concatenate(out_ids)),
                    out_col: pa.array(np.concatenate(out_vals)),
                }
            )

        return (
            lp.union(rp)
            .repartition(self.num_partitions)
            .groupby(PID)
            .map_groups(kernel, batch_format="pyarrow")
        )

    def cut(
        self,
        target="left",
        multiple="first",
        xs_col="xs",
        ys_col="ys",
        ms_col="ms",
    ):
        """Relation ``cut`` (``relate.py:1623-1724``): substring each
        intersecting SOURCE geometry to the target's [beg, end] measure
        range, with the reference's multiple-match policies.

        ``multiple``:
        - ``'first'`` / ``'last'``: cut the first/last intersecting source
          in within-route standard order (one row per target; unmatched
          targets emit null geometry).
        - ``'raise'``: error if any target intersects more than one source.
        - ``'merge'``: chain all matched cuts into one geometry by terminus
          matching (:func:`merge_chains`); raises if the pieces are not
          contiguous (the reference's ``allow_multiple=False``).
        - ``'list'``: one OUTPUT ROW per (target, match) with ``cut_idx``
          giving the match rank — the Dataset-idiomatic explosion of the
          reference's per-row Python list.

        Both sides must be linear; the source side carries its geometry in
        ``xs/ys/ms`` ``list<double>`` columns. Matching uses the intersect
        relation with ``enforce_edges=False`` (as the reference forces for
        cutting). Route-atomic partitioning, like ``distribute``.
        """
        from linref_ray.kernels.geometry import (
            merge_chains,
            substring_by_m_many,
        )

        if target not in ("left", "right"):
            raise ValueError("target must be 'left' or 'right'")
        if multiple not in ("first", "last", "merge", "list", "raise"):
            raise ValueError(f"invalid multiple policy {multiple!r}")
        if self.left_lrs.is_point or self.right_lrs.is_point:
            raise ValueError("both relation sides must be linear for cut")
        tgt_left = target == "left"
        geom_cols = (xs_col, ys_col, ms_col)
        src_names = (self.right if tgt_left else self.left).schema().names
        missing = [c for c in geom_cols if c not in src_names]
        if missing:
            raise ValueError(f"source side lacks geometry columns {missing}")
        carry_schema = {c: pa.list_(pa.float64()) for c in geom_cols}
        lp = _prepare_side(
            self.left, self.left_lrs, 0, self.id_col,
            () if tgt_left else geom_cols, self.num_partitions,
            carry_schema, None,
        )
        rp = _prepare_side(
            self.right, self.right_lrs, 1, self.right_id_col,
            geom_cols if tgt_left else (), self.num_partitions,
            carry_schema, None,
        )
        id_col = self.id_col if tgt_left else self.right_id_col
        l_closed, r_closed = self.left_lrs.closed, self.right_lrs.closed

        def _empty() -> pa.Table:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cut_idx": pa.array([], pa.int64()),
                    "xs": pa.array([], pa.list_(pa.float64())),
                    "ys": pa.array([], pa.list_(pa.float64())),
                    "ms": pa.array([], pa.list_(pa.float64())),
                }
            )

        def kernel(tbl: pa.Table) -> pa.Table:
            if len(tbl) == 0:
                return _empty()
            key = _np(tbl, KEYCOL)
            side = _np(tbl, SIDE)
            beg = _np(tbl, "beg")
            end = _np(tbl, "end")
            ids = _np(tbl, IDCOL)
            gx = tbl[xs_col].to_pylist()
            gy = tbl[ys_col].to_pylist()
            gm = tbl[ms_col].to_pylist()
            order = np.lexsort([ids, end, beg, side, key])
            key_s, side_s = key[order], side[order]
            out_ids: list[int] = []
            out_idx: list[int] = []
            out_geoms: list[tuple | None] = []

            def emit_unmatched(rows: np.ndarray) -> None:
                for row in rows:
                    out_ids.append(int(ids[row]))
                    out_idx.append(0)
                    out_geoms.append(None)

            for a, z in iter_group_segments(key_s):
                split = a + int(np.searchsorted(side_s[a:z], 1))
                lseg, rseg = order[a:split], order[split:z]
                tseg, sseg = (lseg, rseg) if tgt_left else (rseg, lseg)
                nt, ns = len(tseg), len(sseg)
                if nt == 0:
                    continue
                if ns == 0:
                    emit_unmatched(tseg)
                    continue
                li, ri = intersect_linear_linear_pairs(
                    beg[lseg], end[lseg], beg[rseg], end[rseg],
                    l_closed, r_closed, False,
                    modified_edges_sorted(beg[lseg], end[lseg], l_closed),
                    modified_edges_sorted(beg[rseg], end[rseg], r_closed),
                )
                ti, si = (li, ri) if tgt_left else (ri, li)
                po = np.lexsort([si, ti])
                ti, si = ti[po], si[po]
                counts = np.bincount(ti, minlength=nt)
                if multiple == "raise" and (counts > 1).any():
                    raise ValueError(
                        "multiple intersecting geometries found with "
                        "multiple='raise' for cut"
                    )
                firsts = np.concatenate(([0], np.cumsum(counts)[:-1]))
                if multiple in ("first", "last", "raise"):
                    matched = np.flatnonzero(counts > 0)
                    pick = (
                        firsts[matched]
                        if multiple != "last"
                        else firsts[matched] + counts[matched] - 1
                    )
                    keep_t, keep_s = ti[pick], si[pick]
                    keep_idx = np.zeros(len(pick), np.int64)
                else:
                    keep_t, keep_s = ti, si
                    keep_idx = np.arange(len(ti)) - firsts[ti]
                # Substring per unique source, vectorized over its targets
                # (per-geometry looping is inherent to variable-length
                # polyline payloads; the cut math itself is the vectorized
                # substring kernel).
                res: list[tuple | None] = [None] * len(keep_t)
                for s in np.unique(keep_s):
                    rows = np.flatnonzero(keep_s == s)
                    src_row = sseg[s]
                    if gx[src_row] is None:
                        raise ValueError(
                            "cut source row (id "
                            f"{int(ids[src_row])}) has null geometry — "
                            "sources must carry xs/ys/ms lists"
                        )
                    sx = np.asarray(gx[src_row], dtype=np.float64)
                    sy = np.asarray(gy[src_row], dtype=np.float64)
                    sm = np.asarray(gm[src_row], dtype=np.float64)
                    tr = tseg[keep_t[rows]]
                    ln, fx, fy, fm = substring_by_m_many(
                        sx, sy, sm, beg[tr], end[tr]
                    )
                    offs = np.concatenate(([0], np.cumsum(ln)))
                    for j, r in enumerate(rows):
                        res[r] = (
                            fx[offs[j] : offs[j + 1]],
                            fy[offs[j] : offs[j + 1]],
                            fm[offs[j] : offs[j + 1]],
                        )
                if multiple == "merge":
                    for tloc in np.unique(keep_t):
                        rows = np.flatnonzero(keep_t == tloc)
                        merged = _merge_cut_pieces(
                            [res[r] for r in rows], merge_chains
                        )
                        out_ids.append(int(ids[tseg[tloc]]))
                        out_idx.append(0)
                        out_geoms.append(merged)
                else:
                    for j in range(len(keep_t)):
                        out_ids.append(int(ids[tseg[keep_t[j]]]))
                        out_idx.append(int(keep_idx[j]))
                        out_geoms.append(res[j])
                emit_unmatched(tseg[np.flatnonzero(counts == 0)])
            if not out_ids:
                return _empty()
            lens = np.array(
                [0 if g is None else len(g[0]) for g in out_geoms], np.int64
            )
            valid = np.array([g is not None for g in out_geoms], bool)
            off = np.concatenate(([0], np.cumsum(lens)))
            if valid.all():
                offsets = pa.array(off, pa.int64())
            else:
                offsets = pa.array(
                    off, pa.int64(),
                    mask=np.concatenate([~valid, [False]]),
                )

            def lst(part: int) -> pa.Array:
                flat = (
                    np.concatenate([g[part] for g in out_geoms if g is not None])
                    if valid.any()
                    else np.empty(0, np.float64)
                )
                return pa.LargeListArray.from_arrays(
                    offsets, pa.array(flat, pa.float64())
                ).cast(pa.list_(pa.float64()))

            return pa.table(
                {
                    id_col: pa.array(out_ids, pa.int64()),
                    "cut_idx": pa.array(out_idx, pa.int64()),
                    "xs": lst(0),
                    "ys": lst(1),
                    "ms": lst(2),
                }
            )

        return (
            lp.union(rp)
            .repartition(self.num_partitions)
            .groupby(PID)
            .map_groups(kernel, batch_format="pyarrow")
        )


    def interpolate_geoms(
        self,
        target="left",
        multiple="first",
        xs_col="xs",
        ys_col="ys",
        ms_col="ms",
    ):
        """Relation ``interpolate`` (``relate.py:1523-1621``): for each POINT
        target, interpolate the (x, y) coordinate at its measure on each
        intersecting LINEAR source's own geometry.

        ``multiple`` ∈ {'first','last','raise','list'} — same selection
        semantics as :meth:`cut` ('list' explodes to one row per match with
        ``interp_idx``). Unmatched targets emit NaN coordinates (filter
        with ``pc.is_finite`` to keep matches only). The
        target side must be point events and the source side linear events
        carrying ``xs/ys/ms`` list columns (the reference's axis
        requirement, both directions).
        """
        from linref_ray.kernels.geometry import interpolate_at_m

        if target not in ("left", "right"):
            raise ValueError("target must be 'left' or 'right'")
        if multiple not in ("first", "last", "list", "raise"):
            raise ValueError(f"invalid multiple policy {multiple!r}")
        tgt_left = target == "left"
        tgt_lrs = self.left_lrs if tgt_left else self.right_lrs
        src_lrs = self.right_lrs if tgt_left else self.left_lrs
        if not tgt_lrs.is_point or src_lrs.is_point:
            raise ValueError(
                "interpolate needs point targets and linear sources"
            )
        geom_cols = (xs_col, ys_col, ms_col)
        src_names = (self.right if tgt_left else self.left).schema().names
        missing = [c for c in geom_cols if c not in src_names]
        if missing:
            raise ValueError(f"source side lacks geometry columns {missing}")
        carry_schema = {c: pa.list_(pa.float64()) for c in geom_cols}
        lp = _prepare_side(
            self.left, self.left_lrs, 0, self.id_col,
            () if tgt_left else geom_cols, self.num_partitions,
            carry_schema, None,
        )
        rp = _prepare_side(
            self.right, self.right_lrs, 1, self.right_id_col,
            geom_cols if tgt_left else (), self.num_partitions,
            carry_schema, None,
        )
        id_col = self.id_col if tgt_left else self.right_id_col
        l_closed, r_closed = self.left_lrs.closed, self.right_lrs.closed
        enforce_edges = True

        def _empty() -> pa.Table:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "interp_idx": pa.array([], pa.int64()),
                    "x": pa.array([], pa.float64()),
                    "y": pa.array([], pa.float64()),
                }
            )

        def kernel(tbl: pa.Table) -> pa.Table:
            if len(tbl) == 0:
                return _empty()
            key = _np(tbl, KEYCOL)
            side = _np(tbl, SIDE)
            beg = _np(tbl, "beg")
            end = _np(tbl, "end")
            loc = _np(tbl, "loc")
            ids = _np(tbl, IDCOL)
            gx = tbl[xs_col].to_pylist()
            gy = tbl[ys_col].to_pylist()
            gm = tbl[ms_col].to_pylist()
            order = np.lexsort([ids, end, beg, side, key])
            key_s, side_s = key[order], side[order]
            # Group-level array appends (one concatenate at the end) — no
            # per-row Python in the emit path.
            out_ids: list[np.ndarray] = []
            out_idx: list[np.ndarray] = []
            out_x: list[np.ndarray] = []
            out_y: list[np.ndarray] = []

            def emit_nan(rows: np.ndarray) -> None:
                n = len(rows)
                out_ids.append(ids[rows])
                out_idx.append(np.zeros(n, np.int64))
                out_x.append(np.full(n, np.nan))
                out_y.append(np.full(n, np.nan))

            for a, z in iter_group_segments(key_s):
                split = a + int(np.searchsorted(side_s[a:z], 1))
                lseg, rseg = order[a:split], order[split:z]
                tseg, sseg = (lseg, rseg) if tgt_left else (rseg, lseg)
                nt, ns = len(tseg), len(sseg)
                if nt == 0:
                    continue
                if ns == 0:
                    emit_nan(tseg)
                    continue
                s_closed = r_closed if tgt_left else l_closed
                pi, ii = intersect_point_linear_pairs(
                    loc[tseg], beg[sseg], end[sseg], s_closed,
                    enforce_edges,
                    modified_edges_sorted(beg[sseg], end[sseg], s_closed),
                )
                ti, si = pi, ii
                po = np.lexsort([si, ti])
                ti, si = ti[po], si[po]
                counts = np.bincount(ti, minlength=nt)
                if multiple == "raise" and (counts > 1).any():
                    raise ValueError(
                        "multiple intersecting geometries found with "
                        "multiple='raise' for interpolate"
                    )
                firsts = np.concatenate(([0], np.cumsum(counts)[:-1]))
                if multiple in ("first", "last", "raise"):
                    matched = np.flatnonzero(counts > 0)
                    pick = (
                        firsts[matched]
                        if multiple != "last"
                        else firsts[matched] + counts[matched] - 1
                    )
                    keep_t, keep_s = ti[pick], si[pick]
                    keep_idx = np.zeros(len(pick), np.int64)
                else:
                    keep_t, keep_s = ti, si
                    keep_idx = np.arange(len(ti)) - firsts[ti]
                res_x = np.full(len(keep_t), np.nan)
                res_y = np.full(len(keep_t), np.nan)
                for s in np.unique(keep_s):
                    rows = np.flatnonzero(keep_s == s)
                    src_row = sseg[s]
                    if gx[src_row] is None:
                        raise ValueError(
                            "interpolate source row (id "
                            f"{int(ids[src_row])}) has null geometry — "
                            "sources must carry xs/ys/ms lists"
                        )
                    sx = np.asarray(gx[src_row], dtype=np.float64)
                    sy = np.asarray(gy[src_row], dtype=np.float64)
                    sm = np.asarray(gm[src_row], dtype=np.float64)
                    px, py = interpolate_at_m(
                        sx, sy, sm, loc[tseg[keep_t[rows]]]
                    )
                    res_x[rows] = px
                    res_y[rows] = py
                out_ids.append(ids[tseg[keep_t]])
                out_idx.append(keep_idx.astype(np.int64))
                out_x.append(res_x)
                out_y.append(res_y)
                emit_nan(tseg[counts == 0])
            if not out_ids:
                return _empty()
            return pa.table(
                {
                    id_col: pa.array(
                        np.concatenate(out_ids).astype(np.int64)
                    ),
                    "interp_idx": pa.array(np.concatenate(out_idx)),
                    "x": pa.array(np.concatenate(out_x).astype(np.float64)),
                    "y": pa.array(np.concatenate(out_y).astype(np.float64)),
                }
            )

        return (
            lp.union(rp)
            .repartition(self.num_partitions)
            .groupby(PID)
            .map_groups(kernel, batch_format="pyarrow")
        )


def _merge_cut_pieces(pieces: list, merge_chains) -> tuple:
    """Chain cut fragments into one polyline (reference ``line_merge_m`` with
    ``allow_multiple=False``): order by terminus matching, drop the
    duplicated junction vertex of each appended fragment, raise if the
    pieces do not form a single contiguous chain."""
    if len(pieces) == 1:
        return pieces[0]
    first_pts = np.array([[p[0][0], p[1][0]] for p in pieces])
    last_pts = np.array([[p[0][-1], p[1][-1]] for p in pieces])
    chain_id, pos = merge_chains(first_pts, last_pts)
    if int(chain_id.max()) > 0:
        raise ValueError(
            "cut pieces do not merge into a single contiguous geometry "
            "(multiple='merge' requires one chain, as the reference's "
            "line_merge_m with allow_multiple=False)"
        )
    order = np.argsort(pos)
    xs_p: list[np.ndarray] = []
    ys_p: list[np.ndarray] = []
    ms_p: list[np.ndarray] = []
    for j, idx in enumerate(order):
        px, py, pm = pieces[idx]
        if j > 0:
            px, py, pm = px[1:], py[1:], pm[1:]
        xs_p.append(px)
        ys_p.append(py)
        ms_p.append(pm)
    return np.concatenate(xs_p), np.concatenate(ys_p), np.concatenate(ms_p)


def value_counts_wide(
    vc: ray.data.Dataset,
    id_col: str = "event_id",
    value_col: str | None = None,
    count_col: str = "n",
):
    """Collect-time pivot of :meth:`Relation.value_counts` long output to the
    reference's wide frame (``relate.py:969-1018``): one column per distinct
    value, zero-filled. The long aggregate is already small (ids × distinct
    values); the pivot is a driver-side finishing step, not a pipeline stage.
    """
    import pandas as pd

    df = vc.to_pandas()
    if value_col is None:
        value_col = [c for c in df.columns if c not in (id_col, count_col)][0]
    wide = (
        df.pivot_table(
            index=id_col, columns=value_col, values=count_col,
            aggfunc="sum", fill_value=0,
        )
        .astype(np.int64)
        .reset_index()
    )
    wide.columns.name = None
    return wide


def attach(
    target: ray.data.Dataset,
    agg: ray.data.Dataset,
    on: str = "event_id",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> ray.data.Dataset:
    """Left join aggregate results back onto the target dataset.

    Target ids are unique (the reference assigns the aggregated numpy array
    straight back onto the frame); unmatched rows get nulls. Uses the
    engine's partitioned hash join (see :mod:`linref_ray.joins` for why not
    ``Dataset.join``).
    """
    from linref_ray.joins import hash_join

    return hash_join(target, agg, on=on, how="left", num_partitions=num_partitions)
