"""Partitioned hash join built on the engine's union + pid-groupby pattern.

``ray.data.Dataset.join`` (2.49) fails when an input contains the
zero-column empty blocks that ``groupby().map_groups`` emits for empty
partitions — which is every relation/aggregate output here. This helper is
the portable explicit-hash-join pattern instead: pad both sides to a common
schema, tag, union, one hash shuffle on the key, then a per-partition pandas
merge. Empty partitions produce empty typed output from our own kernel, so
the result is safe to feed anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from linref_ray.partition import DEFAULT_NUM_PARTITIONS

_JPID = "__jpid"
_JSIDE = "__jside"


def _pa_type(t) -> pa.DataType:
    """Ray Schema types may be numpy dtypes / Python classes for pandas
    blocks; coerce to a pyarrow DataType."""
    if isinstance(t, pa.DataType):
        return t
    if t in (str, object):
        return pa.string()
    try:
        return pa.from_numpy_dtype(np.dtype(t))
    except Exception:
        return pa.string()


def _schema_dict(ds: ray.data.Dataset) -> dict[str, pa.DataType]:
    s = ds.schema()
    return {n: _pa_type(t) for n, t in zip(s.names, s.types)}


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    how: str = "left",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    distinct_left: bool = False,
) -> ray.data.Dataset:
    """Join two datasets on one key column (left/inner/outer).

    ``distinct_left=True`` drops full-row duplicates from the left side
    inside the join kernel. Because duplicate rows share the key and
    therefore the hash partition, the partition-local distinct is globally
    complete — it fuses a would-be ``groupby().agg()`` dedup shuffle into
    the join's own shuffle for free."""
    lsch = _schema_dict(left)
    rsch = _schema_dict(right)
    overlap = (set(lsch) & set(rsch)) - {on}
    if overlap:
        raise ValueError(f"overlapping non-key columns: {sorted(overlap)}")
    all_cols = {**lsch, **{k: v for k, v in rsch.items() if k not in lsch}}

    def prep(side: int, sch: dict[str, pa.DataType]):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            cols = {}
            for name, typ in all_cols.items():
                if name in t.column_names:
                    cols[name] = t[name]
                else:
                    cols[name] = pa.nulls(n, typ)
            out = pa.table(cols)
            h = pd.util.hash_array(t[on].to_numpy(zero_copy_only=False))
            out = out.append_column(
                _JPID, pa.array((h % np.uint64(num_partitions)).astype(np.int64))
            )
            return out.append_column(
                _JSIDE, pa.array(np.full(n, side, dtype=np.int8))
            )

        return fn

    lp = left.map_batches(prep(0, lsch), batch_format="pyarrow")
    rp = right.map_batches(prep(1, rsch), batch_format="pyarrow")

    left_names = list(lsch)
    right_only = [c for c in rsch if c not in lsch]

    pa_how = {"left": "left outer", "inner": "inner", "outer": "full outer"}

    def kernel(t: pa.Table) -> pa.Table:
        # Partition-local Arrow (Acero) hash join — no pandas round-trip.
        # The outer-join coalesce of the key column and the fixed column
        # order keep the output schema stable across partitions.
        side = t[_JSIDE].to_numpy(zero_copy_only=False)
        lt = t.filter(pa.array(side == 0)).select(left_names)
        if distinct_left and len(lt):
            lt = lt.group_by(left_names, use_threads=False).aggregate(
                []
            ).select(left_names)
        rt = t.filter(pa.array(side == 1)).select([on] + right_only)
        jt = lt.join(
            rt, keys=on, join_type=pa_how[how], coalesce_keys=True
        )
        target = pa.schema(
            [(c, all_cols[c]) for c in left_names + right_only]
        )
        return pa.table({c: jt[c] for c in target.names}).cast(target)

    return (
        lp.union(rp)
        .repartition(num_partitions)
        .groupby(_JPID)
        .map_groups(kernel, batch_format="pyarrow")
    )


def broadcast_semi_join(
    big: ray.data.Dataset,
    small: ray.data.Dataset,
    on: str,
    small_on: str | None = None,
    anti: bool = False,
) -> ray.data.Dataset:
    """Map-side semi-join (``anti=True`` → anti-join): keep big-side rows
    whose key does (not) appear in the small side.

    The small side's DISTINCT key column is collected once and broadcast
    through the object store (``ray.put``); every big-side batch probes it
    with a sorted-array ``searchsorted`` — the big side never shuffles and
    its non-key columns never move. This is the dimension→fact pruning
    pattern: the scale contract is |distinct small keys| fits in a worker
    heap (use :func:`hash_join` when it does not)."""
    import numpy as np

    key_col = small_on or on
    keys_tbl = pa.concat_tables(
        ray.get(small.select_columns([key_col]).to_arrow_refs()),
        promote_options="default",
    )
    keys = np.unique(
        keys_tbl[key_col].to_numpy(zero_copy_only=False)
    )
    keys_ref = ray.put(keys)

    def fn(t: pa.Table) -> pa.Table:
        arr = ray.get(keys_ref)  # per-worker plasma fetch, cached
        k = t[on].to_numpy(zero_copy_only=False)
        if len(arr) == 0:
            hit = np.zeros(len(k), dtype=bool)
        else:
            pos = np.minimum(np.searchsorted(arr, k), len(arr) - 1)
            hit = arr[pos] == k
        return t.filter(pa.array(hit != anti))

    return big.map_batches(fn, batch_format="pyarrow")


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    ts_col: str,
    id_col: str,
    value_cols: tuple[str, ...] = (),
    inclusive: bool = True,
    tolerance: int | None = None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> ray.data.Dataset:
    """As-of join: for every left row, the single most recent right row
    with the same ``on`` key and ``right.ts <= left.ts`` (``< `` when
    ``inclusive=False``); ties on right ts break toward the larger right
    id (a total order, so the match is deterministic). ``tolerance``
    bounds the staleness: matches older than ``left.ts - tolerance``
    (in the ts column's integer unit) are dropped.

    Ray-native plan: both sides project to a slim harmonized layout, ONE
    hash shuffle co-partitions them by key, and each partition resolves
    all its keys in a single vectorized sweep — lexsort by (key, ts, side,
    id) with rights ordered before lefts at equal ts, then a
    ``maximum.accumulate`` forward-fill of the last-right index; a carried
    index from the previous key run self-invalidates by key mismatch, so
    no per-key Python loop exists at any group count. Unmatched lefts emit
    ``matched_id = -1`` (and 0 values) rather than nulls.

    No linref counterpart (linref relates intervals, not timestamps);
    semantics anchored to ANSI ``ASOF JOIN`` / the windowed-SQL oracle in
    __ray_entry__.
    """
    import pyarrow.compute as pc

    def project(ds: ray.data.Dataset, side: int):
        def fn(t: pa.Table) -> pa.Table:
            key = pc.cast(t[on], pa.int64())
            knp = key.to_numpy(zero_copy_only=False)
            cols = {
                "__key": key,
                "__ts": pc.cast(t[ts_col], pa.int64()),
                "__id": pc.cast(t[id_col], pa.int64()),
                "__side": pa.array(
                    np.full(len(t), side, dtype=np.int8)
                ),
                _JPID: pa.array(
                    (knp % num_partitions).astype(np.int64)
                ),
            }
            for i, c in enumerate(value_cols):
                # values ride only on the right side; lefts pad with nulls
                cols[f"__v{i}"] = (
                    pc.cast(t[c], pa.float64())
                    if side == 1
                    else pa.nulls(len(t), pa.float64())
                )
            return pa.table(cols)

        return ds.map_batches(fn, batch_format="pyarrow")

    both = project(left, 0).union(project(right, 1))

    def kernel(t: pa.Table) -> pa.Table:
        out_schema = {
            id_col: pa.array([], pa.int64()),
            "matched_id": pa.array([], pa.int64()),
            **{
                f"matched_{c}": pa.array([], pa.float64())
                for c in value_cols
            },
        }
        if len(t) == 0:
            return pa.table(out_schema)
        key = t["__key"].to_numpy(zero_copy_only=False)
        ts = t["__ts"].to_numpy(zero_copy_only=False)
        ids = t["__id"].to_numpy(zero_copy_only=False)
        side = t["__side"].to_numpy(zero_copy_only=False)
        # rights (side=1) before lefts at equal ts when inclusive, after
        # when strict — encoded by the side sort key
        side_key = (side == 0) if inclusive else (side == 1)
        order = np.lexsort([ids, side_key, ts, key])
        key_s, ts_s, ids_s = key[order], ts[order], ids[order]
        is_right = (side[order] == 1)
        r_idx = np.where(is_right, np.arange(len(t)), -1)
        last_r = np.maximum.accumulate(r_idx)
        left_pos = np.flatnonzero(~is_right)
        lr = last_r[left_pos]
        valid = lr >= 0
        # a forward-fill carried across a key run boundary invalidates
        # itself: its key differs from the left row's key
        valid &= key_s[np.maximum(lr, 0)] == key_s[left_pos]
        if tolerance is not None:
            valid &= ts_s[left_pos] - ts_s[np.maximum(lr, 0)] <= tolerance
        matched = np.where(valid, ids_s[np.maximum(lr, 0)], -1)
        out = {
            id_col: pa.array(ids_s[left_pos]),
            "matched_id": pa.array(matched),
        }
        if value_cols:
            vsorted = {
                i: t[f"__v{i}"].to_numpy(zero_copy_only=False)[order]
                for i in range(len(value_cols))
            }
            for i, c in enumerate(value_cols):
                v = vsorted[i][np.maximum(lr, 0)]
                out[f"matched_{c}"] = pa.array(
                    np.where(valid, np.nan_to_num(v, nan=0.0), 0.0)
                )
        return pa.table(out)

    return (
        both.repartition(num_partitions)
        .groupby(_JPID)
        .map_groups(kernel, batch_format="pyarrow")
    )
