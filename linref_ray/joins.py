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
