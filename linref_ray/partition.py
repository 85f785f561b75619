"""Partitioning helpers: route-keyed hash partitions and salted buckets.

The engine's one deliberate shuffle is a hash partition on the route key
(optionally salted with a measure bucket for skewed mega-routes — the
"salted-key shuffle" named by BASELINE.json). All per-route operators run as
``groupby('__pid').map_groups`` with multi-group vectorized kernels: one
Python call per *partition* (not per route), which is the fast path vs
per-group dispatch when routes are many and small.

Partition-count guidance at scale: ``num_partitions`` should be chosen so a
partition's rows fit a worker heap (≈ total_rows / (2-4 × cluster cores) as a
default); it is a parameter on every pipeline here. Hashes are computed with
``pandas.util.hash_array`` (stable SipHash across processes — safe for
retries and resume).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

PID = "__pid"
KEYCOL = "__key"
SIDE = "__side"
IDCOL = "__id"
BUCKET = "__bucket"

DEFAULT_NUM_PARTITIONS = 64


def canonical_key_array(tbl: pa.Table, key_cols: tuple[str, ...]) -> pa.Array:
    """Single string key column from one or more key columns.

    Multi-column keys are joined with an ASCII unit separator — the analog of
    the reference's recarray group keys (``ext/base.py:749``).
    """
    parts = []
    for c in key_cols:
        col = tbl[c]
        if col.type != pa.string():
            col = pc.cast(col, pa.string())
        parts.append(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, "\x1f")


def hash_partition_ids(keys: pa.Array | np.ndarray, num_partitions: int) -> np.ndarray:
    """Stable partition id per key value."""
    if isinstance(keys, (pa.Array, pa.ChunkedArray)):
        keys = keys.to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(np.asarray(keys), categorize=True)
    return (h % np.uint64(num_partitions)).astype(np.int64)


def add_partition_cols(
    tbl: pa.Table,
    key_cols: tuple[str, ...],
    num_partitions: int,
    side: int | None = None,
    id_col: str | None = None,
) -> pa.Table:
    """Append ``__key`` + ``__pid`` (and optionally ``__side``) columns."""
    key = canonical_key_array(tbl, key_cols)
    pid = hash_partition_ids(key, num_partitions)
    out = tbl.append_column(KEYCOL, key)
    out = out.append_column(PID, pa.array(pid))
    if side is not None:
        out = out.append_column(
            SIDE, pa.array(np.full(len(tbl), side, dtype=np.int8))
        )
    if id_col is not None:
        out = out.append_column(IDCOL, pc.cast(out[id_col], pa.int64()))
    return out


def salted_partition_rows(
    begs: np.ndarray,
    ends: np.ndarray,
    keys: np.ndarray,
    bucket_size: float,
    num_partitions: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Replicate each interval row into every measure bucket it spans.

    Returns ``(row_index, bucket_id, pid)``: the expansion index plus the
    bucket and partition of each replica. Pair weights are later computed
    per-bucket with window clipping so replicas never double-count (see
    ``overlay_pairs(window=...)`` additivity, tested in
    ``tests/test_kernels_intervals.py``).
    """
    b0 = np.floor(begs / bucket_size).astype(np.int64)
    b1 = np.floor(np.nextafter(ends, -np.inf) / bucket_size).astype(np.int64)
    b1 = np.maximum(b1, b0)
    counts = b1 - b0 + 1
    rows = np.repeat(np.arange(len(begs), dtype=np.int64), counts)
    offs = np.concatenate([[0], np.cumsum(counts)])
    buckets = (
        np.arange(int(counts.sum()), dtype=np.int64)
        - np.repeat(offs[:-1], counts)
        + np.repeat(b0, counts)
    )
    # integer mix of (key hash, bucket) — the earlier np.char string
    # concat ("key#bucket") was the dominant cost of the salted path
    kh = pd.util.hash_array(np.asarray(keys), categorize=True)[rows]
    mixed = (
        kh * np.uint64(0x9E3779B97F4A7C15)
        ^ buckets.view(np.uint64)
    )
    pid = (mixed % np.uint64(num_partitions)).astype(np.int64)
    return rows, buckets, pid


def grouped_int_sum(
    ds,
    key_cols: tuple[str, ...],
    sum_col: str,
    out_col: str | None = None,
    num_partitions: int = 8,
):
    """Single-column integer wrapper over :func:`grouped_sums` — integer
    sums are order-free, so outputs stay bitwise-reproducible."""
    return grouped_sums(
        ds, key_cols, ((sum_col, out_col or sum_col),),
        num_partitions=num_partitions,
    )


def grouped_sums(
    ds,
    key_cols: tuple[str, ...],
    sums: tuple[tuple[str, str], ...],
    num_partitions: int = 8,
):
    """Exact groupby-sum built for HIGH GROUP CARDINALITY: coarse hash
    partition on the key tuple, then ONE lexsort + ``reduceat`` kernel per
    partition. Ray Data's ``groupby(keys).aggregate(Sum)`` is pathological
    when distinct groups number in the hundreds of thousands or more
    (measured ~490 s remote wall on 5M rows / ~3M pair groups; this shape
    ran in ~1 s) — few-group aggregates should keep using the built-in.

    ``sums`` is ``((in_col, out_col), ...)`` or ``((in_col, out_col,
    op), ...)`` with ``op`` ∈ {'sum','min','max'} (default 'sum').
    Integer sums and all min/max are order-free (bitwise-stable); float64
    sums run in ``reduceat`` order, which differs from the built-in
    aggregate's order by last-bit float association — callers that need
    bit-stability against an oracle must round after the total (the same
    contract the built-in already imposed).
    """
    import ray.data

    keys = list(key_cols)

    def add_pid(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("__gpid", pa.array([], pa.int64()))
        h = np.zeros(len(t), dtype=np.uint64)
        for c in keys:
            v = t[c].to_numpy(zero_copy_only=False).astype(np.int64)
            h = h * np.uint64(0x9E3779B97F4A7C15) ^ v.astype(np.uint64)
        return t.append_column(
            "__gpid",
            pa.array((h % np.uint64(num_partitions)).astype(np.int64)),
        )

    schema = {n: t for n, t in zip(ds.schema().names, ds.schema().types)}
    key_types = {n: schema.get(n, pa.int64()) for n in keys}

    def _sum_np_dtype(col: str):
        t = schema.get(col, pa.int64())
        return (
            np.float64
            if isinstance(t, pa.DataType) and pa.types.is_floating(t)
            else np.int64
        )

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                **{c: pa.array([], key_types[c]) for c in keys},
                **{
                    spec[1]: pa.array(
                        np.empty(0, _sum_np_dtype(spec[0]))
                    )
                    for spec in sums
                },
            }
        )
        if len(t) == 0:
            return empty
        arrs = [
            t[c].to_numpy(zero_copy_only=False).astype(np.int64)
            for c in keys
        ]
        order = np.lexsort(arrs[::-1])
        sorted_arrs = [a[order] for a in arrs]
        neq = np.zeros(len(t) - 1, dtype=bool)
        for a in sorted_arrs:
            neq |= a[1:] != a[:-1]
        starts = np.concatenate(([0], np.flatnonzero(neq) + 1))
        cols = {
            c: pc.cast(pa.array(a[starts]), key_types[c])
            for c, a in zip(keys, sorted_arrs)
        }
        ufuncs = {"sum": np.add, "min": np.minimum, "max": np.maximum}
        for spec in sums:
            col, out = spec[0], spec[1]
            op = spec[2] if len(spec) > 2 else "sum"
            v = t[col].to_numpy(zero_copy_only=False).astype(
                _sum_np_dtype(col)
            )
            cols[out] = pa.array(ufuncs[op].reduceat(v[order], starts))
        return pa.table(cols)

    anchor = ray.data.from_arrow(
        pa.table(
            {
                **{c: pa.array([], key_types[c]) for c in keys},
                **{
                    spec[0]: pa.array(np.empty(0, _sum_np_dtype(spec[0])))
                    for spec in sums
                },
                "__gpid": pa.array([], pa.int64()),
            }
        )
    )
    return (
        anchor.union(ds.map_batches(add_pid, batch_format="pyarrow"))
        # consolidate the many tiny partial blocks first: the sort-based
        # groupby pays a large fixed cost PER BLOCK (repartition-before-
        # groupby pitfall), and partials are slim
        .repartition(num_partitions)
        .groupby("__gpid")
        .map_groups(kernel, batch_format="pyarrow")
    )


def grouped_distinct(
    ds,
    cols: tuple[str, ...],
    num_partitions: int = 8,
):
    """DISTINCT over a column tuple at high cardinality: coarse hash
    partition on the canonical key string, then Arrow's own C++
    ``Table.group_by`` per partition — same rationale as
    :func:`grouped_sums` (Ray's Aggregate degrades with many groups),
    but type-agnostic (string keys welcome)."""
    import ray.data

    key_cols = list(cols)
    schema = {n: t for n, t in zip(ds.schema().names, ds.schema().types)}

    def add_pid(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("__dpid2", pa.array([], pa.int64()))
        key = canonical_key_array(t.select(key_cols), tuple(key_cols))
        pid = hash_partition_ids(key, num_partitions)
        return t.select(key_cols).append_column("__dpid2", pa.array(pid))

    def kernel(t: pa.Table) -> pa.Table:
        sub = t.select(key_cols)
        if len(sub) == 0:
            return sub
        return sub.group_by(key_cols, use_threads=False).aggregate(
            []
        ).select(key_cols)

    anchor = ray.data.from_arrow(
        pa.table(
            {
                **{
                    c: pa.array(
                        [],
                        schema[c]
                        if isinstance(schema.get(c), pa.DataType)
                        else pa.string(),
                    )
                    for c in key_cols
                },
                "__dpid2": pa.array([], pa.int64()),
            }
        )
    )
    return (
        anchor.union(ds.map_batches(add_pid, batch_format="pyarrow"))
        .repartition(num_partitions)
        .groupby("__dpid2")
        .map_groups(kernel, batch_format="pyarrow")
    )
