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
    salted = np.char.add(
        np.char.add(keys[rows].astype(str), "#"), buckets.astype(str)
    )
    pid = (pd.util.hash_array(salted) % np.uint64(num_partitions)).astype(np.int64)
    return rows, buckets, pid
