"""Stream-shaped windowed aggregates over an ordered, keyed event log.

Ray Data is a batch engine (no watermarks); per the engine's streaming
doctrine the input is treated as a partitioned log: hash-partition by key,
sort within the key inside the kernel, window with vectorized numpy. The
reference library has no streaming surface (SURVEY §1.6) — these operators
are part of the beyond-reference training-pipeline set, shaped so their
results are expressible as SQL window/group-by oracles.

- tumbling: fixed buckets of ``size`` seconds (GROUP BY floor(ts/size))
- sliding (hop): overlapping buckets every ``hop`` seconds (rows replicate
  into ceil(size/hop) windows — bounded expansion)
- session: gaps-and-islands with ``gap`` seconds timeout
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from linref_ray.partition import DEFAULT_NUM_PARTITIONS, grouped_sums, KEYCOL, PID, add_partition_cols


_TS_DIVISOR = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}


def _epoch_seconds(col: pa.ChunkedArray) -> pa.ChunkedArray:
    if pa.types.is_timestamp(col.type):
        return pc.divide(
            pc.cast(col, pa.int64()), _TS_DIVISOR[col.type.unit]
        )
    return pc.cast(col, pa.int64())


def _window_partials(
    key_arr, win: np.ndarray, vals: np.ndarray, key_col: str
) -> pa.Table:
    """Per-(key, window) count + sum partials — lexsort + reduceat, no
    pandas round-trip inside the Arrow kernel."""
    keys = key_arr.to_numpy(zero_copy_only=False)
    if len(keys) == 0:
        return pa.table(
            {
                key_col: key_arr,
                "window": pa.array([], pa.int64()),
                "__n": pa.array([], pa.int64()),
                "__s": pa.array([], pa.float64()),
            }
        )
    order = np.lexsort([win, keys])
    k_s, w_s, v_s = keys[order], win[order], vals[order]
    starts = np.concatenate(
        [[True], (k_s[1:] != k_s[:-1]) | (w_s[1:] != w_s[:-1])]
    )
    first = np.flatnonzero(starts)
    n = np.diff(np.concatenate([first, [len(k_s)]]))
    return pa.table(
        {
            key_col: pa.array(k_s[first]),
            "window": pa.array(w_s[first].astype(np.int64)),
            "__n": pa.array(n.astype(np.int64)),
            "__s": pa.array(np.add.reduceat(v_s, first)),
        }
    )


def tumbling_window(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    size_s: int,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> ray.data.Dataset:
    """Per (key, window) count + sum; window = floor(epoch / size).

    Pure pre-aggregated groupby — one tiny shuffle of partials.
    """

    def fn(t: pa.Table) -> pa.Table:
        win = pc.cast(
            pc.floor(pc.divide(_epoch_seconds(t[ts_col]), float(size_s))),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        vals = pc.cast(t[value_col], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        return _window_partials(t[key_col], win, vals, key_col)

    partials = ds.map_batches(fn, batch_format="pyarrow")
    # (key, window) is high-cardinality — coarse-pid kernel sum, not the
    # built-in Aggregate (see partition.grouped_sums)
    return grouped_sums(
        partials, (key_col, "window"), (("__n", "n"), ("__s", "total")),
        num_partitions=max(num_partitions // 2, 4),
    )


def sliding_window(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    size_s: int,
    hop_s: int,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> ray.data.Dataset:
    """Hopping windows: each row lands in every window whose span covers its
    timestamp (``ceil(size/hop)`` replicas — vectorized row expansion, then
    the tumbling machinery). Window id = start_epoch / hop."""
    if size_s % hop_s != 0:
        raise ValueError("size_s must be a multiple of hop_s")
    k = size_s // hop_s

    def expand(t: pa.Table) -> pa.Table:
        sec = _epoch_seconds(t[ts_col]).to_numpy(zero_copy_only=False)
        base = np.floor_divide(sec, hop_s)
        n = len(sec)
        rows = np.repeat(np.arange(n, dtype=np.int64), k)
        offs = np.tile(np.arange(k, dtype=np.int64), n)
        win = base[rows] - offs
        out = t.take(pa.array(rows))
        vals = pc.cast(out[value_col], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        return _window_partials(out[key_col], win, vals, key_col)

    partials = ds.map_batches(expand, batch_format="pyarrow")
    return grouped_sums(
        partials, (key_col, "window"), (("__n", "n"), ("__s", "total")),
        num_partitions=max(num_partitions // 2, 4),
    )


def session_window(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    gap_s: int,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> ray.data.Dataset:
    """Session windows with ``gap_s`` timeout: per key, a new session starts
    when the gap since the previous event exceeds ``gap_s`` (strictly).

    Needs the whole key history together → one key-hash shuffle, sorted
    sweep inside the kernel. Output: (key, session, n, ts_min, ts_max).
    """

    def part(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                key_col: t[key_col],
                "__sec": _epoch_seconds(t[ts_col]),
            }
        )
        return add_partition_cols(out, (key_col,), num_partitions)

    def kernel(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    key_col: pa.array([], t.schema.field(key_col).type),
                    "session": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "ts_min": pa.array([], pa.int64()),
                    "ts_max": pa.array([], pa.int64()),
                }
            )
        keys = t[key_col].to_numpy(zero_copy_only=False)
        sec = t["__sec"].to_numpy(zero_copy_only=False)
        order = np.lexsort([sec, keys])
        k_s, s_s = keys[order], sec[order]
        new_key = np.concatenate([[True], k_s[1:] != k_s[:-1]])
        gap = np.concatenate([[0], s_s[1:] - s_s[:-1]])
        brk = new_key | (gap > gap_s)
        sess_global = np.cumsum(brk) - 1
        first = np.flatnonzero(brk)
        bounds = np.concatenate([first, [len(k_s)]])
        counts = np.diff(bounds)
        # Session ordinal within key (0-based).
        key_of_sess = k_s[first]
        sess_break = np.concatenate(
            [[True], key_of_sess[1:] != key_of_sess[:-1]]
        )
        sess_start = np.flatnonzero(sess_break)
        ordinal = np.arange(len(first)) - np.repeat(
            sess_start, np.diff(np.concatenate([sess_start, [len(first)]]))
        )
        return pa.table(
            {
                key_col: pa.array(key_of_sess),
                "session": pa.array(ordinal.astype(np.int64)),
                "n": pa.array(counts.astype(np.int64)),
                "ts_min": pa.array(s_s[first]),
                "ts_max": pa.array(s_s[bounds[1:] - 1]),
            }
        )

    return (
        ds.map_batches(part, batch_format="pyarrow")
        .repartition(num_partitions)
        .groupby(PID)
        .map_groups(kernel, batch_format="pyarrow")
    )
