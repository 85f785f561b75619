"""Distributed exact order statistics.

Exact ``percentile_cont`` quantiles over columns with bounded distinct
values (measure codes, integer quantities, ratings, token counts — the
common shape for corpus statistics): per-batch value-counts partials, one
small ``groupby`` over (group, value), then closed-form interpolation over
the cumulative counts. The shuffled payload is counts, never rows, so the
all-to-all stays tiny at any corpus size; the contract is distinct values
per group bounded, NOT rows. For genuinely continuous columns, bucket
first (round/log-bucket) or use a sketch.

Engine-side addition (no linref counterpart); the SQL oracle is ANSI
``percentile_cont(q) within group (order by col)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def exact_quantiles(
    ds: ray.data.Dataset,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    group_cols: tuple[str, ...] = (),
    num_partitions: int = 8,
) -> pa.Table:
    """(group_cols..., q, value) — bit-compatible with SQL percentile_cont
    (linear interpolation at rank ``q * (n - 1)``). Returns an Arrow table:
    the result is one row per (group, q), always driver-small."""
    cols = list(group_cols) + [value_col]

    def partial(t: pa.Table) -> pa.Table:
        sub = t.select(cols)
        # value-counts over the composite (groups, value) key
        combined = sub.group_by(cols).aggregate([([], "count_all")])
        return combined.rename_columns(cols + ["n"])

    counts = pa.concat_tables(
        ray.get(
            ds.map_batches(partial, batch_format="pyarrow")
            .repartition(num_partitions)
            .groupby(cols[0])
            .map_groups(
                lambda t: t.group_by(cols).aggregate([("n", "sum")])
                .rename_columns(cols + ["n"]),
                batch_format="pyarrow",
            )
            .to_arrow_refs()
        ),
        promote_options="default",
    )
    # driver-side closed form over the tiny counts table
    vals = counts[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
    ns = counts["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    if group_cols:
        gkeys = list(
            zip(*(counts[g].to_pylist() for g in group_cols))
        )
    else:
        gkeys = [()] * len(counts)
    out_rows: list[tuple] = []
    for gk in sorted(set(gkeys)):
        sel = np.array([g == gk for g in gkeys])
        v, c = vals[sel], ns[sel]
        order = np.argsort(v)
        v, c = v[order], c[order]
        cum = np.cumsum(c)
        n = int(cum[-1])
        for q in qs:
            pos = q * (n - 1)
            i0, frac = int(np.floor(pos)), pos - np.floor(pos)
            lo = v[np.searchsorted(cum, i0, side="right")]
            hi = v[np.searchsorted(cum, i0 + 1, side="right")] if frac else lo
            out_rows.append(gk + (float(q), lo + (hi - lo) * frac))
    arrays: dict[str, pa.Array] = {}
    for i, g in enumerate(group_cols):
        arrays[g] = pa.array([r[i] for r in out_rows], counts[g].type)
    arrays["q"] = pa.array([r[-2] for r in out_rows], pa.float64())
    arrays["value"] = pa.array([r[-1] for r in out_rows], pa.float64())
    return pa.table(arrays)


def top_k_per_group(
    ds: ray.data.Dataset,
    group_col: str,
    order_col: str,
    k: int = 3,
    descending: bool = True,
    tie_col: str | None = None,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Exact top-``k`` rows of every group by ``order_col`` — the generic
    per-key selection op (best captions per image, highest-score docs per
    domain, largest lineitems per order).

    One hash shuffle on the group key; each partition then resolves ALL
    its groups in a single vectorized pass (factorize group → lexsort →
    run-boundary rank), never dispatching per group. ``tie_col``
    (ascending) makes the selection a total order, hence deterministic
    under any partitioning; without it, ties at the boundary are broken
    by ``order_col`` input order within the partition."""
    from linref_ray.partition import PID, hash_partition_ids

    def add_pid(t: pa.Table) -> pa.Table:
        return t.append_column(
            PID, pa.array(hash_partition_ids(t[group_col], num_partitions))
        )

    def kernel(t: pa.Table) -> pa.Table:
        t = t.drop_columns([PID])
        if len(t) == 0:
            return t
        _, gcode = np.unique(
            t[group_col].to_numpy(zero_copy_only=False), return_inverse=True
        )
        order = t[order_col].to_numpy(zero_copy_only=False).astype(np.float64)
        okey = -order if descending else order
        keys = [okey, gcode]
        if tie_col is not None:
            keys.insert(
                0, t[tie_col].to_numpy(zero_copy_only=False)
            )
        srt = np.lexsort(keys)
        g_s = gcode[srt]
        starts = np.concatenate([[True], g_s[1:] != g_s[:-1]])
        start_idx = np.flatnonzero(starts)
        pos = np.arange(len(g_s)) - start_idx[np.cumsum(starts) - 1]
        return t.take(srt[pos < k])

    return (
        ds.map_batches(add_pid, batch_format="pyarrow")
        .repartition(num_partitions)
        .groupby(PID)
        .map_groups(kernel, batch_format="pyarrow")
    )


def filter_by_quantile(
    ds: ray.data.Dataset,
    value_col: str,
    q: float = 0.9,
    keep: str = "above",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Quantile-threshold filter — the "keep the top (1-q) of the corpus by
    quality score" primitive of curation pipelines. Computes the exact
    ``q``-quantile of ``value_col`` (:func:`exact_quantiles` — counts-only
    shuffle, driver-small result), then streams one vectorized filter pass:
    ``keep='above'`` keeps rows with value >= the quantile, ``'below'``
    keeps value <= it. The threshold is a closure scalar — nothing
    broadcast, nothing re-shipped per batch; the wide columns never
    shuffle."""
    if keep not in ("above", "below"):
        raise ValueError("keep must be 'above' or 'below'")
    qt = exact_quantiles(ds, value_col, qs=(q,))
    thr = qt["value"][0].as_py()

    def fn(t: pa.Table) -> pa.Table:
        v = t[value_col]
        mask = (
            pc.greater_equal(v, thr) if keep == "above"
            else pc.less_equal(v, thr)
        )
        return t.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def approx_distinct(
    ds: ray.data.Dataset,
    col: str,
    precision: int = 12,
) -> float:
    """HyperLogLog approximate COUNT DISTINCT (Flajolet et al. 2007,
    public) — the mergeable-sketch cardinality path for columns whose
    exact distinct would itself need a full shuffle.

    Per batch: stable 64-bit value hashes → register index (top
    ``precision`` bits) and rank (leading-zero count of the rest + 1);
    the batch partial is its max rank per register — slim ``(register,
    rank)`` rows. One tiny ``groupby(register).max`` merges all partials
    (registers ≤ 2^precision), and the driver applies the standard HLL
    estimator with linear-counting small-range correction. Deterministic
    for a given input set and independent of batching/partitioning
    (max is order-free) — asserted by tests.
    """
    import pandas as pd
    import ray as _ray

    p = int(precision)
    if not 4 <= p <= 18:
        raise ValueError("precision must be in [4, 18]")
    m = 1 << p

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "reg": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
            }
        )
        if len(t) == 0:
            return empty
        h = pd.util.hash_array(
            t[col].to_numpy(zero_copy_only=False), categorize=False
        )
        reg = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
        # rank = leading zeros of the remaining 64-p bits + 1; the OR above
        # caps it at 64-p+1 without a branch
        rank = np.zeros(len(h), dtype=np.int64)
        x = rest.copy()
        probe = np.uint64(1) << np.uint64(63)
        while True:
            lead = (x & probe) == 0
            if not lead.any():
                break
            rank[lead] += 1
            x[lead] = x[lead] << np.uint64(1)
        rank += 1
        order = np.lexsort([-rank, reg])
        reg_s, rank_s = reg[order], rank[order]
        first = np.concatenate(([True], reg_s[1:] != reg_s[:-1]))
        return pa.table(
            {
                "reg": pa.array(reg_s[first]),
                "rank": pa.array(rank_s[first]),
            }
        )

    tbl = pa.concat_tables(
        _ray.get(
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("reg")
            .max("rank")
            .to_arrow_refs()
        ),
        promote_options="default",
    )
    regs = np.zeros(m, dtype=np.int64)
    if len(tbl):
        regs[tbl["reg"].to_numpy(zero_copy_only=False)] = tbl[
            "max(rank)"
        ].to_numpy(zero_copy_only=False)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting small-range fix
    return float(est)


def approx_quantiles(
    ds: ray.data.Dataset,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    points_per_batch: int = 256,
    group_cols: tuple[str, ...] = (),
) -> pa.Table:
    """Mergeable ε-approximate quantiles — the scale path where
    :func:`exact_quantiles`' per-distinct-value count shuffle would explode
    on continuous float columns (1e12 rows of doubles have ~1e12 distinct
    values; this never shuffles more than ``points_per_batch`` rows per
    batch).

    Each batch contributes its own exact quantile grid decimated to
    ``points_per_batch`` (value, weight) points — a classic mergeable
    summary with rank error ≤ batch_rows / points_per_batch per batch,
    i.e. ≤ total_rows / points_per_batch overall after the single merge
    (one tiny driver-side weighted-quantile pass; partials are
    driver-small by construction). With ``group_cols`` the decimation
    runs per in-batch group (rank error bounds per group the same way).
    Deterministic given the batching; tests assert the rank-error bound
    against the exact result. Returns an Arrow table
    ``(group_cols..., q, value)``.
    """
    import ray as _ray

    k = int(points_per_batch)
    gcols = list(group_cols)

    def _decimate(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        n = len(v)
        if n <= k:
            return v, np.ones(n)
        idx = np.minimum(
            ((np.arange(k) + 0.5) * n / k).astype(np.int64), n - 1
        )
        return v[idx], np.full(k, n / k)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                **{c: pa.array([], t.schema.field(c).type) for c in gcols},
                "v": pa.array([], pa.float64()),
                "w": pa.array([], pa.float64()),
            }
        )
        if len(t) == 0:
            return empty
        vals = t[value_col].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        if not gcols:
            v, w = _decimate(np.sort(vals))
            return pa.table({"v": pa.array(v), "w": pa.array(w)})
        key = np.empty(len(t), dtype=object)
        key[:] = list(zip(*(t[c].to_pylist() for c in gcols)))
        uniq, codes = np.unique(key, return_inverse=True)
        order = np.lexsort([vals, codes])
        codes_s, v_s = codes[order], vals[order]
        first = np.concatenate(([True], codes_s[1:] != codes_s[:-1]))
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(v_s))
        cols: dict = {c: [] for c in gcols}
        vv, ww = [], []
        for a, z in zip(starts, ends):
            dv, dw = _decimate(v_s[a:z])
            vv.append(dv)
            ww.append(dw)
            g = uniq[codes_s[a]]
            for ci, c in enumerate(gcols):
                cols[c].extend([g[ci]] * len(dv))
        return pa.table(
            {
                **{
                    c: pc.cast(
                        pa.array(cols[c]), t.schema.field(c).type
                    )
                    for c in gcols
                },
                "v": pa.array(np.concatenate(vv)),
                "w": pa.array(np.concatenate(ww)),
            }
        )

    tbl = pa.concat_tables(
        _ray.get(
            ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
        ),
        promote_options="default",
    )

    def _weighted(v: np.ndarray, w: np.ndarray):
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        cum = np.cumsum(w)
        total = cum[-1] if len(cum) else 0.0
        for q in qs:
            if not len(v):
                continue
            pos = np.searchsorted(cum, q * total, side="left")
            yield float(q), float(v[min(pos, len(v) - 1)])

    v = tbl["v"].to_numpy(zero_copy_only=False)
    w = tbl["w"].to_numpy(zero_copy_only=False)
    if not gcols:
        pairs = list(_weighted(v, w))
        return pa.table(
            {
                "q": pa.array([p[0] for p in pairs]),
                "value": pa.array([p[1] for p in pairs]),
            }
        )
    key = np.empty(len(tbl), dtype=object)
    key[:] = list(zip(*(tbl[c].to_pylist() for c in gcols)))
    out: dict = {c: [] for c in gcols}
    out_q, out_v = [], []
    for g in sorted(set(key.tolist())):
        m = key == g
        for q, val in _weighted(v[m], w[m]):
            for ci, c in enumerate(gcols):
                out[c].append(g[ci])
            out_q.append(q)
            out_v.append(val)
    return pa.table(
        {
            **{
                c: pc.cast(pa.array(out[c]), tbl.schema.field(c).type)
                for c in gcols
            },
            "q": pa.array(out_q),
            "value": pa.array(out_v),
        }
    )
