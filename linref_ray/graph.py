"""Distributed graph ops over edge Datasets.

`connected_components` is the scale path for the dedup cascades'
pairs→components step: `dedup.dedup_corpus` collects the verified edge list
to the driver for union-find (right while edges ≪ corpus), but a
pathologically duplicate-heavy corpus can produce an edge list that itself
needs the cluster. Min-label propagation with pointer jumping
(Shiloach–Vishkin style label shortcutting — public algorithm family, cf.
also Kiveris et al.'s MapReduce alternating-star): O(E + N) bytes exchanged
per round, O(log diameter) rounds, nothing ever collected to the driver.

Execution shape: this is the one operator here built on RAW Ray tasks
rather than Dataset transforms, deliberately. An iterative fixpoint wants
the (static) edge partitions CACHED in the object store across rounds;
expressing each round as Dataset joins re-shuffled the edge table every
iteration through ~7 all-to-all barriers (measured 362 s for a 200k-edge
graph — fixed per-stage costs, not compute). Here edges are partitioned
and u-sorted ONCE; each round is three P-wide waves of small numpy tasks
(message generation, min-reduce, pointer-jump resolution) exchanging only
slim (node, label) arrays. The per-partition state lives in the object
store as Arrow-free numpy pairs; the driver holds refs only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _part(x: np.ndarray, p: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return ((x.astype(np.uint64) * _GOLD) % np.uint64(p)).astype(np.int64)


@ray.remote
def _split_edges(tbl: pa.Table, a_col: str, b_col: str, p: int):
    """Symmetrize one input block and bucket directed edges by h(u)."""
    import pyarrow.compute as pc

    if a_col not in tbl.column_names:
        # Ray 2.49 groupby().map_groups emits ZERO-COLUMN empty blocks for
        # empty partitions (see joins.hash_join) — treat as no edges.
        if len(tbl) == 0:
            e = np.empty(0, dtype=np.int64)
            return tuple((e, e) for _ in range(p))
        raise KeyError(f"edge table missing column {a_col!r}")
    a = pc.cast(tbl[a_col], pa.int64()).to_numpy(zero_copy_only=False)
    b = pc.cast(tbl[b_col], pa.int64()).to_numpy(zero_copy_only=False)
    keep = a != b
    a, b = a[keep], b[keep]
    u = np.concatenate([a, b])
    v = np.concatenate([b, a])
    pid = _part(u, p)
    order = np.argsort(pid, kind="stable")
    u, v, pid = u[order], v[order], pid[order]
    bounds = np.searchsorted(pid, np.arange(p + 1))
    return tuple(
        (u[s:e], v[s:e]) for s, e in zip(bounds[:-1], bounds[1:])
    )


@ray.remote
def _build_part(*chunks):
    """Merge one partition's edge chunks, sort by u, init labels = node."""
    if chunks:
        u = np.concatenate([c[0] for c in chunks])
        v = np.concatenate([c[1] for c in chunks])
    else:
        u = np.empty(0, np.int64)
        v = np.empty(0, np.int64)
    order = np.argsort(u, kind="stable")
    u, v = u[order], v[order]
    nodes = np.unique(u)  # symmetric edges: u covers every incident node
    return (u, v), (nodes, nodes.copy())


@ray.remote
def _gen_msgs(edges, labels, p: int):
    """(target_node, candidate_label) messages, bucketed by h(target).

    The reverse edge delivers L(v) to u, so sending L(u) to v over the
    symmetrized list covers both directions.
    """
    (u, v) = edges
    (nodes, lab) = labels
    if not len(u):
        z = np.empty(0, np.int64)
        return tuple((z, z) for _ in range(p))
    lu = lab[np.searchsorted(nodes, u)]  # u is sorted per partition build
    pid = _part(v, p)
    order = np.argsort(pid, kind="stable")
    v_s, lu_s, pid_s = v[order], lu[order], pid[order]
    bounds = np.searchsorted(pid_s, np.arange(p + 1))
    return tuple(
        (v_s[s:e], lu_s[s:e]) for s, e in zip(bounds[:-1], bounds[1:])
    )


@ray.remote
def _reduce_min(labels, *msgs):
    """labels[n] ← min(labels[n], min candidate); returns new state +
    changed count."""
    (nodes, lab) = labels
    new = lab.copy()
    for tn, cand in msgs:
        if not len(tn):
            continue
        idx = np.searchsorted(nodes, tn)
        np.minimum.at(new, idx, cand)
    changed = int((new != lab).sum())
    return (nodes, new), changed


@ray.remote
def _bucket_label_requests(labels, p: int):
    """Distinct label values this partition needs resolved, by h(label)."""
    (_, lab) = labels
    uniq = np.unique(lab)
    pid = _part(uniq, p)
    order = np.argsort(pid, kind="stable")
    u_s, pid_s = uniq[order], pid[order]
    bounds = np.searchsorted(pid_s, np.arange(p + 1))
    return tuple(u_s[s:e] for s, e in zip(bounds[:-1], bounds[1:]))


@ray.remote
def _resolve_labels(labels, *requests):
    """(l, L(l)) for every requested label l owned by this partition."""
    (nodes, lab) = labels
    req = (
        np.unique(np.concatenate([r for r in requests if len(r)]))
        if any(len(r) for r in requests)
        else np.empty(0, np.int64)
    )
    if not len(req) or not len(nodes):
        z = np.empty(0, np.int64)
        return z, z
    pos = np.clip(np.searchsorted(nodes, req), 0, len(nodes) - 1)
    hit = nodes[pos] == req
    # a label is always a node id, so misses can only be empty partitions
    return req[hit], lab[pos[hit]]


@ray.remote
def _apply_jump(labels, *mappings):
    """labels ← L(labels) via the resolved (l, L(l)) union; returns new
    state + changed count."""
    (nodes, lab) = labels
    keys = np.concatenate([m[0] for m in mappings]) if mappings else lab[:0]
    vals = np.concatenate([m[1] for m in mappings]) if mappings else lab[:0]
    if not len(keys):
        return (nodes, lab), 0
    order = np.argsort(keys, kind="stable")
    keys, vals = keys[order], vals[order]
    pos = np.searchsorted(keys, lab)
    pos = np.clip(pos, 0, len(keys) - 1)
    hit = keys[pos] == lab
    new = lab.copy()
    new[hit] = vals[pos[hit]]
    changed = int((new != lab).sum())
    return (nodes, new), changed


@ray.remote
def _n_nodes(labels) -> int:
    return len(labels[0])


@ray.remote
def _emit(labels) -> pa.Table:
    (nodes, lab) = labels
    return pa.table(
        {"node": pa.array(nodes, pa.int64()),
         "label": pa.array(lab, pa.int64())}
    )


def connected_components(
    edges: ray.data.Dataset,
    a_col: str = "id_a",
    b_col: str = "id_b",
    num_partitions: int = 8,
    max_rounds: int = 64,
) -> ray.data.Dataset:
    """``(node, component)`` for every node incident to an edge; the
    component label is the minimum node id of its component (the same
    canonical-winner convention as ``dedup.dedup_corpus``).

    BSP rounds over cached edge partitions (see module docstring): each
    round generates min-label messages along every directed edge, reduces
    per node, then pointer-jumps ``L(u) ← L(L(u))`` so chains collapse in
    O(log diameter) rounds. Labels only ever decrease; a round with zero
    changes in both phases is the exact fixpoint test.
    """
    # num_returns=1 would deliver each producer's whole result tuple as a
    # single object (breaking every consumer's unpacking) — two partitions
    # is the working minimum.
    p = max(2, int(num_partitions))
    block_refs = edges.to_arrow_refs()
    # everything below moves by OBJECT REF between tasks — the driver
    # only ever fetches per-round scalar changed-counts
    split = [
        _split_edges.options(num_returns=p).remote(ref, a_col, b_col, p)
        for ref in block_refs
    ]
    built = [
        _build_part.options(num_returns=2).remote(
            *[sp[q] for sp in split]
        )
        for q in range(p)
    ]
    edge_refs = [b[0] for b in built]
    label_refs = [b[1] for b in built]

    # node count from the built partitions — edges.count() would
    # re-execute the whole upstream pipeline a second time
    if sum(ray.get([_n_nodes.remote(r) for r in label_refs])) == 0:
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()),
                 "label": pa.array([], pa.int64())}
            )
        )

    for _ in range(max_rounds):
        msgs = [
            _gen_msgs.options(num_returns=p).remote(
                edge_refs[q], label_refs[q], p
            )
            for q in range(p)
        ]
        red = [
            _reduce_min.options(num_returns=2).remote(
                label_refs[q], *[m[q] for m in msgs]
            )
            for q in range(p)
        ]
        new_labels = [r[0] for r in red]
        changed1 = sum(ray.get([r[1] for r in red]))
        reqs = [
            _bucket_label_requests.options(num_returns=p).remote(
                new_labels[q], p
            )
            for q in range(p)
        ]
        res = [
            _resolve_labels.remote(
                new_labels[r], *[rq[r] for rq in reqs]
            )
            for r in range(p)
        ]
        jumped = [
            _apply_jump.options(num_returns=2).remote(
                new_labels[q], *res
            )
            for q in range(p)
        ]
        label_refs = [j[0] for j in jumped]
        changed2 = sum(ray.get([j[1] for j in jumped]))
        if changed1 == 0 and changed2 == 0:
            return ray.data.from_arrow_refs(
                [_emit.remote(label_refs[q]) for q in range(p)]
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds"
    )


def component_losers(
    components: ray.data.Dataset,
) -> ray.data.Dataset:
    """Non-canonical members — every node whose component label is not
    itself. One streaming filter over the (node, component) table."""
    import pyarrow.compute as pc

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t["node"],
                "component": t[
                    "component" if "component" in t.column_names else "label"
                ],
            }
        )

    def fn(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t["node"], t["component"]))

    return components.map_batches(
        rename, batch_format="pyarrow"
    ).map_batches(fn, batch_format="pyarrow")
