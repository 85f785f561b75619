"""Distributed graph ops over edge Datasets.

`connected_components` is the scale path for the dedup cascades'
pairs→components step: `dedup.dedup_corpus` collects the verified edge list
to the driver for union-find (right while edges ≪ corpus), but a
pathologically duplicate-heavy corpus can produce an edge list that itself
needs the cluster. This implements min-label propagation with pointer
jumping (Shiloach–Vishkin style label shortcutting — public algorithm
family, cf. also Kiveris et al.'s MapReduce alternating-star), entirely as
Ray Data shuffles: O(E + N) bytes exchanged per round, O(log diameter)
rounds, nothing ever collected to the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from linref_ray.joins import hash_join


def _rename(ds: ray.data.Dataset, mapping: dict[str, str]) -> ray.data.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {mapping.get(c, c): t[c] for c in t.column_names}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


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

    The edge list is symmetrized ONCE up front (2E rows, materialized), so
    each round is exactly three shuffles: one ``hash_join`` attaching
    ``L(u)`` to every directed edge (the reverse edge delivers ``L(v)`` to
    ``u``), one ``groupby(node).min`` over the messages, and one
    pointer-jumping self-join of the label table (``L(u) ← L(L(u))``) so
    long chains collapse logarithmically instead of one hop per round.
    Labels only ever decrease, so an unchanged ``sum(label)`` aggregate is
    an exact convergence test. The label table is materialized each round —
    the iterative fixpoint is inherently a per-round barrier; everything
    inside a round streams.
    """

    def prep(t: pa.Table) -> pa.Table:
        a = pc.cast(t[a_col], pa.int64()).to_numpy(zero_copy_only=False)
        b = pc.cast(t[b_col], pa.int64()).to_numpy(zero_copy_only=False)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table(
            {
                "u": pa.array(np.concatenate([a, b]), pa.int64()),
                "v": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    e = edges.map_batches(prep, batch_format="pyarrow").materialize()
    empty = pa.table(
        {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
    )
    if e.count() == 0:  # typed empty — all-empty Ray datasets lose schema
        return ray.data.from_arrow(empty)

    def node_partial(t: pa.Table) -> pa.Table:
        # edges are symmetric — u alone covers every incident node
        both = np.unique(t["u"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(both, pa.int64())})

    labels = (
        e.map_batches(node_partial, batch_format="pyarrow")
        .repartition(num_partitions)
        .groupby("node")
        .count()
        .map_batches(
            lambda t: pa.table({"node": t["node"], "label": t["node"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def msgs(t: pa.Table) -> pa.Table:
        # the reverse edge delivers L(v) to u, so (v, lab_u) covers both
        return pa.table({"node": t["v"], "cand": t["lab_u"]})

    prev_sum: int | None = None
    for _ in range(max_rounds):
        with_u = hash_join(
            e,
            _rename(labels, {"node": "u", "label": "lab_u"}),
            on="u",
            how="inner",
            num_partitions=num_partitions,
        )
        cand = with_u.map_batches(msgs, batch_format="pyarrow").union(
            _rename(labels, {"label": "cand"})
        )
        new_labels = (
            cand.repartition(num_partitions)
            .groupby("node")
            .min("cand")
            .map_batches(
                lambda t: pa.table(
                    {"node": t["node"], "label": t["min(cand)"]}
                ),
                batch_format="pyarrow",
            )
        )
        # pointer jumping: L(u) ← L(L(u)) (a label is always a node id)
        jumped = hash_join(
            _rename(new_labels, {"label": "mid"}),
            _rename(new_labels, {"node": "mid"}),
            on="mid",
            how="inner",
            num_partitions=num_partitions,
        ).select_columns(["node", "label"])
        labels = jumped.materialize()
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds"
    )


def component_losers(
    components: ray.data.Dataset,
) -> ray.data.Dataset:
    """Non-canonical members — every node whose component label is not
    itself. One streaming filter over the (node, component) table."""

    def fn(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t["node"], t["component"]))

    return _rename(components, {"label": "component"}).map_batches(
        fn, batch_format="pyarrow"
    )
