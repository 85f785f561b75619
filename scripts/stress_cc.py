#!/usr/bin/env python
"""Distributed connected-components stress: an edge list far above what the
driver union-find path is meant for, exercising graph.connected_components
(min-label propagation + pointer jumping, all Ray shuffles).

Graph: `n_nodes` nodes in `n_nodes/comp_size` ground-truth components;
each component is a random tree plus extra random intra-component edges,
and node ids are scrambled (deterministic permutation) so labels are not
trivially ordered. Verifies every component resolved to its true minimum
member and reports wall + rounds.

Usage: python scripts/stress_cc.py [n_edges] [num_cpus]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def make_edges(n_edges: int, comp_size: int = 64, seed: int = 5):
    rng = np.random.default_rng(seed)
    # tree edges give n-1 edges per comp; top up with random intra edges
    n_comp = max(n_edges // comp_size, 1)
    n_nodes = n_comp * comp_size
    perm = rng.permutation(n_nodes).astype(np.int64)  # scrambled ids
    comp_of = np.arange(n_nodes) // comp_size
    # tree: node i links to a random earlier node of its component
    local = np.arange(n_nodes) % comp_size
    base = (np.arange(n_nodes) - local).astype(np.int64)
    parent = base + (rng.random(n_nodes) * np.maximum(local, 1)).astype(np.int64)
    mask = local > 0
    a = perm[np.arange(n_nodes)[mask]]
    b = perm[parent[mask]]
    extra = n_edges - len(a)
    if extra > 0:
        u = rng.integers(0, n_nodes, extra)
        v = (u - (u % comp_size)) + rng.integers(0, comp_size, extra)
        a = np.concatenate([a, perm[u]])
        b = np.concatenate([b, perm[v]])
    truth = {}
    for c in range(n_comp):
        members = perm[c * comp_size : (c + 1) * comp_size]
        mn = int(members.min())
        for m in members:
            truth[int(m)] = mn
    return a, b, truth


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    from linref_ray.graph import connected_components

    a, b, truth = make_edges(n_edges)
    edges = rd.from_arrow(
        pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})
    ).repartition(64).materialize()
    t0 = time.time()
    comps = connected_components(edges, num_partitions=32)
    out = comps.to_pandas()
    wall = time.time() - t0
    got = dict(zip(out["node"].astype(int), out["label"].astype(int)))
    bad = sum(1 for n_, c in truth.items() if got.get(n_) != c)
    print({
        "n_edges": len(a),
        "n_nodes": len(truth),
        "wall_s": round(wall, 2),
        "wrong_labels": bad,
        "edges_per_sec": round(len(a) / wall),
        "num_cpus": cpus,
    })
    assert bad == 0
    ray.shutdown()


if __name__ == "__main__":
    main()
