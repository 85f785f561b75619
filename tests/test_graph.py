"""Distributed connected components (graph.py) and the dedup_corpus
distributed method.

SQL parity of the organic dup graph is gated by the `connected_components`
/ `dedup_corpus_dist` oracles in __ray_entry__; these tests pin the
algorithm against a reference union-find on adversarial shapes (long chain
— the pointer-jumping case, cliques, self loops, random graphs) and the
driver/distributed method equivalence.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd

from linref_ray.graph import component_losers, connected_components


def _edges(pairs) -> rd.Dataset:
    return rd.from_arrow(
        pa.table(
            {
                "id_a": pa.array([a for a, _ in pairs], pa.int64()),
                "id_b": pa.array([b for _, b in pairs], pa.int64()),
            }
        )
    )


def _union_find(pairs) -> dict[int, int]:
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for a, b in pairs:
        if a != b:
            nodes |= {a, b}
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
    groups: dict = {}
    for n in nodes:
        groups.setdefault(find(n), []).append(n)
    return {n: min(g) for g in groups.values() for n in g}


def _cc_dict(pairs, **kw) -> dict[int, int]:
    out = connected_components(_edges(pairs), **kw).to_pandas()
    return dict(zip(out["node"], out["label"]))


def test_long_chain_converges_logarithmically(ray_session):
    # a 200-node path exercises pointer jumping (naive min-prop would need
    # 200 rounds; max_rounds=16 forces the log-round behavior)
    pairs = [(i, i + 1) for i in range(200)]
    got = _cc_dict(pairs, max_rounds=16)
    assert got == {i: 0 for i in range(201)}


def test_cliques_self_loops_isolated(ray_session):
    pairs = [(100, 101), (101, 102), (100, 102), (7, 7), (200, 300)]
    got = _cc_dict(pairs)
    assert got == {100: 100, 101: 100, 102: 100, 200: 200, 300: 200}


def test_random_graph_matches_union_find(ray_session):
    rng = np.random.default_rng(3)
    pairs = list(
        zip(
            rng.integers(0, 500, 1200).tolist(),
            rng.integers(0, 500, 1200).tolist(),
        )
    )
    assert _cc_dict(pairs, num_partitions=4) == _union_find(pairs)


def test_empty_edges_typed_empty(ray_session):
    out = connected_components(_edges([]))
    assert out.count() == 0
    assert {f.name for f in out.schema().base_schema} == {"node", "label"}


def test_component_losers(ray_session):
    comps = connected_components(_edges([(5, 3), (3, 9), (20, 21)]))
    losers = sorted(component_losers(comps).to_pandas()["node"])
    assert losers == [5, 9, 21]


def test_dedup_corpus_methods_agree(ray_session):
    from linref_ray.dedup import dedup_corpus, ngram_jaccard_pairs

    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    )
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    a = sorted(
        dedup_corpus(docs, pairs, method="driver").to_pandas()["doc_id"]
    )
    b = sorted(
        dedup_corpus(docs, pairs, method="distributed")
        .to_pandas()["doc_id"]
    )
    assert a == b and len(a) < docs.count()  # organic dups exist
