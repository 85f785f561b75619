"""LSH-bucketed kNN: equality vs brute force on organic data at generous
parameters, and the scale story — high recall with strong prefilter
selectivity — on a corpus with genuine cluster structure.

Reference scope: similarity search is an engine-side addition (no linref
counterpart); semantics anchored to knn_brute_force, which is SQL-oracled.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from linref_ray.similarity import (
    _hyperplane_codes,
    _to_matrix,
    knn_brute_force,
    knn_lsh,
)

SF_DIR = "/root/testdata/sf0.001"


def test_organic_equals_brute_force_at_generous_params(ray_session):
    emb = rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    ex = (
        knn_brute_force(emb, (0, 1, 2), k=5)
        .to_pandas()
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )
    ap = (
        knn_lsh(emb, (0, 1, 2), k=5, n_bits=5, n_tables=24)
        .to_pandas()
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )
    assert ex.equals(ap)


def _clustered_corpus(
    n_fam: int = 20, fam_size: int = 40, dim: int = 32, seed: int = 5
) -> tuple[pa.Table, list[int]]:
    rng = np.random.Generator(np.random.PCG64(seed))
    cents = rng.standard_normal((n_fam, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    vecs = np.repeat(cents, fam_size, axis=0)
    vecs = vecs + 0.02 * rng.standard_normal(vecs.shape)
    ids = np.array(
        [f * 100 + j for f in range(n_fam) for j in range(fam_size)],
        dtype=np.int64,
    )
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs],
                pa.list_(pa.float32()),
            ),
        }
    )
    return tbl, [0, 100, 200]


def test_clustered_recall_one_with_selective_prefilter(ray_session):
    tbl, queries = _clustered_corpus()
    emb = rd.from_arrow(tbl)
    ex = knn_brute_force(emb, tuple(queries), k=5).to_pandas()
    ap = knn_lsh(emb, tuple(queries), k=5).to_pandas()
    ex_set = set(map(tuple, ex[["query_id", "vec_id"]].values))
    ap_set = set(map(tuple, ap[["query_id", "vec_id"]].values))
    assert ex_set == ap_set  # recall 1.0 at the defaults
    # every neighbor of query f*100 is a family co-member
    for q, v in ap_set:
        assert v // 100 == q // 100

    # Prefilter selectivity: with real cluster structure the default
    # (n_bits=10, n_tables=8) buckets pass only ~family members + a few
    # percent of distractors — the property that makes LSH the scale path.
    m = _to_matrix(tbl["embedding"])
    rng = np.random.Generator(np.random.PCG64(11))  # knn_lsh default seed
    planes = rng.standard_normal((8, 10, m.shape[1]))
    codes = _hyperplane_codes(m, planes)
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False)
    qsel = np.isin(ids, queries)
    match = np.zeros(len(m), dtype=bool)
    for t in range(len(codes)):
        match |= np.isin(codes[t], codes[t][qsel])
    assert match.mean() < 0.25


def test_missing_query_ids_degrade_to_brute_force(ray_session):
    emb = rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    out = knn_lsh(emb, (10**9,), k=5).to_pandas()
    # (column names are unavailable here: an all-empty Ray 2.49 dataset
    # drops its schema on to_pandas — known upstream behavior)
    assert len(out) == 0
