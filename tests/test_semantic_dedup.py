"""SemDeDup-style semantic dedup (k-means cluster prefilter → exact
in-cluster cosine verify → canonical keep).

Semantics anchored to embedding_near_duplicates(lsh_planes=0), which is
SQL-oracled (`embedding_neardup_exact`): with n_clusters=1 the semantic
cascade must reproduce the exact all-pairs result bitwise; with k>1 it is a
recall-bounded subset with precision 1.0 (every emitted pair is exact-cosine
verified). Engine-side addition — no linref counterpart; pattern from
Abbas et al. 2023 (SemDeDup), public.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd

from linref_ray.similarity import (
    embedding_near_duplicates,
    semantic_dedup,
    semantic_near_duplicates,
)

SF_DIR = "/root/testdata/sf0.001"


def _pairs(df):
    return set(zip(df["id_a"], df["id_b"]))


def _planted_families(
    n_fam: int = 12, fam_size: int = 5, dim: int = 16, seed: int = 9
) -> pa.Table:
    """Tight vector families (near-dup within, near-orthogonal across):
    family f member j gets id f*100+j, plus 40 unique isotropic fillers."""
    rng = np.random.Generator(np.random.PCG64(seed))
    cents = rng.standard_normal((n_fam, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    vecs = np.repeat(cents, fam_size, axis=0)
    vecs = vecs + 0.01 * rng.standard_normal(vecs.shape)
    ids = [f * 100 + j for f in range(n_fam) for j in range(fam_size)]
    fill = rng.standard_normal((40, dim))
    vecs = np.vstack([vecs, fill])
    ids += [10_000 + i for i in range(40)]
    return pa.table(
        {
            "vec_id": pa.array(np.asarray(ids, np.int64)),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )


def test_single_cluster_matches_exact_all_pairs(ray_session):
    emb = rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    exact = (
        embedding_near_duplicates(
            emb, threshold=0.4, lsh_planes=0, num_partitions=4,
            max_bucket=1_000_000,
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    sem = (
        semantic_near_duplicates(
            emb, threshold=0.4, n_clusters=1, num_partitions=4,
            max_cluster=1_000_000,
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert sem.equals(exact)
    assert len(exact) > 0  # the parity claim is non-vacuous


def test_clustered_pairs_are_verified_subset(ray_session):
    emb = rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    exact = embedding_near_duplicates(
        emb, threshold=0.4, lsh_planes=0, num_partitions=4,
        max_bucket=1_000_000,
    ).to_pandas()
    sem = semantic_near_duplicates(
        emb, threshold=0.4, n_clusters=8, num_partitions=4
    ).to_pandas()
    assert _pairs(sem) <= _pairs(exact)  # precision 1.0
    # cosine values are the same deterministic dot products
    ex = {(a, b): c for a, b, c in zip(exact.id_a, exact.id_b, exact.cosine)}
    for a, b, c in zip(sem.id_a, sem.id_b, sem.cosine):
        assert abs(ex[(a, b)] - c) < 1e-12
    # deterministic (seeded quantizer): second run is identical
    again = semantic_near_duplicates(
        emb, threshold=0.4, n_clusters=8, num_partitions=4
    ).to_pandas()
    assert _pairs(again) == _pairs(sem)


def test_planted_families_full_recall_and_canonical_keep(ray_session):
    tbl = _planted_families()
    emb = rd.from_arrow(tbl)
    pairs = semantic_near_duplicates(
        emb, threshold=0.9, n_clusters=12, num_partitions=4, seed=7,
        sample=4096,
    ).to_pandas()
    # well-separated tight families: within-family pairs never straddle a
    # k-means cell, so recall is 1.0 = every within-family pair appears
    want = {
        (f * 100 + i, f * 100 + j)
        for f in range(12)
        for i in range(5)
        for j in range(i + 1, 5)
    }
    assert _pairs(pairs) == want
    surv = semantic_dedup(
        emb, threshold=0.9, n_clusters=12, num_partitions=4, seed=7
    ).to_pandas()
    # canonical = min id per family (f*100), plus all 40 unique fillers
    assert sorted(surv.vec_id) == sorted(
        [f * 100 for f in range(12)] + [10_000 + i for i in range(40)]
    )


def test_hot_cluster_chain_degradation_keeps_components(ray_session):
    # One giant identical-vector family: max_cluster forces chain pairs,
    # which still connect the whole clique transitively, so the dedup
    # survivors are unchanged.
    rng = np.random.Generator(np.random.PCG64(3))
    base = rng.standard_normal(8)
    vecs = np.tile(base, (50, 1)) + 1e-4 * rng.standard_normal((50, 8))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(50, dtype=np.int64)),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    surv = semantic_dedup(
        rd.from_arrow(tbl), threshold=0.99, n_clusters=1, num_partitions=2,
        max_cluster=8,
    ).to_pandas()
    assert sorted(surv.vec_id) == [0]


def test_empty_result_keeps_schema(ray_session):
    # Ray 2.49's to_pandas drops columns for fully-empty datasets, so the
    # engine contract is on Dataset.schema(): the typed anchor keeps it
    # intact for downstream operators (joins/groupbys on a schema-less
    # dataset fail outright).
    emb = rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    out = semantic_near_duplicates(
        emb, threshold=1.01, n_clusters=4, num_partitions=4
    )
    assert out.schema().names == ["id_a", "id_b", "cosine"]
    assert out.count() == 0
    # same anchor guard on the LSH cascade (both single- and multi-set)
    for sets in (1, 2):
        out = embedding_near_duplicates(
            emb, threshold=1.01, lsh_planes=4, lsh_sets=sets,
            num_partitions=4,
        )
        assert sorted(out.schema().names) == ["cosine", "id_a", "id_b"]
        assert out.count() == 0
