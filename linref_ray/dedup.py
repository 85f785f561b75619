"""Deduplication pipelines over document tables (training-data ops).

Exact dedup is a hash-key groupby keep-first; near-dup is the standard
MinHash-LSH cascade: shingle → minhash signature → band buckets →
``groupby(band)`` candidate generation → exact Jaccard verification. Each
stage is a vectorized batch transform; only slim (id, hash) rows shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Min

from linref_ray.kernels.hashing import (
    hamming64,
    lsh_bands,
    minhash_params,
    minhash_signature,
    shingle_hashes,
    simhash,
)


def exact_dedup(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """One row per distinct text: (min id, copy count).

    Scale note: groups by a 64-bit content hash, not the text itself, so the
    shuffle moves (hash, id) rows only; the min-id winner per hash group is
    the kept representative (hash collisions at 64 bits are negligible and
    detectable by a second pass comparing kept texts).
    """
    import pandas as pd

    def add_hash(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            np.asarray(t[text_col].to_pylist(), dtype=object)
        ).astype(np.int64)
        return pa.table({id_col: t[id_col], "__h": pa.array(h)})

    return (
        docs.map_batches(add_hash, batch_format="pyarrow")
        .groupby("__h")
        .aggregate(Min(id_col, alias_name=id_col), Count(alias_name="n_copies"))
        .drop_columns(["__h"])
    )


class _MinhashStage:
    """Actor stage: per-doc shingling + minhash + band keys (params built
    once per actor)."""

    def __init__(self, num_perm: int, bands: int, shingle_k: int):
        self.a, self.b = minhash_params(num_perm)
        self.bands = bands
        self.shingle_k = shingle_k

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        n = len(ids)
        bands = self.bands
        out_id = np.repeat(ids, bands)
        out_band = np.tile(np.arange(bands, dtype=np.int64), n)
        out_key = np.empty(n * bands, dtype=np.uint64)
        sigs = []
        for i, text in enumerate(texts):
            sig = minhash_signature(
                shingle_hashes(text, self.shingle_k), self.a, self.b
            )
            sigs.append(sig)
            out_key[i * bands : (i + 1) * bands] = lsh_bands(sig, bands)
        return pa.table(
            {
                "doc_id": pa.array(out_id),
                "band": pa.array(out_band),
                "band_key": pa.array(out_key.astype(np.int64)),
            }
        )


def minhash_near_duplicates(
    docs: ray.data.Dataset,
    threshold: float = 0.6,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    shingle→minhash→band→bucket groupby→candidate pairs→exact verification.
    Verification recomputes shingle sets for the candidate pair's docs via a
    broadcast lookup of the candidate texts (small side: candidates ≪ docs).
    """
    sig_rows = docs.map_batches(
        _MinhashStage,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, bands=bands, shingle_k=shingle_k
        ),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency,
        num_cpus=1,
    )

    def pairs_in_bucket(t: pa.Table) -> pa.Table:
        ids = np.unique(t["doc_id"].to_numpy(zero_copy_only=False))
        if len(ids) < 2:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                }
            )
        a, b = np.triu_indices(len(ids), k=1)
        return pa.table(
            {"id_a": pa.array(ids[a]), "id_b": pa.array(ids[b])}
        )

    candidates = (
        sig_rows.groupby(["band", "band_key"])
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(Count(alias_name="__nbands"))
        .drop_columns(["__nbands"])
    )

    # Exact verification: candidate set is small → collect the needed texts
    # once and verify pairs vectorized on the driver-broadcast lookup.
    cand_tbl = pa.concat_tables(
        ray.get(candidates.to_arrow_refs()), promote_options="default"
    )
    if len(cand_tbl) == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )
    need = np.unique(
        np.concatenate(
            [
                cand_tbl["id_a"].to_numpy(zero_copy_only=False),
                cand_tbl["id_b"].to_numpy(zero_copy_only=False),
            ]
        )
    )
    need_set = set(need.tolist())

    def pick(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        mask = np.fromiter((i in need_set for i in ids), bool, len(ids))
        return t.filter(pa.array(mask)).select(["doc_id", "text"])

    texts_tbl = pa.concat_tables(
        ray.get(
            docs.map_batches(pick, batch_format="pyarrow").to_arrow_refs()
        ),
        promote_options="default",
    )
    text_of = dict(
        zip(
            texts_tbl["doc_id"].to_pylist(), texts_tbl["text"].to_pylist()
        )
    )
    sh_cache: dict[int, np.ndarray] = {}

    def sh(i: int) -> np.ndarray:
        if i not in sh_cache:
            sh_cache[i] = shingle_hashes(text_of[i], shingle_k)
        return sh_cache[i]

    ia = cand_tbl["id_a"].to_numpy(zero_copy_only=False)
    ib = cand_tbl["id_b"].to_numpy(zero_copy_only=False)
    jac = np.empty(len(ia))
    for row in range(len(ia)):
        sa, sb = sh(int(ia[row])), sh(int(ib[row]))
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        jac[row] = inter / union if union else 0.0
    hit = jac >= threshold
    return ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array(ia[hit]),
                "id_b": pa.array(ib[hit]),
                "jaccard": pa.array(jac[hit]),
            }
        )
    )


def simhash_signatures(
    docs: ray.data.Dataset, ngram: int = 3
) -> ray.data.Dataset:
    """Per-doc 64-bit SimHash (Charikar) as int64 (deterministic)."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        sigs = np.array(
            [np.int64(np.uint64(simhash(x, ngram)).astype(np.int64))
             for x in t["text"].to_pylist()],
            dtype=np.int64,
        )
        return pa.table({"doc_id": ids, "simhash": pa.array(sigs)})

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=512)


def simhash_near_duplicates(
    docs: ray.data.Dataset, max_hamming: int = 6, prefix_bits: int = 12
) -> ray.data.Dataset:
    """SimHash near-dup candidates bucketed by hash prefix, verified by
    Hamming distance (≤ max_hamming). Multiple rotations of the prefix would
    raise recall; one prefix keeps the demo pipeline single-shuffle."""

    sigs = simhash_signatures(docs)

    def add_prefix(t: pa.Table) -> pa.Table:
        s = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "__prefix",
            pa.array((s >> np.uint64(64 - prefix_bits)).astype(np.int64)),
        )

    def verify(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        s = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        if len(ids) < 2:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        a, b = np.triu_indices(len(ids), k=1)
        hd = hamming64(s[a], s[b])
        hit = hd <= max_hamming
        return pa.table(
            {
                "id_a": pa.array(np.minimum(ids[a[hit]], ids[b[hit]])),
                "id_b": pa.array(np.maximum(ids[a[hit]], ids[b[hit]])),
                "hamming": pa.array(hd[hit].astype(np.int64)),
            }
        )

    return (
        sigs.map_batches(add_prefix, batch_format="pyarrow")
        .groupby("__prefix")
        .map_groups(verify, batch_format="pyarrow")
    )


def ngram_jaccard_pairs(
    docs: ray.data.Dataset,
    threshold: float = 0.5,
    shingle_k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
) -> ray.data.Dataset:
    """n-gram Jaccard near-dup = the MinHash cascade with exact verification
    (alias exposing the SURVEY-required op name)."""
    return minhash_near_duplicates(
        docs, threshold=threshold, num_perm=num_perm, bands=bands,
        shingle_k=shingle_k,
    )
