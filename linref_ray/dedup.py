"""Deduplication pipelines over document tables (training-data ops).

Exact dedup is a hash-key groupby keep-first; near-dup is the standard
MinHash-LSH cascade: shingle → minhash signature → band buckets →
``groupby(band)`` candidate generation → exact Jaccard verification. Each
stage is a vectorized batch transform; only slim (id, hash) rows shuffle.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Min

_LOG = logging.getLogger(__name__)

from linref_ray.kernels.hashing import (
    hamming64,
    lsh_bands_many,
    minhash_params,
    minhash_signature_many,
    shingle_hashes_many,
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
    """Actor stage: batch shingling + minhash + band keys (+ the bucket
    partition id, fused here so no extra operator touches the 16×-row
    band table). Params built once per actor."""

    def __init__(
        self, num_perm: int, bands: int, shingle_k: int,
        num_partitions: int = 0,
        id_col: str = "doc_id", text_col: str = "text",
    ):
        self.a, self.b = minhash_params(num_perm)
        self.bands = bands
        self.shingle_k = shingle_k
        self.num_partitions = num_partitions
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        texts = t[self.text_col].to_pylist()
        n = len(ids)
        bands = self.bands
        all_h, lens = shingle_hashes_many(texts, self.shingle_k)
        sigs = minhash_signature_many(all_h, lens, self.a, self.b)
        keys = lsh_bands_many(sigs, bands)
        out = pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, bands)),
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int64), n)),
                "band_key": pa.array(keys.reshape(-1).astype(np.int64)),
            }
        )
        if self.num_partitions:
            band = np.tile(
                np.arange(bands, dtype=np.uint64), n
            )
            with np.errstate(over="ignore"):
                mixed = (
                    keys.reshape(-1) * np.uint64(0x9E3779B97F4A7C15)
                ) ^ (band << np.uint64(32))
            pid = (mixed % np.uint64(self.num_partitions)).astype(np.int64)
            out = out.append_column("__bpid", pa.array(pid))
        return out


def _chain_or_all_pairs(
    ids: np.ndarray, max_bucket: int, what: str
) -> tuple[np.ndarray, np.ndarray]:
    """All-pairs indices for a bucket, degrading to a sorted chain when the
    bucket exceeds ``max_bucket`` unique members.

    A hot bucket (boilerplate text, all-zero vectors) would otherwise emit
    O(n²) pairs in one task. The chain (id[0]-id[1], id[1]-id[2], …) keeps
    every member linked — duplicate CLUSTERS remain discoverable via
    connected components over verified pairs — at O(n) pairs. Never silent:
    the degradation is logged with the forgone pair count.
    """
    n = len(ids)
    if n > max_bucket:
        _LOG.warning(
            "%s bucket with %d members exceeds cap %d: emitting %d chain "
            "pairs instead of %d all-pairs (cluster connectivity preserved)",
            what, n, max_bucket, n - 1, n * (n - 1) // 2,
        )
        a = np.arange(n - 1)
        return a, a + 1
    return np.triu_indices(n, k=1)


def _allpairs_runs(
    run_starts: np.ndarray, run_sizes: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Global indices of ALL within-run pairs (i<j) for MANY runs at once —
    the vectorized replacement for a per-run ``np.triu_indices`` loop
    (200k+ tiny runs per kernel made the Python loop the stage wall).

    Pair k of an n-run maps to (i, j) by triangular-number inversion:
    ``i = n-2 - floor((sqrt(8*(C-k-1)+1) - 1)/2)`` with ``C = n(n-1)/2``,
    then ``j = k - S(i) + i + 1`` where ``S(i) = i(n-1) - i(i-1)/2`` counts
    pairs with first index < i. Exact in float64 for C < 2^52 (run sizes
    are capped far below); an integer correction step guards the sqrt edge.
    """
    c_r = run_sizes * (run_sizes - 1) // 2
    K = int(c_r.sum())
    if K == 0:
        z = np.empty(0, np.int64)
        return z, z
    run_id = np.repeat(np.arange(len(run_sizes)), c_r)
    cum = np.concatenate(([0], np.cumsum(c_r)[:-1]))
    k = np.arange(K, dtype=np.int64) - cum[run_id]
    n = run_sizes[run_id]
    c = c_r[run_id]
    v = 8.0 * (c - k - 1) + 1.0
    i = n - 2 - ((np.sqrt(v) - 1.0) / 2.0).astype(np.int64)
    # correction: S(i) <= k < S(i+1)
    def _s(ii):
        return ii * (n - 1) - ii * (ii - 1) // 2
    i = np.clip(i, 0, n - 2)
    too_hi = _s(i) > k
    i[too_hi] -= 1
    too_lo = _s(i + 1) <= k
    i[too_lo] += 1
    j = k - _s(i) + i + 1
    base = run_starts[run_id]
    return base + i, base + j


def pair_jaccard(
    ia: np.ndarray,
    ib: np.ndarray,
    ta: list[str],
    tb: list[str],
    shingle_k: int,
) -> np.ndarray:
    """Exact shingle-Jaccard for a batch of candidate pairs — no per-doc
    or per-pair Python.

    Each UNIQUE doc is shingled once in one vectorized pass, then pair
    intersections are counted with a row-wise merge: concatenate the two
    docs' padded sorted-hash rows, sort each row, count adjacent
    duplicates (shingles are unique per doc, so a value seen twice in a
    row is exactly one shared shingle; sentinel-pad duplicates are
    subtracted in closed form). Batches whose padded pair matrix would
    exceed the kernel cell cap (one outlier-long doc) use an
    O(total-expansion) packed-key searchsorted membership instead.
    """
    from linref_ray.kernels import hashing as _hashing

    npairs = len(ia)
    all_ids = np.concatenate([ia, ib])
    uniq, inv = np.unique(all_ids, return_inverse=True)
    texts: list = [None] * len(uniq)
    for r in range(npairs):
        texts[inv[r]] = ta[r]
        texts[inv[npairs + r]] = tb[r]
    all_h, lens, mat = _hashing.shingle_hashes_many(
        texts, shingle_k, return_matrix=True
    )
    da, db = inv[:npairs], inv[npairs:]
    if (
        mat is not None
        and npairs * 2 * mat.shape[1] <= _hashing._MATRIX_CELL_CAP
    ):
        width = mat.shape[1]
        merged = np.concatenate([mat[da], mat[db]], axis=1)
        merged.sort(axis=1)
        dup = (merged[:, 1:] == merged[:, :-1]).sum(axis=1)
        n_sent = 2 * width - lens[da] - lens[db]
        inter = dup - np.maximum(n_sent - 1, 0)
    else:
        # Both expansions are globally sorted (pair-major; per-doc hashes
        # ascend and dense codes preserve hash order), so one searchsorted
        # probe counts the shared shingles.
        starts = np.concatenate(([0], np.cumsum(lens[:-1])))
        _, codes = np.unique(all_h, return_inverse=True)
        ncodes = (int(codes.max()) + 1) if len(codes) else 1

        def gather(docs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            ln = lens[docs]
            total = int(ln.sum())
            if total == 0:
                return np.empty(0, np.int64), np.empty(0, np.int64)
            pair_idx = np.repeat(np.arange(len(docs)), ln)
            seg_off = np.concatenate(([0], np.cumsum(ln)[:-1]))
            within = np.arange(total) - seg_off[pair_idx]
            rows = starts[docs][pair_idx] + within
            return pair_idx * ncodes + codes[rows], pair_idx

        ka, pia = gather(da)
        kb, _ = gather(db)
        if len(ka) and len(kb):
            pos = np.minimum(np.searchsorted(kb, ka), len(kb) - 1)
            inter = np.bincount(pia[kb[pos] == ka], minlength=npairs)
        else:
            inter = np.zeros(npairs, dtype=np.int64)
    union = lens[da] + lens[db] - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 0.0)


def _verified_pairs(
    docs: ray.data.Dataset,
    candidates: ray.data.Dataset,
    *,
    threshold: float,
    shingle_k: int,
    num_partitions: int,
    text_col: str,
    id_col: str,
    text_broadcast_budget: int = 1 << 30,
) -> ray.data.Dataset:
    """Shared tail of every near-dup cascade: dedup raw (id_a, id_b)
    candidates, attach both texts, and verify exact shingle-Jaccard per
    batch. Two regimes, same results:

    - corpus fits ``text_broadcast_budget``: texts ship ONCE via
      ``ray.put`` and candidates verify with a per-batch searchsorted
      lookup — one exchange total (the pair distinct) and text never
      enters a shuffle.
    - larger corpus: partitioned hash joins attach both texts — fully
      distributed, nothing on the driver (the 100-TB regime).
    """
    from linref_ray.joins import hash_join

    # Anchor the schema: with zero candidates the lazy dataset has no
    # inferable schema and the join below could not type its columns.
    candidates = ray.data.from_arrow(
        pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
        )
    ).union(candidates)

    docs_bytes = docs.size_bytes() or 0
    if 0 < docs_bytes <= text_broadcast_budget:
        return _verified_pairs_broadcast(
            docs, candidates, threshold=threshold, shingle_k=shingle_k,
            num_partitions=num_partitions, text_col=text_col, id_col=id_col,
        )

    # Distributed exact verification: dedup candidate pairs inside the
    # first join's shuffle (``distinct_left`` — same pair always lands in
    # the same id_a partition, so no standalone groupby shuffle), attach
    # both texts with partitioned hash joins, then verify per batch.
    # (Rename via an Arrow map_batches — Dataset.rename_columns chokes on
    # pandas blocks in Ray 2.49.)
    def _renamed(side: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {f"id_{side}": t[id_col], f"__text_{side}": t[text_col]}
            )

        return docs.map_batches(fn, batch_format="pyarrow")

    with_a = hash_join(
        candidates, _renamed("a"), on="id_a", how="inner",
        num_partitions=num_partitions, distinct_left=True,
    )
    with_ab = hash_join(
        with_a, _renamed("b"), on="id_b", how="inner",
        num_partitions=num_partitions,
    )

    def verify(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
        if len(t) == 0:
            return empty
        ia = t["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        ib = t["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        ta = t["__text_a"].to_pylist()
        tb = t["__text_b"].to_pylist()
        jac = pair_jaccard(ia, ib, ta, tb, shingle_k)
        hit = jac >= threshold
        return pa.table(
            {
                "id_a": pa.array(ia[hit]),
                "id_b": pa.array(ib[hit]),
                "jaccard": pa.array(jac[hit]),
            }
        )

    verified = with_ab.map_batches(
        verify, batch_format="pyarrow", batch_size=4096
    )
    # Anchor the output schema too: a run with zero verified pairs must
    # still yield a typed (id_a, id_b, jaccard) dataset downstream.
    return ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    ).union(verified)


def _verified_pairs_broadcast(
    docs: ray.data.Dataset,
    candidates: ray.data.Dataset,
    *,
    threshold: float,
    shingle_k: int,
    num_partitions: int,
    text_col: str,
    id_col: str,
) -> ray.data.Dataset:
    """Broadcast-corpus verify: pair distinct (one exchange), then each
    batch resolves both texts from the object-store copy and verifies."""
    import ray as _ray

    from linref_ray.partition import grouped_distinct

    tbl = pa.concat_tables(
        _ray.get(docs.select_columns([id_col, text_col]).to_arrow_refs()),
        promote_options="default",
    )
    ids = pc.cast(tbl[id_col], pa.int64()).to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    texts = tbl[text_col].combine_chunks().take(pa.array(order))
    texts_ref = _ray.put((ids[order], texts))

    cand = grouped_distinct(
        candidates, ("id_a", "id_b"), num_partitions=num_partitions
    )

    def verify(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
        if len(t) == 0 or "id_a" not in t.column_names:
            return empty
        ids_s, texts_s = _ray.get(texts_ref)
        ia = pc.cast(t["id_a"], pa.int64()).to_numpy(zero_copy_only=False)
        ib = pc.cast(t["id_b"], pa.int64()).to_numpy(zero_copy_only=False)
        pa_pos = np.clip(np.searchsorted(ids_s, ia), 0, len(ids_s) - 1)
        pb_pos = np.clip(np.searchsorted(ids_s, ib), 0, len(ids_s) - 1)
        hit = (ids_s[pa_pos] == ia) & (ids_s[pb_pos] == ib)
        if not hit.all():
            ia, ib = ia[hit], ib[hit]
            pa_pos, pb_pos = pa_pos[hit], pb_pos[hit]
        if not len(ia):
            return empty
        ta = texts_s.take(pa.array(pa_pos)).to_pylist()
        tb = texts_s.take(pa.array(pb_pos)).to_pylist()
        jac = pair_jaccard(ia, ib, ta, tb, shingle_k)
        keep = jac >= threshold
        return pa.table(
            {
                "id_a": pa.array(ia[keep]),
                "id_b": pa.array(ib[keep]),
                "jaccard": pa.array(jac[keep]),
            }
        )

    verified = cand.map_batches(
        verify, batch_format="pyarrow", batch_size=4096
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    ).union(verified)


def minhash_near_duplicates(
    docs: ray.data.Dataset,
    threshold: float = 0.6,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    concurrency: int = 4,
    max_bucket: int = 1024,
    num_partitions: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    text_broadcast_budget: int = 1 << 30,
) -> ray.data.Dataset:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    shingle→minhash→band→bucket groupby→candidate pairs→exact verification.

    Scale shape: every stage is distributed — candidates are deduped with a
    groupby, texts are attached to both pair sides via two partitioned hash
    joins (slim (id, text) projections; the join's own shuffle prunes
    non-candidate texts after partitioning), and exact Jaccard runs per
    batch on the joined rows with a per-batch shingle cache. Nothing is ever
    collected to the driver, so a dup-heavy corpus with O(corpus) candidate
    pairs streams through the object store instead of OOMing one process.
    Hot LSH buckets degrade to chain pairs at ``max_bucket`` (logged — see
    :func:`_chain_or_all_pairs`).
    """
    sig_rows = docs.map_batches(
        _MinhashStage,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, bands=bands, shingle_k=shingle_k,
            num_partitions=num_partitions,
            id_col=id_col, text_col=text_col,
        ),
        batch_format="pyarrow",
        batch_size=1024,
        # autoscaling (1, N): a fixed pool of size == cluster CPUs parks
        # every core in idle actors and starves the read/shuffle stages —
        # observed deadlock at ray.init(num_cpus=4)
        concurrency=(1, concurrency),
        num_cpus=1,
    )

    # Candidate generation: ONE kernel call per partition handling ALL of
    # its buckets via a lexsort + run sweep. (A groupby on the raw
    # (band, band_key) dispatched the UDF once per bucket — tens of
    # thousands of per-group Arrow slices dominated the stage wall.)
    def bucket_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
            }
        )
        if len(t) == 0:
            return empty
        band = t["band"].to_numpy(zero_copy_only=False)
        key = t["band_key"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort([ids, key, band])
        band_s, key_s, ids_s = band[order], key[order], ids[order]
        brk = np.flatnonzero(
            (band_s[1:] != band_s[:-1]) | (key_s[1:] != key_s[:-1])
        )
        starts = np.concatenate(([0], brk + 1))
        ends = np.concatenate((brk + 1, [len(ids_s)]))
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for a, z in zip(starts, ends):
            seg = ids_s[a:z]
            uniq = seg[np.concatenate(([True], seg[1:] != seg[:-1]))]
            if len(uniq) < 2:
                continue
            ai, bi = _chain_or_all_pairs(uniq, max_bucket, "minhash-LSH")
            out_a.append(uniq[ai])
            out_b.append(uniq[bi])
        if not out_a:
            return empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a)),
                "id_b": pa.array(np.concatenate(out_b)),
            }
        )

    # No repartition before the groupby: the signature stage already emits
    # a handful of coarse blocks (the per-block sort-shuffle fixed cost
    # only bites with MANY tiny blocks).
    candidates = sig_rows.groupby("__bpid").map_groups(
        bucket_pairs, batch_format="pyarrow"
    )
    return _verified_pairs(
        docs,
        candidates,
        threshold=threshold, shingle_k=shingle_k,
        num_partitions=num_partitions, text_col=text_col, id_col=id_col,
        text_broadcast_budget=text_broadcast_budget,
    )


def simhash_signatures(
    docs: ray.data.Dataset, ngram: int = 3
) -> ray.data.Dataset:
    """Per-doc 64-bit SimHash (Charikar) as int64 (deterministic)."""

    from linref_ray.kernels.hashing import simhash_many

    def fn(t: pa.Table) -> pa.Table:
        sigs = simhash_many(t["text"].to_pylist(), ngram)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "simhash": pa.array(sigs.astype(np.int64)),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=512)


def hash_near_duplicates(
    sigs: ray.data.Dataset,
    max_hamming: int = 6,
    prefix_bits: int = 12,
    max_bucket: int = 4096,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
) -> ray.data.Dataset:
    """Near-dup pairs over any precomputed 64-bit signature column
    (``(id_col, hash_col)`` rows): bucket by hash prefix, verify by Hamming
    distance (≤ max_hamming). Shared by text SimHash and image aHash/pHash
    dedup — the modality only decides how the signature is computed.
    Multiple rotations of the prefix would raise recall; one prefix keeps
    the pipeline single-shuffle.

    Hot prefix buckets degrade to chain pairs at ``max_bucket`` (logged);
    within the cap, all-pairs Hamming runs in 1024-row tiles so per-task
    scratch stays O(tile²) instead of O(bucket²)."""

    def add_prefix(t: pa.Table) -> pa.Table:
        s = t[hash_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "__prefix",
            pa.array((s >> np.uint64(64 - prefix_bits)).astype(np.int64)),
        )

    def verify(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        s = t[hash_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        idt = t.schema.field(id_col).type
        empty = pa.table(
            {
                "id_a": pa.array([], idt),
                "id_b": pa.array([], idt),
                "hamming": pa.array([], pa.int64()),
            }
        )
        n = len(ids)
        if n < 2:
            return empty
        out_a, out_b, out_h = [], [], []
        if n > max_bucket:
            a, b = _chain_or_all_pairs(ids, max_bucket, f"{hash_col}-prefix")
            hd = hamming64(s[a], s[b])
            hit = hd <= max_hamming
            out_a.append(ids[a[hit]])
            out_b.append(ids[b[hit]])
            out_h.append(hd[hit])
        else:
            tile = 1024
            for i0 in range(0, n, tile):
                i1 = min(i0 + tile, n)
                for j0 in range(i0, n, tile):
                    j1 = min(j0 + tile, n)
                    ai, bj = np.meshgrid(
                        np.arange(i0, i1), np.arange(j0, j1), indexing="ij"
                    )
                    ai, bj = ai.ravel(), bj.ravel()
                    keep = ai < bj
                    ai, bj = ai[keep], bj[keep]
                    if not len(ai):
                        continue
                    hd = hamming64(s[ai], s[bj])
                    hit = hd <= max_hamming
                    out_a.append(ids[ai[hit]])
                    out_b.append(ids[bj[hit]])
                    out_h.append(hd[hit])
        if not out_a:
            return empty
        ia = np.concatenate(out_a)
        ib = np.concatenate(out_b)
        return pa.table(
            {
                "id_a": pa.array(np.minimum(ia, ib)),
                "id_b": pa.array(np.maximum(ia, ib)),
                "hamming": pa.array(
                    np.concatenate(out_h).astype(np.int64)
                ),
            }
        )

    return (
        sigs.map_batches(add_prefix, batch_format="pyarrow")
        .groupby("__prefix")
        .map_groups(verify, batch_format="pyarrow")
    )


def simhash_near_duplicates(
    docs: ray.data.Dataset,
    max_hamming: int = 6,
    prefix_bits: int = 12,
    max_bucket: int = 4096,
) -> ray.data.Dataset:
    """Text SimHash near-dup: signatures + the shared prefix-bucketed
    Hamming verify (:func:`hash_near_duplicates`)."""
    return hash_near_duplicates(
        simhash_signatures(docs),
        max_hamming=max_hamming,
        prefix_bits=prefix_bits,
        max_bucket=max_bucket,
    )


class _PrefixPostingsStage:
    """Actor stage for the exact Jaccard join: per doc, emit prefix-filtered
    shingle postings ``(token, doc_id, size, __pid)``.

    Prefix filtering (AllPairs / PPJoin principle): order shingle hashes
    ascending (a global total order); a doc with ``s`` distinct shingles
    emits only its first ``s - ceil(t*s) + 1`` tokens. Any pair with
    Jaccard >= t shares at least ``ceil(t/(1+t)*(sa+sb)) >= ceil(t*sa)``
    shingles, so its prefixes must intersect — candidate generation over
    prefix postings is COMPLETE, and the exact verify pass removes false
    positives. No signatures, no probabilistic recall."""

    def __init__(
        self, threshold: float, shingle_k: int, num_partitions: int,
        id_col: str = "doc_id", text_col: str = "text",
    ):
        self.threshold = threshold
        self.shingle_k = shingle_k
        self.num_partitions = num_partitions
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t[self.text_col].to_pylist()
        all_h, lens = shingle_hashes_many(texts, self.shingle_k)
        # ceil(t*s) without float-edge surprises: ceil(a/b) on scaled ints.
        t_num = int(round(self.threshold * 10**9))
        need = -(-(lens * t_num) // 10**9)
        p = np.clip(lens - need + 1, 1, lens)
        total = int(p.sum())
        doc_idx = np.repeat(np.arange(len(ids)), p)
        seg_off = np.concatenate(([0], np.cumsum(p)[:-1]))
        starts = np.concatenate(([0], np.cumsum(lens[:-1])))
        within = np.arange(total) - seg_off[doc_idx]
        rows = starts[doc_idx] + within
        tok = all_h[rows]
        pid = (tok % np.uint64(self.num_partitions)).astype(np.int64)
        return pa.table(
            {
                "token": pa.array(tok.astype(np.int64)),
                "doc_id": pa.array(ids[doc_idx]),
                "size": pa.array(lens[doc_idx]),
                # position of the token in the doc's full sorted shingle
                # array (= prefix index) — drives the positional filter
                "pos": pa.array(within),
                "__pid": pa.array(pid),
            }
        )


def _token_pairs_kernel(
    t: pa.Table, threshold: float, max_bucket: int
) -> pa.Table:
    """Candidate sweep for the exact Jaccard join: ONE kernel per postings
    partition handling all its equal-token runs (lexsort + run sweep), with
    the size-ratio length filter and the PPJoin positional filter applied
    per occurrence. Module-level so completeness is property-testable
    without a Ray session."""
    empty = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
        }
    )
    if len(t) == 0:
        return empty
    tok = t["token"].to_numpy(zero_copy_only=False)
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    size = t["size"].to_numpy(zero_copy_only=False).astype(np.int64)
    pos = t["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort([ids, tok])
    tok_s, ids_s = tok[order], ids[order]
    size_s, pos_s = size[order], pos[order]
    brk = np.flatnonzero(tok_s[1:] != tok_s[:-1])
    starts = np.concatenate(([0], brk + 1))
    ends = np.concatenate((brk + 1, [len(ids_s)]))
    # alpha(sa+sb) = ceil(t/(1+t) * (sa+sb)) on scaled ints
    t_num = int(round(threshold * 10**9))
    t_den = 10**9 + t_num
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    for a, z in zip(starts, ends):
        # shingles are unique per doc → one posting per (token, doc)
        uniq = ids_s[a:z]
        if len(uniq) < 2:
            continue
        usize, upos = size_s[a:z], pos_s[a:z]
        ai, bi = _chain_or_all_pairs(uniq, max_bucket, "ngram-prefix")
        sa, sb = usize[ai], usize[bi]
        # Length filter: J >= t forces the smaller shingle set to be
        # at least t times the larger (strictly conservative).
        ok = np.minimum(sa, sb) >= threshold * np.maximum(sa, sb) - 1e-9
        # Positional filter (PPJoin): at the smallest common token the
        # achievable overlap is 1 + min(remaining suffixes); a
        # qualifying pair's smallest common token is in both prefixes,
        # so pruning occurrences below the required overlap
        # ceil(t/(1+t)*(sa+sb)) is complete (pairs surviving via ANY
        # occurrence are kept; dedup happens in the verify join).
        ub = 1 + np.minimum(sa - upos[ai] - 1, sb - upos[bi] - 1)
        alpha = -(-(t_num * (sa + sb)) // t_den)
        ok &= ub >= alpha
        out_a.append(uniq[ai[ok]])
        out_b.append(uniq[bi[ok]])
    if not out_a:
        return empty
    return pa.table(
        {
            "id_a": pa.array(np.concatenate(out_a)),
            "id_b": pa.array(np.concatenate(out_b)),
        }
    )


def ngram_jaccard_pairs(
    docs: ray.data.Dataset,
    threshold: float = 0.5,
    shingle_k: int = 3,
    concurrency: int = 4,
    max_bucket: int = 8192,
    num_partitions: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    text_broadcast_budget: int = 1 << 30,
) -> ray.data.Dataset:
    """EXACT n-gram (word k-shingle) Jaccard similarity self-join:
    all pairs (id_a < id_b) with shingle-set Jaccard >= ``threshold``.

    Unlike :func:`minhash_near_duplicates` this is deterministic and
    complete — no signature recall loss. Scale shape: prefix filtering
    (see :class:`_PrefixPostingsStage`) bounds the inverted index to the
    rarest ``(1-t)`` fraction of each doc's shingles under the hash
    order; postings shuffle once on a coarse token partition; candidate
    pairs within equal-token runs are swept in ONE kernel per partition
    with a size ratio filter (J >= t requires min(sa,sb) >= t*max(sa,sb));
    the shared distributed verify tail attaches texts and computes exact
    Jaccard. A pathological hot token (identical boilerplate in thousands
    of docs) degrades to chain pairs at ``max_bucket`` — completeness of
    *clusters* is preserved via connectivity, per-pair completeness above
    the cap is logged (`_chain_or_all_pairs`)."""

    postings = docs.map_batches(
        _PrefixPostingsStage,
        fn_constructor_kwargs=dict(
            threshold=threshold, shingle_k=shingle_k,
            num_partitions=num_partitions,
            id_col=id_col, text_col=text_col,
        ),
        batch_format="pyarrow",
        batch_size=1024,
        # autoscaling, same deadlock note as minhash_near_duplicates
        concurrency=(1, concurrency),
        num_cpus=1,
    )

    def token_pairs(t: pa.Table) -> pa.Table:
        return _token_pairs_kernel(t, threshold, max_bucket)

    candidates = postings.groupby("__pid").map_groups(
        token_pairs, batch_format="pyarrow"
    )
    return _verified_pairs(
        docs,
        candidates,
        threshold=threshold, shingle_k=shingle_k,
        num_partitions=num_partitions, text_col=text_col, id_col=id_col,
        text_broadcast_budget=text_broadcast_budget,
    )


def shared_span_pairs(
    docs: ray.data.Dataset,
    window: int = 16,
    keep_mod: int = 8,
    min_shared: int = 1,
    max_bucket: int = 1024,
    num_partitions: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Shared exact-substring pairs — the duplicated-span detection of Lee
    et al. 2022's ExactSubstr (public method): ``(id_a, id_b, n_shared)``
    for doc pairs sharing ≥ ``min_shared`` DISTINCT ``window``-byte
    substrings. Docs shorter than ``window`` bytes emit nothing.

    ``keep_mod`` samples the Rabin-Karp window hashes content-defined
    (kept iff hash % keep_mod == 0, so both docs keep the same windows of a
    shared span): a shared span of length L survives with probability
    1-(1-1/keep_mod)^(L-window+1) — ~1 for spans a few×keep_mod longer
    than the window. The scale path trades index size for short-span
    recall; ``keep_mod=1`` keeps EVERY window, making the pair set
    exhaustive and exact — the mode the SQL oracle checks.

    One data shuffle end-to-end: per-doc distinct kept hashes → (fp, id)
    postings carrying a coarse ``__pid = fp % P`` → ``groupby(__pid)`` →
    ONE kernel per partition sweeps all its fp-buckets via lexsort + run
    boundaries (never one dispatch per bucket), emitting pairs with hot
    buckets chain-degraded at ``max_bucket`` (logged) and pair counts
    partial-aggregated INSIDE the kernel (≤ P rows per distinct pair cross
    the final ``groupby(pair).sum`` — not one row per shared window); the
    sum is the distinct-window overlap per pair. Hash collisions across
    different windows inflate a count with
    probability ~pairs/2⁶⁴ — the accepted-negligible bound used throughout.
    """
    from linref_ray.kernels.hashing import rolling_fingerprints_many

    def postings(t: pa.Table) -> pa.Table:
        # byte-length filter BEFORE fingerprinting: the scalar fingerprint
        # spec zero-pads short docs, which this pair op must not see
        blen = pc.binary_length(t[text_col]).to_numpy(zero_copy_only=False)
        keep = blen >= window
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        texts = [
            s for s, k in zip(t[text_col].to_pylist(), keep) if k
        ]
        flat, lens = rolling_fingerprints_many(
            texts, window=window, keep_mod=keep_mod
        )
        fp = flat.astype(np.uint64)
        return pa.table(
            {
                "fp": pa.array(flat),
                "doc": pa.array(np.repeat(ids, lens)),
                "__spid": pa.array(
                    (fp % np.uint64(num_partitions)).astype(np.int64)
                ),
            }
        )

    def bucket_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "n_partial": pa.array([], pa.int64()),
            }
        )
        if len(t) == 0:
            return empty
        fp = t["fp"].to_numpy(zero_copy_only=False)
        ids = t["doc"].to_numpy(zero_copy_only=False)
        order = np.lexsort([ids, fp])
        fp_s, ids_s = fp[order], ids[order]
        brk = np.flatnonzero(fp_s[1:] != fp_s[:-1])
        starts = np.concatenate(([0], brk + 1))
        ends = np.concatenate((brk + 1, [len(fp_s)]))
        sizes = ends - starts
        # small runs: ONE vectorized all-pairs pass over every run at once
        small = np.flatnonzero((sizes >= 2) & (sizes <= max_bucket))
        ai, bi = _allpairs_runs(starts[small], sizes[small])
        out_a = [ids_s[ai]]
        out_b = [ids_s[bi]]
        # hot runs (rare, logged): chain degradation, per run
        for r in np.flatnonzero(sizes > max_bucket):
            seg = ids_s[starts[r] : ends[r]]
            ca, cb = _chain_or_all_pairs(seg, max_bucket, "shared-span")
            out_a.append(seg[ca])
            out_b.append(seg[cb])
        if not sum(len(x) for x in out_a):
            return empty
        # partial aggregation INSIDE the partition: a pair sharing many
        # windows whose fingerprints land in this partition collapses to
        # ONE (pair, count) row here, so the global shuffle moves at most
        # num_partitions rows per distinct pair instead of one row per
        # shared window (dup-heavy corpora emit orders of magnitude more
        # raw pair rows than distinct pairs)
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        order = np.lexsort([b, a])
        a_s, b_s = a[order], b[order]
        first = np.concatenate(
            ([True], (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1]))
        )
        starts = np.flatnonzero(first)
        cnt = np.diff(np.append(starts, len(a_s)))
        ua, ub = a_s[starts], b_s[starts]
        ppid = (
            (ua.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             ^ ub.astype(np.uint64)) % np.uint64(num_partitions)
        ).astype(np.int64)
        return pa.table(
            {
                "id_a": pa.array(ua),
                "id_b": pa.array(ub),
                "n_partial": pa.array(cnt.astype(np.int64)),
                "__ppid": pa.array(ppid),
            }
        )

    pairs = (
        docs.map_batches(postings, batch_format="pyarrow", batch_size=1024)
        .groupby("__spid")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )

    def pair_sum(t: pa.Table) -> pa.Table:
        # final per-pair sum as ONE kernel per coarse pair-hash partition —
        # Ray's multi-key groupby().sum() Aggregate was the stage wall
        # (~490 s remote on 5M pair rows at sf0.1; this kernel is <1 s)
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "n_shared": pa.array([], pa.int64()),
            }
        )
        if len(t) == 0:
            return empty
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        n = t["n_partial"].to_numpy(zero_copy_only=False)
        order = np.lexsort([b, a])
        a_s, b_s, n_s = a[order], b[order], n[order]
        first = np.concatenate(
            ([True], (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1]))
        )
        starts = np.flatnonzero(first)
        tot = np.add.reduceat(n_s, starts)
        keep = tot >= min_shared
        return pa.table(
            {
                "id_a": pa.array(a_s[starts][keep]),
                "id_b": pa.array(b_s[starts][keep]),
                "n_shared": pa.array(tot[keep].astype(np.int64)),
            }
        )

    anchor = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "n_partial": pa.array([], pa.int64()),
                "__ppid": pa.array([], pa.int64()),
            }
        )
    )
    return (
        anchor.union(pairs)
        .groupby("__ppid")
        .map_groups(pair_sum, batch_format="pyarrow")
    )


def remove_duplicate_spans(
    docs: ray.data.Dataset,
    window: int = 16,
    keep_mod: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """ExactSubstr span REMOVAL (the dedup of Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better" — public method): every
    ``window``-char span that occurs more than once in the corpus keeps only
    its globally-first occurrence (min ``(doc_id, position)``); all other
    occurrences have their char range cut out, overlapping cuts merging
    naturally, and each document's surviving characters are re-joined in
    order. Returns the input rows with ``text_col`` rewritten.

    Chars, not bytes: texts round-trip through UTF-32 so window positions,
    cuts and the SQL oracle's ``substring`` all index the same codepoints —
    no multibyte edge cases. ``keep_mod=1`` (default) fingerprints EVERY
    window: exact, the oracle mode. ``keep_mod>1`` is the scale path:
    content-defined sampling (hash ≡ 0 mod m) keeps index size ~1/m while
    long duplicated spans are still caught by their sampled windows (the
    same trade documented on :func:`shared_span_pairs`).

    Scale shape mirrors :func:`dedup_segments`: winner election shuffles
    ``(fp, packed doc·pos)`` int rows only; per-doc loser positions
    aggregate small; ONE text shuffle (the ``hash_join``); the rebuild is
    a streaming pass that re-decodes only MODIFIED docs. Packing bound:
    ``doc_id < 2^31`` and positions ``< 2^32``.
    """
    import pandas as pd

    from linref_ray.joins import hash_join

    W = int(window)
    if W < 1:
        raise ValueError("window must be >= 1")
    PACK = np.int64(1) << np.int64(32)
    P = np.uint64(num_partitions)
    base = np.uint64(0x100000001B3)
    powers = np.empty(W, dtype=np.uint64)
    powers[0] = 1
    with np.errstate(over="ignore"):
        for i in range(1, W):
            powers[i] = powers[i - 1] * base

    def _codes(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """Per-batch UTF-32 codepoint CSR: (flat uint32 codes, char lens)."""
        lens = np.fromiter(map(len, texts), np.int64, len(texts))
        flat = np.frombuffer(
            "".join(texts).encode("utf-32-le"), dtype=np.uint32
        )
        return flat, lens

    def postings(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "__h": pa.array([], pa.int64()),
                "packed": pa.array([], pa.int64()),
                "__spid": pa.array([], pa.int64()),
            }
        )
        if len(t) == 0:
            return empty
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        if ids.max(initial=0) >= (1 << 31) or ids.min(initial=0) < 0:
            raise ValueError("doc ids must fit in 31 bits for span packing")
        codes, lens = _codes(t[text_col].to_pylist())
        m_per = np.maximum(lens - W + 1, 0)
        total = int(m_per.sum())
        if total == 0:
            return empty
        doc_idx = np.repeat(np.arange(len(ids)), m_per)
        seg_off = np.concatenate(([0], np.cumsum(m_per)[:-1]))
        within = np.arange(total) - seg_off[doc_idx]
        word_off = np.concatenate(([0], np.cumsum(lens)[:-1]))
        pos = word_off[doc_idx] + within
        acc = np.zeros(total, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(W):
                acc += codes[pos + j].astype(np.uint64) * powers[W - 1 - j]
        if keep_mod > 1:
            keep = acc % np.uint64(keep_mod) == 0
            acc, doc_idx, within = acc[keep], doc_idx[keep], within[keep]
        packed = ids[doc_idx] * PACK + within
        return pa.table(
            {
                "__h": pa.array(acc.astype(np.int64)),
                "packed": pa.array(packed),
                "__spid": pa.array((acc % P).astype(np.int64)),
            }
        )

    def losers(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "__idx": pa.array([], pa.int64()),
                "__dpid": pa.array([], pa.int64()),
            }
        )
        if len(t) == 0:
            return empty
        h = t["__h"].to_numpy(zero_copy_only=False)
        packed = t["packed"].to_numpy(zero_copy_only=False)
        order = np.lexsort([packed, h])
        hs, ps = h[order], packed[order]
        lose = ps[np.concatenate(([False], hs[1:] == hs[:-1]))]
        if not len(lose):
            return empty
        d = lose // PACK
        dp = pd.util.hash_array(d) % np.uint64(num_partitions)
        return pa.table(
            {
                id_col: pa.array(d),
                "__idx": pa.array(lose % PACK),
                "__dpid": pa.array(dp.astype(np.int64)),
            }
        )

    def listify(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "__cut_str": pa.array([], pa.string()),
            }
        )
        if len(t) == 0:
            return empty
        d = t[id_col].to_numpy(zero_copy_only=False)
        s = t["__idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort([s, d])
        ds_, ss_ = d[order], s[order]
        first = np.concatenate(([True], ds_[1:] != ds_[:-1]))
        starts = np.flatnonzero(first)
        offsets = np.concatenate((starts, [len(ds_)]))
        la = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pc.cast(pa.array(ss_, pa.int64()), pa.string()),
        )
        return pa.table(
            {
                id_col: pa.array(ds_[starts]),
                "__cut_str": pc.binary_join(la, ","),
            }
        )

    cut_lists = (
        docs.map_batches(postings, batch_format="pyarrow", batch_size=1024)
        .groupby("__spid")
        .map_groups(losers, batch_format="pyarrow")
        .groupby("__dpid")
        .map_groups(listify, batch_format="pyarrow")
    )
    anchor = ray.data.from_arrow(
        pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "__cut_str": pa.array([], pa.string()),
            }
        )
    )
    joined = hash_join(
        docs, anchor.union(cut_lists), on=id_col, how="left",
        num_partitions=num_partitions,
    )

    def rebuild(t: pa.Table) -> pa.Table:
        out_cols = [c for c in t.column_names if c != "__cut_str"]
        if len(t) == 0:
            return t.select(out_cols)
        cut = t["__cut_str"]
        modified = np.flatnonzero(
            pc.is_valid(cut).to_numpy(zero_copy_only=False)
        )
        texts = t[text_col].to_pylist()
        if len(modified):
            mod_texts = [texts[i] for i in modified]
            codes, lens = _codes(mod_texts)
            off = np.concatenate(([0], np.cumsum(lens)[:-1]))
            cut_m = cut.take(pa.array(modified))
            sl = pc.split_pattern(cut_m, ",")
            vals = pc.cast(
                pc.list_flatten(sl), pa.int64()
            ).to_numpy(zero_copy_only=False)
            par = pc.list_parent_indices(sl).to_numpy(zero_copy_only=False)
            diff = np.zeros(int(lens.sum()) + 1, dtype=np.int64)
            s0 = off[par] + vals
            e0 = s0 + W  # pos <= len-W by construction, never clipped
            np.add.at(diff, s0, 1)
            np.add.at(diff, e0, -1)
            keep = np.cumsum(diff[:-1]) == 0
            kept = codes[keep]
            kcnt = np.add.reduceat(
                keep.astype(np.int64), off
            ) if len(keep) else np.zeros(len(modified), np.int64)
            kcnt[lens == 0] = 0  # reduceat repeats on empty slices
            ko = np.concatenate(([0], np.cumsum(kcnt)))
            kb = kept.tobytes()
            for i, row in enumerate(modified):
                texts[row] = kb[ko[i] * 4 : ko[i + 1] * 4].decode(
                    "utf-32-le"
                )
        cols = {c: t[c] for c in out_cols}
        cols[text_col] = pa.array(texts, pa.string())
        return pa.table(cols)

    return joined.map_batches(rebuild, batch_format="pyarrow")


def dedup_segments(
    docs: ray.data.Dataset,
    words_per_seg: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 16,
    max_seg_per_doc: int = 1 << 20,
) -> ray.data.Dataset:
    """Segment-level exact dedup (the CCNet line-dedup idea generalized to
    fixed ``words_per_seg``-word chunks): every repeated segment keeps ONLY
    its globally-first occurrence (min ``(doc_id, seg_idx)``); all other
    occurrences are cut out of their documents and the surviving words are
    re-joined. Returns the input rows with ``text_col`` rewritten (possibly
    ``''`` when every segment lost).

    Segments are compared by a 64-bit FNV-combine over per-word FNV-1a
    hashes — equal word sequences hash equal, distinct ones collide with
    probability ~2⁻⁶⁴ (the accepted bound used by every dedup op here), so
    the winner shuffle moves ``(hash, packed doc·seg)`` int rows only.
    Scale shape: one int shuffle to pick winners, one int shuffle to
    aggregate each doc's loser list, and ONE text shuffle (the
    ``hash_join`` attaching loser lists); the rebuild is a streaming
    vectorized pass (difference-array segment masking + ``binary_join``).
    Requires ``doc_id < 2^63 / max_seg_per_doc`` and fewer than
    ``max_seg_per_doc`` segments per doc (packing bound, checked).
    """
    import pandas as pd

    from linref_ray.joins import hash_join
    from linref_ray.kernels.hashing import _hash_tokens_u64

    W = int(words_per_seg)
    if W < 1:
        raise ValueError("words_per_seg must be >= 1")
    P = np.uint64(num_partitions)
    FNV = np.uint64(0x100000001B3)
    OFF = np.uint64(0xCBF29CE484222325)

    def _split_words(t: pa.Table):
        """Exact single-space split (empties preserved) so that
        ``' '.join(words) == text`` — lossless rebuild, and identical to
        the SQL oracle's ``string_split(text, ' ')``."""
        wl = pc.split_pattern(t[text_col], " ")
        lens = pc.list_value_length(wl).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        return wl, lens

    def postings(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        wl, lens = _split_words(t)
        wh = _hash_tokens_u64(pc.list_flatten(wl).to_pylist())
        nseg = -(-lens // W)  # >=1: split('') is ['']
        if nseg.max(initial=0) >= max_seg_per_doc:
            raise ValueError("doc exceeds max_seg_per_doc segments")
        seg_doc = np.repeat(np.arange(len(ids)), nseg)
        seg_off = np.concatenate(([0], np.cumsum(nseg)[:-1]))
        seg_local = np.arange(len(seg_doc)) - seg_off[seg_doc]
        word_off = np.concatenate(([0], np.cumsum(lens)[:-1]))
        start = word_off[seg_doc] + seg_local * W
        h = np.full(len(seg_doc), OFF, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for p in range(W):
                valid = seg_local * W + p < lens[seg_doc]
                if not valid.any():
                    break
                hv = h[valid]
                h[valid] = (hv ^ wh[start[valid] + p]) * FNV
        packed = ids[seg_doc] * max_seg_per_doc + seg_local
        return pa.table(
            {
                "__h": pa.array(h.astype(np.int64)),
                "packed": pa.array(packed),
                "__spid": pa.array((h % P).astype(np.int64)),
            }
        )

    def losers(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "__idx": pa.array([], pa.int64()),
                "__dpid": pa.array([], pa.int64()),
            }
        )
        if len(t) == 0:
            return empty
        h = t["__h"].to_numpy(zero_copy_only=False)
        packed = t["packed"].to_numpy(zero_copy_only=False)
        order = np.lexsort([packed, h])
        hs, ps = h[order], packed[order]
        lose = ps[np.concatenate(([False], hs[1:] == hs[:-1]))]
        if not len(lose):
            return empty
        d = lose // max_seg_per_doc
        dp = pd.util.hash_array(d) % np.uint64(num_partitions)
        return pa.table(
            {
                id_col: pa.array(d),
                "__idx": pa.array(lose % max_seg_per_doc),
                "__dpid": pa.array(dp.astype(np.int64)),
            }
        )

    def listify(t: pa.Table) -> pa.Table:
        # Loser indexes ride as a comma-joined string — Acero joins don't
        # support list payload columns, and split/cast on the other side is
        # equally vectorized.
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "__loser_str": pa.array([], pa.string()),
            }
        )
        if len(t) == 0:
            return empty
        d = t[id_col].to_numpy(zero_copy_only=False)
        s = t["__idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort([s, d])
        ds_, ss_ = d[order], s[order]
        first = np.concatenate(([True], ds_[1:] != ds_[:-1]))
        starts = np.flatnonzero(first)
        offsets = np.concatenate((starts, [len(ds_)]))
        la = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pc.cast(pa.array(ss_, pa.int64()), pa.string()),
        )
        return pa.table(
            {
                id_col: pa.array(ds_[starts]),
                "__loser_str": pc.binary_join(la, ","),
            }
        )

    loser_lists = (
        docs.map_batches(postings, batch_format="pyarrow", batch_size=1024)
        .groupby("__spid")
        .map_groups(losers, batch_format="pyarrow")
        .groupby("__dpid")
        .map_groups(listify, batch_format="pyarrow")
    )
    anchor = ray.data.from_arrow(
        pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "__loser_str": pa.array([], pa.string()),
            }
        )
    )
    joined = hash_join(
        docs, anchor.union(loser_lists), on=id_col, how="left",
        num_partitions=num_partitions,
    )

    def rebuild(t: pa.Table) -> pa.Table:
        out_cols = [c for c in t.column_names if c != "__loser_str"]
        if len(t) == 0:
            return t.select(out_cols)
        wl, lens = _split_words(t)
        word_off = np.concatenate(([0], np.cumsum(lens)[:-1]))
        total = int(lens.sum())
        idxs = pc.split_pattern(
            pc.coalesce(t["__loser_str"], pa.scalar("", pa.string())), ","
        )
        vals_s = pc.list_flatten(idxs)
        par_all = pc.list_parent_indices(idxs).to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(vals_s, "")
        vals = pc.cast(
            vals_s.filter(nonempty), pa.int64()
        ).to_numpy(zero_copy_only=False)
        par = par_all[nonempty.to_numpy(zero_copy_only=False)]
        diff = np.zeros(total + 1, dtype=np.int64)
        if len(vals):
            s0 = word_off[par] + vals * W
            e0 = np.minimum(s0 + W, word_off[par] + lens[par])
            np.add.at(diff, s0, 1)
            np.add.at(diff, e0, -1)
        keep = np.cumsum(diff[:-1]) == 0
        kept_counts = np.add.reduceat(
            keep.astype(np.int64), word_off
        ) if total else np.zeros(len(t), np.int64)
        # reduceat repeats a doc's sum when its slice is empty (lens>=1
        # always here, but guard the all-empty batch)
        new_off = np.concatenate(([0], np.cumsum(kept_counts)))
        kept_words = pc.list_flatten(wl).filter(pa.array(keep))
        if isinstance(kept_words, pa.ChunkedArray):
            kept_words = kept_words.combine_chunks()
        la = pa.ListArray.from_arrays(
            pa.array(new_off, pa.int32()), kept_words
        )
        new_text = pc.binary_join(la, " ")
        cols = {c: t[c] for c in out_cols}
        cols[text_col] = new_text
        return pa.table(cols)

    return joined.map_batches(rebuild, batch_format="pyarrow")


def dedup_corpus(
    docs: ray.data.Dataset,
    pairs: ray.data.Dataset,
    id_col: str = "doc_id",
    method: str = "driver",
) -> ray.data.Dataset:
    """End-to-end near-dedup: given verified near-dup ``(id_a, id_b)``
    pairs from any cascade (minhash / simhash / exact n-gram / embedding /
    image), drop every non-canonical member of each duplicate component
    and return the surviving corpus rows (all input columns).

    Canonical = the minimum id of the connected component. The distinct
    edge list is collected to the driver for union-find — edges ≪ corpus
    by construction (every edge already survived bucketing + exact
    verification; a corpus that is 50% duplicates still has O(dups)
    edges after pair dedup, and hot buckets chain-degrade upstream).
    The loser set broadcasts once via ``ray.put`` and the corpus filters
    in one streaming ``map_batches`` pass — the wide text/bytes columns
    never shuffle.

    ``method='distributed'`` is the edges-don't-fit-anywhere scale path:
    components via :func:`linref_ray.graph.connected_components` (min-label
    propagation + pointer jumping, all Ray shuffles) and the loser filter
    as a distributed hash anti-join — nothing touches the driver, at the
    cost of one id-hash shuffle of the corpus (wide columns move once).
    Requires integer ids.
    """
    import pyarrow.compute as pc
    import ray

    if method == "distributed":
        from linref_ray.graph import component_losers, connected_components
        from linref_ray.joins import hash_join

        comps = connected_components(pairs)
        losers = component_losers(comps).map_batches(
            lambda t: pa.table(
                {
                    id_col: t["node"],
                    "__dup": pa.array(np.ones(len(t), np.int8)),
                }
            ),
            batch_format="pyarrow",
        )
        joined = hash_join(docs, losers, on=id_col, how="left")

        def keep_unmarked(t: pa.Table) -> pa.Table:
            out = t.filter(pc.is_null(t["__dup"]))
            return out.drop_columns(["__dup"])

        return joined.map_batches(keep_unmarked, batch_format="pyarrow")
    if method != "driver":
        raise ValueError(f"unknown method {method!r}")

    edges = pairs.select_columns(["id_a", "id_b"]).to_pandas()
    if len(edges) == 0 or "id_a" not in edges.columns:
        # No duplicates (an all-empty pairs dataset may arrive schema-less).
        return docs
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edges["id_a"], edges["id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    comp: dict = {}
    for x in parent:
        comp.setdefault(find(x), []).append(x)
    losers = [x for members in comp.values() for x in members
              if x != min(members)]
    loser_ref = ray.put(pa.array(losers))

    def keep(t: pa.Table) -> pa.Table:
        value_set = ray.get(loser_ref)
        if len(value_set) == 0:
            return t
        dup = pc.is_in(
            t[id_col], value_set=value_set.cast(t.schema.field(id_col).type)
        )
        return t.filter(pc.invert(pc.fill_null(dup, False)))

    return docs.map_batches(keep, batch_format="pyarrow")
