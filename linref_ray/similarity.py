"""Similarity search over embedding columns.

Brute-force cosine top-k as the exact baseline: the query matrix is tiny and
broadcast (captured in the batch closure → shipped once per task by Ray's
closure serialization); each batch computes one numpy matmul and emits only
its local top-k per query, so the final exact top-k reduction sees ≤
k × n_batches rows. An IVF-style bucketed variant rides the same kernel with
a coarse-quantizer cell column as the partition key (scale path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1)


def knn_brute_force(
    embeddings: ray.data.Dataset,
    query_ids: tuple[int, ...],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Exact cosine top-k of each query id against the full table.

    Output: (query_id, vec_id, cosine), self-matches excluded, ties broken
    by ascending vec_id (matches the SQL oracle's ORDER BY).
    """
    id_set = pa.array(list(query_ids), pa.int64())
    q_tbl = embeddings.map_batches(
        lambda t: t.filter(
            pa.compute.is_in(pa.compute.cast(t[id_col], pa.int64()), value_set=id_set)
        ),
        batch_format="pyarrow",
    ).select_columns([id_col, vec_col])
    q_pa = pa.concat_tables(
        ray.get(q_tbl.to_arrow_refs()), promote_options="default"
    )
    q_ids = np.asarray(q_pa[id_col].to_pylist(), dtype=np.int64)
    if len(q_ids) == 0:
        # No query id exists in the table: typed empty result (the per-query
        # loop below would otherwise np.concatenate([]) in every task).
        return ray.data.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        )
    order = np.argsort(q_ids)
    q_ids = q_ids[order]
    qm = _to_matrix(q_pa[vec_col])[order]
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    def partial_topk(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _to_matrix(t[vec_col])
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        cos = mn @ qn.T  # (batch, n_queries)
        out_q, out_v, out_c = [], [], []
        for j in range(len(q_ids)):
            c = cos[:, j].copy()
            c[ids == q_ids[j]] = -np.inf  # exclude self
            take = min(k, len(c))
            part = np.argpartition(-c, take - 1)[:take]
            keep = part[np.isfinite(c[part])]
            out_q.append(np.full(len(keep), q_ids[j]))
            out_v.append(ids[keep])
            out_c.append(c[keep])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "cosine": pa.array(np.concatenate(out_c)),
            }
        )

    partial = embeddings.map_batches(
        partial_topk, batch_format="pyarrow", batch_size=4096
    )

    def final_topk(t: pa.Table) -> pa.Table:
        q = t["query_id"].to_numpy(zero_copy_only=False)
        v = t["vec_id"].to_numpy(zero_copy_only=False)
        c = t["cosine"].to_numpy(zero_copy_only=False)
        if len(q) == 0:
            return t
        order = np.lexsort([v, -c, q])
        q_s = q[order]
        starts = np.concatenate([[True], q_s[1:] != q_s[:-1]])
        run_of = np.cumsum(starts) - 1
        start_idx = np.flatnonzero(starts)
        pos_in_run = np.arange(len(q_s)) - start_idx[run_of]
        sel = order[pos_in_run < k]
        return pa.table(
            {
                "query_id": pa.array(q[sel]),
                "vec_id": pa.array(v[sel]),
                "cosine": pa.array(c[sel]),
            }
        )

    return partial.groupby("query_id").map_groups(
        final_topk, batch_format="pyarrow"
    )


def _anchor_cosine_pairs(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Union a typed empty (id_a, id_b, cosine) block so a run with zero
    verified pairs still yields a schema'd dataset downstream (Ray 2.49
    loses the schema of an all-empty map_groups output)."""
    return ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    ).union(ds)


def _make_cosine_verifier(
    id_col: str, vec_col: str, threshold: float, max_bucket: int, label: str
):
    """Within-group exact-cosine pair verifier shared by the LSH and the
    k-means (SemDeDup-style) cascades: tiled all-pairs so per-step scratch
    is O(tile × group), hot groups chain-degrade (logged) at
    ``max_bucket``. Emits (id_a, id_b, cosine) with id_a < id_b."""

    def verify(t: pa.Table) -> pa.Table:
        from linref_ray.dedup import _chain_or_all_pairs

        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if n < 2:
            return empty
        m = _to_matrix(t[vec_col])
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        out_a, out_b, out_c = [], [], []
        if n > max_bucket:
            # Hot group (e.g. boilerplate embeddings): chain pairs, logged.
            a, b = _chain_or_all_pairs(ids, max_bucket, label)
            cos = (mn[a] * mn[b]).sum(axis=1)
            hit = cos >= threshold
            out_a.append(ids[a[hit]])
            out_b.append(ids[b[hit]])
            out_c.append(cos[hit])
        else:
            # Tiled all-pairs: per-step scratch is O(tile x group), never
            # the full O(group^2) cosine matrix.
            tile = 1024
            for i0 in range(0, n, tile):
                i1 = min(i0 + tile, n)
                cos = mn[i0:i1] @ mn[i0:].T  # columns j >= i0 only
                ai, bj = np.nonzero(cos >= threshold)
                keep = (ai + i0) < (bj + i0)
                ai, bj = ai[keep], bj[keep]
                if not len(ai):
                    continue
                out_a.append(ids[ai + i0])
                out_b.append(ids[bj + i0])
                out_c.append(cos[ai, bj])
        if not out_a:
            return empty
        ia = np.concatenate(out_a)
        ib = np.concatenate(out_b)
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        return pa.table(
            {
                "id_a": pa.array(lo),
                "id_b": pa.array(hi),
                "cosine": pa.array(np.concatenate(out_c)),
            }
        )

    return verify


def embedding_near_duplicates(
    embeddings: ray.data.Dataset,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_partitions: int = 16,
    lsh_planes: int = 12,
    lsh_sets: int = 1,
    seed: int = 11,
    max_bucket: int = 4096,
) -> ray.data.Dataset:
    """Embedding-cosine near-duplicate pairs via random-hyperplane LSH.

    Vectors hash to a sign-pattern bucket (Charikar SimHash for vectors);
    exact cosine is verified within buckets — tiled so per-task scratch is
    bounded, with hot buckets degrading to logged chain pairs at
    ``max_bucket``. Emits (id_a, id_b, cosine) with id_a < id_b.

    ``lsh_sets`` ORs multiple independent plane sets (banding): each vector
    lands in one bucket PER SET and a pair is a candidate if ANY set
    agrees, so recall ≈ 1-(1-p^planes)^sets for per-plane agreement p —
    the lever for moderate thresholds where a single sign-pattern's recall
    collapses (p^planes). Cross-set duplicate pairs are merged by a final
    (id_a, id_b) groupby. Precision stays 1.0: every candidate is
    exact-cosine verified in-bucket.
    """
    planes_by_dim: dict[int, np.ndarray] = {}

    def bucket(t: pa.Table) -> pa.Table:
        m = _to_matrix(t[vec_col])
        n, d = m.shape
        if d not in planes_by_dim:
            planes_by_dim[d] = np.random.Generator(
                np.random.PCG64(seed)
            ).normal(size=(d, lsh_planes * lsh_sets))
        signs = (m @ planes_by_dim[d]) > 0
        weights = 1 << np.arange(lsh_planes)
        codes = np.empty((n, lsh_sets), np.int64)
        for s in range(lsh_sets):
            seg = signs[:, s * lsh_planes : (s + 1) * lsh_planes]
            codes[:, s] = (seg * weights).sum(axis=1) + (s << lsh_planes)
        if lsh_sets == 1:
            return pa.table(
                {
                    id_col: t[id_col],
                    vec_col: t[vec_col],
                    "__bucket": pa.array(codes[:, 0]),
                }
            )
        take = pa.array(np.repeat(np.arange(n), lsh_sets))
        return pa.table(
            {
                id_col: t[id_col].take(take),
                vec_col: t[vec_col].take(take),
                "__bucket": pa.array(codes.ravel()),
            }
        )

    verify = _make_cosine_verifier(
        id_col, vec_col, threshold, max_bucket, "embedding-LSH"
    )

    out = (
        embeddings.map_batches(bucket, batch_format="pyarrow")
        # Coalesce before the sort-based groupby shuffle — many tiny read
        # blocks otherwise pay the fixed per-block exchange cost (same fix
        # as the minhash path; see partition.py notes).
        .repartition(num_partitions)
        .groupby("__bucket")
        .map_groups(verify, batch_format="pyarrow")
    )
    if lsh_sets > 1:
        from linref_ray.partition import grouped_sums

        # Merge pairs found by more than one plane set (cosine is the same
        # deterministic dot product in every bucket; min over equal values
        # is order-free). Pair keys are high-cardinality — kernel merge,
        # not the built-in Aggregate (partition.grouped_sums note). The
        # pre-anchor types the key columns when every bucket verified
        # empty; grouped_sums anchors its own output.
        return _anchor_cosine_pairs(
            grouped_sums(
                _anchor_cosine_pairs(out),
                ("id_a", "id_b"),
                (("cosine", "cosine", "min"),),
                num_partitions=max(num_partitions // 2, 2),
            )
        )
    return _anchor_cosine_pairs(out)


def kmeans_centroids(
    embeddings: ray.data.Dataset,
    k: int = 16,
    sample: int = 2048,
    iters: int = 8,
    seed: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Coarse quantizer for IVF: k-means on a driver-side sample (seeded,
    deterministic). The sample is tiny; the full table never leaves workers."""
    tbl = pa.concat_tables(
        ray.get(embeddings.limit(sample).to_arrow_refs()),
        promote_options="default",
    )
    m = _to_matrix(tbl[vec_col])
    rng = np.random.Generator(np.random.PCG64(seed))
    cent = m[rng.choice(len(m), size=min(k, len(m)), replace=False)].copy()
    for _ in range(iters):
        # rank-equivalent to |m-c|^2 without the (B,k,d) temporary:
        # |x|^2 is constant per row, so |c|^2 - 2 x.c orders identically
        d = (cent * cent).sum(axis=1)[None, :] - 2.0 * (m @ cent.T)
        assign = d.argmin(axis=1)
        for j in range(len(cent)):
            sel = m[assign == j]
            if len(sel):
                cent[j] = sel.mean(axis=0)
    return cent


def semantic_near_duplicates(
    embeddings: ray.data.Dataset,
    threshold: float = 0.95,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_partitions: int = 16,
    seed: int = 3,
    sample: int = 2048,
    iters: int = 8,
    max_cluster: int = 8192,
) -> ray.data.Dataset:
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023, public):
    k-means clusters the embedding space — driver-sample quantizer
    (deterministic, seeded), centroids broadcast once via ``ray.put`` —
    then exact cosine pairs are verified only WITHIN a cluster. One
    shuffle (groupby cluster); precision 1.0 in-cluster, recall bounded by
    the quantizer like the paper's. ``threshold`` plays the paper's
    1−epsilon role."""
    cent = kmeans_centroids(
        embeddings, k=n_clusters, sample=sample, iters=iters, seed=seed,
        id_col=id_col, vec_col=vec_col,
    )
    cent_ref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _to_matrix(t[vec_col])
        # argmin ||m - c||² via the expanded form; ||m||² is constant per
        # row and drops out of the argmin.
        d = -2.0 * (m @ c.T) + (c * c).sum(axis=1)[None, :]
        return pa.table(
            {
                id_col: t[id_col],
                vec_col: t[vec_col],
                "__bucket": pa.array(d.argmin(axis=1).astype(np.int64)),
            }
        )

    verify = _make_cosine_verifier(
        id_col, vec_col, threshold, max_cluster, "semantic-kmeans"
    )
    return _anchor_cosine_pairs(
        embeddings.map_batches(assign, batch_format="pyarrow")
        .repartition(num_partitions)
        .groupby("__bucket")
        .map_groups(verify, batch_format="pyarrow")
    )


def semantic_dedup(
    embeddings: ray.data.Dataset,
    threshold: float = 0.95,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_partitions: int = 16,
    seed: int = 3,
    max_cluster: int = 8192,
) -> ray.data.Dataset:
    """End-to-end semantic dedup: within-cluster near-dup pairs →
    connected components → keep the minimum-id canonical of each
    component. Component resolution over the (tiny) verified edge list on
    the driver; survivors filter in one streaming pass with the loser set
    broadcast — the embedding payload never shuffles
    (:func:`linref_ray.dedup.dedup_corpus`)."""
    from linref_ray.dedup import dedup_corpus

    pairs = semantic_near_duplicates(
        embeddings.select_columns([id_col, vec_col]),
        threshold=threshold,
        n_clusters=n_clusters,
        id_col=id_col,
        vec_col=vec_col,
        num_partitions=num_partitions,
        seed=seed,
        max_cluster=max_cluster,
    )
    return dedup_corpus(embeddings, pairs, id_col=id_col)


def knn_ivf(
    embeddings: ray.data.Dataset,
    query_ids: tuple[int, ...],
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """IVF-bucketed approximate top-k: vectors pre-filter to the ``nprobe``
    closest coarse cells of each query, then the brute-force kernel runs on
    the surviving fraction (~nprobe/n_centroids of the table). The scale path
    for :func:`knn_brute_force`; recall depends on nprobe (standard IVF
    trade-off)."""
    cent = kmeans_centroids(
        embeddings, k=n_centroids, id_col=id_col, vec_col=vec_col
    )
    q_tbl = pa.concat_tables(
        ray.get(
            embeddings.map_batches(
                lambda t: t.filter(
                    pa.compute.is_in(
                        pa.compute.cast(t[id_col], pa.int64()),
                        value_set=pa.array(list(query_ids), pa.int64()),
                    )
                ),
                batch_format="pyarrow",
            ).to_arrow_refs()
        ),
        promote_options="default",
    )
    qm = _to_matrix(q_tbl[vec_col])
    qd = (cent * cent).sum(axis=1)[None, :] - 2.0 * (qm @ cent.T)
    probe_cells = np.unique(
        np.argsort(qd, axis=1)[:, :nprobe].ravel()
    )
    probe_set = pa.array(sorted(int(c) for c in probe_cells), pa.int64())

    def in_probed_cells(t: pa.Table) -> pa.Table:
        m = _to_matrix(t[vec_col])
        # rank-equivalent to |m-c|^2 without the (B,k,d) temporary:
        # |x|^2 is constant per row, so |c|^2 - 2 x.c orders identically
        d = (cent * cent).sum(axis=1)[None, :] - 2.0 * (m @ cent.T)
        cell = d.argmin(axis=1).astype(np.int64)
        return t.filter(
            pa.compute.is_in(pa.array(cell), value_set=probe_set)
        )

    filtered = embeddings.map_batches(in_probed_cells, batch_format="pyarrow")
    return knn_brute_force(
        filtered, query_ids, k=k, id_col=id_col, vec_col=vec_col
    )


def _hyperplane_codes(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Pack sign bits of ``m @ planes[t].T`` into one integer bucket code
    per (table, row). Sign of a dot product is norm-invariant, so raw
    (unnormalized) vectors hash identically to their normalized forms —
    cosine neighbors share codes with high probability per bit."""
    n_tables, n_bits, _ = planes.shape
    shifts = (np.uint64(1) << np.arange(n_bits, dtype=np.uint64))
    codes = np.empty((n_tables, len(m)), dtype=np.uint64)
    for t in range(n_tables):
        bits = (m @ planes[t].T) > 0.0  # (rows, n_bits)
        codes[t] = bits.astype(np.uint64) @ shifts
    return codes


def knn_lsh(
    embeddings: ray.data.Dataset,
    query_ids: tuple[int, ...],
    k: int = 5,
    n_bits: int = 10,
    n_tables: int = 8,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Hyperplane-LSH-bucketed approximate top-k: rows survive iff they
    share a bucket code with some query in at least one of ``n_tables``
    independent hash tables, then the exact brute-force kernel ranks the
    survivors. The LSH scale path beside :func:`knn_ivf`: the prefilter is
    a per-batch bit-hash + ``np.isin`` (no shuffle, no training pass, no
    driver-side sample), expected candidate fraction ≈
    ``n_tables * P(code collision)`` with recall growing in ``n_tables``
    (multi-table OR — standard SimHash-LSH trade-off). The hyperplane
    tensor is ``n_tables × n_bits × dim`` floats (a few KB), captured in
    the batch closure and shipped once per task."""
    q_tbl = pa.concat_tables(
        ray.get(
            embeddings.map_batches(
                lambda t: t.filter(
                    pa.compute.is_in(
                        pa.compute.cast(t[id_col], pa.int64()),
                        value_set=pa.array(list(query_ids), pa.int64()),
                    )
                ),
                batch_format="pyarrow",
            ).to_arrow_refs()
        ),
        promote_options="default",
    )
    if len(q_tbl) == 0:
        return knn_brute_force(
            embeddings, query_ids, k=k, id_col=id_col, vec_col=vec_col
        )
    qm = _to_matrix(q_tbl[vec_col])
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.standard_normal((n_tables, n_bits, qm.shape[1]))
    q_codes = _hyperplane_codes(qm, planes)  # (n_tables, n_queries)

    def in_query_buckets(t: pa.Table) -> pa.Table:
        m = _to_matrix(t[vec_col])
        codes = _hyperplane_codes(m, planes)
        match = np.zeros(len(m), dtype=bool)
        for ti in range(n_tables):
            match |= np.isin(codes[ti], q_codes[ti])
        return t.filter(pa.array(match))

    filtered = embeddings.map_batches(in_query_buckets, batch_format="pyarrow")
    return knn_brute_force(
        filtered, query_ids, k=k, id_col=id_col, vec_col=vec_col
    )


def knn_graph(
    embeddings: ray.data.Dataset,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Brute-force cosine kNN GRAPH: for EVERY vector its ``k`` nearest
    neighbors (self excluded), deterministic ties (cosine desc, id asc).
    Output: ``(query_id, vec_id, cosine)``.

    The normalized corpus matrix broadcasts ONCE via ``ray.put``; each
    batch is one (B×N) matmul against it, per-row exact top-k resolved
    tie-complete (partition for the k-th value, keep ALL >= it, lexsort,
    cut k) — no shuffle, no reduce stage: a row's neighbors complete
    within its own batch. O(N²d) flops and O(Nd) broadcast memory are the
    honest bounds of the brute path (1e8×64-d float64 ≈ 51 GB object
    store); past that use :func:`knn_graph_ivf`."""
    corpus = pa.concat_tables(
        ray.get(
            embeddings.select_columns([id_col, vec_col]).to_arrow_refs()
        ),
        promote_options="default",
    )
    c_ids = np.asarray(corpus[id_col].to_pylist(), dtype=np.int64)
    cm = _to_matrix(corpus[vec_col])
    cn = cm / np.maximum(np.linalg.norm(cm, axis=1, keepdims=True), 1e-30)
    ref = ray.put((c_ids, cn))

    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if len(t) == 0:
            return empty
        ids_all, cn_all = ray.get(ref)  # per-worker plasma read, zero-copy
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _to_matrix(t[vec_col])
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        B = len(ids)
        N = len(ids_all)
        take = min(k, N - 1)
        if take <= 0:
            return empty
        # corpus-tiled exact top-k: the full B×N cosine matrix does not fit
        # a worker heap at real corpus sizes (1024×1e5 f64 ≈ 0.8 GB), so
        # scan corpus tiles, keep each row's tile-local tie-complete
        # top-take candidates (a guaranteed superset of the global top-take),
        # and cut once at the end — all vectorized, ~64 MB scratch
        ctile = max(take + 1, (8 << 20) // max(B, 1))
        cand_r: list[np.ndarray] = []
        cand_c: list[np.ndarray] = []
        cand_v: list[np.ndarray] = []
        for c0 in range(0, N, ctile):
            c1 = min(c0 + ctile, N)
            cos = mn @ cn_all[c0:c1].T
            cos[ids[:, None] == ids_all[None, c0:c1]] = -np.inf
            W = c1 - c0
            tt = min(take, W)
            kth = np.partition(cos, W - tt, axis=1)[:, W - tt]
            mask = (cos >= kth[:, None]) & np.isfinite(cos)
            ri, ci = np.nonzero(mask)
            cand_r.append(ri)
            cand_c.append(ci + c0)
            cand_v.append(cos[ri, ci])
        rr = np.concatenate(cand_r)
        cc = np.concatenate(cand_c)
        vv = np.concatenate(cand_v)
        # deterministic global cut per row: (cosine desc, id asc)
        order = np.lexsort([ids_all[cc], -vv, rr])
        r_s = rr[order]
        first = np.concatenate(([True], r_s[1:] != r_s[:-1]))
        starts = np.flatnonzero(first)
        pos = np.arange(len(r_s)) - starts[np.cumsum(first) - 1]
        sel = order[pos < take]
        return pa.table(
            {
                "query_id": pa.array(ids[rr[sel]]),
                "vec_id": pa.array(ids_all[cc[sel]]),
                "cosine": pa.array(vv[sel]),
            }
        )

    return embeddings.map_batches(fn, batch_format="pyarrow", batch_size=1024)


def knn_graph_ivf(
    embeddings: ray.data.Dataset,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell: int = 65536,
    sample: int = 2048,
    iters: int = 8,
) -> ray.data.Dataset:
    """IVF-bucketed kNN graph — the scale path: no full-corpus broadcast,
    no O(N²) scan. Every vector posts ONCE as data (its nearest coarse
    cell) and ``nprobe`` times as query (its closest cells); a
    ``groupby(cell)`` kernel brute-forces query×data within each cell;
    a final ``groupby(query)`` merge re-ranks the per-cell partials
    (cosine desc, id asc) and cuts k. Shuffle volume: (1+nprobe)·N vector
    rows. With ``nprobe == n_centroids`` every cell is probed, candidates
    cover the corpus, and the result is EXACT (= :func:`knn_graph`) — the
    oracle mode. ``max_cell`` bounds the DATA rows per cell (the quadratic
    side) and raises rather than silently exploding; a cell hot on the
    QUERY side (a centroid near the data mean lands in many probe lists)
    costs query×data — linear, not quadratic — and the kernel tiles the
    query dimension so scratch stays bounded regardless. At real scale a
    pathologically query-hot cell shards by query hash (the standard salt;
    results merge identically because the per-cell top-k is per-query)."""
    cent = kmeans_centroids(
        embeddings, k=n_centroids, id_col=id_col, vec_col=vec_col,
        sample=sample, iters=iters,
    )
    cent_ref = ray.put(cent)

    def postings(t: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _to_matrix(t[vec_col])
        # rank-equivalent distance (see kmeans assign): no 3D temp
        d = (cents * cents).sum(axis=1)[None, :] - 2.0 * (m @ cents.T)
        near = np.argsort(d, axis=1, kind="stable")
        np_ = min(nprobe, d.shape[1])
        vecs = t[vec_col]
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        n = len(ids)
        # one data posting + nprobe query postings per vector
        cells = np.concatenate(
            [near[:, 0]] + [near[:, j] for j in range(np_)]
        ).astype(np.int64)
        side = np.concatenate(
            [np.zeros(n, np.int8)] + [np.ones(n, np.int8)] * np_
        )
        row = np.tile(np.arange(n), np_ + 1)
        # a query posting to the vector's own data cell is redundant
        keep = ~((side == 1) & (cells == near[row, 0]))
        cells, side, row = cells[keep], side[keep], row[keep]
        return pa.table(
            {
                "__cell": pa.array(cells),
                "__side": pa.array(side),
                id_col: pa.array(ids[row]),
                vec_col: vecs.take(pa.array(row)),
            }
        )

    def cell_topk(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if len(t) == 0:
            return empty
        side = t["__side"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        di = np.flatnonzero(side == 0)
        if not len(di):
            return empty
        if len(di) > max_cell:
            raise ValueError(
                f"IVF cell holds {len(di)} data rows > max_cell="
                f"{max_cell}; increase n_centroids"
            )
        m = _to_matrix(t[vec_col])
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        q_ids, d_ids = ids, ids[di]
        dn = mn[di]
        D = len(di)
        take = min(k, D)
        out_q, out_v, out_c = [], [], []
        tile = max(1, (8 << 20) // max(D, 1))  # ~64MB f64 scratch
        for t0 in range(0, len(ids), tile):
            t1 = min(t0 + tile, len(ids))
            cos = mn[t0:t1] @ dn.T
            cos[q_ids[t0:t1, None] == d_ids[None, :]] = -np.inf
            # tie-complete SET per row, fully vectorized: the final merge
            # re-sorts and cuts k, so per-cell output needs no ordering —
            # emit everything >= each row's take-th value (a superset on
            # exact ties, which the merge resolves deterministically)
            kth = np.partition(cos, D - take, axis=1)[:, D - take]
            mask = (cos >= kth[:, None]) & np.isfinite(cos)
            ri, ci = np.nonzero(mask)
            out_q.append(q_ids[t0 + ri])
            out_v.append(d_ids[ci])
            out_c.append(cos[ri, ci])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "cosine": pa.array(np.concatenate(out_c)),
            }
        )

    def merge_topk(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        q = t["query_id"].to_numpy(zero_copy_only=False)
        v = t["vec_id"].to_numpy(zero_copy_only=False)
        c = t["cosine"].to_numpy(zero_copy_only=False)
        # a (query, data) pair can reappear via several probed cells
        order = np.lexsort([v, -c, q])
        q_s, v_s = q[order], v[order]
        uniq = np.concatenate(
            ([True], (q_s[1:] != q_s[:-1]) | (v_s[1:] != v_s[:-1]))
        )
        order = order[uniq]
        q_s = q[order]
        starts = np.concatenate(([True], q_s[1:] != q_s[:-1]))
        start_idx = np.flatnonzero(starts)
        pos = np.arange(len(q_s)) - start_idx[np.cumsum(starts) - 1]
        sel = order[pos < k]
        return pa.table(
            {
                "query_id": pa.array(q[sel]),
                "vec_id": pa.array(v[sel]),
                "cosine": pa.array(c[sel]),
            }
        )

    return (
        embeddings.map_batches(postings, batch_format="pyarrow",
                               batch_size=1024)
        .groupby("__cell")
        .map_groups(cell_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge_topk, batch_format="pyarrow")
    )


def knn_join(
    queries: ray.data.Dataset,
    corpus: ray.data.Dataset,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    exclude_same_id: bool = False,
) -> ray.data.Dataset:
    """Cross-table kNN join: for every QUERY row its ``k`` nearest CORPUS
    rows by cosine (ties id-ascending) — the retrieval shape
    (new queries × indexed corpus), vs :func:`knn_graph`'s self-join.

    Same scale shape as the graph kernel: the corpus broadcasts once via
    ``ray.put`` and the query side streams through corpus-TILED matmuls,
    no shuffle. ``exclude_same_id`` drops corpus rows sharing the query's
    id (for overlapping tables)."""
    qid = query_id_col or id_col
    tbl = pa.concat_tables(
        ray.get(
            corpus.select_columns([id_col, vec_col]).to_arrow_refs()
        ),
        promote_options="default",
    )
    c_ids = np.asarray(tbl[id_col].to_pylist(), dtype=np.int64)
    cm = _to_matrix(tbl[vec_col])
    cn = cm / np.maximum(np.linalg.norm(cm, axis=1, keepdims=True), 1e-30)
    ref = ray.put((c_ids, cn))

    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if len(t) == 0:
            return empty
        ids_all, cn_all = ray.get(ref)
        ids = t[qid].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _to_matrix(t[vec_col])
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        B, N = len(ids), len(ids_all)
        take = min(k, N - 1 if exclude_same_id else N)
        if take <= 0:
            return empty
        ctile = max(take + 1, (8 << 20) // max(B, 1))
        cand_r, cand_c, cand_v = [], [], []
        for c0 in range(0, N, ctile):
            c1 = min(c0 + ctile, N)
            cos = mn @ cn_all[c0:c1].T
            if exclude_same_id:
                cos[ids[:, None] == ids_all[None, c0:c1]] = -np.inf
            W = c1 - c0
            tt = min(take, W)
            kth = np.partition(cos, W - tt, axis=1)[:, W - tt]
            mask = (cos >= kth[:, None]) & np.isfinite(cos)
            ri, ci = np.nonzero(mask)
            cand_r.append(ri)
            cand_c.append(ci + c0)
            cand_v.append(cos[ri, ci])
        rr = np.concatenate(cand_r)
        cc = np.concatenate(cand_c)
        vv = np.concatenate(cand_v)
        order = np.lexsort([ids_all[cc], -vv, rr])
        r_s = rr[order]
        first = np.concatenate(([True], r_s[1:] != r_s[:-1]))
        starts = np.flatnonzero(first)
        pos = np.arange(len(r_s)) - starts[np.cumsum(first) - 1]
        sel = order[pos < take]
        return pa.table(
            {
                "query_id": pa.array(ids[rr[sel]]),
                "vec_id": pa.array(ids_all[cc[sel]]),
                "cosine": pa.array(vv[sel]),
            }
        )

    return queries.map_batches(fn, batch_format="pyarrow", batch_size=1024)


# -- Product quantization (Jégou et al. 2011, public method) -----------------
# The beyond-broadcast compression path for the kNN family: raw 64-d float64
# vectors cost 512 B each in the object store; 8-subspace PQ codes cost 8 B —
# a 64x larger corpus fits the same broadcast budget, at approximate
# (asymmetric-distance) ranking quality measured by the recall tests/stress.


def pq_train(
    embeddings: ray.data.Dataset,
    m: int = 8,
    k: int = 256,
    sample: int = 16384,
    iters: int = 8,
    seed: int = 5,
    vec_col: str = "embedding",
    normalize: bool = True,
) -> np.ndarray:
    """Train PQ codebooks on a driver-side sample: split the dimension into
    ``m`` subspaces and k-means each independently. Returns (m, k, d/m).
    ``normalize=True`` trains on unit vectors so asymmetric L2 distance
    ranks by cosine (||a-b||^2 = 2 - 2 cos for unit vectors)."""
    tbl = pa.concat_tables(
        ray.get(embeddings.limit(sample).to_arrow_refs()),
        promote_options="default",
    )
    x = _to_matrix(tbl[vec_col]).astype(np.float64)
    if normalize:
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
    n, d = x.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    dsub = d // m
    rng = np.random.Generator(np.random.PCG64(seed))
    books = np.empty((m, min(k, n), dsub))
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        cent = sub[rng.choice(n, size=min(k, n), replace=False)].copy()
        for _ in range(iters):
            dist = (cent * cent).sum(axis=1)[None, :] - 2.0 * (sub @ cent.T)
            assign = dist.argmin(axis=1)
            for c in range(len(cent)):
                sel = sub[assign == c]
                if len(sel):
                    cent[c] = sel.mean(axis=0)
        books[j] = cent
    return books


def _pq_encode_matrix(x: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) float → (n, m) uint8/uint16 codes (argmin per subspace)."""
    m, k, dsub = books.shape
    n = len(x)
    codes = np.empty((n, m), dtype=np.uint8 if k <= 256 else np.uint16)
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        cent = books[j]
        dist = (cent * cent).sum(axis=1)[None, :] - 2.0 * (sub @ cent.T)
        codes[:, j] = dist.argmin(axis=1)
    return codes


def knn_graph_pq(
    embeddings: ray.data.Dataset,
    k: int = 5,
    m: int = 8,
    n_codes: int = 256,
    sample: int = 16384,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Approximate cosine kNN graph with a PQ-COMPRESSED broadcast corpus.

    Same shape as :func:`knn_graph` (each batch scores against a
    broadcast corpus, no shuffle, top-k complete within the batch) but the
    broadcast holds (ids, uint8 codes): N·(8+m) bytes instead of N·d·8 —
    the documented brute broadcast bound extends ~(d·8/m)×. Scoring is
    standard asymmetric distance: per query, an (m, n_codes) lookup table
    of exact subspace distances to every codeword; a corpus vector's
    approximate distance is the sum of its codes' table entries.
    Deterministic ties (distance asc, id asc). Output
    ``(query_id, vec_id, cosine)`` with cosine = 1 - adc/2 (unit-vector
    identity), approximate by construction — recall is measured in
    tests/stress, not assumed."""
    books = pq_train(
        embeddings, m=m, k=n_codes, sample=sample, iters=iters,
        vec_col=vec_col, normalize=True,
    )
    books_ref = ray.put(books)

    def encode(t: pa.Table) -> pa.Table:
        bk = ray.get(books_ref)
        x = _to_matrix(t[vec_col]).astype(np.float64)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        codes = _pq_encode_matrix(x, bk)
        return pa.table(
            {
                id_col: pc.cast(t[id_col], pa.int64()),
                "__code": pa.array(list(codes), pa.list_(pa.uint8())),
            }
        )

    code_tbl = pa.concat_tables(
        ray.get(
            embeddings.map_batches(
                encode, batch_format="pyarrow", batch_size=4096
            ).to_arrow_refs()
        ),
        promote_options="default",
    )
    c_ids = code_tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    c_codes = np.asarray(code_tbl["__code"].to_pylist(), dtype=np.uint8)
    corpus_ref = ray.put((c_ids, c_codes))
    dsub = books.shape[2]

    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if len(t) == 0:
            return empty
        ids_all, codes_all = ray.get(corpus_ref)
        bk = ray.get(books_ref)
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        q = _to_matrix(t[vec_col]).astype(np.float64)
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        B, N = len(ids), len(ids_all)
        take = min(k, N - 1)
        if take <= 0:
            return empty
        mm = bk.shape[0]
        # per-query subspace LUTs: (B, m, n_codes) exact distances to
        # every codeword — O(B·m·n_codes·dsub) flops, independent of N
        luts = np.empty((B, mm, bk.shape[1]))
        for j in range(mm):
            sub = q[:, j * dsub : (j + 1) * dsub]
            cent = bk[j]
            luts[:, j, :] = (
                (cent * cent).sum(axis=1)[None, :]
                + (sub * sub).sum(axis=1)[:, None]
                - 2.0 * (sub @ cent.T)
            )
        ctile = max(take + 1, (8 << 20) // max(B, 1))
        cand_r, cand_c, cand_v = [], [], []
        for c0 in range(0, N, ctile):
            c1 = min(c0 + ctile, N)
            tile_codes = codes_all[c0:c1]
            adc = np.zeros((B, c1 - c0))
            for j in range(mm):
                adc += luts[:, j, :][:, tile_codes[:, j]]
            adc[ids[:, None] == ids_all[None, c0:c1]] = np.inf
            W = c1 - c0
            tt = min(take, W)
            kth = np.partition(adc, tt - 1, axis=1)[:, tt - 1]
            mask = (adc <= kth[:, None]) & np.isfinite(adc)
            ri, ci = np.nonzero(mask)
            cand_r.append(ri)
            cand_c.append(ci + c0)
            cand_v.append(adc[ri, ci])
        rr = np.concatenate(cand_r)
        cc = np.concatenate(cand_c)
        vv = np.concatenate(cand_v)
        order = np.lexsort([ids_all[cc], vv, rr])
        r_s = rr[order]
        first = np.concatenate(([True], r_s[1:] != r_s[:-1]))
        starts = np.flatnonzero(first)
        pos = np.arange(len(r_s)) - starts[np.cumsum(first) - 1]
        sel = order[pos < take]
        return pa.table(
            {
                "query_id": pa.array(ids[rr[sel]]),
                "vec_id": pa.array(ids_all[cc[sel]]),
                "cosine": pa.array(1.0 - vv[sel] / 2.0),
            }
        )

    return embeddings.map_batches(fn, batch_format="pyarrow", batch_size=512)
