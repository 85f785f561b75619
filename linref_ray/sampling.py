"""Deterministic hash-based sampling and splitting.

Training-data pipelines need samples and train/val/test splits that are a
pure function of a key — the same rows are selected at any parallelism, on
any partitioning, on any cluster size, with no RNG state to coordinate and
exact resumability for free. The bucket function is plain integer
arithmetic, ``((key XOR salt*2654435769) * 2654435761) mod 2**32``
(Knuth multiplicative hashing over a salt-scrambled key), so an ANSI-SQL
oracle can replicate row selection bit-for-bit.

Engine-side addition (no linref counterpart); complements the content-hash
dedup ops in :mod:`linref_ray.dedup`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_K_MULT = 2654435761  # Knuth's 2^32 / phi
_K_SALT = 2654435769  # salt scrambler: XOR'd into the key pre-multiply
_MOD = 2**32


def hash_buckets(keys: np.ndarray, salt: int = 0) -> np.ndarray:
    """Bucket in [0, 2**32) per key. Non-negative integer keys only (the
    SQL-parity contract: uint64 wraparound here equals exact hugeint
    arithmetic mod 2**32 for keys >= 0).

    The multiply wraps mod 2**64; (x mod 2**64) mod 2**32 == x mod 2**32,
    so the wrapped product hashes identically to the exact one.
    """
    k = keys.astype(np.uint64) ^ np.uint64(salt * _K_SALT)
    return (k * np.uint64(_K_MULT)) % np.uint64(_MOD)


def hash_sample(
    ds: ray.data.Dataset,
    fraction: float,
    key_col: str,
    salt: int = 0,
) -> ray.data.Dataset:
    """Deterministic Bernoulli sample: keep a row iff its key's bucket is
    below ``fraction * 2**32``. Different ``salt`` values draw independent
    samples; nested fractions with one salt are contained (a 10% sample is
    a subset of the 25% one), which is what reproducible corpus ablations
    want."""
    if fraction >= 1.0:
        return ds
    thr = np.uint64(int(fraction * _MOD))

    def fn(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = hash_buckets(keys, salt) < thr
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def split_edges(fracs: np.ndarray) -> np.ndarray:
    """Inclusive upper bucket edges for :func:`hash_split` — shared by the
    engine kernel and the SQL oracle so both quantize identically."""
    edges = np.minimum(
        (np.cumsum(fracs) * _MOD).astype(np.uint64), np.uint64(_MOD - 1)
    )
    edges[-1] = np.uint64(_MOD - 1)  # absorb float residue
    return edges


def hash_split(
    ds: ray.data.Dataset,
    splits: tuple[tuple[str, float], ...] = (
        ("train", 0.8), ("val", 0.1), ("test", 0.1)
    ),
    key_col: str = "doc_id",
    salt: int = 0,
    out_col: str = "split",
) -> ray.data.Dataset:
    """Assign every row a split label by hash-bucket range — disjoint and
    exhaustive by construction (the last split absorbs rounding residue),
    stable under any repartitioning. Appends ``out_col`` to the schema."""
    names = [name for name, _ in splits]
    fracs = np.array([f for _, f in splits], dtype=np.float64)
    if not np.isclose(fracs.sum(), 1.0):
        raise ValueError(f"split fractions must sum to 1, got {fracs.sum()}")
    edges = split_edges(fracs)

    def fn(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = hash_buckets(keys, salt)
        idx = np.searchsorted(edges, b, side="left")
        lab = pa.DictionaryArray.from_arrays(
            pa.array(idx.astype(np.int32)), pa.array(names)
        ).cast(pa.string())
        return t.append_column(out_col, lab)

    return ds.map_batches(fn, batch_format="pyarrow")


def sql_bucket_expr(key_col: str, salt: int = 0) -> str:
    """The DuckDB/ANSI expression computing :func:`hash_buckets` for a
    column — exact hugeint arithmetic, bit-equal to the numpy path for
    non-negative keys. Keeps engine and oracle formulas in one place."""
    return (
        f"(cast(xor(cast({key_col} as bigint), {salt * _K_SALT}) as hugeint)"
        f" * {_K_MULT}) % {_MOD}"
    )


def weighted_hash_sample(
    ds: ray.data.Dataset,
    prob_col: str,
    key_col: str,
    salt: int = 0,
) -> ray.data.Dataset:
    """Per-row Bernoulli keep with probability read from ``prob_col``
    (clipped to [0, 1]): keep iff ``bucket(key) < floor(p * 2**32)``.

    The quality-weighted corpus-sampling primitive: score docs (quality,
    dedup confidence, curriculum weight), then thin the corpus with a
    decision that is a pure function of (key, p) — reproducible on any
    cluster shape, no RNG state, and SQL-replicable when ``p`` is."""

    def fn(t: pa.Table) -> pa.Table:
        p = np.clip(
            t[prob_col].to_numpy(zero_copy_only=False).astype(np.float64),
            0.0, 1.0,
        )
        thr = np.floor(p * _MOD).astype(np.uint64)
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(hash_buckets(keys, salt) < thr))

    return ds.map_batches(fn, batch_format="pyarrow")


def stratified_sample(
    ds: ray.data.Dataset,
    strata_col: str,
    fractions: dict,
    key_col: str,
    default: float = 0.0,
    salt: int = 0,
) -> ray.data.Dataset:
    """Per-stratum deterministic sampling: each row keeps with its
    stratum's fraction (``default`` for unlisted strata). Rebalancing
    primitive — e.g. downsample over-represented languages/domains to
    target proportions. Same bucket function as :func:`hash_sample`, so
    per-stratum nesting and SQL parity carry over."""
    # thr = floor(f * 2**32), and f >= 1 -> 2**32 itself (keeps every
    # bucket) — uint64 holds it, so no special case
    thr_map = {
        k: np.uint64(min(int(f * _MOD), _MOD)) for k, f in fractions.items()
    }
    thr_default = np.uint64(min(int(default * _MOD), _MOD))

    def fn(t: pa.Table) -> pa.Table:
        strata = t[strata_col].to_pylist()
        thr = np.array(
            [thr_map.get(s, thr_default) for s in strata], dtype=np.uint64
        )
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(hash_buckets(keys, salt) < thr))

    return ds.map_batches(fn, batch_format="pyarrow")


def pack_sequences(
    docs: ray.data.Dataset,
    seq_len: int = 2048,
    bucket_size: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Concat-and-chunk sequence packing (GPT-style pretraining layout):
    documents concatenated in ``id`` order, the token stream chunked into
    fixed ``seq_len`` sequences. Returns each doc's deterministic placement
    ``(id, n_tokens, tok_offset, first_seq, last_seq)`` — everything a
    sharded tokenizer-writer needs to emit its slice independently.

    The global token offset is a DISTRIBUTED PREFIX SCAN: docs bucket by
    ``id // bucket_size``; pass 1 streams per-bucket token sums (one row
    per bucket — at 1e9 docs / 4096 that's a 244k-row driver cumsum);
    the exclusive bucket bases broadcast via ``ray.put``; pass 2 is one
    ``groupby(bucket)`` kernel that sorts its bucket locally and adds the
    base. No global sort, no all-to-all beyond the bucket groupby; text
    never shuffles (token counts are computed per batch, and pass 2 moves
    ``(id, n_tokens)`` int rows only). Token = nonempty whitespace word,
    identical to the SQL oracle.
    """
    import pyarrow.compute as pc
    import ray as _ray

    L = int(seq_len)
    B = int(bucket_size)

    def counts(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        toks = pc.split_pattern(t[text_col], " ")
        total = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = pc.list_flatten(toks)
        emptyc = np.bincount(
            pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)[
                pc.equal(flat, "").to_numpy(zero_copy_only=False)
            ],
            minlength=len(ids),
        )
        n_tok = total - emptyc
        return pa.table(
            {
                id_col: pa.array(ids),
                "n_tokens": pa.array(n_tok),
                "__bkt": pa.array(ids // B),
            }
        )

    per_doc = docs.map_batches(
        counts, batch_format="pyarrow", batch_size=1024
    ).materialize()  # consumed twice: bucket sums + placement pass

    bkt_tbl = pa.concat_tables(
        _ray.get(
            per_doc.groupby("__bkt").sum("n_tokens").to_arrow_refs()
        ),
        promote_options="default",
    )
    b_ids = bkt_tbl["__bkt"].to_numpy(zero_copy_only=False)
    b_sum = bkt_tbl["sum(n_tokens)"].to_numpy(zero_copy_only=False)
    order = np.argsort(b_ids)
    base = dict(
        zip(
            b_ids[order].tolist(),
            np.concatenate(([0], np.cumsum(b_sum[order])[:-1])).tolist(),
        )
    )
    base_ref = _ray.put(base)

    def place(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "tok_offset": pa.array([], pa.int64()),
                "first_seq": pa.array([], pa.int64()),
                "last_seq": pa.array([], pa.int64()),
            }
        )
        if len(t) == 0:
            return empty
        bases = _ray.get(base_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids_s, n_s = ids[order], n[order]
        off = bases[int(ids_s[0] // B)] + np.concatenate(
            ([0], np.cumsum(n_s)[:-1])
        )
        return pa.table(
            {
                id_col: pa.array(ids_s),
                "n_tokens": pa.array(n_s),
                "tok_offset": pa.array(off),
                "first_seq": pa.array(off // L),
                "last_seq": pa.array((off + np.maximum(n_s, 1) - 1) // L),
            }
        )

    return per_doc.groupby("__bkt").map_groups(place, batch_format="pyarrow")


def cap_per_source(
    ds: ray.data.Dataset,
    source_col: str = "source",
    order_col: str = "n_chars",
    cap: int = 5,
    tie_col: str | None = "doc_id",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Per-source document cap — the per-domain cap of web-crawl curation
    (keep the ``cap`` "best" docs of every source, best-first by
    ``order_col`` descending, ``tie_col``-ascending tie-break for a total
    order).

    Thin named façade over :func:`linref_ray.stats.top_k_per_group`: one
    hash shuffle on the source key, then a single vectorized
    factorize→lexsort→run-rank pass per partition — no per-group dispatch,
    so million-domain corpora cost one exchange of the slim
    (id, source, order) projection.
    """
    from linref_ray.stats import top_k_per_group

    return top_k_per_group(
        ds, group_col=source_col, order_col=order_col, k=cap,
        descending=True, tie_col=tie_col, num_partitions=num_partitions,
    )
