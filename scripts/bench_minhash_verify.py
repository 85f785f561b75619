#!/usr/bin/env python
"""Micro-bench: minhash exact-verify kernel, per-pair loop (round-2) vs the
batch-wide lexsort merge (round-3). Pure-numpy kernel timing — no Ray session.

Builds a dup-heavy candidate batch (the LSH output shape on a corpus full of
near-duplicate families: many pairs, few unique docs) and times one 4096-pair
verify batch through both formulations, asserting identical jaccard output.

Usage: python scripts/bench_minhash_verify.py [npairs] [ndocs]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from linref_ray.kernels.hashing import shingle_hashes  # noqa: E402

K = 3


def make_batch(npairs: int, ndocs: int, seed: int = 11):
    rng = np.random.Generator(np.random.PCG64(seed))
    words = [f"w{i}" for i in range(500)]
    base = [
        " ".join(rng.choice(words, size=120).tolist()) for _ in range(ndocs)
    ]
    texts = []
    for i, b in enumerate(base):
        toks = b.split()
        j = int(rng.integers(0, len(toks)))
        toks[j] = f"mut{i}"
        texts.append(" ".join(toks))
    ia = rng.integers(0, ndocs, size=npairs)
    ib = (ia + 1 + rng.integers(0, ndocs - 1, size=npairs)) % ndocs
    lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
    return lo, hi, texts


_MERSENNE = (1 << 61) - 1


def _hash_tokens_u64_r2(tokens):
    """FROZEN round-2 token hasher (boolean-mask column loop) so the bench
    compares against what actually shipped in round 2, not today's core."""
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    bs = [t.encode("utf-8", "ignore") for t in tokens]
    lens = np.fromiter(map(len, bs), np.int64, n)
    maxlen = int(lens.max()) if n else 0
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    if maxlen == 0:
        return h
    flat = np.frombuffer(b"".join(bs), dtype=np.uint8)
    arr = np.zeros((n, maxlen), dtype=np.uint8)
    off = np.concatenate([[0], np.cumsum(lens)])
    rows = np.repeat(np.arange(n), lens)
    cols = np.arange(len(flat)) - np.repeat(off[:-1], lens)
    arr[rows, cols] = flat
    fnv = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            active = lens > j
            h[active] = (h[active] ^ arr[active, j].astype(np.uint64)) * fnv
    return h


def _shingle_hashes_r2(text, k):
    """FROZEN round-2 per-doc shingler."""
    words = text.lower().split()
    if len(words) < k:
        words = words + [""] * (k - len(words))
    wh = _hash_tokens_u64_r2(words).astype(np.int64) % _MERSENNE
    n = len(wh) - k + 1
    acc = np.zeros(n, dtype=np.int64)
    for j in range(k):
        acc = (acc * 1000003 + wh[j : j + n]) % _MERSENNE
    return np.unique(acc.astype(np.uint64))


def verify_loop(ia, ib, ta, tb):
    """The round-2 formulation: per-doc scalar shingling + per-pair Python
    loop over np.intersect1d — frozen byte-for-byte from the round-2 tree."""
    cache: dict[int, np.ndarray] = {}

    def sh(i, txt):
        if i not in cache:
            cache[i] = _shingle_hashes_r2(txt, K)
        return cache[i]

    jac = np.empty(len(ia))
    for r in range(len(ia)):
        sa, sb = sh(int(ia[r]), ta[r]), sh(int(ib[r]), tb[r])
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        jac[r] = inter / union if union else 0.0
    return jac


def verify_merge(ia, ib, ta, tb):
    """The round-3 formulation (mirrors linref_ray.dedup verify): batched
    shingling + row-wise merge-sort duplicate counting."""
    from linref_ray.kernels.hashing import shingle_hashes_many

    npairs = len(ia)
    all_ids = np.concatenate([ia, ib])
    uniq, inv = np.unique(all_ids, return_inverse=True)
    texts = [None] * len(uniq)
    for r in range(npairs):
        texts[inv[r]] = ta[r]
        texts[inv[npairs + r]] = tb[r]
    _, lens, mat = shingle_hashes_many(texts, K, return_matrix=True)
    da, db = inv[:npairs], inv[npairs:]
    width = mat.shape[1]
    merged = np.concatenate([mat[da], mat[db]], axis=1)
    merged.sort(axis=1)
    dup = (merged[:, 1:] == merged[:, :-1]).sum(axis=1)
    n_sent = 2 * width - lens[da] - lens[db]
    inter = dup - np.maximum(n_sent - 1, 0)
    union = lens[da] + lens[db] - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 0.0)


def main():
    npairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    ndocs = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    ia, ib, texts = make_batch(npairs, ndocs)
    ta = [texts[i] for i in ia]
    tb = [texts[i] for i in ib]
    j1 = verify_loop(ia, ib, ta, tb)
    j2 = verify_merge(ia, ib, ta, tb)
    assert np.allclose(j1, j2), "kernel mismatch"
    reps = 5
    t_loop = min(
        _timed(verify_loop, ia, ib, ta, tb) for _ in range(reps)
    )
    t_merge = min(
        _timed(verify_merge, ia, ib, ta, tb) for _ in range(reps)
    )
    print(
        f"pairs={npairs} docs={ndocs} "
        f"loop={t_loop * 1000:.1f}ms merge={t_merge * 1000:.1f}ms "
        f"speedup={t_loop / t_merge:.1f}x"
    )


def _timed(fn, *args):
    t0 = time.perf_counter()
    fn(*args)
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
