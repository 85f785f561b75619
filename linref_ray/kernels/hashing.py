"""Text hashing kernels: MinHash, SimHash, rolling fingerprints, shingles.

Standard public constructions (Broder '97 MinHash, Charikar '02 SimHash,
Rabin-Karp rolling hash) implemented vectorized for per-batch use inside
``map_batches``. These back the dedup and fingerprinting pipelines over the
``documents`` table — capabilities beyond the reference library, required by
the large-scale-training-pipeline part of the brief.
"""

from __future__ import annotations

import numpy as np

_MERSENNE = (1 << 61) - 1


def _hash_tokens_u64(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit FNV-1a hashes of tokens (no PYTHONHASHSEED dependence).

    Vectorized column-wise over a padded byte matrix: the outer loop runs
    max-token-LENGTH times (≈10), not total-bytes times — a per-byte Python
    loop here made MinHash the dedup pipeline's bottleneck (~6 ms/doc).
    Bit-identical to the scalar FNV-1a (asserted by a differential test).
    """
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
    with np.errstate(over="ignore"):  # mod-2^64 wraparound is the hash ring
        for j in range(maxlen):
            active = lens > j
            h[active] = (h[active] ^ arr[active, j].astype(np.uint64)) * fnv
    return h


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Hashes of word k-shingles via a polynomial rolling combination."""
    words = text.lower().split()
    if len(words) < k:
        words = words + [""] * (k - len(words))
    wh = _hash_tokens_u64(words).astype(np.int64) % _MERSENNE
    n = len(wh) - k + 1
    acc = np.zeros(n, dtype=np.int64)
    for j in range(k):
        acc = (acc * 1000003 + wh[j : j + n]) % _MERSENNE
    return np.unique(acc.astype(np.uint64))


def minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) parameters for num_perm universal-hash permutations."""
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature: min over shingles of (a·x + b) mod p, per permutation."""
    if len(shingles) == 0:
        return np.full(len(a), _MERSENNE, dtype=np.int64)
    x = shingles.astype(np.int64) % _MERSENNE
    # (num_perm, n_shingles) — use object->int64 safe modmul via Python ints
    # is too slow; 61-bit modulus keeps products within float-unsafe range, so
    # do the multiply in uint128 chunks via splitting.
    vals = (_modmul(a[:, None], x[None, :]) + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


def _modmul(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """(a*x) mod 2^61-1 without overflow: split BOTH operands into 31-bit
    limbs so every intermediate product stays < 2^62 (a single-operand split
    lets hi*x reach ~2^91 and silently wrap mod 2^64).

    a = a_hi*2^31 + a_lo, x = x_hi*2^31 + x_lo =>
    a*x = a_hi*x_hi*2^62 + (a_hi*x_lo + a_lo*x_hi)*2^31 + a_lo*x_lo,
    reduced with 2^61 === 1 (mod p).
    """
    P = np.uint64(_MERSENNE)
    a = a.astype(np.uint64)
    x = x.astype(np.uint64)
    mask31 = np.uint64(0x7FFFFFFF)
    a_lo, a_hi = a & mask31, a >> np.uint64(31)
    x_lo, x_hi = x & mask31, x >> np.uint64(31)
    hh = (a_hi * x_hi) % P          # operands < 2^30 -> product < 2^60
    mid = (a_hi * x_lo + a_lo * x_hi) % P  # each term < 2^61, sum < 2^62
    ll = (a_lo * x_lo) % P          # < 2^62
    term1 = (hh << np.uint64(1)) % P  # hh*2^62 === hh*2 (mod p)
    # mid*2^31 mod p: mid = m_h*2^30 + m_l => m_h*2^61 + m_l*2^31 === m_h + m_l*2^31
    mask30 = np.uint64((1 << 30) - 1)
    term2 = ((mid >> np.uint64(30)) + ((mid & mask30) << np.uint64(31))) % P
    return ((term1 + term2 + ll) % P).astype(np.int64)


def lsh_bands(sig: np.ndarray, bands: int) -> np.ndarray:
    """Hash each band of a signature to one uint64 bucket key."""
    rows = len(sig) // bands
    out = np.empty(bands, dtype=np.uint64)
    for bi in range(bands):
        h = np.uint64(0xCBF29CE484222325)
        for v in sig[bi * rows : (bi + 1) * rows]:
            h = np.uint64((int(h) ^ (int(v) & 0xFFFFFFFFFFFFFFFF)) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        out[bi] = h
    return out


def simhash(text: str, ngram: int = 3) -> np.uint64:
    """64-bit SimHash over character n-grams."""
    s = " " + text.lower() + " "
    grams = [s[i : i + ngram] for i in range(max(1, len(s) - ngram + 1))]
    hashes = _hash_tokens_u64(grams)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    score = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for bit in np.flatnonzero(score > 0):
        out |= np.uint64(1) << np.uint64(bit)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise Hamming distance between uint64 arrays (popcount via table)."""
    x = (np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64)).view(np.uint8)
    table = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)
    return table[x.reshape(-1, 8)].sum(axis=1)


def rolling_fingerprint(text: str, window: int = 16, keep_mod: int = 8) -> np.ndarray:
    """Winnowing-style document fingerprint: Rabin-Karp rolling hashes of
    byte windows, keeping hashes ≡ 0 (mod keep_mod) — a content-defined
    sample that is robust to local edits."""
    data = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
    n = len(data)
    if n < window:
        data = np.pad(data, (0, window - n))
        n = window
    base = np.uint64(257)
    powers = np.empty(window, dtype=np.uint64)
    powers[0] = 1
    with np.errstate(over="ignore"):  # mod 2^64 wraparound is the hash ring
        for i in range(1, window):
            powers[i] = powers[i - 1] * base
    m = n - window + 1
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(window):
        acc += data[j : j + m].astype(np.uint64) * powers[window - 1 - j]
    kept = acc[acc % np.uint64(keep_mod) == 0]
    return np.unique(kept)
