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

# Padded (ndocs × max_shingles) matrices above this many cells (128 MB of
# uint64) switch to O(total)-memory formulations — a single outlier-long
# doc must not inflate a whole batch's scratch quadratically.
_MATRIX_CELL_CAP = 1 << 24

# simhash bit-count scratch cap (grams per chunk; 64 bytes of scratch each).
_SIMHASH_GRAM_CAP = 1 << 20

# Empty docs hash to the maximum value under every permutation (uint64 max
# viewed as int64), so they never win a min and never bucket together.
_MINHASH_SENTINEL = np.int64(-1)


def _fnv1a_segments(
    flat: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """FNV-1a over CSR byte segments: ``flat[starts[i] : starts[i]+lens[i]]``
    hashes to ``out[i]``. Bit-identical to the scalar FNV-1a.

    Vectorized column-wise with segments SORTED by length descending so the
    per-column active set is a contiguous prefix slice — the boolean-mask
    formulation this replaces went superlinear past ~100k tokens (two masked
    gathers + one masked scatter per column).
    """
    n = len(lens)
    out = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    if n == 0 or len(flat) == 0:
        return out
    fnv = np.uint64(0x100000001B3)
    # Bucket by segment length (a handful of distinct values for words /
    # n-grams): each bucket hashes column-by-column over plain gathers — no
    # argsort, no padded matrix, total work O(total bytes).
    with np.errstate(over="ignore"):  # mod-2^64 wraparound is the hash ring
        for length in np.unique(lens):
            if length == 0:
                continue
            idx = np.flatnonzero(lens == length)
            s = starts[idx]
            h = out[idx]
            for j in range(length):
                h = (h ^ flat[s + j].astype(np.uint64)) * fnv
            out[idx] = h
    return out


def _hash_tokens_u64(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit FNV-1a hashes of tokens (no PYTHONHASHSEED dependence).

    Tokens may contain any bytes (simhash feeds char n-grams with spaces);
    word-only callers use the faster join-encode path in
    :func:`shingle_hashes_many`. Bit-identical to the scalar FNV-1a
    (asserted by a differential test).
    """
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    bs = [t.encode("utf-8", "ignore") for t in tokens]
    lens = np.fromiter(map(len, bs), np.int64, n)
    flat = np.frombuffer(b"".join(bs), dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    return _fnv1a_segments(flat, starts, lens)


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


# ASCII bytes on which str.split() breaks (str.isspace() singles).
_WS_TABLE = np.zeros(256, dtype=bool)
for _b in b"\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f\x20":
    _WS_TABLE[_b] = True
del _b


def _has_multibyte_ws(blob: np.ndarray) -> bool:
    """True if the utf-8 blob contains any whitespace char that encodes to
    more than one byte (U+0085, U+00A0, U+1680, U+2000–200A, U+2028/29/2F,
    U+205F, U+3000) — byte-level splitting would diverge from str.split()."""
    if len(blob) >= 2:
        b0, b1 = blob[:-1], blob[1:]
        if ((b0 == 0xC2) & ((b1 == 0x85) | (b1 == 0xA0))).any():
            return True
    if len(blob) >= 3:
        b0, b1, b2 = blob[:-2], blob[1:-1], blob[2:]
        tri = (
            ((b0 == 0xE1) & (b1 == 0x9A) & (b2 == 0x80))
            | (
                (b0 == 0xE2)
                & (b1 == 0x80)
                & ((b2 <= 0x8A) | (b2 == 0xA8) | (b2 == 0xA9) | (b2 == 0xAF))
            )
            | ((b0 == 0xE2) & (b1 == 0x81) & (b2 == 0x9F))
            | ((b0 == 0xE3) & (b1 == 0x80) & (b2 == 0x80))
        )
        if tri.any():
            return True
    return False


def _tokenize_batch(
    texts: list[str], k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Batch word tokenization: ``(blob, word_starts, word_lens, words_per_doc)``
    with words in doc order and short docs padded to ``k`` empty words —
    word-for-word identical to per-doc ``text.lower().split()``.

    Fast path: one ``lower()`` per doc (full unicode), ONE NUL-joined utf-8
    encode, then vectorized byte scanning (ASCII whitespace only splits at
    single bytes; utf-8 continuation bytes are >= 0x80 so no false splits
    inside multi-byte chars). Falls back to the per-doc Python split for
    the rare batch containing NUL chars or multi-byte unicode whitespace.
    """
    nd = len(texts)
    lowered = [t.lower() for t in texts]
    blob = np.frombuffer(
        "\x00".join(lowered).encode("utf-8", "ignore"), dtype=np.uint8
    )
    nul_pos = np.flatnonzero(blob == 0)
    if len(nul_pos) != nd - 1 or (
        int(blob.max(initial=0)) >= 0x80 and _has_multibyte_ws(blob)
    ):
        # Slow path: exact str.split() semantics via Python; per-word
        # encode because words may themselves contain NUL here.
        flat_words: list[str] = []
        wcp = np.empty(nd, dtype=np.int64)
        for i, t in enumerate(lowered):
            w = t.split()
            if len(w) < k:
                w = w + [""] * (k - len(w))
            wcp[i] = len(w)
            flat_words.extend(w)
        bs = [w.encode("utf-8", "ignore") for w in flat_words]
        w_lens = np.fromiter(map(len, bs), np.int64, len(bs))
        blob = np.frombuffer(b"".join(bs), dtype=np.uint8)
        w_starts = np.concatenate(([0], np.cumsum(w_lens[:-1])))
        return blob, w_starts, w_lens, wcp
    is_sep = _WS_TABLE[blob]
    is_sep[nul_pos] = True
    is_word = ~is_sep
    prev_sep = np.concatenate(([True], is_sep[:-1]))
    next_sep = np.concatenate((is_sep[1:], [True]))
    w_starts = np.flatnonzero(is_word & prev_sep)
    w_lens = (np.flatnonzero(is_word & next_sep) + 1) - w_starts
    w_doc = np.searchsorted(nul_pos, w_starts)
    wc = np.bincount(w_doc, minlength=nd)
    if (wc < k).any():
        # Append zero-length pad words to short docs (stable sort keeps
        # real words first within each doc, matching the scalar path).
        pad = np.maximum(k - wc, 0)
        pad_doc = np.repeat(np.arange(nd), pad)
        w_doc2 = np.concatenate([w_doc, pad_doc])
        w_starts = np.concatenate(
            [w_starts, np.zeros(len(pad_doc), np.int64)]
        )
        w_lens = np.concatenate([w_lens, np.zeros(len(pad_doc), np.int64)])
        order = np.argsort(w_doc2, kind="stable")
        w_starts, w_lens = w_starts[order], w_lens[order]
        wc = wc + pad
    return blob, w_starts, w_lens, wc.astype(np.int64)


def shingle_hashes_many(
    texts: list[str], k: int = 5, return_matrix: bool = False
):
    """Sorted-unique shingle hashes for MANY docs in one vectorized pass.

    Returns ``(all_h, lens)``: per-doc sorted-unique hashes concatenated in
    doc order plus per-doc counts (a CSR layout). Bit-identical per doc to
    :func:`shingle_hashes` (differential-tested) — the per-call numpy
    overhead of the scalar path made unique-doc shingling the minhash
    verify stage's real bottleneck, not the pair intersection.

    With ``return_matrix=True`` additionally returns the padded
    ``(ndocs, max_shingles)`` uint64 matrix whose row i holds doc i's
    sorted-unique hashes followed by uint64-max sentinels — the zero-copy
    input for row-wise pair intersection counting.
    """
    nd = len(texts)
    if nd == 0:
        if return_matrix:
            return (
                np.empty(0, np.uint64),
                np.zeros(0, np.int64),
                np.empty((0, 0), np.uint64),
            )
        return np.empty(0, np.uint64), np.zeros(0, np.int64)
    blob, w_starts, w_lens, wcp = _tokenize_batch(texts, k)
    wh = (
        _fnv1a_segments(blob, w_starts, w_lens).astype(np.int64) % _MERSENNE
    )
    n_sh = wcp - k + 1
    starts = np.concatenate(([0], np.cumsum(wcp[:-1])))
    total = int(n_sh.sum())
    doc_idx = np.repeat(np.arange(nd), n_sh)
    seg_off = np.concatenate(([0], np.cumsum(n_sh)[:-1]))
    within = np.arange(total) - seg_off[doc_idx]
    pos = starts[doc_idx] + within
    acc = np.zeros(total, dtype=np.int64)
    # Same elementwise int64 ops (incl. wraparound) as the scalar path.
    for j in range(k):
        acc = (acc * 1000003 + wh[pos + j]) % _MERSENNE
    # Per-doc sorted-unique via ONE row-wise sort of a padded matrix
    # (hashes < 2^61, so the uint64 max sentinel pads cleanly past every
    # real value) — much cheaper than a lexsort over (doc, hash). The
    # matrix is (ndocs, MAX shingles): one outlier-long doc in a batch
    # would inflate it quadratically, so past the cell cap we fall back
    # to a lexsort (O(total) memory; callers get mat=None and must use a
    # CSR pair algorithm).
    sent = np.uint64(0xFFFFFFFFFFFFFFFF)
    max_sh = int(n_sh.max())
    if nd * max_sh > _MATRIX_CELL_CAP:
        u = acc.astype(np.uint64)
        order = np.lexsort((u, doc_idx))
        d_s, u_s = doc_idx[order], u[order]
        keep1 = np.concatenate(
            ([True], (d_s[1:] != d_s[:-1]) | (u_s[1:] != u_s[:-1]))
        )
        flat = u_s[keep1]
        lens_out = np.bincount(d_s[keep1], minlength=nd).astype(np.int64)
        if return_matrix:
            return flat, lens_out, None
        return flat, lens_out
    mat = np.full((nd, max_sh), sent, dtype=np.uint64)
    mat[doc_idx, within] = acc.astype(np.uint64)
    mat.sort(axis=1)
    keep = mat != sent
    keep[:, 1:] &= mat[:, 1:] != mat[:, :-1]
    lens_out = keep.sum(axis=1).astype(np.int64)
    flat = mat[keep]  # BEFORE any mutation — keep indexes this layout
    if return_matrix:
        # Duplicate (non-first) occurrences are re-padded to the sentinel
        # and re-sorted so each row is its doc's sorted-unique set + pad.
        mat[~keep] = sent
        mat.sort(axis=1)
        return flat, lens_out, mat
    return flat, lens_out


def minhash_signature_many(
    all_h: np.ndarray, lens: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """``(ndocs, num_perm)`` MinHash signatures from CSR shingle hashes.

    Row-for-row equal to :func:`minhash_signature` per doc (empty docs get
    the sentinel-p row). Permutations are processed in chunks so scratch
    stays ≈16 MB — large fresh allocations page-fault on this host.
    """
    nd = len(lens)
    num_perm = len(a)
    out = np.full((nd, num_perm), _MINHASH_SENTINEL, dtype=np.int64)
    x = all_h.astype(np.uint64)
    total = len(x)
    if nd == 0 or total == 0:
        return out
    au = a.astype(np.uint64)
    bu = b.astype(np.uint64)
    starts = np.concatenate(([0], np.cumsum(lens[:-1])))
    # Clipped starts keep reduceat in bounds when trailing docs are empty;
    # zero-length segments produce garbage rows that nz masks out.
    idx = np.minimum(starts, total - 1)
    nz = lens > 0
    chunk = max(1, (1 << 20) // max(total, 1))
    with np.errstate(over="ignore"):
        for p0 in range(0, num_perm, chunk):
            p1 = min(p0 + chunk, num_perm)
            vals = au[p0:p1, None] * x[None, :] + bu[p0:p1, None]
            mins = np.minimum.reduceat(vals, idx, axis=1)
            out[nz, p0:p1] = mins[:, nz].T.astype(np.int64)
    return out


def minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) parameters for ``num_perm`` multiply-shift permutations
    (Dietzfelbinger et al.): odd 64-bit multipliers + 64-bit offsets."""
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64) * np.uint64(
        2
    ) + np.uint64(1)
    b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
    return a.astype(np.int64), b.astype(np.int64)


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature: min over shingles of the multiply-shift
    permutation ``a·x + b mod 2^64`` (odd ``a`` makes it a bijection on
    the 64-bit ring — order-scrambling is all min-wise hashing needs, at
    one multiply+add per (perm, shingle) instead of Mersenne-prime limb
    arithmetic)."""
    if len(shingles) == 0:
        return np.full(len(a), _MINHASH_SENTINEL, dtype=np.int64)
    x = shingles.astype(np.uint64)
    with np.errstate(over="ignore"):
        vals = (
            a.astype(np.uint64)[:, None] * x[None, :]
            + b.astype(np.uint64)[:, None]
        )
    return vals.min(axis=1).view(np.int64)


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


def lsh_bands_many(sigs: np.ndarray, bands: int) -> np.ndarray:
    """Band bucket keys for MANY signatures at once: ``(ndocs, bands)``
    uint64. Bit-identical to :func:`lsh_bands` per row (same mod-2^64 FNV
    ring), with the loop over band ROWS (≈4) instead of per-value Python.
    """
    nd, num_perm = sigs.shape
    rows = num_perm // bands
    v = sigs.astype(np.uint64).reshape(nd, bands, rows)
    h = np.full((nd, bands), 0xCBF29CE484222325, dtype=np.uint64)
    fnv = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for r in range(rows):
            h = (h ^ v[:, :, r]) * fnv
    return h


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


def simhash_many(texts: list[str], ngram: int = 3) -> np.ndarray:
    """Batched :func:`simhash`: one vectorized pass for ASCII docs (char
    n-gram windows == byte windows), scalar fallback per non-ASCII / NUL /
    shorter-than-ngram doc. Bit-identical per doc (differential-tested).
    """
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    padded = [" " + t.lower() + " " for t in texts]
    blob = np.frombuffer(
        "\x00".join(padded).encode("utf-8", "ignore"), dtype=np.uint8
    )
    nul_pos = np.flatnonzero(blob == 0)
    doc_lens = (
        np.diff(np.concatenate(([-1], nul_pos, [len(blob)]))) - 1
        if len(nul_pos) == n - 1
        else None
    )
    slow_docs: np.ndarray
    if doc_lens is None:
        slow_docs = np.arange(n)  # some text contains NUL — all scalar
    else:
        doc_starts = np.concatenate(([0], nul_pos + 1))
        nonascii = np.zeros(n, dtype=bool)
        if int(blob.max(initial=0)) >= 0x80:
            pref = np.concatenate(([0], np.cumsum(blob >= 0x80)))
            nonascii = (
                pref[doc_starts + doc_lens] - pref[doc_starts]
            ) > 0
        # Padded length is len(text)+2 >= ngram needed for the fast path.
        slow_docs = np.flatnonzero(nonascii | (doc_lens < ngram))
    for d in slow_docs:
        out[d] = simhash(texts[d], ngram)
    if doc_lens is None or len(slow_docs) == n:
        return out
    fast = np.ones(n, dtype=bool)
    fast[slow_docs] = False
    all_fast = np.flatnonzero(fast)
    shifts = np.arange(64, dtype=np.uint64)
    fnv = np.uint64(0x100000001B3)
    # Chunk over docs so the (grams, 64) bit matrix stays ~64 MB — one
    # batch of long docs must not allocate a page-fault-sized temporary.
    all_m = doc_lens[all_fast] - ngram + 1
    cum = np.cumsum(all_m)
    gram_cap = _SIMHASH_GRAM_CAP
    c0 = 0
    while c0 < len(all_fast):
        base_g = cum[c0 - 1] if c0 else 0
        c1 = int(np.searchsorted(cum, base_g + gram_cap)) + 1
        c1 = min(max(c1, c0 + 1), len(all_fast))
        fast_ids = all_fast[c0:c1]
        c0 = c1
        # Gram windows fully inside each fast doc, gathered with the CSR
        # multi-arange (no per-doc Python).
        m_per = doc_lens[fast_ids] - ngram + 1
        total = int(m_per.sum())
        seg_idx = np.repeat(np.arange(len(fast_ids)), m_per)
        seg_off = np.concatenate(([0], np.cumsum(m_per)[:-1]))
        within = np.arange(total) - seg_off[seg_idx]
        g_pos = doc_starts[fast_ids][seg_idx] + within
        h = np.full(total, 0xCBF29CE484222325, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(ngram):
                h = (h ^ blob[g_pos + j].astype(np.uint64)) * fnv
        bits = (
            (h[:, None] >> shifts[None, :]) & np.uint64(1)
        ).astype(np.int8)
        counts = np.add.reduceat(bits, seg_off, axis=0)
        score = 2 * counts.astype(np.int64) - m_per[:, None]
        out[fast_ids] = (
            (score > 0).astype(np.uint64) << shifts[None, :]
        ).sum(axis=1, dtype=np.uint64)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise Hamming distance between uint64 arrays (popcount via table)."""
    x = (np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64)).view(np.uint8)
    table = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)
    return table[x.reshape(-1, 8)].sum(axis=1)


def rolling_fingerprints_many(
    texts: list[str], window: int = 16, keep_mod: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """Batched :func:`rolling_fingerprint`: per-doc sorted-unique kept
    hashes as a ``(flat, lens)`` CSR pair, bit-identical per doc.

    One NUL-joined byte blob, window hashes via the CSR multi-arange;
    docs shorter than ``window`` (zero-padded by the scalar spec) or
    containing NUL fall back to the scalar kernel individually.
    """
    n = len(texts)
    if n == 0:
        return np.empty(0, np.int64), np.zeros(0, np.int64)
    blob = np.frombuffer(
        "\x00".join(texts).encode("utf-8", "ignore"), dtype=np.uint8
    )
    nul_pos = np.flatnonzero(blob == 0)
    per_doc: list[np.ndarray | None] = [None] * n
    if len(nul_pos) != n - 1:
        fast_ids = np.empty(0, dtype=np.int64)
    else:
        doc_starts = np.concatenate(([0], nul_pos + 1))
        doc_lens = (
            np.diff(np.concatenate(([-1], nul_pos, [len(blob)]))) - 1
        )
        fast_ids = np.flatnonzero(doc_lens >= window)
    slow = (
        np.setdiff1d(np.arange(n), fast_ids) if len(fast_ids) < n
        else np.empty(0, np.int64)
    )
    for d in slow:
        per_doc[d] = rolling_fingerprint(
            texts[d], window=window, keep_mod=keep_mod
        ).astype(np.int64)
    if len(fast_ids):
        base = np.uint64(257)
        powers = np.empty(window, dtype=np.uint64)
        powers[0] = 1
        with np.errstate(over="ignore"):
            for i in range(1, window):
                powers[i] = powers[i - 1] * base
            m_per = doc_lens[fast_ids] - window + 1
            total = int(m_per.sum())
            seg_idx = np.repeat(np.arange(len(fast_ids)), m_per)
            seg_off = np.concatenate(([0], np.cumsum(m_per)[:-1]))
            within = np.arange(total) - seg_off[seg_idx]
            pos = doc_starts[fast_ids][seg_idx] + within
            acc = np.zeros(total, dtype=np.uint64)
            for j in range(window):
                acc += blob[pos + j].astype(np.uint64) * powers[window - 1 - j]
        keep = acc % np.uint64(keep_mod) == 0
        k_doc, k_val = seg_idx[keep], acc[keep]
        order = np.lexsort((k_val, k_doc))
        d_s, v_s = k_doc[order], k_val[order]
        uniq = np.concatenate(
            ([True], (d_s[1:] != d_s[:-1]) | (v_s[1:] != v_s[:-1]))
        ) if len(d_s) else np.zeros(0, bool)
        d_u, v_u = d_s[uniq], v_s[uniq].astype(np.int64)
        cnt = np.bincount(d_u, minlength=len(fast_ids))
        offs = np.concatenate(([0], np.cumsum(cnt)))
        for i, d in enumerate(fast_ids):
            per_doc[d] = v_u[offs[i] : offs[i + 1]]
    lens = np.array([len(p) for p in per_doc], dtype=np.int64)
    flat = (
        np.concatenate(per_doc) if lens.sum() else np.empty(0, np.int64)
    )
    return flat, lens


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
