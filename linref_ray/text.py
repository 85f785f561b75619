"""Text analysis stages: token stats, quality scoring, language ID,
fingerprinting (training-data pipeline ops).

All vectorized ``map_batches`` transforms; the language-ID stage is an actor
pool (stopword tables + compiled regexes built once per actor).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def token_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_chars, n_tokens) — n_tokens counts single-space-separated
    words exactly like the SQL oracle formula (length(trim) - length(replace)
    + 1) so the two are bit-identical."""

    def fn(t: pa.Table) -> pa.Table:
        text = t["text"]
        trimmed = pc.utf8_trim(text, " ")
        n_chars = pc.utf8_length(text)
        without = pc.replace_substring(trimmed, " ", "")
        n_tokens = pc.add(
            pc.subtract(pc.utf8_length(trimmed), pc.utf8_length(without)), 1
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pc.cast(n_chars, pa.int64()),
                "n_tokens": pc.cast(n_tokens, pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


# GPT-2-style pre-tokenizer shape (letter runs / single digits / punct),
# deliberately lookahead-free so Python re and RE2 (DuckDB) agree exactly.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_token_counts(
    docs: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """(id, n_bpe_tokens) under the BPE-ish pre-tokenizer split — the
    "token counting (whitespace + a BPE-ish regex)" training-pipeline op;
    :func:`token_stats` is the whitespace half."""
    import re

    pat = re.compile(BPE_ISH_PATTERN)

    def fn(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        counts = np.fromiter(
            (len(pat.findall(s)) for s in texts), np.int64, len(texts)
        )
        return pa.table(
            {id_col: t[id_col], "n_bpe_tokens": pa.array(counts)}
        )

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=2048)


_STOPWORDS = (
    "the", "and", "of", "a", "to", "in", "is", "it", "that",
    "for", "on", "as", "with",
)


def _quality_features(texts: list[str]) -> dict[str, np.ndarray] | None:
    """Vectorized quality features over a whole batch: one utf-32 decode,
    then char-class masks + run detection + per-doc prefix sums — no
    per-char or per-word Python. Char classes are the ASCII RE2 classes of
    the reference SQL spec (``[A-Za-z]+`` words, ``[\\w\\s]`` / ``[A-Z]``
    ratios). Word identity uses 64-bit FNV hashes (collision odds are
    ~n²/2⁶⁴ — negligible). Returns None if a text contains NUL (the
    batch separator) — caller falls back to the scalar path.
    """
    from linref_ray.kernels.hashing import _fnv1a_segments, _hash_tokens_u64

    n = len(texts)
    try:
        cp = np.frombuffer(
            "\x00".join(texts).encode("utf-32-le"), dtype=np.uint32
        )
    except UnicodeEncodeError:
        return None  # lone surrogates — scalar path handles them
    sep_pos = np.flatnonzero(cp == 0)
    if len(sep_pos) != n - 1:
        return None
    bounds = np.concatenate((sep_pos, [len(cp)]))
    doc_starts = np.concatenate(([0], sep_pos + 1))
    n_chars = bounds - doc_starts
    lower32 = cp | np.uint32(32)
    is_alpha = (lower32 >= 97) & (lower32 <= 122)
    is_upper = (cp >= 65) & (cp <= 90)
    is_word_ch = is_alpha | ((cp >= 48) & (cp <= 57)) | (cp == 95)
    is_space = (cp == 32) | ((cp >= 9) & (cp <= 13))
    is_punct = ~(is_word_ch | is_space) & (cp != 0)

    def per_doc(mask: np.ndarray) -> np.ndarray:
        pref = np.concatenate(([0], np.cumsum(mask)))
        return pref[bounds] - pref[doc_starts]

    denom_c = np.maximum(n_chars, 1).astype(np.float64)
    # Word runs of [A-Za-z]+ (separators are never alpha, so runs cannot
    # cross doc boundaries).
    prev = np.concatenate(([False], is_alpha[:-1]))
    nxt = np.concatenate((is_alpha[1:], [False]))
    ws = np.flatnonzero(is_alpha & ~prev)
    we = np.flatnonzero(is_alpha & ~nxt)
    w_len = we - ws + 1
    w_doc = np.searchsorted(sep_pos, ws)
    n_words = np.bincount(w_doc, minlength=n)
    denom_w = np.maximum(n_words, 1).astype(np.float64)
    sum_wlen = np.bincount(w_doc, weights=w_len, minlength=n)
    # Word hashes over the gathered alpha chars (runs stay contiguous).
    alpha_rank = np.cumsum(is_alpha)
    starts_flat = (alpha_rank[ws] - 1) if len(ws) else np.empty(0, np.int64)
    flat_cs = cp[is_alpha].astype(np.uint8)
    flat_lo = (lower32[is_alpha]).astype(np.uint8)
    h_cs = _fnv1a_segments(flat_cs, starts_flat, w_len)
    h_lo = _fnv1a_segments(flat_lo, starts_flat, w_len)
    stop_h = _hash_tokens_u64(list(_STOPWORDS))
    n_stop = np.bincount(
        w_doc, weights=np.isin(h_lo, stop_h), minlength=n
    )
    order = np.lexsort((h_cs, w_doc))
    d_s, h_s = w_doc[order], h_cs[order]
    uniq = (
        np.concatenate(
            ([True], (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1]))
        )
        if len(d_s)
        else np.zeros(0, bool)
    )
    n_dist = np.bincount(d_s[uniq], minlength=n)
    return {
        "n_chars": n_chars.astype(np.int64),
        "mean_word_len": np.where(n_words > 0, sum_wlen / denom_w, 0.0),
        "punct_ratio": per_doc(is_punct) / denom_c,
        "upper_ratio": per_doc(is_upper) / denom_c,
        "stop_ratio": n_stop / denom_w,
        "rep_ratio": 1.0 - n_dist / denom_w,
    }


def quality_scores(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Heuristic quality features per doc: length, mean word length,
    punctuation ratio, uppercase ratio, stopword ratio, repetition ratio.
    Fully vectorized (see :func:`_quality_features`); a rare batch
    containing NUL chars falls back to a per-doc scalar path with the
    same ASCII-class semantics."""
    import re

    word_re = re.compile(r"[A-Za-z]+")
    punct_re = re.compile(r"[^0-9A-Za-z_ \t\n\r\f\v]")
    upper_re = re.compile(r"[A-Z]")
    stop = set(_STOPWORDS)

    def scalar(texts: list[str]) -> dict[str, np.ndarray]:
        n = len(texts)
        out = {
            "n_chars": np.empty(n, np.int64),
            "mean_word_len": np.empty(n),
            "punct_ratio": np.empty(n),
            "upper_ratio": np.empty(n),
            "stop_ratio": np.empty(n),
            "rep_ratio": np.empty(n),
        }
        for i, s in enumerate(texts):
            words = word_re.findall(s)
            nw = max(len(words), 1)
            out["n_chars"][i] = len(s)
            out["mean_word_len"][i] = (
                sum(map(len, words)) / nw if words else 0.0
            )
            out["punct_ratio"][i] = len(punct_re.findall(s)) / max(len(s), 1)
            out["upper_ratio"][i] = len(upper_re.findall(s)) / max(len(s), 1)
            out["stop_ratio"][i] = sum(w.lower() in stop for w in words) / nw
            out["rep_ratio"][i] = 1.0 - len(set(words)) / nw
        return out

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        feats = _quality_features(texts)
        if feats is None:
            feats = scalar(texts)
        cols = {"doc_id": t["doc_id"]}
        cols.update({k: pa.array(v) for k, v in feats.items()})
        return pa.table(cols)

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=1024)


def normalize_text(
    docs: ray.data.Dataset,
    text_col: str = "text",
    out_col: str = "norm_text",
    lowercase: bool = False,
) -> ray.data.Dataset:
    """Canonical text cleanup for dedup/tokenizer front-ends: unicode NFC
    composition, ASCII-whitespace-run collapse to single spaces, and
    edge-space trim (optionally lowercase). Bit-identical to the SQL
    ``trim(regexp_replace(nfc_normalize(text), '\\s+', ' ', 'g'))``
    (both sides run RE2 with ASCII ``\\s``).

    Collapse/trim/lower are Arrow kernels. NFC composition is NOT
    delegated to ``pc.utf8_normalize`` — pyarrow 16.1's NFC leaves
    combining marks decomposed (a+U+0301 stays two codepoints), diverging
    from DuckDB/CPython — so batches containing non-ASCII rows route
    those rows through ``unicodedata.normalize`` (one C call per string;
    ASCII rows are NFC-invariant and skip it)."""
    import unicodedata

    def fn(t: pa.Table) -> pa.Table:
        x = t[text_col]
        # non-ASCII detection: utf8 byte length != codepoint length
        if pc.any(
            pc.not_equal(pc.binary_length(x), pc.utf8_length(x))
        ).as_py():
            x = pa.array(
                [
                    s if s is None or s.isascii()
                    else unicodedata.normalize("NFC", s)
                    for s in x.to_pylist()
                ],
                pa.string(),
            )
        x = pc.replace_substring_regex(x, r"\s+", " ")
        x = pc.utf8_trim(x, " ")
        if lowercase:
            x = pc.utf8_lower(x)
        cols = {c: t[c] for c in t.column_names if c != text_col}
        cols[out_col] = x
        return pa.table(cols)

    return docs.map_batches(fn, batch_format="pyarrow")


def _repetition_features(texts: list[str]) -> dict[str, np.ndarray] | None:
    """Vectorized Gopher-style repetition signals (Rae et al. 2021, public)
    over a whole batch: one utf-32 decode, newline-run line segmentation,
    FNV line hashes for duplicate detection, and word-2-gram top counts —
    no per-line or per-word Python. Returns None if a text contains NUL
    (the batch separator) — caller falls back to the scalar path.

    Definitions (mirrored exactly by the SQL oracle):
    lines = newline-split, empties dropped; a line is "duplicate" if its
    exact text occurs >1× within the doc; char fractions are over the sum
    of line lengths; words are ``[A-Za-z]+`` runs (case-sensitive); the
    top-2-gram fraction is max 2-gram count / total 2-grams.
    """
    from linref_ray.kernels.hashing import _fnv1a_segments

    n = len(texts)
    try:
        cp = np.frombuffer(
            "\x00".join(texts).encode("utf-32-le"), dtype=np.uint32
        )
    except UnicodeEncodeError:
        return None
    sep_pos = np.flatnonzero(cp == 0)
    if len(sep_pos) != n - 1:
        return None
    # --- line spans (runs of non-break chars; empty lines vanish) ---
    brk = (cp == 10) | (cp == 0)
    keep = ~brk
    prev = np.concatenate(([False], keep[:-1]))
    nxt = np.concatenate((keep[1:], [False]))
    ls = np.flatnonzero(keep & ~prev)
    le = np.flatnonzero(keep & ~nxt)
    line_len = le - ls + 1
    line_doc = np.searchsorted(sep_pos, ls)
    n_lines = np.bincount(line_doc, minlength=n).astype(np.int64)
    line_chars = np.bincount(line_doc, weights=line_len, minlength=n)
    # duplicate lines: hash the codepoint bytes of each span
    bv = cp.view(np.uint8)
    h = _fnv1a_segments(bv, ls * 4, line_len * 4)
    order = np.lexsort((h, line_doc))
    d_s, h_s = line_doc[order], h[order]
    starts = np.concatenate(
        ([True], (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1]))
    ) if len(d_s) else np.zeros(0, bool)
    run_id = np.cumsum(starts) - 1
    run_len = np.bincount(run_id, minlength=run_id[-1] + 1 if len(run_id) else 0)
    dup_sorted = run_len[run_id] > 1
    dup = np.zeros(len(ls), bool)
    dup[order] = dup_sorted
    dup_lines = np.bincount(line_doc[dup], minlength=n).astype(np.int64)
    dup_chars = np.bincount(
        line_doc[dup], weights=line_len[dup], minlength=n
    )
    # bullet / ellipsis line shares
    first = cp[ls] if len(ls) else np.empty(0, np.uint32)
    bullet = (first == 45) | (first == 42) | (first == 0x2022)
    ell = (
        (line_len >= 3)
        & (cp[le] == 46)
        & (cp[np.maximum(le - 1, 0)] == 46)
        & (cp[np.maximum(le - 2, 0)] == 46)
    ) if len(ls) else np.zeros(0, bool)
    n_bullet = np.bincount(line_doc[bullet], minlength=n).astype(np.int64)
    n_ell = np.bincount(line_doc[ell], minlength=n).astype(np.int64)
    # --- word 2-grams (alpha runs, exact case) ---
    is_alpha = ((cp | np.uint32(32)) >= 97) & ((cp | np.uint32(32)) <= 122)
    wprev = np.concatenate(([False], is_alpha[:-1]))
    wnxt = np.concatenate((is_alpha[1:], [False]))
    ws = np.flatnonzero(is_alpha & ~wprev)
    we = np.flatnonzero(is_alpha & ~wnxt)
    w_len = we - ws + 1
    w_doc = np.searchsorted(sep_pos, ws)
    alpha_rank = np.cumsum(is_alpha)
    starts_flat = (alpha_rank[ws] - 1) if len(ws) else np.empty(0, np.int64)
    flat_cs = cp[is_alpha].astype(np.uint8)
    h_w = _fnv1a_segments(flat_cs, starts_flat, w_len)
    adj = w_doc[1:] == w_doc[:-1] if len(ws) else np.zeros(0, bool)
    with np.errstate(over="ignore"):
        pair_h = h_w[:-1][adj] * np.uint64(0x9E3779B97F4A7C15) + h_w[1:][adj]
    pair_doc = w_doc[:-1][adj]
    n_2grams = np.bincount(pair_doc, minlength=n).astype(np.int64)
    top_2gram = np.zeros(n, np.int64)
    if len(pair_h):
        po = np.lexsort((pair_h, pair_doc))
        pd_s, ph_s = pair_doc[po], pair_h[po]
        pstarts = np.concatenate(
            ([True], (pd_s[1:] != pd_s[:-1]) | (ph_s[1:] != ph_s[:-1]))
        )
        prun = np.cumsum(pstarts) - 1
        prun_len = np.bincount(prun)
        np.maximum.at(top_2gram, pd_s[pstarts], prun_len)
    denom_l = np.maximum(n_lines, 1).astype(np.float64)
    denom_c = np.maximum(line_chars, 1)
    return {
        "n_lines": n_lines,
        "frac_dup_lines": dup_lines / denom_l,
        "frac_dup_chars": dup_chars / denom_c,
        "frac_bullet": n_bullet / denom_l,
        "frac_ellipsis": n_ell / denom_l,
        "top_2gram_count": top_2gram,
        "frac_top_2gram": top_2gram / np.maximum(n_2grams, 1),
    }


def repetition_signals(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Gopher-style repetition quality signals per doc: duplicate-line
    fraction (count and character mass), bullet-/ellipsis-line shares, and
    the most-frequent word-2-gram's share of all 2-grams. Fully vectorized
    (:func:`_repetition_features`); a rare NUL-bearing batch falls back to
    a scalar path with identical semantics."""
    import re
    from collections import Counter

    word_re = re.compile(r"[A-Za-z]+")

    def scalar(texts: list[str]) -> dict[str, np.ndarray]:
        n = len(texts)
        out = {
            k: np.zeros(n, np.int64 if k in ("n_lines", "top_2gram_count") else np.float64)
            for k in (
                "n_lines", "frac_dup_lines", "frac_dup_chars", "frac_bullet",
                "frac_ellipsis", "top_2gram_count", "frac_top_2gram",
            )
        }
        for i, s in enumerate(texts):
            lines = [l for l in s.split("\n") if l != ""]
            cnt = Counter(lines)
            nl = max(len(lines), 1)
            nc = max(sum(map(len, lines)), 1)
            out["n_lines"][i] = len(lines)
            out["frac_dup_lines"][i] = (
                sum(c for c in cnt.values() if c > 1) / nl
            )
            out["frac_dup_chars"][i] = (
                sum(c * len(l) for l, c in cnt.items() if c > 1) / nc
            )
            out["frac_bullet"][i] = (
                sum(l[0] in "-*•" for l in lines) / nl
            )
            out["frac_ellipsis"][i] = (
                sum(l.endswith("...") for l in lines) / nl
            )
            words = word_re.findall(s)
            grams = Counter(zip(words, words[1:]))
            top = max(grams.values(), default=0)
            out["top_2gram_count"][i] = top
            out["frac_top_2gram"][i] = top / max(len(words) - 1, 1)
        return out

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        feats = _repetition_features(texts)
        if feats is None:
            feats = scalar(texts)
        cols = {"doc_id": t["doc_id"]}
        cols.update({k: pa.array(v) for k, v in feats.items()})
        return pa.table(cols)

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=1024)


_LANG_MARKERS = {
    # Distinctive function words / characters per language (public knowledge).
    "en": {"the", "and", "of", "is", "that", "with", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit"},
    "fr": {"le", "la", "les", "et", "est", "dans", "pour"},
    "es": {"el", "los", "las", "es", "en", "por", "para"},
}


def language_id(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Heuristic language ID: CJK-character ratio → 'zh'; otherwise argmax of
    per-language marker-word hit ratios, default 'en'. Deterministic output
    (doc_id, lang_pred, confidence).

    Pure-ASCII docs (no CJK possible, letter runs == ``[A-Za-z]+``) score
    through one vectorized codepoint pass; non-ASCII / NUL docs take the
    regex scalar path individually (same answers — differential-tested)."""

    class LangId:
        def __init__(self):
            import re

            from linref_ray.kernels.hashing import _hash_tokens_u64

            self.word = re.compile(r"[^\W\d_]+", re.UNICODE)
            self.cjk = re.compile(r"[一-鿿]")
            self.langs = list(_LANG_MARKERS)
            self.marker_h = [
                _hash_tokens_u64(sorted(_LANG_MARKERS[lang]))
                for lang in self.langs
            ]

        def _scalar(self, s: str) -> tuple[str, float]:
            if len(s) and len(self.cjk.findall(s)) / len(s) > 0.2:
                return "zh", 1.0
            words = [w.lower() for w in self.word.findall(s)]
            nw = max(len(words), 1)
            best_lang, best_score = "en", 0.0
            for lang, markers in _LANG_MARKERS.items():
                score = sum(w in markers for w in words) / nw
                if score > best_score:
                    best_lang, best_score = lang, score
            return best_lang, best_score

        def __call__(self, t: pa.Table) -> pa.Table:
            from linref_ray.kernels.hashing import _fnv1a_segments

            texts = t["text"].to_pylist()
            n = len(texts)
            preds = np.empty(n, dtype=object)
            confs = np.zeros(n)
            decode_ok = True
            try:
                cp = np.frombuffer(
                    "\x00".join(texts).encode("utf-32-le"), dtype=np.uint32
                )
                sep = np.flatnonzero(cp == 0)
            except UnicodeEncodeError:  # lone surrogates → all scalar
                decode_ok = False
                cp = np.zeros(0, dtype=np.uint32)
                sep = np.zeros(0, dtype=np.int64)
            if not decode_ok or len(sep) != n - 1:
                slow = np.arange(n)
            else:
                bounds = np.concatenate((sep, [len(cp)]))
                starts = np.concatenate(([0], sep + 1))
                pref = np.concatenate(([0], np.cumsum(cp > 127)))
                slow = np.flatnonzero((pref[bounds] - pref[starts]) > 0)
            for d in slow:
                preds[d], confs[d] = self._scalar(texts[d])
            fast = np.ones(n, dtype=bool)
            if len(slow) == n:
                fast[:] = False
            else:
                fast[slow] = False
                lower32 = cp | np.uint32(32)
                is_alpha = (lower32 >= 97) & (lower32 <= 122)
                prev = np.concatenate(([False], is_alpha[:-1]))
                nxt = np.concatenate((is_alpha[1:], [False]))
                ws = np.flatnonzero(is_alpha & ~prev)
                w_len = (np.flatnonzero(is_alpha & ~nxt) + 1) - ws
                w_doc = np.searchsorted(sep, ws)
                keep_w = fast[w_doc]
                ws, w_len, w_doc = ws[keep_w], w_len[keep_w], w_doc[keep_w]
                alpha_rank = np.cumsum(is_alpha)
                flat_lo = lower32[is_alpha].astype(np.uint8)
                starts_flat = (
                    (alpha_rank[ws] - 1) if len(ws) else np.empty(0, np.int64)
                )
                h_lo = _fnv1a_segments(flat_lo, starts_flat, w_len)
                nw = np.maximum(np.bincount(w_doc, minlength=n), 1)
                scores = np.zeros((n, len(self.langs)))
                for k, mh in enumerate(self.marker_h):
                    scores[:, k] = (
                        np.bincount(
                            w_doc, weights=np.isin(h_lo, mh), minlength=n
                        )
                        / nw
                    )
                best = np.argmax(scores, axis=1)  # first max wins == scalar
                f_ids = np.flatnonzero(fast)
                for d in f_ids:
                    preds[d] = self.langs[best[d]]
                confs[f_ids] = scores[f_ids, best[f_ids]]
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "lang_pred": pa.array(preds.tolist(), pa.string()),
                    "confidence": pa.array(confs),
                }
            )

    return docs.map_batches(
        LangId, batch_format="pyarrow", batch_size=1024,
        # autoscaling: a fixed pool can park CPUs a tiny cluster needs
        # elsewhere (same liveness note as the dedup signature stages)
        concurrency=(1, 2),
        num_cpus=1,
    )


def fingerprints(
    docs: ray.data.Dataset, window: int = 16, keep_mod: int = 8
) -> ray.data.Dataset:
    """Winnowing-style rolling-hash fingerprints, exploded to
    (doc_id, fingerprint) rows — join on fingerprint to find shared content."""
    from linref_ray.kernels.hashing import rolling_fingerprints_many

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        flat, lens = rolling_fingerprints_many(
            t["text"].to_pylist(), window=window, keep_mod=keep_mod
        )
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, lens)),
                "fingerprint": pa.array(flat),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=512)


def _space_token_hashes(
    texts: list[str],
) -> tuple[np.ndarray, np.ndarray]:
    """``(doc_idx, token_hash)`` for split-on-single-space tokenization with
    empty tokens dropped (≡ maximal runs of non-``' '`` codepoints — exactly
    DuckDB's ``list_filter(string_split(s, ' '), x -> x <> '')``).

    One utf-32 decode of the NUL-joined batch, FNV-1a over each token's
    codepoint bytes. Docs containing NUL are hashed individually through the
    same kernel (a single doc needs no separator), so every batch succeeds;
    lone surrogates round-trip via ``surrogatepass``."""
    from linref_ray.kernels.hashing import _fnv1a_segments

    n = len(texts)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)

    cp = np.frombuffer(
        "\x00".join(texts).encode("utf-32-le", "surrogatepass"),
        dtype=np.uint32,
    )
    sep_pos = np.flatnonzero(cp == 0)
    if len(sep_pos) == n - 1:  # no NUL inside any doc — one fused pass
        is_tok = (cp != 32) & (cp != 0)
        prev = np.concatenate(([False], is_tok[:-1]))
        nxt = np.concatenate((is_tok[1:], [False]))
        ws = np.flatnonzero(is_tok & ~prev)
        lens = np.flatnonzero(is_tok & ~nxt) - ws + 1
        h = _fnv1a_segments(cp.view(np.uint8), ws * 4, lens * 4)
        return np.searchsorted(sep_pos, ws), h
    docs_idx, hashes = [], []
    for i, s in enumerate(texts):  # rare: some doc contains NUL
        cpi = np.frombuffer(
            s.encode("utf-32-le", "surrogatepass"), dtype=np.uint32
        )
        # NUL is a real token char here (SQL string_split keeps it too);
        # only ' ' separates.
        is_tok = cpi != 32
        prev = np.concatenate(([False], is_tok[:-1]))
        nxt = np.concatenate((is_tok[1:], [False]))
        ws = np.flatnonzero(is_tok & ~prev)
        lens = np.flatnonzero(is_tok & ~nxt) - ws + 1
        h = _fnv1a_segments(cpi.view(np.uint8), ws * 4, lens * 4)
        docs_idx.append(np.full(len(h), i))
        hashes.append(h)
    return (
        np.concatenate(docs_idx) if docs_idx else np.empty(0, np.int64),
        np.concatenate(hashes) if hashes else np.empty(0, np.uint64),
    )


_GRAM_MIX = np.uint64(0x9E3779B97F4A7C15)


def _word_ngram_hashes(
    texts: list[str], n: int
) -> tuple[np.ndarray, np.ndarray]:
    """``(doc_idx, gram_hash)`` of word ``n``-grams (adjacent lowercased
    space-tokens), combined by a golden-ratio polynomial over the token
    hashes — collision odds ~pairs/2⁶⁴, the same accepted-negligible bound
    as :func:`_quality_features` word identity."""
    w_doc, h = _space_token_hashes(texts)
    if len(h) < n:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    m = len(h) - (n - 1)
    gh = h[:m].copy()
    with np.errstate(over="ignore"):
        for j in range(1, n):
            gh = gh * _GRAM_MIX + h[j : j + m]
    valid = w_doc[:m] == w_doc[n - 1 :]
    return w_doc[:m][valid], gh[valid]


def _bloom_build(hashes: np.ndarray, fp: float) -> tuple[np.ndarray, int, int]:
    """Bloom bit array over 64-bit hashes (classic double hashing):
    ``(words, m_bits, k)`` with false-positive target ``fp``."""
    import math

    n = max(len(hashes), 1)
    m_bits = max(64, int(-n * math.log(fp) / (math.log(2) ** 2)))
    k = max(1, round(m_bits / n * math.log(2)))
    words = np.zeros((m_bits + 63) // 64, dtype=np.uint64)
    h1 = hashes.astype(np.uint64)
    h2 = h1 * np.uint64(0x9E3779B97F4A7C15) | np.uint64(1)
    with np.errstate(over="ignore"):
        for i in range(k):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
            np.bitwise_or.at(
                words, (idx >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (idx & np.uint64(63)),
            )
    return words, m_bits, k


def _bloom_probe(
    words: np.ndarray, m_bits: int, k: int, hashes: np.ndarray
) -> np.ndarray:
    h1 = hashes.astype(np.uint64)
    h2 = h1 * np.uint64(0x9E3779B97F4A7C15) | np.uint64(1)
    hit = np.ones(len(hashes), dtype=bool)
    with np.errstate(over="ignore"):
        for i in range(k):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
            bit = (
                words[(idx >> np.uint64(6)).astype(np.int64)]
                >> (idx & np.uint64(63))
            ) & np.uint64(1)
            hit &= bit.astype(bool)
    return hit


def decontaminate(
    docs: ray.data.Dataset,
    eval_docs: ray.data.Dataset,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_eval_grams: int = 50_000_000,
    method: str = "exact",
    bloom_fp: float = 0.01,
) -> ray.data.Dataset:
    """Benchmark decontamination — flag corpus docs sharing any lowercased
    word ``n``-gram with an eval/benchmark set (the GPT-3-appendix /
    PaLM-style n-gram-overlap method, public knowledge).

    Scale shape: the eval side is tiny by definition (benchmark suites are
    MBs; the corpus is TBs), so its DISTINCT gram-hash set is reduced with
    per-batch ``np.unique`` partials, collected to the driver, and broadcast
    once via ``ray.put`` — the corpus side then streams through one
    stateless ``map_batches`` membership scan (sorted-array
    ``searchsorted``), no shuffle anywhere. ``max_eval_grams`` guards the
    small-side assumption with a hard error instead of a silent OOM.

    Output: ``(id, n_grams, n_hits, contaminated)`` per corpus doc —
    ``n_hits`` counts gram *positions* whose gram is in the eval set.

    ``method='bloom'`` is the broadcast-size scale mode: the eval set ships
    as a Bloom bit array (~10 bits/gram at ``bloom_fp=0.01`` vs 64 for the
    sorted-hash array — 6.4× smaller, or 16× at fp=1%±). Bloom filters have
    NO false negatives, so every truly contaminated doc is still flagged;
    a ~``bloom_fp`` fraction of clean grams false-positive (over-flagging
    only — the safe direction for decontamination). The exact mode is the
    oracle mode.
    """
    import ray as _ray

    if method not in ("exact", "bloom"):
        raise ValueError("method must be 'exact' or 'bloom'")

    def eval_partial(t: pa.Table) -> pa.Table:
        texts = pc.utf8_lower(t[text_col]).to_pylist()
        _, gh = _word_ngram_hashes(texts, n)
        return pa.table({"g": pa.array(np.unique(gh))})

    parts = _ray.get(
        eval_docs.map_batches(
            eval_partial, batch_format="pyarrow"
        ).to_arrow_refs()
    )
    merged = pa.concat_tables(parts, promote_options="default")
    banned = np.unique(merged["g"].to_numpy(zero_copy_only=False))
    if len(banned) > max_eval_grams:
        raise ValueError(
            f"eval side produced {len(banned)} distinct {n}-grams "
            f"(> max_eval_grams={max_eval_grams}); decontaminate broadcasts "
            "the eval set — it must be the small side"
        )
    if method == "bloom":
        banned_ref = _ray.put(_bloom_build(banned, bloom_fp))
        have_banned = bool(len(banned))
    else:
        banned_ref = _ray.put(banned)
        have_banned = True

    def scan(t: pa.Table) -> pa.Table:
        texts = pc.utf8_lower(t[text_col]).to_pylist()
        rows = len(texts)
        gdoc, gh = _word_ngram_hashes(texts, n)
        b = _ray.get(banned_ref)  # per-worker plasma fetch, cached
        if method == "bloom":
            words, m_bits, kk = b
            hit = (
                _bloom_probe(words, m_bits, kk, gh)
                if len(gh) and have_banned
                else np.zeros(len(gh), bool)
            )
        elif len(gh) and len(b):
            pos = np.minimum(np.searchsorted(b, gh), len(b) - 1)
            hit = b[pos] == gh
        else:
            hit = np.zeros(len(gh), bool)
        n_grams = np.bincount(gdoc, minlength=rows).astype(np.int64)
        n_hits = np.bincount(gdoc[hit], minlength=rows).astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                "n_grams": pa.array(n_grams),
                "n_hits": pa.array(n_hits),
                "contaminated": pa.array(n_hits > 0),
            }
        )

    return docs.map_batches(scan, batch_format="pyarrow", batch_size=2048)


# codepoints are < 0x110000 (21 bits): pack a bigram as a*2^21 + b — the
# exact integer the SQL oracle rebuilds with unicode(substring(..)).
_BIGRAM_BASE = np.int64(1 << 21)


def _char_bigram_grams(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """``(doc_idx, packed_bigram)`` of adjacent codepoint pairs per doc.
    Docs containing NUL are processed individually (NUL is a real char for
    them, not the batch separator)."""
    n = len(texts)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    cp = np.frombuffer(
        "\x00".join(texts).encode("utf-32-le", "surrogatepass"),
        dtype=np.uint32,
    ).astype(np.int64)
    sep_pos = np.flatnonzero(cp == 0)
    if len(sep_pos) == n - 1:
        ok = (cp[:-1] != 0) & (cp[1:] != 0)
        g = cp[:-1] * _BIGRAM_BASE + cp[1:]
        pos = np.flatnonzero(ok)
        return np.searchsorted(sep_pos, pos), g[pos]
    docs_idx, grams = [], []
    for i, s in enumerate(texts):
        cpi = np.frombuffer(
            s.encode("utf-32-le", "surrogatepass"), dtype=np.uint32
        ).astype(np.int64)
        if len(cpi) >= 2:
            grams.append(cpi[:-1] * _BIGRAM_BASE + cpi[1:])
            docs_idx.append(np.full(len(cpi) - 1, i))
    return (
        np.concatenate(docs_idx) if docs_idx else np.empty(0, np.int64),
        np.concatenate(grams) if grams else np.empty(0, np.int64),
    )


def lm_rarity(
    docs: ray.data.Dataset,
    rare_max: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 8,
    max_vocab: int = 20_000_000,
) -> ray.data.Dataset:
    """Corpus-LM rarity scoring — the shape of a CCNet-style perplexity
    quality filter (Wenzek et al. 2020, public method) with a char-bigram
    model trained on the corpus itself, so it is deterministic and exactly
    SQL-checkable (integer counts + ONE IEEE division, no float sums).

    Two streaming scans: (1) per-batch ``np.unique`` bigram-count partials
    → one small ``groupby(gram)`` (vocabulary ≤ distinct codepoint pairs,
    guarded by ``max_vocab``) → broadcast via ``ray.put``; (2) score each
    doc against the broadcast table. Output per doc with ≥1 bigram:
    ``(id, n_bigrams, n_rare, min_count, rarity)`` where ``n_rare`` counts
    bigram positions whose corpus count ≤ ``rare_max`` and
    ``rarity = n_rare / n_bigrams``."""
    import ray as _ray

    def partial(t: pa.Table) -> pa.Table:
        _, g = _char_bigram_grams(t[text_col].to_pylist())
        u, c = np.unique(g, return_counts=True)
        return pa.table(
            {"gram": pa.array(u), "c": pa.array(c.astype(np.int64))}
        )

    counts = (
        docs.map_batches(partial, batch_format="pyarrow")
        .repartition(num_partitions)
        .groupby("gram")
        .sum("c")
    )
    tbl = pa.concat_tables(
        _ray.get(counts.to_arrow_refs()), promote_options="default"
    )
    grams = tbl["gram"].to_numpy(zero_copy_only=False)
    cnts = tbl["sum(c)"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(grams) > max_vocab:
        raise ValueError(
            f"bigram vocabulary {len(grams)} > max_vocab={max_vocab}"
        )
    order = np.argsort(grams)
    model_ref = _ray.put((grams[order], cnts[order]))

    def score(t: pa.Table) -> pa.Table:
        gdoc, g = _char_bigram_grams(t[text_col].to_pylist())
        rows = len(t)
        vocab, vc = _ray.get(model_ref)
        c = vc[np.searchsorted(vocab, g)] if len(g) else np.empty(0, np.int64)
        n_big = np.bincount(gdoc, minlength=rows).astype(np.int64)
        n_rare = np.bincount(
            gdoc[c <= rare_max], minlength=rows
        ).astype(np.int64)
        min_c = np.full(rows, np.iinfo(np.int64).max)
        if len(g):
            np.minimum.at(min_c, gdoc, c)
        keep = n_big > 0
        rarity = n_rare[keep].astype(np.float64) / n_big[keep].astype(
            np.float64
        )
        return pa.table(
            {
                id_col: t[id_col].filter(pa.array(keep)),
                "n_bigrams": pa.array(n_big[keep]),
                "n_rare": pa.array(n_rare[keep]),
                "min_count": pa.array(min_c[keep]),
                "rarity": pa.array(rarity),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow", batch_size=2048)


# RE2 patterns (pyarrow and DuckDB both run RE2, so replace/count are
# bit-identical across the Ray op and the SQL oracle).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
LONG_NUM_PATTERN = r"[0-9]{7,}"


def redact_pii(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "clean_text",
) -> ray.data.Dataset:
    """PII scrubbing — replace email addresses with ``<EMAIL>`` and ≥7-digit
    runs with ``<NUM>`` (the standard pre-training scrub pass). Stateless
    vectorized Arrow RE2 kernels; numbers are counted/replaced AFTER the
    email pass so digits inside an address are not double-redacted.
    Output: ``(id, clean_text, n_emails, n_nums)``."""

    def fn(t: pa.Table) -> pa.Table:
        x = t[text_col]
        n_email = pc.count_substring_regex(x, EMAIL_PATTERN)
        x = pc.replace_substring_regex(x, EMAIL_PATTERN, "<EMAIL>")
        n_num = pc.count_substring_regex(x, LONG_NUM_PATTERN)
        x = pc.replace_substring_regex(x, LONG_NUM_PATTERN, "<NUM>")
        return pa.table(
            {
                id_col: t[id_col],
                out_col: x,
                "n_emails": pc.cast(n_email, pa.int64()),
                "n_nums": pc.cast(n_num, pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def vocab_topk(
    docs: ray.data.Dataset,
    n: int = 50,
    text_col: str = "text",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Global top-``n`` most frequent whitespace tokens: (token, n) with
    count-desc / token-asc tie-break (a total order, so the result set is
    deterministic even at the rank-``n`` boundary).

    Two-level reduction — the vocabulary-building op of a training-data
    pipeline: per-batch Arrow ``value_counts`` partials (only (token, count)
    rows ever shuffle, never text), one ``groupby(token)`` for exact global
    counts, then per-batch local top-``n`` so the single-partition final
    total-order step sees ≤ n × batches rows, not the whole vocabulary."""

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern(pc.utf8_lower(t[text_col]), " ")
        )
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = pc.value_counts(toks)
        return pa.table(
            {
                "token": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    def topn(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        tok = np.asarray(t["token"].to_pylist(), dtype=str)
        cnt = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = np.lexsort([tok, -cnt])[:n]  # count desc, token asc
        return pa.table(
            {
                "token": pa.array(tok[sel].tolist(), pa.string()),
                "n": pa.array(cnt[sel]),
            }
        )

    counts = (
        docs.map_batches(partial, batch_format="pyarrow")
        .repartition(num_partitions)
        .groupby("token")
        .sum("n")
        .map_batches(
            lambda t: pa.table(
                {"token": t["token"],
                 "n": pc.cast(t["sum(n)"], pa.int64())}
            ),
            batch_format="pyarrow",
        )
    )
    return (
        counts.map_batches(topn, batch_format="pyarrow")
        .repartition(1)
        .map_batches(topn, batch_format="pyarrow")
    )


def tfidf_topk(
    docs: ray.data.Dataset,
    m: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Top-``m`` TF-IDF terms per document: (id, token, tfidf) with
    score-desc / token-asc tie-break, ``tfidf = tf * ln(N / df)``.

    Two scans of the corpus, no large shuffle: scan 1 aggregates document
    frequencies (per-batch DISTINCT-token partials → one small
    ``groupby(token)``); the resulting (token, df) vocabulary is broadcast
    via ``ray.put`` — read once per worker, never re-shipped per batch.
    Scan 2 recomputes per-doc term frequencies batch-locally (a doc's tf
    rows never cross a batch boundary, so per-doc top-``m`` needs no
    shuffle either) and scores against the broadcast vocabulary.
    Recomputing tf beats materializing the tf table: the tf expansion is
    larger than the input corpus, two streaming input scans are not."""
    import ray as _ray

    def _doc_tf(t: pa.Table):
        """(doc row -> (doc_idx, token_code, tf)) plus the batch's token
        vocabulary; tokenization identical to vocab_topk / the SQL oracle."""
        toks_list = pc.split_pattern(pc.utf8_lower(t[text_col]), " ")
        flat = pc.list_flatten(toks_list)
        lens = pc.list_value_length(toks_list).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(t)), lens)
        words = np.asarray(flat.to_pylist(), dtype=str)
        keep = words != ""
        doc_idx, words = doc_idx[keep], words[keep]
        vocab, codes = np.unique(words, return_inverse=True)
        key = doc_idx * len(vocab) + codes
        ukey, tf = np.unique(key, return_counts=True)
        return ukey // len(vocab), ukey % len(vocab), tf, vocab

    def df_partial(t: pa.Table) -> pa.Table:
        d, c, _, vocab = _doc_tf(t)
        # tf rows are already DISTINCT (doc, token) pairs
        return pa.table(
            {
                "token": pa.array(vocab[np.unique(c)].tolist(), pa.string()),
                "df": pa.array(np.bincount(c, minlength=len(vocab))[
                    np.unique(c)
                ].astype(np.int64)),
            }
        )

    df_tbl = pa.concat_tables(
        _ray.get(
            docs.map_batches(df_partial, batch_format="pyarrow")
            .repartition(num_partitions)
            .groupby("token")
            .sum("df")
            .to_arrow_refs()
        ),
        promote_options="default",
    )
    n_docs = docs.count()
    df_map = dict(
        zip(df_tbl["token"].to_pylist(),
            df_tbl["sum(df)"].to_numpy(zero_copy_only=False))
    )
    df_ref = _ray.put(df_map)

    def score(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], t[id_col].type),
                "token": pa.array([], pa.string()),
                "tfidf": pa.array([], pa.float64()),
            }
        )
        if len(t) == 0:
            return empty
        d, c, tf, vocab = _doc_tf(t)
        if len(d) == 0:
            return empty
        dfm = _ray.get(df_ref)  # per-worker plasma fetch, cached
        df_per_code = np.array(
            [dfm[w] for w in vocab], dtype=np.float64
        )
        s = tf * np.log(n_docs / df_per_code[c])
        # per-doc top-m: sort (doc, score desc, token asc), run boundaries
        order = np.lexsort([vocab[c], -s, d])
        d_s = d[order]
        starts = np.concatenate([[True], d_s[1:] != d_s[:-1]])
        start_idx = np.flatnonzero(starts)
        pos = np.arange(len(d_s)) - start_idx[np.cumsum(starts) - 1]
        sel = order[pos < m]
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(ids[d[sel]], t[id_col].type),
                "token": pa.array(vocab[c[sel]].tolist(), pa.string()),
                "tfidf": pa.array(s[sel]),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow", batch_size=2048)


def bm25_scores(
    docs: ray.data.Dataset,
    terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """BM25 score of every document against a fixed bag of query ``terms``
    (Robertson tf saturation, Lucene-style ``ln(1+(N-df+0.5)/(df+0.5))``
    idf). Output: ``(id, bm25)`` for ALL docs (zero-hit docs score 0.0).

    Scale shape mirrors :func:`tfidf_topk`: scan 1 streams tiny per-batch
    partials — per-term document frequencies plus (ndocs, Σdl) — through
    one small ``groupby(term).sum``; the resulting constants (idf per term,
    avgdl) are driver-computed scalars captured in the scoring closure
    (bytes, not a broadcast table). Scan 2 scores each batch locally:
    term frequencies via vectorized word matching, no shuffle at all.
    Tokenization (lower, single-space split, empties dropped) is identical
    to ``vocab_topk`` / the SQL oracle."""
    import ray as _ray

    terms = tuple(terms)

    def _tok(t: pa.Table):
        toks = pc.split_pattern(pc.utf8_lower(t[text_col]), " ")
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        words = np.asarray(pc.list_flatten(toks).to_pylist(), dtype=str)
        doc_idx = np.repeat(np.arange(len(t)), lens)
        keep = words != ""
        return words[keep], doc_idx[keep]

    def stats_partial(t: pa.Table) -> pa.Table:
        words, doc_idx = _tok(t)
        n = len(t)
        dl = np.bincount(doc_idx, minlength=n).astype(np.int64)
        names = ["\x00ndocs", "\x00sumdl"]
        vals = [n, int(dl.sum())]
        for term in terms:
            hit = np.bincount(doc_idx[words == term], minlength=n) > 0
            names.append(term)
            vals.append(int(hit.sum()))
        return pa.table(
            {
                "term": pa.array(names, pa.string()),
                "v": pa.array(vals, pa.int64()),
            }
        )

    stats_tbl = pa.concat_tables(
        _ray.get(
            docs.map_batches(stats_partial, batch_format="pyarrow")
            .groupby("term")
            .sum("v")
            .to_arrow_refs()
        ),
        promote_options="default",
    )
    sd = dict(
        zip(stats_tbl["term"].to_pylist(),
            stats_tbl["v" if "v" in stats_tbl.column_names else "sum(v)"]
            .to_numpy(zero_copy_only=False))
    )
    n_docs = int(sd["\x00ndocs"])
    avgdl = sd["\x00sumdl"] / n_docs  # IEEE int/int division, SQL-matched
    k1p = k1 + 1.0
    idf = [
        float(np.log(1.0 + (n_docs - sd.get(term, 0) + 0.5)
                     / (sd.get(term, 0) + 0.5)))
        for term in terms
    ]

    def score(t: pa.Table) -> pa.Table:
        n = len(t)
        out_empty = pa.table(
            {
                id_col: pa.array([], t.schema.field(id_col).type),
                "bm25": pa.array([], pa.float64()),
            }
        )
        if n == 0:
            return out_empty
        words, doc_idx = _tok(t)
        dl = np.bincount(doc_idx, minlength=n).astype(np.float64)
        norm = k1 * (1.0 - b + b * (dl / avgdl))
        s = np.zeros(n, dtype=np.float64)
        for term, w in zip(terms, idf):
            tf = np.bincount(
                doc_idx[words == term], minlength=n
            ).astype(np.float64)
            s = s + w * (tf * k1p) / (tf + norm)
        return pa.table({id_col: t[id_col], "bm25": pa.array(s)})

    return docs.map_batches(score, batch_format="pyarrow", batch_size=2048)


def heavy_hitters(
    docs: ray.data.Dataset,
    k: int = 10,
    capacity: int = 64,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Exact top-``k`` most frequent tokens via a CANDIDATE-COMPLETE
    two-pass sketch (the Misra-Gries / frequent-items pattern at scale):
    pass 1 keeps each batch's tokens whose in-batch count reaches the
    ``capacity``-th largest — by pigeonhole at most ``capacity`` tokens can
    exceed ``n_batch/(capacity+1)``, so every token with GLOBAL frequency
    > N/(capacity+1) survives in at least one batch partial. Pass 2
    broadcasts the distinct candidate set (small: ≤ capacity·batches before
    dedup) and counts ONLY candidates exactly — one streaming scan, tiny
    groupby. The top-k is exact whenever the true k-th count exceeds
    N/(capacity+1) (amply true for Zipf-ish corpora at the defaults; the
    SQL oracle is the unconditioned exact top-k, so the gate itself proves
    the bound held). Ties break token-ascending.
    """
    import ray as _ray

    def _tokens(t: pa.Table) -> np.ndarray:
        toks = pc.split_pattern(pc.utf8_lower(t[text_col]), " ")
        words = np.asarray(pc.list_flatten(toks).to_pylist(), dtype=str)
        return words[words != ""]

    def candidates(t: pa.Table) -> pa.Table:
        empty = pa.table({"token": pa.array([], pa.string())})
        if len(t) == 0:
            return empty
        words = _tokens(t)
        if not len(words):
            return empty
        uniq, counts = np.unique(words, return_counts=True)
        if len(uniq) > capacity:
            kth = np.partition(counts, len(counts) - capacity)[
                len(counts) - capacity
            ]
            uniq = uniq[counts >= kth]
        return pa.table({"token": pa.array(uniq.tolist(), pa.string())})

    cand_tbl = pa.concat_tables(
        _ray.get(
            docs.map_batches(candidates, batch_format="pyarrow",
                             batch_size=2048)
            .groupby("token")
            .count()
            .to_arrow_refs()
        ),
        promote_options="default",
    )
    cand = set(cand_tbl["token"].to_pylist())
    cand_ref = _ray.put(cand)

    def exact_counts(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "token": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if len(t) == 0:
            return empty
        cs = _ray.get(cand_ref)
        words = _tokens(t)
        if not len(words):
            return empty
        uniq, counts = np.unique(words, return_counts=True)
        keep = np.fromiter((w in cs for w in uniq), bool, len(uniq))
        return pa.table(
            {
                "token": pa.array(uniq[keep].tolist(), pa.string()),
                "n": pa.array(counts[keep].astype(np.int64)),
            }
        )

    def topk(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        tok = np.asarray(t["token"].to_pylist(), dtype=str)
        n = t["sum(n)"].to_numpy(zero_copy_only=False)
        order = np.lexsort([tok, -n])[:k]
        return pa.table(
            {
                "token": pa.array(tok[order].tolist(), pa.string()),
                "n": pa.array(n[order].astype(np.int64)),
            }
        )

    return (
        docs.map_batches(exact_counts, batch_format="pyarrow",
                         batch_size=2048)
        .groupby("token")
        .sum("n")
        .repartition(1)
        .map_batches(topk, batch_format="pyarrow", batch_size=None)
    )


def chunk_documents(
    docs: ray.data.Dataset,
    chunk_words: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Overlapping fixed-size chunking (the RAG / long-context windowing
    op): chunk ``j`` of a doc covers words ``[j*stride, j*stride +
    chunk_words)``; chunks are emitted while ``j*stride < n_words``, so
    every word is covered and consecutive chunks overlap by
    ``chunk_words - stride`` words. Output: ``(id, chunk_idx, word_start,
    text)``.

    One streaming ``flat_map``-shaped ``map_batches`` pass, fully
    vectorized (CSR word gather + ``binary_join``); no shuffle. The
    single-space split is lossless, so a chunk's text is exactly the
    words it covers re-joined (identical to the SQL oracle's
    ``array_to_string(ws[a:b], ' ')``)."""
    C = int(chunk_words)
    S = int(stride)
    if not 1 <= S <= C:
        raise ValueError("need 1 <= stride <= chunk_words")

    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "chunk_idx": pa.array([], pa.int64()),
                "word_start": pa.array([], pa.int64()),
                text_col: pa.array([], pa.string()),
            }
        )
        if len(t) == 0:
            return empty
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        wl = pc.split_pattern(t[text_col], " ")
        lens = pc.list_value_length(wl).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        word_off = np.concatenate(([0], np.cumsum(lens)[:-1]))
        nchunk = -(-lens // S)  # lens >= 1 always (split('') == [''])
        total_c = int(nchunk.sum())
        cdoc = np.repeat(np.arange(len(ids)), nchunk)
        coff = np.concatenate(([0], np.cumsum(nchunk)[:-1]))
        cidx = np.arange(total_c) - coff[cdoc]
        wstart = cidx * S
        csize = np.minimum(C, lens[cdoc] - wstart)
        # flat gather indices: for chunk r, words word_off[doc]+wstart ..
        rows = np.repeat(np.arange(total_c), csize)
        woff2 = np.concatenate(([0], np.cumsum(csize)[:-1]))
        within = np.arange(int(csize.sum())) - woff2[rows]
        gather = word_off[cdoc[rows]] + wstart[rows] + within
        flat = pc.list_flatten(wl)
        words = flat.take(pa.array(gather))
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        la = pa.ListArray.from_arrays(
            pa.array(np.concatenate(([0], np.cumsum(csize))), pa.int32()),
            words,
        )
        return pa.table(
            {
                id_col: pa.array(ids[cdoc]),
                "chunk_idx": pa.array(cidx),
                "word_start": pa.array(wstart),
                text_col: pc.binary_join(la, " "),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=1024)


def gopher_rules(
    docs: ray.data.Dataset,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_ratio: float = 0.9,
    max_ellipsis_line_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_stop_hits: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Gopher-style document quality rules (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", §A1.1 repetition/format heuristics —
    public method; thresholds are theirs by default).

    Every feature is an Arrow C++ kernel over the batch (count_substring /
    split / regex match on flattened list elements) — no per-row Python.
    Output is one row per document with each rule's boolean verdict and the
    conjunction ``keep``: integer/boolean only, so the DuckDB oracle
    compares bit-exactly with no float hashing concerns.

    Rule definitions (shared verbatim with the SQL oracle):
      r_words       min_words <= #([A-Za-z]+ runs) <= max_words
      r_mean_len    min <= (alpha chars / words) <= max
      r_symbols     (#'#' + #'…' + non-overlapping '...') / words <= 0.1
      r_bullets     lines starting with -, *, or • <= 90%
      r_ellipsis    lines ending with '...' or '…' <= 30%
      r_alpha       >= 80% of whitespace tokens contain an [A-Za-z]
      r_stop        >= 2 occurrences of {the,be,to,of,and,that,have,with}
    """
    STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]
    stop_set = pa.array(STOPS, pa.string())

    def fn(t: pa.Table) -> pa.Table:
        n = len(t)
        text = t[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_words = pc.count_substring_regex(text, "[A-Za-z]+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        alpha_chars = pc.utf8_length(
            pc.replace_substring_regex(text, "[^A-Za-z]", "")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        denom_w = np.maximum(n_words, 1).astype(np.float64)
        mean_len = alpha_chars / denom_w
        n_hash = pc.count_substring(text, "#").to_numpy(zero_copy_only=False)
        n_uell = pc.count_substring(text, "…").to_numpy(
            zero_copy_only=False
        )
        # non-overlapping '...' count, replace-based (== the SQL formula)
        n_dell = (
            pc.utf8_length(text).to_numpy(zero_copy_only=False)
            - pc.utf8_length(
                pc.replace_substring(text, "...", "")
            ).to_numpy(zero_copy_only=False)
        ) // 3
        sym_ratio = (n_hash + n_uell + n_dell) / denom_w

        lines = pc.split_pattern(text, "\n")
        flat_l = pc.list_flatten(lines)
        par_l = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
        n_lines = np.maximum(
            pc.list_value_length(lines).to_numpy(zero_copy_only=False), 1
        ).astype(np.float64)
        bullet = pc.or_(
            pc.or_(
                pc.starts_with(flat_l, "-"), pc.starts_with(flat_l, "*")
            ),
            pc.starts_with(flat_l, "•"),
        ).to_numpy(zero_copy_only=False)
        ell = pc.or_(
            pc.ends_with(flat_l, "..."), pc.ends_with(flat_l, "…")
        ).to_numpy(zero_copy_only=False)
        n_bullet = np.bincount(par_l, weights=bullet, minlength=n)
        n_ell = np.bincount(par_l, weights=ell, minlength=n)

        toks = pc.utf8_split_whitespace(text)
        flat_t = pc.list_flatten(toks)
        par_t = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        nonempty = pc.utf8_length(flat_t).to_numpy(
            zero_copy_only=False
        ) > 0
        has_alpha = pc.match_substring_regex(
            flat_t, "[A-Za-z]"
        ).to_numpy(zero_copy_only=False)
        n_tok = np.bincount(par_t, weights=nonempty, minlength=n)
        n_alpha_tok = np.bincount(
            par_t, weights=has_alpha & nonempty, minlength=n
        )
        stop_hit = pc.is_in(
            pc.utf8_lower(flat_t), value_set=stop_set
        ).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(par_t, weights=stop_hit, minlength=n).astype(
            np.int64
        )

        r_words = (n_words >= min_words) & (n_words <= max_words)
        r_mean = (mean_len >= min_mean_word_len) & (
            mean_len <= max_mean_word_len
        )
        r_sym = sym_ratio <= max_symbol_word_ratio
        r_bul = n_bullet / n_lines <= max_bullet_line_ratio
        r_ell = n_ell / n_lines <= max_ellipsis_line_ratio
        r_alpha = n_alpha_tok >= min_alpha_word_ratio * np.maximum(n_tok, 1)
        r_stop = n_stop >= min_stop_hits
        keep = r_words & r_mean & r_sym & r_bul & r_ell & r_alpha & r_stop
        return pa.table(
            {
                id_col: t[id_col],
                "n_words": pa.array(n_words),
                "r_words": pa.array(r_words),
                "r_mean_len": pa.array(r_mean),
                "r_symbols": pa.array(r_sym),
                "r_bullets": pa.array(r_bul),
                "r_ellipsis": pa.array(r_ell),
                "r_alpha": pa.array(r_alpha),
                "r_stop": pa.array(r_stop),
                "keep": pa.array(keep),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=2048)
