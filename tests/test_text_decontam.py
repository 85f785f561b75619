"""Decontamination, corpus-LM rarity, and PII redaction.

SQL parity is gated by the `decontam` / `lm_rarity` / `redact` oracles in
__ray_entry__; these tests pin the semantics on hand-built fixtures and the
edge cases the oracle corpus never exercises (NUL chars, empty docs, docs
shorter than n, broadcast-guard errors, partition independence).
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from linref_ray.text import (
    _char_bigram_grams,
    _space_token_hashes,
    _word_ngram_hashes,
    decontaminate,
    lm_rarity,
    redact_pii,
)


def _ds(rows: dict) -> rd.Dataset:
    return rd.from_arrow(pa.table(rows))


# --- kernel-level: tokenization / gram extraction ---


def test_space_tokens_match_python_split():
    texts = ["a b  c", "", "  ", "one", "x y z w"]
    doc, h = _space_token_hashes(texts)
    expect = [[t for t in s.split(" ") if t] for s in texts]
    counts = np.bincount(doc, minlength=len(texts))
    assert counts.tolist() == [len(e) for e in expect]
    # identical token text → identical hash across docs
    d2, h2 = _space_token_hashes(["c x", "x c"])
    assert set(h2[d2 == 0]) == set(h2[d2 == 1])


def test_space_tokens_nul_fallback_consistent():
    """A NUL-bearing batch routes per-doc but must hash tokens identically
    to the fused path (membership tests depend on it)."""
    clean = ["alpha beta", "beta gamma"]
    _, h_fast = _space_token_hashes(clean)
    doc, h_slow = _space_token_hashes(clean + ["with\x00nul token"])
    assert set(h_fast) <= set(h_slow)
    # the NUL doc has 2 tokens: 'with\x00nul' and 'token'
    assert (doc == 2).sum() == 2


def test_word_ngrams_respect_doc_boundaries():
    # last token of doc 0 + first of doc 1 must NOT form a gram
    doc, gh = _word_ngram_hashes(["a b", "c d"], n=2)
    assert len(gh) == 2 and set(doc) == {0, 1}
    _, gh_joined = _word_ngram_hashes(["a b c d"], n=2)
    assert len(gh_joined) == 3  # the cross-doc "b c" only exists here


def test_char_bigrams_pack_and_boundaries():
    doc, g = _char_bigram_grams(["ab", "xyz", "q", ""])
    assert np.bincount(doc, minlength=4).tolist() == [1, 2, 0, 0]
    assert g[0] == ord("a") * (1 << 21) + ord("b")
    # NUL-bearing doc falls back but still yields its bigrams
    doc2, g2 = _char_bigram_grams(["a\x00b"])
    assert len(g2) == 2


# --- decontaminate ---


def test_decontaminate_flags_shared_ngrams(ray_session):
    corpus = _ds({
        "doc_id": [1, 2, 3],
        "text": [
            "the quick brown fox jumps",   # contains eval 3-gram
            "completely different words here",
            "QUICK BROWN FOX",             # case-insensitive hit
        ],
    })
    ev = _ds({"doc_id": [100], "text": ["a quick brown fox ran"]})
    out = (
        decontaminate(corpus, ev, n=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["contaminated"].tolist() == [True, False, True]
    # eval grams: {a-quick-brown, quick-brown-fox, brown-fox-ran};
    # doc 1 shares only quick-brown-fox
    assert out["n_hits"].tolist() == [1, 0, 1]
    assert out["n_grams"].tolist() == [3, 2, 1]


def test_decontaminate_short_docs_zero_grams(ray_session):
    corpus = _ds({"doc_id": [1, 2], "text": ["one two", ""]})
    ev = _ds({"doc_id": [9], "text": ["one two three"]})
    out = (
        decontaminate(corpus, ev, n=3)
        .to_pandas().sort_values("doc_id")
    )
    assert out["n_grams"].tolist() == [0, 0]
    assert out["contaminated"].tolist() == [False, False]


def test_decontaminate_guard_raises(ray_session):
    corpus = _ds({"doc_id": [1], "text": ["a b c"]})
    ev = _ds({"doc_id": [9], "text": ["w x y z a b c d"]})
    with pytest.raises(ValueError, match="small side"):
        decontaminate(corpus, ev, n=2, max_eval_grams=3)


def test_decontaminate_partition_independent(ray_session):
    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    )
    ev = docs.filter(lambda r: r["doc_id"] % 41 == 0)
    scan = docs.filter(lambda r: r["doc_id"] % 41 != 0)
    a = (
        decontaminate(scan, ev, n=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        decontaminate(scan.repartition(7), ev.repartition(3), n=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)
    assert a["contaminated"].any()  # organic overlap exists


# --- lm_rarity ---


def test_lm_rarity_counts_by_hand(ray_session):
    # corpus: "aa", "ab" → bigrams: aa(1), ab(1); both rare at rare_max=1
    docs = _ds({"doc_id": [1, 2, 3], "text": ["aaa", "ab", "x"]})
    out = (
        lm_rarity(docs, rare_max=1)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # doc 3 has no bigram → dropped (matches the SQL join semantics)
    assert out["doc_id"].tolist() == [1, 2]
    # "aaa" → aa,aa (corpus count 2, not rare); "ab" → ab (count 1, rare)
    assert out["n_bigrams"].tolist() == [2, 1]
    assert out["n_rare"].tolist() == [0, 1]
    assert out["min_count"].tolist() == [2, 1]
    assert out["rarity"].tolist() == [0.0, 1.0]


def test_lm_rarity_partition_independent(ray_session):
    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    )
    a = (
        lm_rarity(docs, rare_max=50)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        lm_rarity(docs.repartition(9), rare_max=50, num_partitions=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)


# --- redact_pii ---


def test_redact_patterns(ray_session):
    docs = _ds({
        "doc_id": [1, 2, 3],
        "text": [
            "mail bob.smith+x@sub.example.org now",
            "call 4155551234 or 123456 short",
            "clean text only",
        ],
    })
    out = (
        redact_pii(docs)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["clean_text"].tolist() == [
        "mail <EMAIL> now",
        "call <NUM> or 123456 short",  # 6 digits: below threshold
        "clean text only",
    ]
    assert out["n_emails"].tolist() == [1, 0, 0]
    assert out["n_nums"].tolist() == [0, 1, 0]


def test_redact_email_digits_not_double_counted(ray_session):
    docs = _ds({"doc_id": [1], "text": ["x 12345678@example.com y"]})
    out = redact_pii(docs).to_pandas()
    assert out["clean_text"][0] == "x <EMAIL> y"
    assert out["n_emails"][0] == 1 and out["n_nums"][0] == 0


def test_bloom_mode_no_false_negatives_and_bounded_fp(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from linref_ray.text import decontaminate

    rng = np.random.default_rng(12)
    vocab = [f"w{i}" for i in range(4000)]
    corpus = pd.DataFrame({
        "doc_id": np.arange(400),
        "text": [" ".join(rng.choice(vocab, size=30)) for _ in range(400)],
    })
    evald = pd.DataFrame({
        "doc_id": np.arange(20),
        # eval docs reuse corpus docs 0..19 verbatim -> guaranteed overlap
        "text": corpus.text[:20].tolist(),
    })
    ex = decontaminate(
        rd.from_pandas(corpus), rd.from_pandas(evald)
    ).to_pandas().set_index("doc_id")
    bl = decontaminate(
        rd.from_pandas(corpus), rd.from_pandas(evald),
        method="bloom", bloom_fp=0.01,
    ).to_pandas().set_index("doc_id")
    # no false negatives: every exact hit is a bloom hit, per-doc counts >=
    assert (bl.n_hits >= ex.n_hits).all()
    assert set(ex[ex.contaminated].index) <= set(bl[bl.contaminated].index)
    # bounded over-flagging: extra hit positions are ~fp of clean grams
    extra = int(bl.n_hits.sum() - ex.n_hits.sum())
    clean = int(ex.n_grams.sum() - ex.n_hits.sum())
    assert extra <= max(20, 0.05 * clean), (extra, clean)


def test_bloom_kernel_roundtrip(ray_session):
    import numpy as np

    from linref_ray.text import _bloom_build, _bloom_probe

    rng = np.random.default_rng(1)
    members = rng.integers(0, 2**63, 10_000, dtype=np.int64)
    others = rng.integers(0, 2**63, 10_000, dtype=np.int64)
    others = np.setdiff1d(others, members)
    words, m, k = _bloom_build(members, 0.01)
    assert _bloom_probe(words, m, k, members).all()
    fp = _bloom_probe(words, m, k, others).mean()
    assert fp < 0.03, fp
