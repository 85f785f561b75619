"""Shared exact-substring pair detection (dedup.shared_span_pairs).

SQL parity of the exhaustive mode is gated by the `shared_spans` oracle in
__ray_entry__; these tests pin the hand-checkable semantics (planted spans,
window-length cutoffs, distinctness) and the winnowed-mode containment /
long-span recall properties.
"""

import pyarrow as pa
import ray.data as rd

from linref_ray.dedup import shared_span_pairs


def _docs(texts: list[str]) -> rd.Dataset:
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_planted_span_counts(ray_session):
    span = "0123456789abcdefXYZ"  # 19 chars → 4 distinct 16-char windows
    docs = _docs([
        "A" * 30 + span + "B" * 30,
        "C" * 10 + span + "D" * 50,
        "totally unrelated text that is long enough here",
    ])
    out = shared_span_pairs(docs, window=16, keep_mod=1).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row.id_a, row.id_b) == (1, 2)
    assert row.n_shared == 4


def test_short_docs_emit_nothing(ray_session):
    docs = _docs(["short one", "short one", "x" * 15])
    out = shared_span_pairs(docs, window=16, keep_mod=1).to_pandas()
    assert len(out) == 0


def test_repeated_window_counted_once(ray_session):
    w = "abcdefghij123456"  # exactly one window
    docs = _docs([w + "---" + w, "pad " + w + " pad"])
    out = shared_span_pairs(docs, window=16, keep_mod=1).to_pandas()
    assert out.n_shared.tolist() == [1]  # distinct per doc, not 2


def test_winnowed_subset_and_long_span_recall(ray_session):
    long_span = "the same very long shared paragraph of text " * 4
    docs = _docs([
        "intro " + long_span + " outro",
        "prefix " + long_span + " suffix",
        "unrelated filler content long enough to fingerprint",
    ])
    exact = shared_span_pairs(docs, window=16, keep_mod=1).to_pandas()
    winnowed = shared_span_pairs(docs, window=16, keep_mod=8).to_pandas()
    e = set(zip(exact.id_a, exact.id_b))
    w = set(zip(winnowed.id_a, winnowed.id_b))
    assert w <= e
    assert (1, 2) in w  # ~180 shared windows: kept-hash collision certain
    # counts in winnowed mode never exceed the exact counts
    em = {(a, b): n for a, b, n in exact.itertuples(index=False)}
    assert all(n <= em[(a, b)] for a, b, n in winnowed.itertuples(index=False))


def test_organic_corpus_winnowed_containment(ray_session):
    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    )
    exact = shared_span_pairs(docs, window=16, keep_mod=1).to_pandas()
    winnowed = shared_span_pairs(docs, window=16, keep_mod=4).to_pandas()
    assert set(zip(winnowed.id_a, winnowed.id_b)) <= set(
        zip(exact.id_a, exact.id_b)
    )
    assert len(exact) > 0
