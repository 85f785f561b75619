"""Gopher-style repetition signals (duplicate-line / bullet / ellipsis
fractions, top word-2-gram share). Fixture docs with closed-form expected
values, vectorized-vs-scalar parity (including the NUL fallback), and the
organic SQL oracle is exercised by `repetition` in correctness_sim.

Engine-side addition for training-data pipelines (Rae et al. 2021 §A1.1,
public); no linref counterpart.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd

from linref_ray.text import _repetition_features, repetition_signals


def _run(texts):
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
        }
    )
    return (
        repetition_signals(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_duplicate_lines_closed_form(ray_session):
    # 4 non-empty lines, "same" twice (2 dup lines, 8 dup chars of 21).
    doc = "same\nother\nsame\n\nunique22"
    out = _run([doc])
    assert out.n_lines[0] == 4
    assert out.frac_dup_lines[0] == 0.5
    assert abs(out.frac_dup_chars[0] - 8 / 21) < 1e-12


def test_bullet_and_ellipsis_lines(ray_session):
    doc = "- first\n* second\n• third\nplain\ntrailing...\n.."
    out = _run([doc])
    assert out.n_lines[0] == 6
    assert out.frac_bullet[0] == 0.5
    assert abs(out.frac_ellipsis[0] - 1 / 6) < 1e-12  # ".." is too short


def test_top_2gram_share(ray_session):
    # words: a b a b a -> 2-grams (a,b)x2 (b,a)x2 -> top 2 of 4
    out = _run(["a b a b a", "solo", ""])
    assert out.top_2gram_count.tolist() == [2, 0, 0]
    assert out.frac_top_2gram.tolist() == [0.5, 0.0, 0.0]
    assert out.n_lines.tolist() == [1, 1, 0]
    assert out.frac_dup_lines.tolist() == [0.0, 0.0, 0.0]


def test_case_sensitive_words_and_cross_line_grams(ray_session):
    # "The the" differ by case -> distinct 2-gram members; grams span lines.
    out = _run(["The the\nThe the"])
    # words: The the The the -> grams (The,the)x2 (the,The)x1 -> top 2/3
    assert out.top_2gram_count[0] == 2
    assert abs(out.frac_top_2gram[0] - 2 / 3) < 1e-12
    assert out.frac_dup_lines[0] == 1.0  # both lines identical


def test_nul_fallback_matches_vectorized_semantics(ray_session):
    # NUL in a text forces the scalar path for the whole batch; a NUL-free
    # twin batch must produce identical rows for the clean docs.
    clean = ["dup\ndup\n- b\nx y x y", "plain text..."]
    assert _repetition_features(clean + ["nul\x00here"]) is None
    with_nul = _run(clean + ["nul\x00here"])
    without = _run(clean)
    for c in without.columns:
        assert list(with_nul[c][:2]) == list(without[c])


def test_normalize_text_unicode_and_passthrough(ray_session):
    from linref_ray.text import normalize_text

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                ["  á x\t\ny  ", "ÀB", "plain"]
            ),
            "extra": pa.array([7, 8, 9], pa.int64()),
        }
    )
    out = (
        normalize_text(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # NFC composes a+combining-acute to U+00E1; whitespace runs collapse
    assert out.norm_text.tolist() == ["\u00e1 x y", "\u00c0B", "plain"]
    assert out.extra.tolist() == [7, 8, 9]  # non-text columns pass through
    low = (
        normalize_text(rd.from_arrow(tbl), lowercase=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert low.norm_text.tolist() == ["\u00e1 x y", "\u00e0b", "plain"]


def test_organic_vectorized_equals_scalar(ray_session):
    import pyarrow.parquet as pq

    texts = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )["text"].to_pylist()
    vec = _repetition_features(texts)
    assert vec is not None
    # scalar path: poison with one NUL doc, then compare the shared prefix
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts) + 1, dtype=np.int64)),
            "text": pa.array(texts + ["\x00"]),
        }
    )
    sc = (
        repetition_signals(
            rd.from_arrow(tbl).repartition(1)
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for k, v in vec.items():
        got = sc[k].values[: len(texts)]
        assert np.allclose(got, v, atol=1e-12), k
