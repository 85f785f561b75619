"""dedup_segments (chunk-level exact dedup), bm25_scores, and the kNN
graph (brute + IVF). SQL parity at sf0.01 is gated by the
`dedup_segments` / `bm25` / `knn_graph` / `knn_graph_ivf` oracles in
__ray_entry__; these tests pin semantics on adversarial small shapes and
pure-Python references.
"""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _seg_reference(texts: dict[int, str], w: int) -> dict[int, str]:
    """Pure-Python reference: global first-occurrence wins per segment."""
    segs = []
    for d in sorted(texts):
        ws = texts[d].split(" ")
        for i in range(0, max(len(ws), 1), w):
            segs.append((d, i // w, " ".join(ws[i : i + w])))
    win: dict[str, tuple[int, int]] = {}
    for d, i, s in sorted(segs):
        win.setdefault(s, (d, i))
    out = {}
    for d in sorted(texts):
        ws = texts[d].split(" ")
        kept = []
        for i in range(0, max(len(ws), 1), w):
            s = " ".join(ws[i : i + w])
            if win[s] == (d, i // w):
                kept.extend(ws[i : i + w])
        out[d] = " ".join(kept)
    return out


def _run_segments(texts: dict[int, str], w: int) -> dict[int, str]:
    from linref_ray.dedup import dedup_segments

    df = pd.DataFrame(
        {"doc_id": sorted(texts), "text": [texts[d] for d in sorted(texts)]}
    )
    out = dedup_segments(rd.from_pandas(df), words_per_seg=w).to_pandas()
    return dict(zip(out.doc_id, out.text))


def test_segments_basic(ray_session):
    texts = {
        0: "a b c d e f",
        1: "x y z a b c",  # second occurrence of "a b c" dropped
        2: "a b c",        # whole doc duplicated -> ""
        3: "",             # empty doc
    }
    assert _run_segments(texts, 3) == _seg_reference(texts, 3)
    assert _run_segments(texts, 3)[2] == ""


def test_segments_within_doc_and_tail(ray_session):
    # same segment twice INSIDE one doc; ragged tail segments compete too
    texts = {
        5: "p q r p q r p q",   # seg0="p q r", seg1="p q r"(dup), seg2="p q"
        7: "p q",               # loses the "p q" tail to doc5's seg2
        9: "r p q",
    }
    got = _run_segments(texts, 3)
    assert got == _seg_reference(texts, 3)
    assert got[5] == "p q r p q"


def test_segments_random_matches_reference(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(12)]
    texts = {
        d: " ".join(rng.choice(vocab, size=rng.integers(0, 25)))
        for d in range(60)
    }
    for w in (1, 4, 10):
        assert _run_segments(texts, w) == _seg_reference(texts, w)


def _bm25_reference(texts, terms, k1=1.2, b=0.75):
    toks = {d: [x for x in t.lower().split(" ") if x] for d, t in texts.items()}
    n = len(texts)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for d, ws in toks.items():
        s = 0.0
        for term in terms:
            df = sum(1 for v in toks.values() if term in v)
            tf = ws.count(term)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (len(ws) / avgdl)))
        out[d] = s
    return out


def test_bm25_matches_reference(ray_session):
    from linref_ray.text import bm25_scores

    texts = {
        0: "spark merge window spark",
        1: "table join batch",
        2: "spark spark spark spark spark spark",
        3: "",
        4: "window merge",
    }
    df = pd.DataFrame(
        {"doc_id": sorted(texts), "text": [texts[d] for d in sorted(texts)]}
    )
    got = bm25_scores(
        rd.from_pandas(df), ("spark", "merge", "window")
    ).to_pandas()
    ref = _bm25_reference(texts, ("spark", "merge", "window"))
    for d, s in zip(got.doc_id, got.bm25):
        assert abs(s - ref[d]) < 1e-12
    # saturation: six occurrences score less than 6x one occurrence
    gm = dict(zip(got.doc_id, got.bm25))
    assert gm[2] < 6 * gm[0]
    assert gm[3] == 0.0


def _graph_reference(ids, m, k):
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    cos = mn @ mn.T
    out = []
    for i in range(len(ids)):
        cand = sorted(
            ((float(-cos[i, j]), int(ids[j])) for j in range(len(ids)) if j != i)
        )[:k]
        out.extend((int(ids[i]), v, -c) for c, v in cand)
    return sorted(out)


def test_knn_graph_matches_reference(ray_session):
    from linref_ray.similarity import knn_graph

    rng = np.random.default_rng(4)
    m = rng.normal(size=(40, 8))
    ids = np.arange(40)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in m], pa.list_(pa.float32())
            ),
        }
    )
    got = knn_graph(rd.from_arrow(tbl), k=3).to_pandas()
    got_t = sorted(
        (int(q), int(v), float(c))
        for q, v, c in zip(got.query_id, got.vec_id, got.cosine)
    )
    ref = _graph_reference(
        ids, np.asarray([np.asarray(v, np.float32) for v in m],
                        dtype=np.float64), 3
    )
    assert len(got_t) == len(ref)
    for (gq, gv, gc), (rq, rv, rc) in zip(got_t, ref):
        assert (gq, gv) == (rq, rv) and abs(gc - rc) < 1e-9


def test_knn_graph_ivf_exact_at_full_probe(ray_session):
    from linref_ray.similarity import knn_graph, knn_graph_ivf

    rng = np.random.default_rng(9)
    m = rng.normal(size=(60, 8)).astype(np.float32)
    ds = rd.from_arrow(pa.table(
        {
            "vec_id": pa.array(np.arange(60), pa.int64()),
            "embedding": pa.array(list(m), pa.list_(pa.float32())),
        }
    ))
    a = knn_graph(ds, k=4).to_pandas().sort_values(
        ["query_id", "vec_id"]).reset_index(drop=True)
    b = knn_graph_ivf(ds, k=4, n_centroids=4, nprobe=4).to_pandas(
    ).sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    assert list(a.query_id) == list(b.query_id)
    assert list(a.vec_id) == list(b.vec_id)
    assert np.allclose(a.cosine, b.cosine, atol=1e-12)


def test_knn_graph_ivf_recall_on_clustered(ray_session):
    from linref_ray.similarity import knn_graph, knn_graph_ivf

    # tight clusters: selective probing still finds the true neighbors
    rng = np.random.default_rng(2)
    centers = rng.normal(size=(6, 8)) * 10
    m = np.concatenate(
        [c + rng.normal(size=(20, 8)) * 0.1 for c in centers]
    ).astype(np.float32)
    ds = rd.from_arrow(pa.table(
        {
            "vec_id": pa.array(np.arange(len(m)), pa.int64()),
            "embedding": pa.array(list(m), pa.list_(pa.float32())),
        }
    ))
    exact = knn_graph(ds, k=3).to_pandas()
    approx = knn_graph_ivf(ds, k=3, n_centroids=6, nprobe=2).to_pandas()
    e = set(zip(exact.query_id, exact.vec_id))
    a = set(zip(approx.query_id, approx.vec_id))
    assert len(a & e) / len(e) > 0.95


def _spans_reference(texts: dict[int, str], w: int) -> dict[int, str]:
    """Pure-Python ExactSubstr removal reference."""
    first: dict[str, tuple[int, int]] = {}
    for d in sorted(texts):
        t = texts[d]
        for p in range(len(t) - w + 1):
            first.setdefault(t[p : p + w], (d, p))
    out = {}
    for d in sorted(texts):
        t = texts[d]
        cut = np.zeros(len(t), dtype=bool)
        for p in range(len(t) - w + 1):
            if first[t[p : p + w]] != (d, p):
                cut[p : p + w] = True
        out[d] = "".join(c for c, x in zip(t, cut) if not x)
    return out


def _run_spans(texts: dict[int, str], w: int, **kw) -> dict[int, str]:
    from linref_ray.dedup import remove_duplicate_spans

    df = pd.DataFrame(
        {"doc_id": sorted(texts), "text": [texts[d] for d in sorted(texts)]}
    )
    out = remove_duplicate_spans(
        rd.from_pandas(df), window=w, **kw
    ).to_pandas()
    return dict(zip(out.doc_id, out.text))


def test_remove_spans_basic(ray_session):
    texts = {
        0: "abcdefghij",
        1: "xxabcdefghijyy",  # embedded copy cut, flanks survive
        2: "abcd",            # exactly one window, duplicated -> ""
        3: "zzzz",
    }
    got = _run_spans(texts, 4)
    assert got == _spans_reference(texts, 4)
    assert got[1] == "xxyy" and got[2] == ""


def test_remove_spans_within_doc_and_unicode(ray_session):
    texts = {
        1: "héllo wörld héllo wörld",  # self-repeat: second copy cut
        2: "ascii only text here",
    }
    got = _run_spans(texts, 5)
    assert got == _spans_reference(texts, 5)
    assert got[1].startswith("héllo wörld")
    assert len(got[1]) < len(texts[1])


def test_remove_spans_random_matches_reference(ray_session):
    rng = np.random.default_rng(17)
    alpha = list("abcdef ")
    texts = {}
    shared = "".join(rng.choice(alpha, size=30))
    for d in range(40):
        t = "".join(rng.choice(alpha, size=rng.integers(0, 60)))
        if d % 3 == 0:  # plant the shared span mid-doc
            cutp = len(t) // 2
            t = t[:cutp] + shared + t[cutp:]
        texts[d] = t
    for w in (8, 16):
        assert _run_spans(texts, w) == _spans_reference(texts, w)


def test_remove_spans_sampled_catches_long_spans(ray_session):
    # keep_mod>1: content-defined sampling still removes most of a LONG
    # duplicated span (some flank chars may survive; nothing unique is cut)
    rng = np.random.default_rng(23)
    alpha = list("abcdefgh ")
    shared = "".join(rng.choice(alpha, size=200))
    texts = {
        0: shared,
        1: "UNIQ" + shared + "TAIL",
    }
    got = _run_spans(texts, 16, keep_mod=4)
    exact = _spans_reference(texts, 16)
    assert got[0] == shared                      # winner doc untouched
    assert "UNIQ" in got[1] and "TAIL" in got[1]  # unique flanks survive
    assert len(got[1]) < len(texts[1]) - 150      # bulk of the copy removed
    assert len(exact[1]) <= len(got[1])           # sampling only under-cuts


def test_chunk_documents_coverage_and_overlap(ray_session):
    from linref_ray.text import chunk_documents

    texts = {0: " ".join(f"w{i}" for i in range(100)), 1: "a b", 2: ""}
    df = pd.DataFrame(
        {"doc_id": sorted(texts), "text": [texts[d] for d in sorted(texts)]}
    )
    out = chunk_documents(
        rd.from_pandas(df), chunk_words=16, stride=12
    ).to_pandas().sort_values(["doc_id", "chunk_idx"])
    for d, t in texts.items():
        ws = t.split(" ")
        ch = out[out.doc_id == d]
        # chunk count, starts, and exact text
        import math
        assert len(ch) == math.ceil(len(ws) / 12)
        for _, r in ch.iterrows():
            assert r.word_start == r.chunk_idx * 12
            assert r.text == " ".join(ws[r.word_start : r.word_start + 16])
        # every word covered
        covered = set()
        for _, r in ch.iterrows():
            covered |= set(range(r.word_start, min(r.word_start + 16, len(ws))))
        assert covered == set(range(len(ws)))


def test_knn_join_cross_table(ray_session):
    from linref_ray.similarity import knn_join

    rng = np.random.default_rng(6)
    qm = rng.normal(size=(10, 8)).astype(np.float32)
    cm = rng.normal(size=(50, 8)).astype(np.float32)

    def mk(ids, m):
        return rd.from_arrow(pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(list(m), pa.list_(pa.float32())),
            }
        ))

    got = knn_join(
        mk(np.arange(10), qm), mk(np.arange(100, 150), cm), k=4
    ).to_pandas()
    qn = qm.astype(np.float64)
    qn /= np.linalg.norm(qn, axis=1, keepdims=True)
    cn = cm.astype(np.float64)
    cn /= np.linalg.norm(cn, axis=1, keepdims=True)
    cos = qn @ cn.T
    for q in range(10):
        exp = sorted(
            ((-cos[q, j], 100 + j) for j in range(50))
        )[:4]
        sub = got[got.query_id == q].sort_values(
            ["cosine", "vec_id"], ascending=[False, True])
        assert list(sub.vec_id) == [v for _, v in exp]
        assert np.allclose(sorted(sub.cosine), sorted(-c for c, _ in exp),
                           atol=1e-12)
    assert len(got) == 40


class TestKnnGraphPQ:
    def test_recall_at_5_of_true_nn(self, ray_session):
        # Standard PQ evaluation (Recall@R): does the TRUE nearest
        # neighbor appear in the PQ top-5? Planted twin pairs make the
        # true NN unambiguous (twin = base + tiny noise).
        import ray.data as rd

        from linref_ray.similarity import knn_graph, knn_graph_pq

        rng = np.random.default_rng(9)
        nb, d = 1200, 64
        base = rng.normal(size=(nb, d))
        twin = base + rng.normal(size=(nb, d)) * 0.01
        mzt = np.concatenate([base, twin])
        n = len(mzt)
        ds = rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(np.arange(n), pa.int64()),
                    "embedding": pa.array(
                        list(mzt.astype(np.float32)), pa.list_(pa.float32())
                    ),
                }
            )
        ).repartition(8).materialize()
        brute = knn_graph(ds, k=1).to_pandas()
        top1 = dict(zip(brute.query_id, brute.vec_id))
        # sanity: the planted twin IS the exact top-1 almost always
        twin_of = {i: i + nb for i in range(nb)}
        twin_of.update({i + nb: i for i in range(nb)})
        exact_ok = sum(top1[q] == twin_of[q] for q in top1) / n
        assert exact_ok > 0.99
        pq = knn_graph_pq(
            ds, k=5, m=8, n_codes=256, sample=2048
        ).to_pandas()
        hit = (
            pq.assign(truth=pq.query_id.map(top1))
            .query("vec_id == truth")
            .query_id.nunique()
        )
        recall_at_5 = hit / n
        assert recall_at_5 >= 0.9, recall_at_5

    def test_codes_are_small(self, ray_session):
        import ray.data as rd

        from linref_ray.similarity import _pq_encode_matrix, pq_train

        rng = np.random.default_rng(3)
        m = rng.normal(size=(500, 64))
        ds = rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(np.arange(500), pa.int64()),
                    "embedding": pa.array(
                        list(m.astype(np.float32)), pa.list_(pa.float32())
                    ),
                }
            )
        )
        books = pq_train(ds, m=8, k=256, sample=500)
        codes = _pq_encode_matrix(m, books)
        assert codes.shape == (500, 8) and codes.dtype == np.uint8
        # 8 bytes/vector vs 512 for float64 raw — the 64x broadcast win
        assert codes.nbytes * 64 == m.astype(np.float64).nbytes
