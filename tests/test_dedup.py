"""Pipeline tests for the dedup cascades (minhash / simhash / embedding).

Covers the distributed exact-verification path (texts joined onto candidate
pairs — nothing collected to the driver), the hot-bucket chain-pair cap, and
the tiled within-bucket verification equivalence.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from linref_ray.dedup import (
    exact_dedup,
    minhash_near_duplicates,
    simhash_near_duplicates,
)
from linref_ray.kernels.hashing import hamming64, simhash
from linref_ray.similarity import embedding_near_duplicates


def _doc_corpus():
    """20 docs: 3 near-dup families (small edits) + distinct fillers."""
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill in the afternoon sun near the garden"
    )
    alt = (
        "machine learning pipelines shuffle large datasets across many "
        "worker nodes using partitioned joins and streaming aggregation"
    )
    rows = []
    for i in range(4):  # family A: tiny suffix edits → high jaccard
        rows.append((i, base + f" extra{i % 2}"))
    for i in range(3):  # family B
        rows.append((10 + i, alt + (" today" if i else "")))
    for i in range(10):  # distinct fillers
        rows.append(
            (100 + i, f"unique document number {i} " + " ".join(
                f"tok{i}_{j}" for j in range(30)
            ))
        )
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _components(pairs: pd.DataFrame) -> dict[int, int]:
    """Union-find over (id_a, id_b) → id -> component root."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs.id_a, pairs.id_b):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[rb] = ra
    return {k: find(k) for k in parent}


class TestMinhashPipeline:
    def test_finds_families_no_driver_collect(self, ray_session):
        docs = rd.from_pandas(_doc_corpus())
        out = minhash_near_duplicates(
            docs, threshold=0.6, num_partitions=4
        ).to_pandas()
        comp = _components(out)
        # Family A (0..3) fully connected, family B (10..12) connected.
        assert len({comp[i] for i in range(4)}) == 1
        assert len({comp[i] for i in (10, 11, 12)}) == 1
        # No cross-family or filler pairs.
        fam_a = set(range(4))
        for a, b in zip(out.id_a, out.id_b):
            assert (a in fam_a) == (b in fam_a)
            assert a < 100 and b < 100
        assert (out.jaccard >= 0.6).all()

    def test_dup_heavy_corpus_matches_uncapped(self, ray_session):
        # 10x-duplicated corpus: every bucket is hot. Capped chain pairs
        # must keep each duplicate cluster connected.
        rows = []
        for fam in range(5):
            text = f"family {fam} " + " ".join(
                f"w{fam}_{j} common shared words here" for j in range(20)
            )
            for c in range(10):
                rows.append((fam * 100 + c, text + ("" if c < 9 else " x")))
        docs = rd.from_pandas(pd.DataFrame(rows, columns=["doc_id", "text"]))
        full = minhash_near_duplicates(
            docs, threshold=0.8, num_partitions=4, max_bucket=10_000
        ).to_pandas()
        capped = minhash_near_duplicates(
            docs, threshold=0.8, num_partitions=4, max_bucket=4
        ).to_pandas()
        cf = _components(full)
        cc = _components(capped)
        for fam in range(5):
            ids = [fam * 100 + c for c in range(10)]
            assert len({cf[i] for i in ids}) == 1
            # chain pairs preserve cluster connectivity
            assert len({cc[i] for i in ids}) == 1
        # capped path emits strictly fewer (or equal) pairs, all verified
        assert len(capped) <= len(full)
        assert (capped.jaccard >= 0.8).all()

    def test_custom_column_names(self, ray_session):
        # id_col/text_col must flow through the signature stage too.
        rows = _doc_corpus().rename(columns={"doc_id": "id", "text": "body"})
        docs = rd.from_pandas(rows)
        out = minhash_near_duplicates(
            docs, threshold=0.6, num_partitions=4,
            id_col="id", text_col="body",
        ).to_pandas()
        comp = _components(out)
        assert len({comp[i] for i in range(4)}) == 1

    def test_no_candidates(self, ray_session):
        docs = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": range(6),
                    "text": [
                        " ".join(f"only{i}_{j}" for j in range(40))
                        for i in range(6)
                    ],
                }
            )
        )
        out = minhash_near_duplicates(docs, num_partitions=4)
        assert out.count() == 0


class TestSimhashTiling:
    def test_tiled_equals_naive(self, ray_session):
        docs = _doc_corpus()
        ds = rd.from_pandas(docs)
        out = (
            simhash_near_duplicates(ds, max_hamming=10, prefix_bits=2)
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        # Naive check: group by prefix, all-pairs hamming.
        sigs = {
            int(i): np.uint64(simhash(t, 3)) for i, t in
            zip(docs.doc_id, docs.text)
        }
        expected = set()
        ids = sorted(sigs)
        by_prefix: dict[int, list[int]] = {}
        for i in ids:
            by_prefix.setdefault(int(sigs[i] >> np.uint64(62)), []).append(i)
        for members in by_prefix.values():
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    a, b = members[x], members[y]
                    hd = int(
                        hamming64(
                            np.array([sigs[a]]), np.array([sigs[b]])
                        )[0]
                    )
                    if hd <= 10:
                        expected.add((min(a, b), max(a, b), hd))
        got = {
            (int(r.id_a), int(r.id_b), int(r.hamming))
            for r in out.itertuples()
        }
        assert got == expected


class TestEmbeddingNearDup:
    def test_tiled_verify_finds_planted_cluster(self, ray_session):
        rng = np.random.Generator(np.random.PCG64(5))
        base = rng.normal(size=8)
        vecs, ids = [], []
        for i in range(6):  # planted near-dup cluster
            vecs.append(base + rng.normal(scale=0.01, size=8))
            ids.append(i)
        for i in range(20):  # random background
            vecs.append(rng.normal(size=8))
            ids.append(100 + i)
        tbl = pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    pa.list_(pa.float32()),
                ),
            }
        )
        ds = rd.from_arrow(tbl)
        out = embedding_near_duplicates(
            ds, threshold=0.99, lsh_planes=4
        ).to_pandas()
        comp = _components(out)
        assert len({comp.get(i, i) for i in range(6)}) == 1
        assert not any(a >= 100 or b >= 100 for a, b in zip(out.id_a, out.id_b))

    def test_capped_bucket_chains(self, ray_session):
        rng = np.random.Generator(np.random.PCG64(9))
        base = rng.normal(size=8)
        n = 50
        tbl = pa.table(
            {
                "vec_id": pa.array(list(range(n)), pa.int64()),
                "embedding": pa.array(
                    [
                        list(map(float, base + rng.normal(scale=0.005, size=8)))
                        for _ in range(n)
                    ],
                    pa.list_(pa.float32()),
                ),
            }
        )
        ds = rd.from_arrow(tbl)
        out = embedding_near_duplicates(
            ds, threshold=0.99, lsh_planes=2, max_bucket=8
        ).to_pandas()
        comp = _components(out)
        # chain pairs keep the single cluster connected
        assert len({comp[i] for i in range(n)}) == 1
        assert len(out) < n * (n - 1) // 2


class TestExactDedup:
    def test_keep_first_and_counts(self, ray_session):
        docs = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": [5, 1, 2, 3],
                    "text": ["x", "x", "y", "x"],
                }
            )
        )
        out = exact_dedup(docs).to_pandas().sort_values("doc_id")
        assert out.doc_id.tolist() == [1, 2]
        assert out.n_copies.tolist() == [3, 1]


class TestVerifyCapFallback:
    def test_pair_jaccard_identical_under_tiny_cap(self, monkeypatch):
        """Forcing the padded-matrix cap to zero routes pair verification
        through the packed-searchsorted CSR path — jaccards must be
        identical, including against a brute-force set computation."""
        from linref_ray.dedup import pair_jaccard
        from linref_ray.kernels import hashing as H
        from linref_ray.kernels.hashing import shingle_hashes

        rng = np.random.default_rng(9)
        words = [f"w{i}" for i in range(80)]
        docs = [
            " ".join(rng.choice(words, size=40).tolist()) for _ in range(30)
        ]
        ia = rng.integers(0, 30, size=100)
        ib = (ia + 1 + rng.integers(0, 29, size=100)) % 30
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        ta = [docs[i] for i in lo]
        tb = [docs[i] for i in hi]
        base = pair_jaccard(lo, hi, ta, tb, 3)
        monkeypatch.setattr(H, "_MATRIX_CELL_CAP", 0)
        capped = pair_jaccard(lo, hi, ta, tb, 3)
        assert np.allclose(base, capped)
        # brute-force ground truth on a few pairs
        for r in range(0, 100, 17):
            sa = set(shingle_hashes(ta[r], 3).tolist())
            sb = set(shingle_hashes(tb[r], 3).tolist())
            exp = len(sa & sb) / len(sa | sb) if sa | sb else 0.0
            assert base[r] == pytest.approx(exp)


class TestNgramJaccardExact:
    """The prefix-filtered exact Jaccard join must equal brute-force
    all-pairs exact Jaccard — deterministic, complete, no recall loss."""

    @staticmethod
    def _brute(df, threshold, k=3):
        from linref_ray.kernels.hashing import shingle_hashes

        sets = {
            int(r.doc_id): set(shingle_hashes(r.text, k).tolist())
            for r in df.itertuples()
        }
        ids = sorted(sets)
        out = []
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                u = sets[a] | sets[b]
                j = len(sets[a] & sets[b]) / len(u) if u else 0.0
                if j >= threshold:
                    out.append((a, b, j))
        return sorted(out)

    def _run(self, df, threshold, **kw):
        from linref_ray.dedup import ngram_jaccard_pairs

        got = (
            ngram_jaccard_pairs(
                rd.from_pandas(df), threshold=threshold, **kw
            )
            .to_pandas()
            .sort_values(["id_a", "id_b"])
        )
        return [
            (int(a), int(b), float(j))
            for a, b, j in zip(got.id_a, got.id_b, got.jaccard)
        ]

    def test_matches_bruteforce_mid_threshold(self, ray_session):
        # Overlapping docs built from shared sentence fragments so the
        # brute-force pair set is non-trivial at every threshold tested.
        rng = np.random.default_rng(31)
        frags = [
            [f"s{s}w{j}" for j in range(6)] for s in range(8)
        ]
        rows = []
        for i in range(40):
            picks = rng.choice(8, size=3, replace=False)
            toks = [w for p in picks for w in frags[p]]
            if i % 4 == 0:
                toks = toks + [f"extra{i}"]
            rows.append((i, " ".join(toks)))
        df = pd.DataFrame(rows, columns=["doc_id", "text"])
        for thr in (0.3, 0.5, 0.8):
            exp = self._brute(df, thr)
            got = self._run(df, thr)
            assert [(a, b) for a, b, _ in got] == [
                (a, b) for a, b, _ in exp
            ], f"pair set mismatch at t={thr}"
            assert np.allclose(
                [j for *_, j in got], [j for *_, j in exp]
            )

    def test_family_corpus_and_superset_of_minhash(self, ray_session):
        df = _doc_corpus()
        exp = self._brute(df, 0.6)
        got = self._run(df, 0.6)
        assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in exp]
        mh = minhash_near_duplicates(
            rd.from_pandas(df), threshold=0.6
        ).to_pandas()
        assert set(zip(mh.id_a, mh.id_b)) <= {
            (a, b) for a, b, _ in got
        }

    def test_short_and_empty_docs(self, ray_session):
        df = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": ["", "", "one", "totally different words here"],
            }
        )
        got = self._run(df, 0.9)
        # the two empty docs share the all-pad shingle → jaccard 1.0
        assert (1, 2, 1.0) in got


class TestDedupCorpus:
    def test_keeps_min_id_per_component(self, ray_session):
        from linref_ray.dedup import dedup_corpus

        docs = rd.from_pandas(
            pd.DataFrame(
                {"doc_id": [1, 2, 3, 7, 9, 20], "text": ["x"] * 6}
            )
        )
        # components: {1,2,3} (chain), {7,9}; 20 unpaired
        pairs = rd.from_pandas(
            pd.DataFrame({"id_a": [1, 2, 7], "id_b": [2, 3, 9]})
        )
        out = dedup_corpus(docs, pairs).to_pandas()
        assert sorted(out.doc_id) == [1, 7, 20]

    def test_string_ids_image_pairs(self, ray_session):
        import pyarrow as pa

        from linref_ray.dedup import dedup_corpus

        docs = rd.from_arrow(
            pa.table({"doc_id": ["a", "b", "c"], "val": [1, 2, 3]})
        )
        pairs = rd.from_arrow(pa.table({"id_a": ["b"], "id_b": ["c"]}))
        out = dedup_corpus(docs, pairs).to_pandas()
        assert sorted(out.doc_id) == ["a", "b"]

    def test_no_pairs_identity(self, ray_session):
        from linref_ray.dedup import dedup_corpus

        docs = rd.from_pandas(
            pd.DataFrame({"doc_id": [1, 2], "text": ["a", "b"]})
        )
        pairs = rd.from_pandas(
            pd.DataFrame({"id_a": pd.array([], dtype="int64"),
                          "id_b": pd.array([], dtype="int64")})
        )
        out = dedup_corpus(docs, pairs).to_pandas()
        assert sorted(out.doc_id) == [1, 2]
