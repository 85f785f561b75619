"""Deterministic hash sampling/splitting and top-k vocabulary.

Engine-side training-data-pipeline ops (no linref counterpart). SQL parity
of the bucket formula is gated by the `hash_sample`/`hash_split` oracles in
__ray_entry__; these tests pin the determinism properties that make the
ops usable at scale: partition-independence, nested-sample containment,
split disjointness/exhaustiveness.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd

from linref_ray.sampling import hash_buckets, hash_sample, hash_split
from linref_ray.text import vocab_topk

SF_DIR = "/root/testdata/sf0.001"


def _docs():
    return rd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])


def test_sample_partition_independent(ray_session):
    docs = _docs()
    a = sorted(hash_sample(docs, 0.25, "doc_id", salt=7)
               .to_pandas()["doc_id"])
    b = sorted(hash_sample(docs.repartition(7), 0.25, "doc_id", salt=7)
               .to_pandas()["doc_id"])
    assert a == b
    assert 0 < len(a) < docs.count()


def test_nested_fractions_contained(ray_session):
    docs = _docs()
    small = set(hash_sample(docs, 0.1, "doc_id").to_pandas()["doc_id"])
    big = set(hash_sample(docs, 0.3, "doc_id").to_pandas()["doc_id"])
    assert small <= big


def test_salts_draw_different_samples(ray_session):
    docs = _docs()
    s0 = set(hash_sample(docs, 0.3, "doc_id", salt=0).to_pandas()["doc_id"])
    s1 = set(hash_sample(docs, 0.3, "doc_id", salt=1).to_pandas()["doc_id"])
    assert s0 != s1


def test_fraction_one_keeps_everything(ray_session):
    docs = _docs()
    assert hash_sample(docs, 1.0, "doc_id").count() == docs.count()


def test_split_disjoint_exhaustive_stable(ray_session):
    docs = _docs()
    out = hash_split(docs).to_pandas()
    assert len(out) == docs.count()
    assert set(out["split"]) <= {"train", "val", "test"}
    # per-row assignment is a pure function of the key: repartitioned input
    # assigns identically
    out2 = hash_split(docs.repartition(5)).to_pandas()
    m1 = dict(zip(out["doc_id"], out["split"]))
    m2 = dict(zip(out2["doc_id"], out2["split"]))
    assert m1 == m2
    # fractions roughly honored (hash uniformity; loose band at 50 docs)
    frac_train = (out["split"] == "train").mean()
    assert 0.5 < frac_train < 1.0


def test_bucket_formula_matches_exact_arithmetic():
    keys = np.array([0, 1, 2, 12345, 2**31 - 1, 2**40], dtype=np.int64)
    got = hash_buckets(keys, salt=3)
    want = [((int(k) ^ (3 * 2654435769)) * 2654435761) % 2**32 for k in keys]
    assert got.tolist() == want


def test_vocab_topk_matches_counter(ray_session):
    from collections import Counter

    docs = _docs()
    texts = docs.to_pandas()["text"]
    cnt = Counter(w for s in texts for w in s.lower().split(" ") if w)
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = vocab_topk(docs, n=10).to_pandas()
    got_pairs = sorted(
        zip(got["token"], got["n"]), key=lambda kv: (-kv[1], kv[0])
    )
    assert [(t, int(n)) for t, n in got_pairs] == want


def test_vocab_topk_n_larger_than_vocab(ray_session):
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["a b a", "b a"])})
    )
    got = vocab_topk(docs, n=100).to_pandas()
    assert sorted(zip(got["token"], got["n"])) == [("a", 3), ("b", 2)]


def test_weighted_sample_extremes_and_determinism(ray_session):
    from linref_ray.sampling import weighted_hash_sample

    t = pa.table(
        {
            "doc_id": pa.array(list(range(100)), pa.int64()),
            "p": pa.array([0.0] * 50 + [1.0] * 50),
        }
    )
    ds = rd.from_arrow(t)
    out = weighted_hash_sample(ds, "p", "doc_id").to_pandas()
    # p=0 rows never survive, p=1 rows always do
    assert sorted(out["doc_id"]) == list(range(50, 100))
    # clipping: out-of-range probabilities behave as 0/1
    t2 = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "p": pa.array([-3.0, 7.0]),
        }
    )
    out2 = weighted_hash_sample(rd.from_arrow(t2), "p", "doc_id").to_pandas()
    assert sorted(out2["doc_id"]) == [2]


def test_stratified_sample_respects_per_stratum_fractions(ray_session):
    from linref_ray.sampling import stratified_sample

    n = 3000
    t = pa.table(
        {
            "vec_id": pa.array(list(range(n)), pa.int64()),
            "label": pa.array([i % 3 for i in range(n)], pa.int32()),
        }
    )
    ds = rd.from_arrow(t)
    out = stratified_sample(
        ds, "label", {0: 0.0, 1: 1.0, 2: 0.5}, "vec_id"
    ).to_pandas()
    by = out.groupby("label").size().to_dict()
    assert 0 not in by           # fraction 0 -> empty stratum
    assert by[1] == n // 3       # fraction 1 -> full stratum
    assert 0.35 * n / 3 < by.get(2, 0) < 0.65 * n / 3
    # unlisted strata use the default
    out2 = stratified_sample(
        ds, "label", {}, "vec_id", default=1.0
    ).to_pandas()
    assert len(out2) == n


def test_pack_sequences_prefix_scan(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from linref_ray.sampling import pack_sequences

    rng = np.random.default_rng(7)
    # sparse, shuffled, multi-bucket ids; some empty docs
    ids = rng.choice(10_000, size=300, replace=False)
    texts = [
        " ".join(f"t{j}" for j in range(rng.integers(0, 40)))
        for _ in ids
    ]
    df = pd.DataFrame({"doc_id": ids, "text": texts})
    out = (
        pack_sequences(rd.from_pandas(df), seq_len=64, bucket_size=128)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = df.copy()
    ref["n_tokens"] = [len([w for w in t.split(" ") if w]) for t in texts]
    ref = ref.sort_values("doc_id").reset_index(drop=True)
    exp_off = np.concatenate(([0], np.cumsum(ref.n_tokens)[:-1]))
    assert list(out.doc_id) == list(ref.doc_id)
    assert list(out.n_tokens) == list(ref.n_tokens)
    assert list(out.tok_offset) == list(exp_off)
    assert list(out.first_seq) == list(exp_off // 64)
    assert list(out.last_seq) == list(
        (exp_off + np.maximum(ref.n_tokens, 1) - 1) // 64
    )


class TestGopherRules:
    def test_rules_fire_individually(self, ray_session):
        import ray.data as rd

        from linref_ray.text import gopher_rules

        good = "the quick brown fox and that dog have fun with all of " * 20
        docs = [
            good,                                   # passes everything
            "too short of the and",                 # r_words fails
            good + " ###" * 60,                     # r_symbols fails
            "\n".join(["- bullet the of and that have with to be"] * 9)
            + "\n" + good,                          # exactly 0.9 → passes
            "\n".join([good[:40] + "..."] * 9 + [good]),  # r_ellipsis fails
            good + " 123 456 789 " * 80,            # r_alpha fails
            " ".join(["zz yy xx ww vv"] * 40),      # r_stop fails
        ]
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs),
                }
            )
        )
        out = gopher_rules(ds).to_pandas().set_index("doc_id").sort_index()
        assert bool(out.loc[0, "keep"])
        assert not out.loc[1, "r_words"]
        assert not out.loc[2, "r_symbols"]
        assert bool(out.loc[3, "r_bullets"])  # 9/10 lines == 0.9 boundary
        assert not out.loc[4, "r_ellipsis"]
        assert not out.loc[5, "r_alpha"]
        assert not out.loc[6, "r_stop"]

    def test_bullet_threshold_boundary(self, ray_session):
        import ray.data as rd

        from linref_ray.text import gopher_rules

        base = "the of and that have with to be words " * 10
        mostly_bullets = "\n".join(["- x"] * 95 + [base] * 5)
        all_bullets = "\n".join(["- " + base] * 10)
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array([mostly_bullets, all_bullets]),
                }
            )
        )
        out = gopher_rules(ds).to_pandas().set_index("doc_id")
        assert not out.loc[0, "r_bullets"]  # 95% > 90%
        assert not out.loc[1, "r_bullets"]  # 100%


def test_cap_per_source_keeps_topk_with_tiebreak(ray_session):
    import ray.data as rd

    from linref_ray.sampling import cap_per_source

    # two sources; source "b" has ties on the order column, broken by id asc
    t = pa.table(
        {
            "doc_id": pa.array(list(range(10)), pa.int64()),
            "source": pa.array(["a"] * 6 + ["b"] * 4),
            "n_chars": pa.array([5, 9, 7, 9, 1, 3, 4, 4, 4, 2], pa.int64()),
        }
    )
    out = (
        cap_per_source(rd.from_arrow(t), cap=2, num_partitions=4)
        .to_pandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [1, 3, 6, 7]
