"""TF-IDF top-terms: closed-form tiny corpus, tie-break order, and
batch/partition invariance (per-doc scoring must not depend on how docs
are batched). Organic SQL parity is gated by the `tfidf` oracle."""

import math

import pyarrow as pa
import ray.data as rd

from linref_ray.text import tfidf_topk


def _tiny():
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    ["cat cat dog", "dog bird", "fish fish fish cat"]
                ),
            }
        )
    )


def test_closed_form(ray_session):
    out = tfidf_topk(_tiny(), m=2).to_pandas()
    got = {
        (r.doc_id, r.token): r.tfidf for r in out.itertuples()
    }
    # df: cat=2, dog=2, bird=1, fish=1; N=3
    ln32 = math.log(3 / 2)
    ln31 = math.log(3 / 1)
    want = {
        (1, "cat"): 2 * ln32,
        (1, "dog"): 1 * ln32,
        (2, "bird"): 1 * ln31,
        (2, "dog"): 1 * ln32,
        (3, "fish"): 3 * ln31,
        (3, "cat"): 1 * ln32,
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_tie_break_token_asc(ray_session):
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                # doc 1: b and a have identical tf and df -> equal scores;
                # top-1 must pick 'a'
                "text": pa.array(["b a", "c"]),
            }
        )
    )
    out = tfidf_topk(docs, m=1).to_pandas()
    assert out[out.doc_id == 1]["token"].tolist() == ["a"]


def test_partition_invariance(ray_session):
    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    )
    a = (
        tfidf_topk(docs, m=3).to_pandas()
        .sort_values(["doc_id", "token"]).reset_index(drop=True)
    )
    b = (
        tfidf_topk(docs.repartition(7), m=3).to_pandas()
        .sort_values(["doc_id", "token"]).reset_index(drop=True)
    )
    assert a.equals(b)
