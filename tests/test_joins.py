"""hash_join unit tests: the partitioned Arrow join must match pandas-merge
semantics for left/inner/outer, duplicate keys, and missing matches."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from linref_ray.joins import hash_join


def _left():
    return rd.from_pandas(
        pd.DataFrame(
            {"k": [1, 2, 2, 3, 5], "lv": [10.0, 20.0, 21.0, 30.0, 50.0]}
        )
    )


def _right():
    return rd.from_pandas(
        pd.DataFrame({"k": [2, 3, 3, 4], "rv": [200, 300, 301, 400]})
    )


class TestHashJoin:
    def test_inner_with_duplicate_keys(self, ray_session):
        out = (
            hash_join(_left(), _right(), on="k", how="inner", num_partitions=3)
            .to_pandas()
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        # k=2 explodes 2x1, k=3 explodes 1x2
        assert out.k.tolist() == [2, 2, 3, 3]
        assert out.rv.tolist() == [200, 200, 300, 301]

    def test_left_keeps_unmatched_with_nulls(self, ray_session):
        ds = hash_join(
            _left(), _right(), on="k", how="left", num_partitions=3
        )
        # Arrow-level schema stays int64 (nullable) — no float upcast.
        import pyarrow as pa

        sch = ds.schema()
        assert sch.types[sch.names.index("rv")] == pa.int64()
        out = (
            ds.to_pandas()
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        assert len(out) == 6  # 1,2,2,3(x2),5
        unmatched = out[out.k.isin([1, 5])]
        assert unmatched.rv.isna().all()

    def test_outer_includes_right_only(self, ray_session):
        out = (
            hash_join(_left(), _right(), on="k", how="outer", num_partitions=3)
            .to_pandas()
            .sort_values(["k"])
            .reset_index(drop=True)
        )
        assert 4 in out.k.tolist()
        row4 = out[out.k == 4]
        assert row4.lv.isna().all() and row4.rv.tolist() == [400]

    def test_matches_pandas_merge_on_random_data(self, ray_session):
        rng = np.random.default_rng(3)
        l = pd.DataFrame(
            {"k": rng.integers(0, 50, 300), "lv": rng.random(300)}
        )
        r = pd.DataFrame(
            {"k": rng.integers(0, 50, 200), "rv": rng.random(200)}
        )
        for how in ("inner", "left", "outer"):
            got = (
                hash_join(
                    rd.from_pandas(l), rd.from_pandas(r), on="k", how=how,
                    num_partitions=4,
                )
                .to_pandas()
                .sort_values(["k", "lv", "rv"])
                .reset_index(drop=True)
            )
            exp = (
                l.merge(r, how=how, on="k")
                .sort_values(["k", "lv", "rv"])
                .reset_index(drop=True)
            )
            assert len(got) == len(exp), how
            assert np.allclose(
                got.k.astype(float).fillna(-1), exp.k.astype(float).fillna(-1)
            )
            for c in ("lv", "rv"):
                assert np.allclose(
                    got[c].astype(float).fillna(-1),
                    exp[c].astype(float).fillna(-1),
                ), (how, c)


class TestDistinctLeft:
    def test_dedups_full_left_rows_before_join(self, ray_session):
        import pandas as pd

        from linref_ray.joins import hash_join

        # duplicated (k, lv) rows on the left must collapse to one each,
        # regardless of which partition they land in
        l = pd.DataFrame(
            {"k": [1, 1, 1, 2, 2, 3, 3], "lv": [10, 10, 11, 20, 20, 30, 30]}
        )
        r = pd.DataFrame({"k": [1, 2, 3], "rv": ["a", "b", "c"]})
        got = (
            hash_join(
                rd.from_pandas(l), rd.from_pandas(r), on="k", how="inner",
                num_partitions=3, distinct_left=True,
            )
            .to_pandas()
            .sort_values(["k", "lv"])
            .reset_index(drop=True)
        )
        exp = (
            l.drop_duplicates()
            .merge(r, on="k")
            .sort_values(["k", "lv"])
            .reset_index(drop=True)
        )
        assert got[["k", "lv", "rv"]].equals(exp[["k", "lv", "rv"]])
