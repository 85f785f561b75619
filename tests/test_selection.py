"""Selection surface + small reference-parity ops: select by
index/mask/slice, drop, drop_group, equal_groups, value_counts wide pivot,
check_exact_geoms (reference ``events/selection.py:146-294``,
``events/relate.py:2088-2110``, ``relate.py:969-1018``, ``ext/base.py:694-709``).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from linref_ray import events as ev
from linref_ray.api import Events
from linref_ray.lrs import LRS

L = LRS(key_col=("route",), beg_col="beg", end_col="end", closed="right")


@pytest.fixture
def coll(ray_session):
    return rd.from_pandas(
        pd.DataFrame(
            {
                "event_id": [10, 3, 7, 1, 5],
                "route": ["A", "A", "B", "B", "B"],
                "beg": [0.0, 1, 0, 1, 2],
                "end": [1.0, 2, 1, 2, 3],
            }
        )
    )


class TestSelection:
    def test_select_index(self, coll):
        out = ev.select_index(coll, [3, 7]).to_pandas()
        assert sorted(out.event_id) == [3, 7]

    def test_drop(self, coll):
        out = ev.drop(coll, [3, 7]).to_pandas()
        assert sorted(out.event_id) == [1, 5, 10]

    def test_select_mask_id_sorted_order(self, coll):
        # ids sorted: [1, 3, 5, 7, 10]; mask picks positions 0, 2, 4
        out = ev.select_mask(coll, [True, False, True, False, True]).to_pandas()
        assert sorted(out.event_id) == [1, 5, 10]

    def test_select_mask_wrong_length(self, coll):
        with pytest.raises(ValueError, match="mask length"):
            ev.select_mask(coll, [True, False])

    def test_select_slice(self, coll):
        # positions 1:4 over id-sorted order -> ids 3, 5, 7
        out = ev.select_slice(coll, slice(1, 4)).to_pandas()
        assert sorted(out.event_id) == [3, 5, 7]
        out2 = ev.select_slice(coll, slice(None, None, 2)).to_pandas()
        assert sorted(out2.event_id) == [1, 5, 10]

    def test_generic_select_dispatch(self, coll):
        assert sorted(
            ev.select(coll, slice(0, 2)).to_pandas().event_id
        ) == [1, 3]
        assert sorted(
            ev.select(coll, np.array([10, 1])).to_pandas().event_id
        ) == [1, 10]
        assert sorted(
            ev.select(coll, np.array([False, True, False, True, False]))
            .to_pandas().event_id
        ) == [3, 7]

    def test_positional_selection_rejects_duplicate_ids(self, ray_session):
        dup = rd.from_pandas(
            pd.DataFrame(
                {"event_id": [1, 1, 2], "route": ["A"] * 3,
                 "beg": [0.0, 1, 2], "end": [1.0, 2, 3]}
            )
        )
        with pytest.raises(ValueError, match="unique"):
            ev.select_mask(dup, [True, False, False])
        with pytest.raises(ValueError, match="unique"):
            ev.select_slice(dup, slice(0, 1))

    def test_drop_group(self, coll):
        out = ev.drop_group(coll, L, "B").to_pandas()
        assert sorted(out.event_id) == [3, 10]

    def test_facade(self, coll):
        e = Events(coll, L)
        assert e.select_slice(slice(0, 1)).count() == 1
        assert e.drop([10]).count() == 4
        assert e.drop_group("A").count() == 3


class TestEqualGroups:
    def test_cross_product_within_groups(self, ray_session, coll):
        from linref_ray.relate import Relation

        right = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [100, 101],
                    "route": ["A", "B"],
                    "beg": [5.0, 5.0],
                    "end": [6.0, 6.0],
                }
            )
        )
        rel = Relation(coll, right, L, num_partitions=4)
        pairs = rel.equal_groups().to_pandas()
        got = {(int(a), int(b)) for a, b in zip(pairs.left_id, pairs.right_id)}
        # group equality ignores measures entirely
        assert got == {(10, 100), (3, 100), (7, 101), (1, 101), (5, 101)}


class TestValueCountsWide:
    def test_pivot(self, ray_session):
        from linref_ray.relate import Relation, value_counts_wide

        pts = rd.from_pandas(
            pd.DataFrame({"event_id": [0, 1], "route": ["1", "1"],
                          "loc": [5.0, 6.0]})
        )
        lines = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [10, 11, 12],
                    "route": ["1"] * 3,
                    "beg": [0.0, 0.0, 5.5],
                    "end": [10.0, 10.0, 10.0],
                    "cat": ["x", "y", "y"],
                }
            )
        )
        rel = Relation(
            pts, lines,
            LRS(key_col=("route",), beg_col=None, end_col=None,
                loc_col="loc", closed="both"),
            LRS(key_col=("route",), closed="both"),
            right_cols=["cat"], num_partitions=4,
        )
        wide = value_counts_wide(rel.value_counts("cat"), "event_id", "cat")
        wide = wide.sort_values("event_id").reset_index(drop=True)
        assert list(wide.columns) == ["event_id", "x", "y"]
        # point 0 at 5.0: inside [0,10]x2 only; point 1 at 6.0: all three
        assert wide.loc[0, "x"] == 1 and wide.loc[0, "y"] == 1
        assert wide.loc[1, "x"] == 1 and wide.loc[1, "y"] == 2


class TestCheckExactGeoms:
    def test_match_and_mismatch(self, ray_session):
        from linref_ray.geometry import check_exact_geoms

        ds = rd.from_arrow(
            pa.table(
                {
                    "event_id": [0, 1, 2],
                    "wkt": [
                        "LINESTRING (0 0, 5 0)",
                        "LINESTRING (0 0, 4 4, 9 9)",
                        None,
                    ],
                    "xs": pa.array(
                        [[0.0, 5.0], [0.0, 5.0, 6.0], None],
                        pa.list_(pa.float64()),
                    ),
                    "ys": pa.array(
                        [[0.0, 0.0], [0.0, 0.0, 1.0], None],
                        pa.list_(pa.float64()),
                    ),
                }
            )
        )
        out = (
            check_exact_geoms(ds)
            .select_columns(["event_id", "geoms_exact"])
            .to_pandas()
            .sort_values("event_id")
        )
        assert out.geoms_exact.tolist() == [True, False, True]

    def test_junk_wkt_is_false_not_missing(self, ray_session):
        # Present-but-unparseable WKT is demonstrably NOT an exact match;
        # only genuinely missing values get if_missing. Malformed numerics
        # must not kill the batch.
        from linref_ray.geometry import check_exact_geoms

        ds = rd.from_arrow(
            pa.table(
                {
                    "event_id": [0, 1, 2],
                    "wkt": [
                        "POINT (1 2)",
                        "LINESTRING (a b, c d)",
                        "LINESTRING (0 0, 5 0)",
                    ],
                    "xs": pa.array(
                        [[0.0, 5.0], [0.0, 5.0], [0.0, 5.0, 6.0]],
                        pa.list_(pa.float64()),
                    ),
                    "ys": pa.array(
                        [[0.0, 0.0], [0.0, 0.0], [0.0, 0.0, 0.0]],
                        pa.list_(pa.float64()),
                    ),
                }
            )
        )
        out = (
            check_exact_geoms(ds)
            .select_columns(["event_id", "geoms_exact"])
            .to_pandas()
            .sort_values("event_id")
        )
        assert out.geoms_exact.tolist() == [False, False, False]
