"""Ray-level relation tests: the canonical reference fixtures run through the
full distributed pipeline (prepare → union → pid shuffle → sweep kernel →
aggregate), asserting exact parity with the expected matrices from
``linref/tests/test_events_relate.py``.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from linref_ray.lrs import LRS
from linref_ray.relate import Relation, attach

LIN = LRS(key_col=("route",), beg_col="beg", end_col="end", closed="right")
PT = LRS(key_col=("route",), beg_col=None, end_col=None, loc_col="loc", closed="right")


@pytest.fixture
def canonical(ray_session):
    left = pd.DataFrame(
        {
            "event_id": [0, 1, 2],
            "route": ["1", "1", "2"],
            "beg": [0.0, 10.0, 20.0],
            "end": [10.0, 20.0, 30.0],
            "lval": [100.0, 200.0, 300.0],
        }
    )
    right = pd.DataFrame(
        {
            "event_id": [0, 1, 2],
            "route": ["1", "1", "2"],
            "beg": [5.0, 15.0, 25.0],
            "end": [15.0, 25.0, 35.0],
            "rval": [1.0, 2.0, 4.0],
        }
    )
    return rd.from_pandas(left), rd.from_pandas(right)


def pairs_dict(ds):
    df = ds.to_pandas()
    return {
        (int(l), int(r)): float(w)
        for l, r, w in zip(df.left_id, df.right_id, df.weight)
    }


class TestOverlayPipeline:
    def test_raw_pairs(self, canonical):
        l, r = canonical
        rel = Relation(l, r, LIN, num_partitions=4)
        d = pairs_dict(rel.overlay(normalize=False))
        assert d == {(0, 0): 5.0, (1, 0): 5.0, (1, 1): 5.0, (2, 2): 5.0}

    def test_normalized(self, canonical):
        l, r = canonical
        rel = Relation(l, r, LIN, num_partitions=4)
        d = pairs_dict(rel.overlay())
        assert d == {(0, 0): 0.5, (1, 0): 0.5, (1, 1): 0.5, (2, 2): 0.5}

    def test_salted_bucket_parity(self, canonical):
        """Salted path (bucket_size) must reproduce the plain pair weights —
        summing window-clipped replicas."""
        l, r = canonical
        plain = pairs_dict(Relation(l, r, LIN, num_partitions=4).overlay())
        salted_ds = Relation(
            l, r, LIN, num_partitions=4, bucket_size=7.0
        ).overlay()
        df = salted_ds.to_pandas()
        acc = df.groupby(["left_id", "right_id"]).weight.sum()
        got = {(int(a), int(b)): float(v) for (a, b), v in acc.items()}
        assert set(got) == set(plain)
        for k in plain:
            assert got[k] == pytest.approx(plain[k])

    def test_sum_aggregate(self, canonical):
        l, r = canonical
        rel = Relation(l, r, LIN, right_cols=["rval"], num_partitions=4)
        out = (
            rel.sum("rval", target="left", out_col="s")
            .to_pandas()
            .set_index("event_id")
            .s
        )
        # left0: 0.5*1; left1: 0.5*1 + 0.5*2; left2: 0.5*4
        assert out[0] == pytest.approx(0.5)
        assert out[1] == pytest.approx(1.5)
        assert out[2] == pytest.approx(2.0)

    def test_sum_conserve(self, canonical):
        """conserve=True: each source's full value lands
        (``relate.py:1077-1089``)."""
        l, r = canonical
        rel = Relation(l, r, LIN, right_cols=["rval"], num_partitions=4)
        out = rel.sum("rval", conserve=True, out_col="s").to_pandas()
        # Each right event's weights across lefts normalized to 1 → total
        # distributed == total rval of matched sources (1 + 2 + 4).
        assert out.s.sum() == pytest.approx(7.0)

    def test_mean_aggregate(self, canonical):
        l, r = canonical
        rel = Relation(l, r, LIN, right_cols=["rval"], num_partitions=4)
        out = (
            rel.mean("rval", out_col="m").to_pandas().set_index("event_id").m
        )
        assert out[1] == pytest.approx((0.5 * 1 + 0.5 * 2) / 1.0)

    def test_count(self, canonical):
        l, r = canonical
        rel = Relation(l, r, LIN, num_partitions=4)
        out = rel.count().to_pandas().set_index("event_id")["count"]
        assert out[0] == 1 and out[1] == 2 and out[2] == 1

    def test_attach_join_back(self, canonical):
        l, r = canonical
        rel = Relation(l, r, LIN, right_cols=["rval"], num_partitions=4)
        agg = rel.sum("rval", out_col="s")
        joined = attach(l, agg, on="event_id", num_partitions=4).to_pandas()
        assert len(joined) == 3
        assert joined.set_index("event_id").s[1] == pytest.approx(1.5)


class TestIntersectPipeline:
    def test_point_linear_counts(self, ray_session):
        pts = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [0, 1, 2, 3],
                    "route": ["1", "1", "1", "2"],
                    "loc": [5.0, 10.0, 30.0, 5.0],
                }
            )
        )
        lines = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [0, 1, 2],
                    "route": ["1", "1", "2"],
                    "beg": [0.0, 10.0, 0.0],
                    "end": [10.0, 20.0, 10.0],
                }
            )
        )
        rel = Relation(
            pts, lines, PT, LRS(key_col=("route",), closed="both"),
            num_partitions=4,
        )
        d = {
            (int(a), int(b))
            for a, b in zip(*(lambda df: (df.left_id, df.right_id))(
                rel.intersect().to_pandas()
            ))
        }
        # loc 5 in [0,10]; loc 10 in both (closed='both'); loc 30 in none;
        # route-2 loc 5 only in route-2 line.
        assert d == {(0, 0), (1, 0), (1, 1), (3, 2)}

    def test_first_last_list(self, ray_session):
        pts = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [0],
                    "route": ["1"],
                    "loc": [5.0],
                }
            )
        )
        lines = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [10, 11, 12],
                    "route": ["1", "1", "1"],
                    "beg": [0.0, 2.0, 4.0],
                    "end": [10.0, 12.0, 14.0],
                    "name": ["a", "b", "c"],
                }
            )
        )
        rel = Relation(
            pts, lines, PT, LRS(key_col=("route",), closed="both"),
            right_cols=["name"], num_partitions=4,
        )
        first = rel.first("name").to_pandas()
        last = rel.last("name").to_pandas()
        assert first.first_name.tolist() == ["a"]
        assert last.last_name.tolist() == ["c"]
        lst = rel.collect_list("name").to_pandas()
        assert list(lst.list_name.tolist()[0]) == ["a", "b", "c"]

    def test_mode_and_value_counts(self, ray_session):
        pts = rd.from_pandas(
            pd.DataFrame(
                {"event_id": [0], "route": ["1"], "loc": [5.0]}
            )
        )
        lines = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [10, 11, 12],
                    "route": ["1"] * 3,
                    "beg": [0.0, 0.0, 0.0],
                    "end": [10.0, 10.0, 10.0],
                    "cat": ["x", "y", "y"],
                }
            )
        )
        rel = Relation(
            pts, lines, PT, LRS(key_col=("route",), closed="both"),
            right_cols=["cat"], num_partitions=4,
        )
        mode = rel.mode("cat").to_pandas()
        assert mode.mode_cat.tolist() == ["y"]
        vc = rel.value_counts("cat").to_pandas()
        got = {(r.cat): int(r.n) for r in vc.itertuples()}
        assert got == {"x": 1, "y": 2}

    def test_distribute_conservation(self, ray_session):
        """HIN invariant: Σ distributed == number of crashes
        (reference ``tests/test_integration.py:333-369``)."""
        segs = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": range(10),
                    "route": ["1"] * 6 + ["2"] * 4,
                    "beg": [0.0, 1, 2, 3, 4, 5, 0, 1, 2, 3],
                    "end": [1.0, 2, 3, 4, 5, 6, 1, 2, 3, 4],
                }
            )
        )
        crashes = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": range(7),
                    "route": ["1", "1", "1", "2", "2", "2", "2"],
                    "loc": [0.5, 2.5, 4.5, 0.5, 1.5, 2.5, 3.5],
                }
            )
        )
        rel = Relation(
            segs,
            crashes,
            LRS(key_col=("route",), closed="left_mod"),
            LRS(key_col=("route",), beg_col=None, end_col=None, loc_col="loc"),
            num_partitions=4,
        )
        out = rel.distribute(
            decay_size=2, decay_func="linear", out_col="score"
        ).to_pandas()
        assert len(out) == 10
        assert out.score.sum() == pytest.approx(7.0)

    def test_distribute_point_targets(self, ray_session):
        """Point targets × linear sources must use the point-linear intersect
        kernel: points sitting ON closed interval edges (0 and 10 of [0,10]
        closed='both') count as matches — the degenerate linear-linear sweep
        would drop them."""
        pts = rd.from_pandas(
            pd.DataFrame(
                {"event_id": [0, 1, 2], "route": ["1"] * 3,
                 "loc": [0.0, 5.0, 10.0]}
            )
        )
        lines = rd.from_pandas(
            pd.DataFrame(
                {"event_id": [10], "route": ["1"],
                 "beg": [0.0], "end": [10.0]}
            )
        )
        rel = Relation(
            pts,
            lines,
            LRS(key_col=("route",), beg_col=None, end_col=None, loc_col="loc"),
            LRS(key_col=("route",), closed="both"),
            num_partitions=4,
        )
        out = rel.distribute(out_col="score", length_normalize=False).to_pandas()
        assert len(out) == 3
        # All three points match the single source; its share normalizes to
        # a total of 1.0 → 1/3 per point.
        assert sorted(out.score.tolist()) == pytest.approx([1 / 3] * 3)


class TestTargetRight:
    def test_axis0_aggregates(self, canonical):
        """target='right' == the reference's axis=0 (aggregate left onto
        right index); output id column named by the right id."""
        l, r = canonical
        rel = Relation(l, r, LIN, left_cols=["lval"], num_partitions=4)
        s = (
            rel.sum("lval", target="right", out_col="s")
            .to_pandas()
            .set_index("event_id")
            .s
        )
        # right0 gets 0.5*100 + 0.5*200; right1 0.5*200; right2 0.5*300.
        assert s[0] == pytest.approx(150.0)
        assert s[1] == pytest.approx(100.0)
        assert s[2] == pytest.approx(150.0)
        cnt = rel.count(target="right").to_pandas().set_index("event_id")["count"]
        assert cnt[0] == 2 and cnt[1] == 1 and cnt[2] == 1
        first = rel.first("lval", target="right").to_pandas().set_index("event_id")
        assert first.first_lval[0] == 100.0

    def test_distribute_target_right_matches_swapped_relation(
        self, ray_session
    ):
        """distribute(target='right') on (A, B) is the reference's axis=0 —
        the SAME overlay matrix transposed (``relate.py:1410-1417``). So it
        must equal distribute(target='left') on the swapped relation (B, A)
        with norm_by='left' (weights normalized by the target=B side in
        both formulations)."""
        a = pd.DataFrame(
            {
                "event_id": [0, 1, 2, 3],
                "route": ["1"] * 4,
                "beg": [0.0, 2.0, 5.0, 7.0],
                "end": [3.0, 6.0, 8.0, 9.0],
            }
        )
        b = pd.DataFrame(
            {
                "event_id": [10, 11, 12, 13, 14],
                "route": ["1"] * 5,
                "beg": [0.0, 1.5, 3.0, 6.0, 8.5],
                "end": [2.0, 4.0, 7.0, 8.5, 9.5],
            }
        )
        lrs = LRS(key_col=("route",))
        kw = dict(decay_size=1, decay_func="linear", out_col="score")
        right_t = (
            Relation(
                rd.from_pandas(a), rd.from_pandas(b), lrs, num_partitions=4
            )
            .distribute(target="right", **kw)
            .to_pandas()
            .set_index("event_id")
            .score
        )
        swapped = (
            Relation(
                rd.from_pandas(b), rd.from_pandas(a), lrs, num_partitions=4
            )
            .distribute(target="left", norm_by="left", **kw)
            .to_pandas()
            .set_index("event_id")
            .score
        )
        assert len(right_t) == 5
        for eid in b.event_id:
            assert right_t[eid] == pytest.approx(swapped[eid])
        # Conservation: every matched source's share normalizes to 1.0.
        assert right_t.sum() == pytest.approx(4.0)


class TestRelationCut:
    """Relation.cut multiple-match policies (reference relate.py:1623-1724).

    Route '1': two contiguous source fragments S10 [0,5] / S11 [5,10] on
    y=0 plus a parallel overlapping source S12 [2,8] on y=1. Target T0
    [3,7] intersects all three; T2 [0,1] only S10.
    """

    def _relation(self, targets_rows, multiple_sources=True):
        tgt = rd.from_pandas(pd.DataFrame(targets_rows))
        src_rows = [
            dict(event_id=10, route="1", beg=0.0, end=5.0,
                 xs=[0.0, 1, 2, 3, 4, 5], ys=[0.0] * 6,
                 ms=[0.0, 1, 2, 3, 4, 5]),
            dict(event_id=11, route="1", beg=5.0, end=10.0,
                 xs=[5.0, 6, 7, 8, 9, 10], ys=[0.0] * 6,
                 ms=[5.0, 6, 7, 8, 9, 10]),
        ]
        if multiple_sources:
            src_rows.append(
                dict(event_id=12, route="1", beg=2.0, end=8.0,
                     xs=[2.0, 5.0, 8.0], ys=[1.0] * 3, ms=[2.0, 5.0, 8.0])
            )
        src = rd.from_pandas(pd.DataFrame(src_rows))
        lrs = LRS(key_col=("route",))
        return Relation(tgt, src, lrs, num_partitions=4)

    def test_first_and_clipping(self, ray_session):
        rel = self._relation(
            [dict(event_id=0, route="1", beg=3.0, end=7.0)]
        )
        out = rel.cut(multiple="first").to_pandas()
        assert len(out) == 1
        # First source in standard order is S10 [0,5]; the [3,7] window
        # clips to its extent.
        assert out["xs"][0] == pytest.approx([3.0, 4.0, 5.0])
        assert out["ms"][0] == pytest.approx([3.0, 4.0, 5.0])
        assert out["ys"][0] == pytest.approx([0.0, 0.0, 0.0])

    def test_last(self, ray_session):
        rel = self._relation(
            [dict(event_id=0, route="1", beg=3.0, end=7.0)]
        )
        out = rel.cut(multiple="last").to_pandas()
        # Standard order is (beg, end, id): S10 (0,5), S12 (2,8), S11
        # (5,10) — last intersecting is S11, clipped to [5,7].
        assert out["ms"][0] == pytest.approx([5.0, 6.0, 7.0])
        assert out["ys"][0] == pytest.approx([0.0, 0.0, 0.0])

    def test_list_explodes_with_rank(self, ray_session):
        rel = self._relation(
            [dict(event_id=0, route="1", beg=3.0, end=7.0)]
        )
        out = (
            rel.cut(multiple="list")
            .to_pandas()
            .sort_values("cut_idx")
            .reset_index(drop=True)
        )
        assert out.cut_idx.tolist() == [0, 1, 2]
        assert out.event_id.tolist() == [0, 0, 0]
        assert out["ms"][0] == pytest.approx([3.0, 4.0, 5.0])  # S10 clip
        assert out["ms"][1] == pytest.approx([3.0, 5.0, 7.0])  # S12
        assert out["ms"][2] == pytest.approx([5.0, 6.0, 7.0])  # S11 clip

    def test_merge_contiguous(self, ray_session):
        rel = self._relation(
            [dict(event_id=0, route="1", beg=3.0, end=7.0)],
            multiple_sources=False,
        )
        out = rel.cut(multiple="merge").to_pandas()
        assert len(out) == 1
        assert out["xs"][0] == pytest.approx([3.0, 4.0, 5.0, 6.0, 7.0])
        assert out["ms"][0] == pytest.approx([3.0, 4.0, 5.0, 6.0, 7.0])

    def test_merge_discontiguous_raises(self, ray_session):
        rel = self._relation(
            [dict(event_id=0, route="1", beg=3.0, end=7.0)]
        )
        with pytest.raises(Exception, match="contiguous"):
            rel.cut(multiple="merge").to_pandas()

    def test_raise_policy(self, ray_session):
        ok = self._relation([dict(event_id=2, route="1", beg=0.0, end=1.0)])
        out = ok.cut(multiple="raise").to_pandas()
        assert out["ms"][0] == pytest.approx([0.0, 1.0])
        bad = self._relation([dict(event_id=0, route="1", beg=3.0, end=7.0)])
        with pytest.raises(Exception, match="[Mm]ultiple"):
            bad.cut(multiple="raise").to_pandas()

    def test_target_right_swaps_roles(self, ray_session):
        """target='right' (reference axis=0): the RIGHT events become the
        cut targets and the LEFT side supplies geometry — equivalent to
        cut(target='left') on the swapped relation."""
        geom_side = rd.from_pandas(
            pd.DataFrame(
                [
                    dict(event_id=10, route="1", beg=0.0, end=5.0,
                         xs=[0.0, 1, 2, 3, 4, 5], ys=[0.0] * 6,
                         ms=[0.0, 1, 2, 3, 4, 5]),
                ]
            )
        )
        tgt_side = rd.from_pandas(
            pd.DataFrame(
                [dict(event_id=0, route="1", beg=1.0, end=4.0)]
            )
        )
        lrs = LRS(key_col=("route",))
        out = (
            Relation(geom_side, tgt_side, lrs, num_partitions=4)
            .cut(target="right", multiple="first")
            .to_pandas()
        )
        assert out.event_id.tolist() == [0]
        assert out["ms"][0] == pytest.approx([1.0, 2.0, 3.0, 4.0])

    def test_unmatched_target_null_geometry(self, ray_session):
        rel = self._relation(
            [
                dict(event_id=0, route="1", beg=3.0, end=4.0),
                dict(event_id=1, route="99", beg=0.0, end=1.0),
            ]
        )
        out = rel.cut(multiple="first").to_pandas().set_index("event_id")
        assert out.loc[0, "ms"] == pytest.approx([3.0, 4.0])
        assert out.loc[1, "xs"] is None or (
            isinstance(out.loc[1, "xs"], float) and np.isnan(out.loc[1, "xs"])
        )


class TestRelationInterpolate:
    """Relation interpolate with multiple-match policies
    (reference relate.py:1523-1621): point targets × linear-geom sources.
    """

    def _relation(self):
        pts = rd.from_pandas(
            pd.DataFrame(
                {"event_id": [0, 1], "route": ["1", "1"],
                 "loc": [5.0, 90.0]}
            )
        )
        src = rd.from_pandas(
            pd.DataFrame(
                [
                    dict(event_id=10, route="1", beg=0.0, end=10.0,
                         xs=[0.0, 10.0], ys=[0.0, 0.0], ms=[0.0, 10.0]),
                    dict(event_id=12, route="1", beg=2.0, end=8.0,
                         xs=[2.0, 8.0], ys=[1.0, 1.0], ms=[2.0, 8.0]),
                ]
            )
        )
        return Relation(
            pts, src,
            LRS(key_col=("route",), beg_col=None, end_col=None,
                loc_col="loc", closed="both"),
            LRS(key_col=("route",), closed="both"),
            num_partitions=4,
        )

    def test_first_last_list_and_unmatched(self, ray_session):
        rel = self._relation()
        first = (
            rel.interpolate_geoms(multiple="first")
            .to_pandas()
            .set_index("event_id")
        )
        assert first.loc[0, "x"] == pytest.approx(5.0)
        assert first.loc[0, "y"] == pytest.approx(0.0)
        assert np.isnan(first.loc[1, "x"])  # loc 90 matches nothing
        last = (
            rel.interpolate_geoms(multiple="last")
            .to_pandas()
            .set_index("event_id")
        )
        assert last.loc[0, "y"] == pytest.approx(1.0)
        lst = (
            rel.interpolate_geoms(multiple="list")
            .to_pandas()
            .sort_values(["event_id", "interp_idx"])
            .reset_index(drop=True)
        )
        matched = lst[lst.event_id == 0]
        assert matched.interp_idx.tolist() == [0, 1]
        assert matched.y.tolist() == pytest.approx([0.0, 1.0])

    def test_raise_policy(self, ray_session):
        rel = self._relation()
        with pytest.raises(Exception, match="[Mm]ultiple"):
            rel.interpolate_geoms(multiple="raise").to_pandas()

    def test_requires_point_targets(self, ray_session):
        lines = rd.from_pandas(
            pd.DataFrame(
                {"event_id": [0], "route": ["1"], "beg": [0.0], "end": [1.0]}
            )
        )
        rel = Relation(
            lines, lines, LRS(key_col=("route",)), num_partitions=2
        )
        with pytest.raises(ValueError, match="point targets"):
            rel.interpolate_geoms()


class TestSaltedSkew:
    def test_salted_parity_on_synthetic_network(self, ray_session):
        """Salted path on the Zipf-skewed synthetic network (mega-route)
        must equal the plain path — pair-for-pair after bucket summing."""
        from linref_ray import synth

        routes = synth.make_routes(10, seed=42)
        ev = synth.make_events(routes, density=0.06, seed=7)
        left = rd.from_arrow(ev.filter(
            (np.arange(len(ev)) % 2 == 0)
        ))
        right = rd.from_arrow(ev.filter(
            (np.arange(len(ev)) % 2 == 1)
        ))
        lrs = LRS(key_col=("route_id",), beg_col="beg", end_col="end")
        plain = (
            Relation(left, right, lrs, num_partitions=8)
            .overlay(normalize=False)
            .to_pandas()
            .groupby(["left_id", "right_id"]).weight.sum()
        )
        salted = (
            Relation(left, right, lrs, num_partitions=8, bucket_size=50.0)
            .overlay(normalize=False)
            .to_pandas()
            .groupby(["left_id", "right_id"]).weight.sum()
        )
        assert len(plain) > 50
        assert set(plain.index) == set(salted.index)
        for k in plain.index:
            assert salted[k] == pytest.approx(plain[k])

    def test_seg_key_collision_guard(self, ray_session):
        """Routes '1' and '11' with buckets that would collide without the
        separator in the (key, bucket) segment id."""
        left = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [0, 1],
                    "route": ["1", "11"],
                    "beg": [120.0, 20.0],
                    "end": [130.0, 30.0],
                }
            )
        )
        right = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [0, 1],
                    "route": ["1", "11"],
                    "beg": [125.0, 25.0],
                    "end": [135.0, 35.0],
                }
            )
        )
        # bucket_size 10: route "1" rows in buckets 12-13, route "11" in 2-3.
        out = (
            Relation(left, right, LIN, num_partitions=1, bucket_size=10.0)
            .overlay(normalize=False)
            .to_pandas()
            .groupby(["left_id", "right_id"]).weight.sum()
        )
        assert dict(out) == {(0, 0): pytest.approx(5.0), (1, 1): pytest.approx(5.0)}
