"""Tests for the composed operators: integrate(expand), constrain_to,
impute_keys, cluster(link_col), intersection_nodes, clip_events."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from linref_ray import modify as md
from linref_ray.kernels.modify import integrate_group_expand
from linref_ray.lrs import LRS
from linref_ray.spatial import clip_events, cluster_events, intersection_nodes

L = LRS(key_col=("route",), beg_col="beg", end_col="end", closed="right")


class TestIntegrateExpand:
    def test_kernel_cross_product(self):
        # Layer A has two events covering [5,10); expand duplicates the grid
        # interval per match (``integration.py:110-152``).
        ob, oe, idx = integrate_group_expand(
            [np.array([0.0, 5.0]), np.array([5.0])],
            [np.array([10.0, 10.0]), np.array([15.0])],
        )
        rows = {
            (float(b), float(e), int(i0), int(i1))
            for b, e, (i0, i1) in zip(ob, oe, idx)
        }
        # [5,10): A matches events 0 and 1, B matches 0 → two rows.
        assert (5.0, 10.0, 0, 0) in rows
        assert (5.0, 10.0, 1, 0) in rows
        # [0,5): only A event 0 → B index -1.
        assert (0.0, 5.0, 0, -1) in rows
        # [10,15): only B.
        assert (10.0, 15.0, -1, 0) in rows

    def test_pipeline_expand(self, ray_session):
        a = rd.from_pandas(
            pd.DataFrame(
                {
                    "route": ["A", "A"],
                    "beg": [0.0, 0.0],
                    "end": [10.0, 10.0],
                    "event_id": [0, 1],
                }
            )
        )
        out = md.integrate([a], [L], expand=True).to_pandas()
        # Single interval [0,10) duplicated for both matching events.
        assert len(out) == 2


class TestConstrainTo:
    def test_clip_to_coverage(self, ray_session):
        ds = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [0, 1],
                    "route": ["A", "A"],
                    "beg": [0.0, 20.0],
                    "end": [10.0, 30.0],
                }
            )
        )
        cover = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [100, 101],
                    "route": ["A", "A"],
                    "beg": [5.0, 8.0],
                    "end": [7.0, 25.0],
                }
            )
        )
        out = (
            md.constrain_to(ds, cover, L, num_partitions=4)
            .to_pandas()
            .sort_values(["event_id", "beg"])
            .reset_index(drop=True)
        )
        # Event 0 ∩ coverage = [5,7) and [8,10); event 1 ∩ = [20,25).
        assert out.event_id.tolist() == [0, 0, 1]
        assert out.beg.tolist() == [5.0, 8.0, 20.0]
        assert out.end.tolist() == [7.0, 10.0, 25.0]

    def test_dissolve_merges_touching_pieces(self, ray_session):
        ds = rd.from_pandas(
            pd.DataFrame(
                {"event_id": [0], "route": ["A"], "beg": [0.0], "end": [10.0]}
            )
        )
        cover = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [100, 101],
                    "route": ["A", "A"],
                    "beg": [2.0, 5.0],
                    "end": [5.0, 8.0],
                }
            )
        )
        out = md.constrain_to(
            ds, cover, L, dissolve_result=True, num_partitions=4
        ).to_pandas()
        assert len(out) == 1
        assert out.beg[0] == 2.0 and out.end[0] == 8.0

    def test_dissolve_disjoint_pieces_stay_disjoint(self, ray_session):
        # Event 1 clips to [0,100] (single long piece); event 2 clips to
        # [0,1] and [50,51] only. Pre-fix, event 1's piece end (100) leaked
        # into event 2's running max and merged [0,1]+[50,51] → [0,51].
        ds = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [1, 2, 2],
                    "route": ["A", "A", "A"],
                    "beg": [0.0, 0.0, 50.0],
                    "end": [100.0, 1.0, 51.0],
                }
            )
        )
        cover = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [100],
                    "route": ["A"],
                    "beg": [0.0],
                    "end": [100.0],
                }
            )
        )
        out = (
            md.constrain_to(ds, cover, L, dissolve_result=True, num_partitions=4)
            .to_pandas()
            .sort_values(["event_id", "beg"])
            .reset_index(drop=True)
        )
        e2 = out[out.event_id == 2].reset_index(drop=True)
        assert e2.beg.tolist() == [0.0, 50.0]
        assert e2.end.tolist() == [1.0, 51.0]


class TestImputeKeys:
    def test_fill_from_first_match(self, ray_session):
        target = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [0, 1],
                    "route": ["A", "A"],
                    "beg": [0.0, 50.0],
                    "end": [5.0, 55.0],
                }
            )
        )
        source = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [10],
                    "route": ["A"],
                    "beg": [0.0],
                    "end": [10.0],
                    "county": ["X"],
                }
            )
        )
        out = (
            md.impute_keys(target, source, L, ["county"], num_partitions=4)
            .to_pandas()
            .set_index("event_id")
        )
        assert out.loc[0, "county"] == "X"
        assert pd.isna(out.loc[1, "county"])


class TestClusterLink:
    def test_link_col_merges_cross_route(self, ray_session):
        ds = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [0, 1, 2],
                    "route": ["A", "B", "C"],
                    "beg": [0.0, 0.0, 0.0],
                    "end": [5.0, 5.0, 5.0],
                    "bridge": ["b1", "b1", None],
                }
            )
        )
        plain = (
            cluster_events(ds, L, num_partitions=4)
            .to_pandas()
            .set_index("event_id")
        )
        assert plain.loc[0, "cluster"] != plain.loc[1, "cluster"]
        linked = (
            cluster_events(ds, L, link_col="bridge", num_partitions=4)
            .to_pandas()
            .set_index("event_id")
        )
        assert linked.loc[0, "cluster"] == linked.loc[1, "cluster"]
        assert linked.loc[2, "cluster"] != linked.loc[0, "cluster"]


class TestNodesAndClip:
    @pytest.fixture
    def cross_routes(self):
        return pa.table(
            {
                "route_id": ["A", "B"],
                "xs": pa.array(
                    [[0.0, 10.0], [5.0, 5.0]], pa.list_(pa.float64())
                ),
                "ys": pa.array(
                    [[0.0, 0.0], [-5.0, 5.0]], pa.list_(pa.float64())
                ),
                "ms": pa.array(
                    [[0.0, 10.0], [0.0, 10.0]], pa.list_(pa.float64())
                ),
            }
        )

    def test_nodes(self, cross_routes):
        nodes = intersection_nodes(cross_routes).to_pandas()
        assert len(nodes) == 1
        assert list(nodes.routes[0]) == ["A", "B"]
        assert nodes.x[0] == pytest.approx(5.0)

    def test_generate_intersections_expand(self, cross_routes):
        # Reference ext/base.py:2972-3054 + test_ext_spatial.py semantics:
        # each node expands to one row per coincident route with the LRS
        # measure ON that route. A runs (0,0)->(10,0) m 0..10; B runs
        # (5,-5)->(5,5) m 0..10; they cross at (5,0): m=5 on A, m=5 on B.
        from linref_ray.spatial import generate_intersections

        out = generate_intersections(cross_routes).to_pandas()
        assert len(out) == 2
        got = {(r.route_id, round(r.loc, 9)) for r in out.itertuples()}
        assert got == {("A", 5.0), ("B", 5.0)}
        assert (out.snap_dist < 1e-9).all()
        one = generate_intersections(cross_routes, expand=False).to_pandas()
        assert len(one) == 1
        assert one.route_id[0] == "A"  # first sorted coincident route

    def test_split_events_polygon_and_line_masks(self, ray_session, cross_routes):
        # Reference ext/base.py:2090-2213: polygon masks split at their
        # boundary, line masks at crossing points, ALL pieces kept.
        from linref_ray.spatial import split_events

        ev = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [0, 1],
                    "route_id": ["A", "A"],
                    "beg": [0.0, 8.5],
                    "end": [8.0, 10.0],
                }
            )
        )
        lrs = LRS(key_col=("route_id",), beg_col="beg", end_col="end")
        square = ("polygon", np.array([3.0, 7.0, 7.0, 3.0]),
                  np.array([-1.0, -1.0, 1.0, 1.0]))
        vline = ("line", np.array([5.5, 5.5]), np.array([-9.0, 9.0]))
        out = (
            split_events(ev, cross_routes, [square, vline], lrs)
            .to_pandas()
            .sort_values(["event_id", "beg"])
            .reset_index(drop=True)
        )
        # Event 0 [0,8] splits at 3, 5.5, 7 → 4 pieces; event 1 [8.5,10]
        # has no crossings → unchanged single piece.
        e0 = out[out.event_id == 0]
        assert e0.beg.tolist() == [0.0, 3.0, 5.5, 7.0]
        assert e0.end.tolist() == [3.0, 5.5, 7.0, 8.0]
        e1 = out[out.event_id == 1]
        assert e1.beg.tolist() == [8.5] and e1.end.tolist() == [10.0]
        # total mileage conserved
        assert (out.end - out.beg).sum() == pytest.approx(9.5)

    def test_split_events_empty_mask_raises(self, ray_session, cross_routes):
        from linref_ray.spatial import split_events

        ev = rd.from_pandas(
            pd.DataFrame({"event_id": [0], "route_id": ["A"],
                          "beg": [0.0], "end": [1.0]})
        )
        lrs = LRS(key_col=("route_id",), beg_col="beg", end_col="end")
        with pytest.raises(ValueError, match="No valid geometries"):
            split_events(ev, cross_routes, [], lrs)

    def test_generate_intersections_multi_cross(self):
        # Ported shape of reference test_ext_spatial.py crossing fixture:
        # route A spans x in [0,20]; B1 crosses at x=5, B2 at x=15.
        from linref_ray.spatial import generate_intersections

        routes = pa.table(
            {
                "route_id": ["A", "B1", "B2"],
                "xs": pa.array(
                    [[0.0, 20.0], [5.0, 5.0], [15.0, 15.0]],
                    pa.list_(pa.float64()),
                ),
                "ys": pa.array(
                    [[0.0, 0.0], [-5.0, 5.0], [-5.0, 5.0]],
                    pa.list_(pa.float64()),
                ),
                "ms": pa.array(
                    [[0.0, 20.0], [0.0, 10.0], [0.0, 10.0]],
                    pa.list_(pa.float64()),
                ),
            }
        )
        out = generate_intersections(routes).to_pandas()
        got = {(r.route_id, round(r.loc, 9)) for r in out.itertuples()}
        assert got == {("A", 5.0), ("B1", 5.0), ("A", 15.0), ("B2", 5.0)}
        # two nodes, each expanded to its two coincident routes
        assert out.node_id.nunique() == 2 and len(out) == 4

    def test_clip_conserves_mileage(self, ray_session, cross_routes):
        ev = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [0],
                    "route_id": ["A"],
                    "beg": [0.0],
                    "end": [10.0],
                }
            )
        )
        lrs = LRS(key_col=("route_id",), beg_col="beg", end_col="end")
        square = (np.array([3.0, 7.0, 7.0, 3.0]), np.array([-1.0, -1.0, 1.0, 1.0]))
        inside = clip_events(ev, cross_routes, square, lrs, "inside").to_pandas()
        outside = clip_events(ev, cross_routes, square, lrs, "outside").to_pandas()
        assert inside.beg.tolist() == [3.0]
        assert inside.end.tolist() == [7.0]
        total = (inside.end - inside.beg).sum() + (outside.end - outside.beg).sum()
        assert total == pytest.approx(10.0)  # mileage conservation

    def test_clip_no_crossings_and_unknown_route(self, ray_session, cross_routes):
        # Event fully inside (no boundary crossing in its range), event fully
        # outside, and an event on a route with no geometry (dropped).
        ev = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [0, 1, 2],
                    "route_id": ["A", "A", "ZZZ"],
                    "beg": [4.0, 8.0, 0.0],
                    "end": [6.0, 9.0, 5.0],
                }
            )
        )
        lrs = LRS(key_col=("route_id",), beg_col="beg", end_col="end")
        square = (np.array([3.0, 7.0, 7.0, 3.0]), np.array([-1.0, -1.0, 1.0, 1.0]))
        inside = clip_events(ev, cross_routes, square, lrs, "inside").to_pandas()
        assert inside.event_id.tolist() == [0]
        assert inside.beg.tolist() == [4.0] and inside.end.tolist() == [6.0]
        outside = clip_events(ev, cross_routes, square, lrs, "outside").to_pandas()
        assert outside.event_id.tolist() == [1]


class TestParallelProject:
    def test_matches_nearest_parallel_line(self, ray_session):
        from linref_ray.spatial import parallel_project

        dst = pa.table(
            {
                "route_id": ["D0", "D1"],
                "xs": pa.array(
                    [[0.0, 100.0], [0.0, 100.0]], pa.list_(pa.float64())
                ),
                "ys": pa.array(
                    [[0.0, 0.0], [50.0, 50.0]], pa.list_(pa.float64())
                ),
                "ms": pa.array(
                    [[0.0, 100.0], [0.0, 100.0]], pa.list_(pa.float64())
                ),
            }
        )
        src = rd.from_items(
            [
                {"route_id": "S0", "xs": [10.0, 60.0], "ys": [2.0, 2.0]},
                {"route_id": "S1", "xs": [20.0, 80.0], "ys": [48.0, 48.0]},
                {"route_id": "S2", "xs": [0.0, 10.0], "ys": [500.0, 500.0]},
            ]
        )
        out = (
            parallel_project(src, dst, buffer=10.0)
            .to_pandas()
            .set_index("src_route_id")
        )
        assert out.loc["S0", "dst_route_id"] == "D0"
        assert out.loc["S0", "hausdorff"] == pytest.approx(2.0)
        assert out.loc["S0", "m_beg"] == pytest.approx(10.0)
        assert out.loc["S0", "m_end"] == pytest.approx(60.0)
        assert out.loc["S1", "dst_route_id"] == "D1"
        assert "S2" not in out.index  # out of buffer → dropped


class TestWindows:
    @pytest.fixture
    def log(self):
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "user_id": [1, 1, 1, 2, 2],
                    "ts": pd.to_datetime(
                        [
                            "2024-01-01 00:10",
                            "2024-01-01 00:50",
                            "2024-01-01 02:00",
                            "2024-01-01 00:05",
                            "2024-01-01 03:00",
                        ]
                    ),
                    "value": [1.0, 2.0, 4.0, 8.0, 16.0],
                }
            )
        )

    def test_tumbling(self, ray_session, log):
        from linref_ray.windows import tumbling_window

        out = (
            tumbling_window(log, "user_id", "ts", "value", 3600, 4)
            .to_pandas()
            .sort_values(["user_id", "window"])
            .reset_index(drop=True)
        )
        u1 = out[out.user_id == 1]
        assert u1.n.tolist() == [2, 1]
        assert u1.total.tolist() == [3.0, 4.0]

    def test_sliding_replication(self, ray_session, log):
        from linref_ray.windows import sliding_window

        out = sliding_window(log, "user_id", "ts", "value", 3600, 1800, 4)
        df = out.to_pandas()
        # Every event lands in exactly size/hop = 2 windows.
        assert df.n.sum() == 2 * 5

    def test_session(self, ray_session, log):
        from linref_ray.windows import session_window

        out = (
            session_window(log, "user_id", "ts", 1800, 4)
            .to_pandas()
            .sort_values(["user_id", "session"])
            .reset_index(drop=True)
        )
        # User 1: events at 00:10 and 00:50 (gap 40min>30min → separate),
        # then 02:00 → 3 sessions; user 2: 2 sessions.
        assert out[out.user_id == 1].n.tolist() == [1, 1, 1]
        assert out[out.user_id == 2].session.tolist() == [0, 1]

    def test_session_merges_within_gap(self, ray_session):
        from linref_ray.windows import session_window

        log = rd.from_pandas(
            pd.DataFrame(
                {
                    "user_id": [1, 1],
                    "ts": pd.to_datetime(
                        ["2024-01-01 00:00", "2024-01-01 00:20"]
                    ),
                }
            )
        )
        out = session_window(log, "user_id", "ts", 1800, 4).to_pandas()
        assert len(out) == 1
        assert out.n[0] == 2


class TestEventsFacade:
    def test_chained_workflow(self, ray_session):
        """The reference's accessor-style chained workflow (dissolve →
        resegment → relate → aggregate) through the Events facade."""
        from linref_ray.api import Events

        roads = Events(
            rd.from_pandas(
                pd.DataFrame(
                    {
                        "event_id": [0, 1],
                        "route": ["A", "A"],
                        "beg": [0.0, 5.0],
                        "end": [5.0, 10.0],
                    }
                )
            ),
            L,
        )
        crashes = Events(
            rd.from_pandas(
                pd.DataFrame(
                    {
                        "event_id": [0, 1, 2],
                        "route": ["A", "A", "A"],
                        "loc": [1.0, 2.5, 7.0],
                    }
                )
            ),
            LRS(key_col=("route",), beg_col=None, end_col=None,
                loc_col="loc", closed="left_mod"),
        )
        segs = roads.dissolve(num_partitions=4).to_pandas()
        assert segs.beg.tolist() == [0.0] and segs.end.tolist() == [10.0]
        reseg = roads.resegment(2.5)
        assert reseg.count() == 4
        counts = (
            reseg.relate(crashes, num_partitions=4)
            .count(out_col="n")
            .to_pandas()
        )
        assert counts.n.sum() == 3
        ext = roads.extend(1.0, 1.0).to_pandas()
        assert ext.beg.min() == -1.0

    def test_relation_conveniences_and_lrs_management(self, ray_session):
        """cut_from / interpolate_from / distribute_from + set_lrs /
        modify_lrs / lrs_like / group_counts (ext/base.py:804-2601)."""
        from linref_ray.api import Events

        geoms = Events(
            rd.from_pandas(
                pd.DataFrame(
                    [
                        dict(event_id=10, route="A", beg=0.0, end=10.0,
                             xs=[0.0, 10.0], ys=[0.0, 0.0],
                             ms=[0.0, 10.0]),
                    ]
                )
            ),
            L,
        )
        spans = Events(
            rd.from_pandas(
                pd.DataFrame(
                    {"event_id": [0], "route": ["A"],
                     "beg": [2.0], "end": [6.0]}
                )
            ),
            L,
        )
        cut = spans.cut_from(geoms, num_partitions=2).to_pandas()
        assert cut["ms"][0] == pytest.approx([2.0, 6.0])
        pts = Events(
            rd.from_pandas(
                pd.DataFrame(
                    {"event_id": [0], "route": ["A"], "loc": [4.0]}
                )
            ),
            LRS(key_col=("route",), beg_col=None, end_col=None,
                loc_col="loc", closed="both"),
        )
        interp = pts.interpolate_from(
            geoms.modify_lrs(closed="both"), num_partitions=2
        ).to_pandas()
        assert interp.x[0] == pytest.approx(4.0)
        dist = spans.distribute_from(pts, num_partitions=2).to_pandas()
        # one crash at loc 4.0 inside [2,6] → its whole unit share lands
        assert dist.distributed.tolist() == pytest.approx([1.0])
        # LRS management
        relabeled = spans.modify_lrs(closed="both")
        assert relabeled.lrs.closed == "both" and relabeled.lrs is not spans.lrs
        adopted = spans.lrs_like(pts)
        assert adopted.lrs is pts.lrs
        fresh = spans.set_lrs(key_col=("route",), closed="right")
        assert fresh.lrs.closed == "right"
        gc = spans.group_counts().to_pandas()
        assert gc["count()"].tolist() == [1]


class TestSimilarityAndImageStages:
    def test_knn_ivf_recall(self, ray_session):
        from linref_ray.similarity import knn_brute_force, knn_ivf

        emb = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
        exact = knn_brute_force(emb, (0, 1), k=5).to_pandas()
        approx = knn_ivf(emb, (0, 1), k=5, n_centroids=8, nprobe=8).to_pandas()
        # nprobe == n_centroids probes everything → identical to exact.
        a = exact.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
        b = approx.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
        assert a[["query_id", "vec_id"]].equals(b[["query_id", "vec_id"]])
        # Partial probing returns k results with decent overlap.
        part = knn_ivf(emb, (0, 1), k=5, n_centroids=8, nprobe=4).to_pandas()
        assert (part.groupby("query_id").size() == 5).all()

    def test_knn_missing_query_ids(self, ray_session):
        # Query ids absent from the table: typed empty result, no crash.
        from linref_ray.similarity import knn_brute_force

        emb = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
        out = knn_brute_force(emb, (10_000_000, 10_000_001), k=3)
        assert out.count() == 0
        assert out.schema().names == ["query_id", "vec_id", "cosine"]

    def test_resize_and_features(self, ray_session):
        from linref_ray import synth
        from linref_ray.images import extract_features, resize_images
        from linref_ray.kernels import codec

        imgs = rd.from_arrow(synth.make_images(20, w=16, h=16))
        small = resize_images(imgs, 8, 8).to_pandas()
        assert (small.w == 8).all() and (small.h == 8).all()
        px, fmt = codec.decode_image(small["bytes"][0])
        assert px.shape == (8, 8, 3)
        feats = extract_features(imgs).to_pandas()
        assert "bytes" not in feats.columns
        assert feats.mean_r.between(0, 255).all()
        assert (feats.luma_std > 0).all()
