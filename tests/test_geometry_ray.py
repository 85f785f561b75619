"""Dataset-level geometry op tests (WKT, build/extract M, cut, interpolate,
chaining, generate_linear_events)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from linref_ray import geometry as geo
from linref_ray import synth


class TestWkt:
    def test_roundtrip(self, ray_session):
        ds = rd.from_items(
            [{"gid": 0, "wkt": "LINESTRING M (0 0 0, 10 0 10, 10 5 15)"}]
        )
        parsed = geo.parse_geom_wkt(ds).to_pandas()
        assert list(parsed["xs"][0]) == [0.0, 10.0, 10.0]
        assert list(parsed["ms"][0]) == [0.0, 10.0, 15.0]
        out = geo.format_geom_wkt(
            geo.parse_geom_wkt(ds).drop_columns(["wkt"]), out_col="wkt2"
        ).to_pandas()
        assert out.wkt2[0] == "LINESTRING M (0 0 0, 10 0 10, 10 5 15)"

    def test_bad_wkt_raises(self):
        with pytest.raises(ValueError):
            geo.parse_wkt_m("POINT (0 0)")


class TestMColumns:
    def test_build_geom_m(self, ray_session):
        ds = rd.from_items(
            [
                {
                    "gid": 0,
                    "beg": 100.0,
                    "end": 120.0,
                    "xs": [0.0, 3.0, 3.0],
                    "ys": [0.0, 4.0, 9.0],
                }
            ]
        )
        out = geo.build_geom_m(ds).to_pandas()
        np.testing.assert_allclose(list(out.ms[0]), [100.0, 110.0, 120.0])

    def test_extract_m_values(self, ray_session):
        ds = rd.from_items(
            [{"gid": 0, "ms": [5.0, 7.0, 12.5], "xs": [0, 1, 2], "ys": [0, 0, 0]}]
        )
        out = geo.extract_m_values(ds).to_pandas()
        assert out.beg[0] == 5.0
        assert out.end[0] == 12.5


class TestCutInterpolate:
    @pytest.fixture
    def routes(self):
        return pa.table(
            {
                "route_id": ["A"],
                "xs": pa.array([[0.0, 10.0, 10.0]], pa.list_(pa.float64())),
                "ys": pa.array([[0.0, 0.0, 10.0]], pa.list_(pa.float64())),
                "ms": pa.array([[0.0, 10.0, 20.0]], pa.list_(pa.float64())),
            }
        )

    def test_cut_adjacent_share_boundary(self, ray_session, routes):
        ev = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [0, 1],
                    "route_id": ["A", "A"],
                    "beg": [0.0, 7.5],
                    "end": [7.5, 20.0],
                }
            )
        )
        out = geo.cut_geometry(ev, routes).to_pandas().sort_values("event_id")
        first_end = (out["xs"].iloc[0][-1], out["ys"].iloc[0][-1])
        second_start = (out["xs"].iloc[1][0], out["ys"].iloc[1][0])
        assert first_end == second_start == (7.5, 0.0)
        assert out["ms"].iloc[0][-1] == out["ms"].iloc[1][0] == 7.5

    def test_interpolate_points(self, ray_session, routes):
        pts = rd.from_pandas(
            pd.DataFrame(
                {
                    "point_id": [0, 1],
                    "route_id": ["A", "A"],
                    "loc": [5.0, 15.0],
                }
            )
        )
        out = geo.interpolate_points(pts, routes).to_pandas().sort_values("point_id")
        assert out.x.iloc[0] == pytest.approx(5.0)
        assert out.y.iloc[0] == pytest.approx(0.0)
        assert out.x.iloc[1] == pytest.approx(10.0)
        assert out.y.iloc[1] == pytest.approx(5.0)

    def test_unknown_route_null(self, ray_session, routes):
        ev = rd.from_pandas(
            pd.DataFrame(
                {"event_id": [0], "route_id": ["ZZZ"], "beg": [0.0], "end": [1.0]}
            )
        )
        out = geo.cut_geometry(ev, routes).to_pandas()
        assert out["xs"][0] is None


class TestChaining:
    def test_chain_and_generate(self, ray_session):
        frags = rd.from_pandas(
            pd.DataFrame(
                {
                    "frag_id": [0, 1, 2],
                    "route_id": ["A", "A", "A"],
                    "xs": [[10.0, 20.0], [0.0, 10.0], [50.0, 60.0]],
                    "ys": [[0.0, 0.0], [0.0, 0.0], [0.0, 0.0]],
                }
            )
        )
        out = (
            geo.generate_linear_events(frags, num_partitions=4)
            .to_pandas()
            .set_index("frag_id")
        )
        # Fragments 1→0 chain contiguously; 2 is its own chain.
        assert out.loc[1, "chain"] == out.loc[0, "chain"]
        assert out.loc[2, "chain"] != out.loc[0, "chain"]
        assert out.loc[1, "beg"] == 0.0 and out.loc[1, "end"] == 10.0
        assert out.loc[0, "beg"] == 10.0 and out.loc[0, "end"] == 20.0
        assert list(out.loc[0, "ms"]) == [10.0, 20.0]
        assert out.loc[2, "beg"] == 0.0 and out.loc[2, "end"] == 10.0

    def test_generate_multi_key_multi_chain(self, ray_session):
        # Two routes, multi-vertex fragments, one disjoint chain: cumulative
        # measures restart per (key, chain); ms is continuous within chains.
        frags = rd.from_pandas(
            pd.DataFrame(
                {
                    "frag_id": [0, 1, 2, 3, 4],
                    "route_id": ["A", "A", "A", "B", "B"],
                    "xs": [
                        [0.0, 3.0, 4.0],   # A chain0 pos0, len 4
                        [4.0, 10.0],        # A chain0 pos1, len 6
                        [100.0, 105.0],     # A chain1 (disjoint), len 5
                        [0.0, 2.0],         # B chain0 pos0, len 2
                        [2.0, 2.0, 5.0],    # B chain0 pos1 (dup vertex), len 3
                    ],
                    "ys": [[0.0] * 3, [0.0] * 2, [0.0] * 2, [0.0] * 2,
                           [0.0] * 3],
                }
            )
        )
        out = (
            geo.generate_linear_events(frags, num_partitions=4)
            .to_pandas()
            .set_index("frag_id")
        )
        assert out.loc[0, "beg"] == 0.0 and out.loc[0, "end"] == 4.0
        assert list(out.loc[0, "ms"]) == [0.0, 3.0, 4.0]
        assert out.loc[1, "beg"] == 4.0 and out.loc[1, "end"] == 10.0
        assert list(out.loc[1, "ms"]) == [4.0, 10.0]
        # disjoint chain restarts at 0
        assert out.loc[2, "beg"] == 0.0 and out.loc[2, "end"] == 5.0
        # second route independent; zero-length segment contributes 0
        assert out.loc[3, "beg"] == 0.0 and out.loc[3, "end"] == 2.0
        assert out.loc[4, "beg"] == 2.0 and out.loc[4, "end"] == 5.0
        assert list(out.loc[4, "ms"]) == [2.0, 2.0, 5.0]


class _FakeLineStringM:
    """Stands in for shapely>=2.1 LineString-with-M: exposes .coords."""

    def __init__(self, coords):
        self.coords = coords


class TestShapelyIngestion:
    def test_coords_from_shapely_m_xym(self):
        from linref_ray.geometry import coords_from_shapely_m

        g = _FakeLineStringM([(0.0, 0.0, 0.0), (3.0, 4.0, 5.0)])
        xs, ys, ms = coords_from_shapely_m(g)
        assert xs.tolist() == [0.0, 3.0]
        assert ms.tolist() == [0.0, 5.0]

    def test_coords_from_shapely_m_xyzm_and_reverse(self):
        from linref_ray.geometry import coords_from_shapely_m

        g = _FakeLineStringM([(3.0, 4.0, 9.0, 5.0), (0.0, 0.0, 9.0, 0.0)])
        with pytest.raises(ValueError, match="monotonic"):
            coords_from_shapely_m(g)
        xs, ys, ms = coords_from_shapely_m(g, reverse=True)
        assert ms.tolist() == [0.0, 5.0]
        assert xs.tolist() == [0.0, 3.0]

    def test_table_from_shapely_m_feeds_engine(self, ray_session):
        """Ingested shapely-M rows drive a real operator end-to-end."""
        import ray.data as rd

        from linref_ray.geometry import table_from_shapely_m
        from linref_ray.lrs import LRS
        from linref_ray.relate import Relation

        tbl = table_from_shapely_m(
            [
                dict(
                    event_id=10, route="1", beg=0.0, end=10.0,
                    geometry=_FakeLineStringM(
                        [(0.0, 0.0, 0.0), (10.0, 0.0, 10.0)]
                    ),
                )
            ]
        )
        assert tbl.schema.field("xs").type == pa.list_(pa.float64())
        targets = rd.from_pandas(
            pd.DataFrame(
                {"event_id": [0], "route": ["1"], "beg": [2.0], "end": [4.0]}
            )
        )
        rel = Relation(
            targets, rd.from_arrow(tbl), LRS(key_col=("route",)),
            num_partitions=2,
        )
        out = rel.cut(multiple="first").to_pandas()
        assert out["ms"][0] == pytest.approx([2.0, 4.0])


class TestOptions:
    def test_set_default_lrs_and_events_fallback(self, ray_session):
        import ray.data as rd

        import linref_ray
        from linref_ray.api import Events

        try:
            installed = linref_ray.set_default_lrs(
                key_col=("route",), closed="right"
            )
            assert linref_ray.get_default_lrs() is installed
            ds = rd.from_pandas(
                pd.DataFrame(
                    {"event_id": [0], "route": ["1"],
                     "beg": [0.0], "end": [1.0]}
                )
            )
            ev = Events(ds)  # no lrs argument → package default
            assert ev.lrs is installed
        finally:
            linref_ray.options.reset()
        assert linref_ray.get_default_lrs().closed == "left_mod"

    def test_invalid_default_rejected(self):
        import linref_ray

        with pytest.raises(ValueError, match="LRS instance"):
            linref_ray.options.default_lrs = "not-an-lrs"


class TestToyDatasets:
    def test_load_all_and_drive_pipeline(self, ray_session):
        """Schema parity with the reference's datasets.load surface
        (datasets/_loaders.py:19-113) + a real relation driven end-to-end
        on the samples."""
        from linref_ray import datasets
        from linref_ray.relate import Relation

        roads = datasets.load("roadways")
        crashes = datasets.load("crashes")
        pave = datasets.load("pavement")
        rdf = roads.to_pandas()
        assert {"route", "beg", "end", "xs", "ys", "ms"} <= set(rdf.columns)
        assert len(rdf) == 10
        cdf = crashes.to_pandas()
        assert {"route", "loc"} <= set(cdf.columns) and len(cdf) == 20
        pdf = pave.to_pandas()
        assert {"route", "beg", "end", "condition_rating"} <= set(
            pdf.columns
        )
        # set_lrs=True returns the Events facade with a working LRS
        ev = datasets.load("roadways", set_lrs=True)
        assert ev.lrs.key_col == ("route",)
        # crashes x roadways intersect counts run end-to-end
        rel = Relation(
            crashes, roads,
            datasets.load("crashes", set_lrs=True).lrs,
            ev.lrs, num_partitions=2,
        )
        out = rel.count().to_pandas()
        # deterministic seeds: 18 of the 20 crashes fall inside their
        # route's roadway extent (count() emits matched targets only)
        assert len(out) == 18
        with pytest.raises(ValueError, match="Unknown dataset"):
            datasets.load("nope")
