"""Dataset-level event-op tests: stateless map_batches ops and the grouped
dissolve / separate / integrate / flag pipelines."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from linref_ray import events as ev
from linref_ray import modify as md
from linref_ray.lrs import LRS

L = LRS(key_col=("route",), beg_col="beg", end_col="end", closed="right")
LP = LRS(key_col=("route",), beg_col=None, end_col=None, loc_col="loc")


@pytest.fixture
def pavement(ray_session):
    # Shaped like the reference's toy pavement table (FIXTURES.md B3).
    return rd.from_pandas(
        pd.DataFrame(
            {
                "event_id": range(6),
                "route": ["A", "A", "A", "A", "B", "B"],
                "beg": [0.0, 2.5, 3.8, 10.0, 0.0, 4.0],
                "end": [2.5, 3.8, 5.0, 12.0, 4.0, 9.0],
                "surface": ["asphalt", "asphalt", "concrete", "asphalt",
                            "asphalt", "asphalt"],
            }
        )
    )


class TestStateless:
    def test_extend_shift_round(self, pavement):
        out = ev.extend(pavement, L, 0.5, 0.5).to_pandas().sort_values("event_id")
        assert out.beg.iloc[0] == -0.5
        assert out.end.iloc[0] == 3.0
        out = ev.shift(pavement, L, 10.0).to_pandas().sort_values("event_id")
        assert out.beg.iloc[0] == 10.0
        out = (
            ev.round_measures(pavement, L, factor=0.5)
            .to_pandas()
            .sort_values("event_id")
        )
        assert out.end.iloc[1] == 4.0  # 3.8 → 4.0

    def test_set_monotonic(self, ray_session):
        ds = rd.from_pandas(
            pd.DataFrame(
                {"route": ["A"], "beg": [5.0], "end": [2.0], "event_id": [0]}
            )
        )
        out = ev.set_monotonic(ds, L).to_pandas()
        assert out.beg[0] == 2.0 and out.end[0] == 5.0

    def test_drop_invalid(self, ray_session):
        ds = rd.from_pandas(
            pd.DataFrame(
                {
                    "route": ["A", None, "B"],
                    "beg": [0.0, 1.0, np.nan],
                    "end": [1.0, 2.0, 3.0],
                    "event_id": [0, 1, 2],
                }
            )
        )
        out = ev.drop_invalid(ds, L).to_pandas()
        assert out.event_id.tolist() == [0]

    def test_select_group(self, pavement):
        out = ev.select_group(pavement, L, "B").to_pandas()
        assert set(out.route) == {"B"}
        assert len(out) == 2

    def test_point_to_linear(self, ray_session):
        ds = rd.from_pandas(
            pd.DataFrame({"route": ["A"], "loc": [7.5], "event_id": [0]})
        )
        out = ev.point_to_linear(ds, LP).to_pandas()
        assert out.beg[0] == 7.5 and out.end[0] == 7.5


class TestDissolve:
    def test_runs_merge(self, pavement):
        out = (
            md.dissolve(pavement, L)
            .to_pandas()
            .sort_values(["route", "beg"])
            .reset_index(drop=True)
        )
        # A: 0-5 (3 consecutive), 10-12; B: 0-9 (2 consecutive).
        assert out.route.tolist() == ["A", "A", "B"]
        assert out.beg.tolist() == [0.0, 10.0, 0.0]
        assert out.end.tolist() == [5.0, 12.0, 9.0]
        assert out.n_events.tolist() == [3, 1, 2]

    def test_retain_breaks_runs(self, pavement):
        out = (
            md.dissolve(pavement, L, retain=["surface"])
            .to_pandas()
            .sort_values(["route", "beg"])
            .reset_index(drop=True)
        )
        # Surface change at 3.8 splits the first run.
        assert out.beg.tolist() == [0.0, 3.8, 10.0, 0.0]
        assert out.end.tolist() == [3.8, 5.0, 12.0, 9.0]
        assert out.surface.tolist() == ["asphalt", "concrete", "asphalt", "asphalt"]


class TestResegmentSeparate:
    def test_resegment_carries_attrs(self, pavement):
        out = md.resegment(pavement, L, length=1.0, fill="cut").to_pandas()
        seg0 = out[out.event_id == 0].sort_values("beg")
        assert seg0.beg.tolist() == [0.0, 1.0, 2.0]
        assert seg0.end.tolist() == [1.0, 2.0, 2.5]
        assert set(seg0.surface) == {"asphalt"}

    def test_separate(self, ray_session):
        ds = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [0, 1],
                    "route": ["A", "A"],
                    "beg": [0.0, 5.0],
                    "end": [10.0, 15.0],
                }
            )
        )
        out = (
            md.separate(ds, L, method="left")
            .to_pandas()
            .sort_values("event_id")
        )
        assert out.end.tolist() == [10.0, 15.0]
        assert out.beg.tolist() == [0.0, 10.0]

    def test_flag_duplicated_and_inside(self, ray_session):
        ds = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [0, 1, 2],
                    "route": ["A", "A", "A"],
                    "beg": [0.0, 0.0, 2.0],
                    "end": [10.0, 10.0, 4.0],
                }
            )
        )
        dup = (
            md.flag_duplicated(ds, L).to_pandas().sort_values("event_id")
        )
        assert dup["duplicated"].tolist() == [False, True, False]
        ins = md.flag_inside(ds, L).to_pandas().sort_values("event_id")
        assert ins.inside.tolist() == [False, False, True]


class TestIntegrate:
    def test_two_layer_grid(self, ray_session):
        a = rd.from_pandas(
            pd.DataFrame(
                {"route": ["A"], "beg": [0.0], "end": [10.0], "event_id": [0]}
            )
        )
        b = rd.from_pandas(
            pd.DataFrame(
                {"route": ["A"], "beg": [5.0], "end": [15.0], "event_id": [0]}
            )
        )
        out = (
            md.integrate([a, b], [L, L])
            .to_pandas()
            .sort_values("beg")
            .reset_index(drop=True)
        )
        assert out.beg.tolist() == [0.0, 5.0, 10.0]
        assert out.end.tolist() == [5.0, 10.0, 15.0]
        assert out.ix_0.tolist() == [0, 0, -1]
        assert out.ix_1.tolist() == [-1, 0, 0]

    def test_multi_route_and_gaps(self, ray_session):
        a = rd.from_pandas(
            pd.DataFrame(
                {
                    "route": ["A", "A", "B"],
                    "beg": [0.0, 20.0, 0.0],
                    "end": [10.0, 30.0, 5.0],
                    "event_id": [0, 1, 2],
                }
            )
        )
        out = (
            md.integrate([a], [L], fill_gaps=True)
            .to_pandas()
            .sort_values(["route", "beg"])
            .reset_index(drop=True)
        )
        assert out[out.route == "A"].beg.tolist() == [0.0, 10.0, 20.0]
        assert out[out.route == "A"].ix_0.tolist() == [0, -1, 1]
        assert out[out.route == "B"].beg.tolist() == [0.0]
