"""chain_col as a dynamic key level (reference ``ext/base.py:197-213`` and
``tests/test_ext_base.py:1455-1690``): a declared chain column joins the
grouping key whenever it exists in the data, so disjoint route fragments
group per (key, chain)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from linref_ray import modify as md
from linref_ray.lrs import LRS
from linref_ray.relate import Relation

CH = LRS(
    key_col=("route",), beg_col="beg", end_col="end",
    closed="left_mod", chain_col="chain",
)


class TestEffectiveKeyCol:
    def test_excludes_absent_chain(self):
        # reference test_key_col_excludes_absent_chain
        assert CH.effective_key_col(["route", "beg", "end"]) == ("route",)

    def test_includes_present_chain(self):
        # reference test_key_col_includes_present_chain
        assert CH.effective_key_col(["route", "beg", "end", "chain"]) == (
            "route",
            "chain",
        )

    def test_no_double_append(self):
        # reference test_no_double_append_chain_in_key_col
        legacy = LRS(
            key_col=("route", "chain"), beg_col="beg", end_col="end",
            chain_col="chain",
        )
        keys = legacy.effective_key_col(["route", "chain", "beg", "end"])
        assert keys.count("chain") == 1

    def test_legacy_chain_in_key_col_still_works(self):
        # reference test_legacy_chain_in_key_col_still_works
        legacy = LRS(key_col=("route", "chain"), beg_col="beg", end_col="end")
        assert legacy.effective_key_col(["route", "chain", "beg"]) == (
            "route",
            "chain",
        )


@pytest.fixture
def chained_events():
    # Route A: two touching events in chain 0, one touching-by-measure event
    # in chain 1 (disjoint geometry); route B: one event.
    return rd.from_pandas(
        pd.DataFrame(
            {
                "event_id": [0, 1, 2, 3],
                "route": ["A", "A", "A", "B"],
                "chain": [0, 0, 1, 0],
                "beg": [0.0, 5.0, 10.0, 0.0],
                "end": [5.0, 10.0, 15.0, 8.0],
            }
        )
    )


class TestChainedGrouping:
    def test_dissolve_respects_chains(self, ray_session, chained_events):
        out = (
            md.dissolve(chained_events, CH, num_partitions=4)
            .to_pandas()
            .sort_values(["route", "chain", "beg"])
            .reset_index(drop=True)
        )
        # Without chaining [5,10]+[10,15] would merge; chain 1 stays apart.
        assert len(out) == 3
        a = out[out.route == "A"].reset_index(drop=True)
        assert a.chain.tolist() == [0, 1]
        assert a.beg.tolist() == [0.0, 10.0]
        assert a.end.tolist() == [10.0, 15.0]

    def test_dissolve_ignores_declared_but_absent_chain(self, ray_session):
        ds = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [0, 1],
                    "route": ["A", "A"],
                    "beg": [0.0, 5.0],
                    "end": [5.0, 10.0],
                }
            )
        )
        out = md.dissolve(ds, CH, num_partitions=4).to_pandas()
        assert len(out) == 1  # groups by route only

    def test_overlay_relates_within_chain_only(self, ray_session, chained_events):
        # Target spans [0,15] in chain 0: overlaps chain-0 events only.
        target = rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [100],
                    "route": ["A"],
                    "chain": [0],
                    "beg": [0.0],
                    "end": [15.0],
                }
            )
        )
        rel = Relation(
            target, chained_events, CH, num_partitions=4
        )
        pairs = rel.overlay(normalize=False).to_pandas()
        assert sorted(pairs.right_id.tolist()) == [0, 1]
        # Same data without chain threading matches event 2 as well.
        nochain = LRS(key_col=("route",), beg_col="beg", end_col="end",
                      closed="left_mod")
        rel2 = Relation(target, chained_events, nochain, num_partitions=4)
        pairs2 = rel2.overlay(normalize=False).to_pandas()
        assert sorted(pairs2.right_id.tolist()) == [0, 1, 2]

    def test_one_sided_chain_raises(self, ray_session, chained_events):
        # A declared chain column present on only one side would silently
        # match nothing — must fail loudly instead.
        no_chain = rd.from_pandas(
            pd.DataFrame(
                {"event_id": [100], "route": ["A"],
                 "beg": [0.0], "end": [15.0]}
            )
        )
        rel = Relation(no_chain, chained_events, CH, num_partitions=4)
        with pytest.raises(ValueError, match="key level mismatch"):
            rel.overlay(normalize=False)

    def test_cluster_respects_chains(self, ray_session, chained_events):
        from linref_ray.spatial import cluster_events

        out = (
            cluster_events(chained_events, CH, max_gap=0.5, num_partitions=4)
            .to_pandas()
            .set_index("event_id")
        )
        # events 1 and 2 touch by measure but live in different chains
        assert out.loc[0, "cluster"] == out.loc[1, "cluster"]
        assert out.loc[1, "cluster"] != out.loc[2, "cluster"]

    def test_add_chaining_then_group(self, ray_session):
        # Geometric chaining feeds the grouping end-to-end: two touching
        # fragments + one disjoint fragment on route A (the reference
        # TestChainCol fixture shape), then dissolve per (route, chain).
        from linref_ray.geometry import add_chaining

        frags = rd.from_arrow(
            pa.table(
                {
                    "event_id": [0, 1, 2, 3],
                    "route": ["A", "A", "A", "B"],
                    "beg": [0.0, 5.0, 20.0, 0.0],
                    "end": [5.0, 10.0, 25.0, 8.0],
                    "xs": pa.array(
                        [[0.0, 5.0], [5.0, 10.0], [20.0, 25.0], [0.0, 8.0]],
                        pa.list_(pa.float64()),
                    ),
                    "ys": pa.array(
                        [[0.0, 0.0], [0.0, 0.0], [0.0, 0.0], [10.0, 10.0]],
                        pa.list_(pa.float64()),
                    ),
                }
            )
        )
        chained = add_chaining(frags, key_col="route", num_partitions=4)
        df = chained.to_pandas().sort_values("event_id").reset_index(drop=True)
        # reference test_add_chaining_computes_correct_chains
        assert df.chain.tolist()[0] == df.chain.tolist()[1]
        assert df.chain.tolist()[2] != df.chain.tolist()[0]
        out = md.dissolve(
            rd.from_pandas(df.drop(columns=["xs", "ys"])), CH,
            num_partitions=4,
        ).to_pandas()
        a = out[out.route == "A"]
        assert len(a) == 2  # [0,10] and [20,25] stay separate chains
