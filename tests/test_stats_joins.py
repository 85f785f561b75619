"""Exact quantiles (counts-only shuffle) and broadcast semi/anti join.

Engine-side additions; SQL parity gated by the `quantiles` / `semi_join` /
`anti_join` oracles. These tests pin the closed-form interpolation
semantics and the semi/anti complement property.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd

from linref_ray.joins import broadcast_semi_join
from linref_ray.stats import exact_quantiles

SF_DIR = "/root/testdata/sf0.001"


def test_quantiles_closed_form_interpolation(ray_session):
    # values [1,2,3,10]: q=0.5 -> pos 1.5 -> 2.5; q=0.75 -> pos 2.25 -> 4.75
    ds = rd.from_arrow(
        pa.table({"v": pa.array([1.0, 2.0, 3.0, 10.0])})
    )
    out = exact_quantiles(ds, "v", (0.0, 0.5, 0.75, 1.0)).to_pandas()
    got = dict(zip(out["q"], out["value"]))
    assert got == {0.0: 1.0, 0.5: 2.5, 0.75: 4.75, 1.0: 10.0}


def test_quantiles_grouped_and_repeated_values(ray_session):
    ds = rd.from_arrow(
        pa.table(
            {
                "g": pa.array(["a"] * 5 + ["b"] * 2),
                "v": pa.array([7.0, 7.0, 7.0, 1.0, 3.0, 5.0, 5.0]),
            }
        )
    )
    out = exact_quantiles(ds, "v", (0.5,), ("g",)).to_pandas()
    got = dict(zip(out["g"], out["value"]))
    assert got == {"a": 7.0, "b": 5.0}  # a sorted: 1,3,7,7,7 -> median 7


def test_quantiles_partition_invariant(ray_session):
    li = rd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_returnflag", "l_quantity"]
    )
    a = exact_quantiles(li, "l_quantity", (0.25, 0.9), ("l_returnflag",))
    b = exact_quantiles(
        li.repartition(11), "l_quantity", (0.25, 0.9), ("l_returnflag",)
    )
    assert a.equals(b)


def _li_orders():
    li = rd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_linenumber"]
    )
    orders = rd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    hi = orders.map_batches(
        lambda t: t.filter(
            pa.compute.greater(t["o_totalprice"], 300000.0)
        ).select(["o_orderkey"]),
        batch_format="pyarrow",
    )
    return li, hi


def test_semi_anti_partition_the_input(ray_session):
    li, hi = _li_orders()
    n = li.count()
    semi = broadcast_semi_join(li, hi, on="l_orderkey", small_on="o_orderkey")
    anti = broadcast_semi_join(
        li, hi, on="l_orderkey", small_on="o_orderkey", anti=True
    )
    ns, na = semi.count(), anti.count()
    assert ns + na == n and 0 < ns < n
    # semi keys are exactly the key intersection
    keys = set(hi.to_pandas()["o_orderkey"])
    sk = set(semi.to_pandas()["l_orderkey"])
    ak = set(anti.to_pandas()["l_orderkey"])
    assert sk <= keys and not (ak & keys)


def test_semi_join_empty_small_side(ray_session):
    li, hi = _li_orders()
    none = hi.map_batches(
        lambda t: t.filter(pa.array(np.zeros(len(t), dtype=bool))),
        batch_format="pyarrow",
    )
    assert broadcast_semi_join(
        li, none, on="l_orderkey", small_on="o_orderkey"
    ).count() == 0
    assert broadcast_semi_join(
        li, none, on="l_orderkey", small_on="o_orderkey", anti=True
    ).count() == li.count()
