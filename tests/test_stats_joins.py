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


def test_group_topk_string_groups_and_ties(ray_session):
    from linref_ray.stats import top_k_per_group

    t = pa.table(
        {
            "g": pa.array(["x", "x", "x", "y", "y", "z"]),
            "v": pa.array([5.0, 5.0, 1.0, 2.0, 9.0, 4.0]),
            "id": pa.array([3, 1, 2, 10, 11, 20], pa.int64()),
        }
    )
    out = top_k_per_group(
        rd.from_arrow(t), "g", "v", k=1, tie_col="id", num_partitions=4
    ).to_pandas()
    got = {r.g: (int(r.id), r.v) for r in out.itertuples()}
    # x: tie at v=5 -> smaller id wins; ascending=False default
    assert got == {"x": (1, 5.0), "y": (11, 9.0), "z": (20, 4.0)}
    # ascending variant
    out2 = top_k_per_group(
        rd.from_arrow(t), "g", "v", k=1, descending=False, tie_col="id",
        num_partitions=4,
    ).to_pandas()
    got2 = {r.g: (int(r.id), r.v) for r in out2.itertuples()}
    assert got2 == {"x": (2, 1.0), "y": (10, 2.0), "z": (20, 4.0)}


def test_group_topk_partition_invariant(ray_session):
    from linref_ray.stats import top_k_per_group

    li = rd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    )
    a = (
        top_k_per_group(li, "l_orderkey", "l_extendedprice", k=2,
                        tie_col="l_linenumber")
        .to_pandas().sort_values(["l_orderkey", "l_linenumber"])
        .reset_index(drop=True)
    )
    b = (
        top_k_per_group(li.repartition(13), "l_orderkey",
                        "l_extendedprice", k=2, tie_col="l_linenumber",
                        num_partitions=3)
        .to_pandas().sort_values(["l_orderkey", "l_linenumber"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_filter_by_quantile(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from linref_ray.stats import filter_by_quantile

    rng = np.random.default_rng(5)
    v = rng.integers(0, 1000, 200)
    ds = rd.from_pandas(pd.DataFrame({"id": np.arange(200), "v": v}))
    thr = np.quantile(v, 0.8)  # numpy 'linear' == percentile_cont
    hi = filter_by_quantile(ds, "v", q=0.8, keep="above").to_pandas()
    lo = filter_by_quantile(ds, "v", q=0.8, keep="below").to_pandas()
    assert sorted(hi.id) == sorted(np.flatnonzero(v >= thr))
    assert sorted(lo.id) == sorted(np.flatnonzero(v <= thr))


def test_approx_distinct_accuracy_and_partition_independence(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from linref_ray.stats import approx_distinct

    rng = np.random.default_rng(3)
    # 20k rows over exactly 7000 distinct values
    vals = [f"v{int(i)}" for i in rng.integers(0, 7000, 20_000)]
    truth = len(set(vals))
    df = pd.DataFrame({"x": vals})
    est = approx_distinct(rd.from_pandas(df), "x", precision=14)
    assert abs(est - truth) / truth < 0.02
    # partition independence: different blocking, identical estimate
    est2 = approx_distinct(
        rd.from_pandas(df).repartition(13), "x", precision=14
    )
    assert est == est2


def test_heavy_hitters_exact_topk(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from linref_ray.text import heavy_hitters

    rng = np.random.default_rng(9)
    # zipf-ish corpus: token ti appears ~ 1/(i+1) of the time
    weights = 1.0 / np.arange(1, 101)
    weights /= weights.sum()
    docs = []
    for d in range(200):
        toks = rng.choice(100, size=50, p=weights)
        docs.append(" ".join(f"t{i:03d}" for i in toks))
    df = pd.DataFrame({"doc_id": np.arange(200), "text": docs})
    got = heavy_hitters(rd.from_pandas(df), k=10, capacity=64).to_pandas()
    # brute-force exact
    from collections import Counter

    c = Counter(w for t in docs for w in t.split())
    exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got.token, got.n)) == exp


def test_approx_quantiles_rank_error_bound(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from linref_ray.stats import approx_quantiles

    rng = np.random.default_rng(8)
    v = rng.normal(size=50_000)  # continuous: every value distinct
    ds = rd.from_pandas(pd.DataFrame({"x": v})).repartition(16)
    got = approx_quantiles(ds, "x", qs=(0.1, 0.5, 0.9, 0.99),
                           points_per_batch=256)
    sv = np.sort(v)
    for q, val in zip(got["q"].to_pylist(), got["value"].to_pylist()):
        # rank of the returned value must be within total/points_per_batch
        # of the true rank (the mergeable-summary bound, with slack 2x)
        rank = np.searchsorted(sv, val)
        assert abs(rank - q * len(v)) < 2 * len(v) / 256, (q, rank)


def test_approx_quantiles_grouped(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from linref_ray.stats import approx_quantiles

    rng = np.random.default_rng(4)
    g = rng.choice(["a", "b", "c"], size=30_000)
    v = rng.normal(loc=np.searchsorted(["a", "b", "c"], g) * 10.0)
    ds = rd.from_pandas(pd.DataFrame({"g": g, "x": v})).repartition(8)
    got = approx_quantiles(ds, "x", qs=(0.5,), points_per_batch=256,
                           group_cols=("g",))
    for grp, q, val in zip(got["g"].to_pylist(), got["q"].to_pylist(),
                           got["value"].to_pylist()):
        sv = np.sort(v[g == grp])
        rank = np.searchsorted(sv, val)
        assert abs(rank - q * len(sv)) < 2 * len(sv) / 256, (grp, rank)
        # medians of the three groups sit near 0 / 10 / 20
        assert abs(val - np.searchsorted(["a", "b", "c"], grp) * 10) < 1
