"""k-nearest-routes lookup: brute-force parity + basic contract tests."""

import numpy as np
import pyarrow as pa
import pytest

from linref_ray.synth import make_routes


def _brute_knn(routes: pa.Table, px, py, k, buffer):
    """Reference result: for each point, each route's min segment distance,
    routes ranked by (distance, route order), top-k within buffer."""
    out = []
    rids = routes["route_id"].to_pylist()
    xs = routes["xs"].to_pylist()
    ys = routes["ys"].to_pylist()
    ms = routes["ms"].to_pylist()
    for pi, (qx, qy) in enumerate(zip(px, py)):
        per_route = []
        for ri, (rid, x, y, m) in enumerate(zip(rids, xs, ys, ms)):
            x, y, m = map(np.asarray, (x, y, m))
            vx, vy = np.diff(x), np.diff(y)
            seg2 = vx * vx + vy * vy
            t = np.divide(
                (qx - x[:-1]) * vx + (qy - y[:-1]) * vy,
                seg2,
                out=np.zeros_like(seg2),
                where=seg2 > 0,
            )
            t = np.clip(t, 0, 1)
            d = np.sqrt((qx - (x[:-1] + t * vx)) ** 2 + (qy - (y[:-1] + t * vy)) ** 2)
            j = int(np.argmin(d))
            loc = m[:-1][j] + t[j] * (m[1:][j] - m[:-1][j])
            per_route.append((float(d[j]), ri, rid, float(loc)))
        per_route.sort(key=lambda z: (z[0], z[1]))
        for rank, (d, ri, rid, loc) in enumerate(per_route[:k]):
            if d <= buffer:
                out.append((pi, rid, rank, round(d, 9), round(loc, 9)))
    return set(out)


def test_knn_routes_brute_parity(ray_session):
    import ray
    import ray.data

    from linref_ray.spatial import build_route_index, knn_routes

    routes = make_routes(12, seed=31)
    rng = np.random.Generator(np.random.PCG64(5))
    # Points near the network so most match several routes
    all_x = np.concatenate(routes["xs"].to_pylist())
    all_y = np.concatenate(routes["ys"].to_pylist())
    pick = rng.integers(0, len(all_x), 200)
    px = all_x[pick] + rng.normal(0, 20, 200)
    py = all_y[pick] + rng.normal(0, 20, 200)
    buffer = 60.0
    ref = build_route_index(routes, res=4, pad=buffer)
    pts = ray.data.from_arrow(
        pa.table({"pid": pa.array(np.arange(200, dtype=np.int64)),
                  "x": px, "y": py})
    )
    got_df = knn_routes(pts, ref, k=3, buffer=buffer).to_pandas()
    got = {
        (int(r["pid"]), r["route_id"], int(r["rank"]),
         round(float(r["snap_dist"]), 9), round(float(r["loc"]), 9))
        for _, r in got_df.iterrows()
    }
    want = _brute_knn(routes, px, py, 3, buffer)
    assert got == want


def test_knn_routes_k1_matches_snap(ray_session):
    import ray
    import ray.data

    from linref_ray.spatial import build_route_index, knn_routes, snap_points

    routes = make_routes(10, seed=13)
    rng = np.random.Generator(np.random.PCG64(7))
    all_x = np.concatenate(routes["xs"].to_pylist())
    all_y = np.concatenate(routes["ys"].to_pylist())
    pick = rng.integers(0, len(all_x), 150)
    px = all_x[pick] + rng.normal(0, 5, 150)
    py = all_y[pick] + rng.normal(0, 5, 150)
    ref = build_route_index(routes, res=4, pad=30.0)
    pts = pa.table({"pid": pa.array(np.arange(150, dtype=np.int64)),
                    "x": px, "y": py})
    a = knn_routes(ray.data.from_arrow(pts), ref, k=1, buffer=30.0).to_pandas()
    b = snap_points(ray.data.from_arrow(pts), ref, buffer=30.0).to_pandas()
    a = a.sort_values("pid").reset_index(drop=True)
    b = b.sort_values("pid").reset_index(drop=True)
    assert list(a.pid) == list(b.pid)
    assert list(a.route_id) == list(b.route_id)
    np.testing.assert_allclose(a.snap_dist, b.snap_dist)
    np.testing.assert_allclose(a["loc"], b["loc"])
    assert (a["rank"] == 0).all()


def test_knn_routes_actor_pool_and_empty(ray_session):
    import ray
    import ray.data

    from linref_ray.spatial import build_route_index, knn_routes

    routes = make_routes(4, seed=3)
    ref = build_route_index(routes, res=4, pad=10.0)
    # far-away points → zero matches, schema intact
    pts = pa.table({"x": [1e7, 2e7], "y": [1e7, 2e7]})
    out = knn_routes(
        ray.data.from_arrow(pts), ref, k=2, buffer=10.0, concurrency=2
    )
    # to_pandas() on an all-empty Dataset drops columns (Ray 2.49 quirk);
    # the Dataset-level schema is the operator's contract.
    assert set(out.schema().names) == {
        "x", "y", "route_id", "loc", "snap_dist", "rank"
    }
    assert len(out.to_pandas()) == 0
