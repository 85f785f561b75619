"""Toy sample datasets for learning and testing the engine.

API parity with the reference's ``linref.datasets.load``
(``datasets/_loaders.py:19-113``): the same three dataset names with the
same schema shapes (route key + measures + attributes; linear geometry as
this engine's ``xs/ys/ms`` ``list<double>`` columns instead of shapely
objects). The sample VALUES are generated here deterministically — they
are this engine's own teaching corpus, not a copy of the reference's data
files.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from linref_ray.lrs import LRS

_ROUTES = ("A-10", "B-20", "C-30")


def _roadway_rows() -> tuple[list, list, list, list]:
    rng = np.random.Generator(np.random.PCG64(71))
    routes, begs, ends = [], [], []
    attrs = {"traffic_volume": [], "speed_limit": []}
    for r, n_seg in zip(_ROUTES, (4, 3, 3)):
        edges = np.round(np.cumsum(rng.uniform(1.0, 3.0, n_seg)), 1)
        beg = np.concatenate(([0.0], edges[:-1]))
        routes += [r] * n_seg
        begs += beg.tolist()
        ends += edges.tolist()
        attrs["traffic_volume"] += (
            rng.integers(5, 40, n_seg) * 1000
        ).tolist()
        attrs["speed_limit"] += rng.choice([45, 55, 65], n_seg).tolist()
    return routes, begs, ends, attrs


def load(name: str, set_lrs: bool = False):
    """Load a toy dataset as a ``ray.data.Dataset``.

    - ``'roadways'``: linear events with ``xs/ys/ms`` geometry (10 segments)
    - ``'crashes'``: point events with coordinates (20 crashes)
    - ``'pavement'``: linear condition events, no geometry (14 segments)

    With ``set_lrs=True`` returns an :class:`linref_ray.api.Events` facade
    with the matching LRS attached instead of the bare Dataset.
    """
    import ray.data as rd

    if name == "roadways":
        routes, begs, ends, attrs = _roadway_rows()
        n = len(routes)
        # Straight diagonal geometry per segment: x = m, y = route slope.
        slope = {r: 0.2 * (i + 1) for i, r in enumerate(_ROUTES)}
        xs = [[b, e] for b, e in zip(begs, ends)]
        ys = [
            [b * slope[r], e * slope[r]]
            for r, b, e in zip(routes, begs, ends)
        ]
        tbl = pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "route": pa.array(routes),
                "beg": pa.array(begs, pa.float64()),
                "end": pa.array(ends, pa.float64()),
                "traffic_volume": pa.array(attrs["traffic_volume"], pa.int64()),
                "speed_limit": pa.array(attrs["speed_limit"], pa.int64()),
                "xs": pa.array(xs, pa.list_(pa.float64())),
                "ys": pa.array(ys, pa.list_(pa.float64())),
                "ms": pa.array(xs, pa.list_(pa.float64())),
            }
        )
        lrs = LRS(key_col=("route",), closed="left_mod")
    elif name == "crashes":
        rng = np.random.Generator(np.random.PCG64(72))
        n = 20
        routes = rng.choice(_ROUTES, n).tolist()
        locs = np.round(rng.uniform(0.0, 7.0, n), 2)
        tbl = pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "route": pa.array(routes),
                "loc": pa.array(locs, pa.float64()),
                "severity": pa.array(
                    rng.integers(1, 5, n).tolist(), pa.int64()
                ),
            }
        )
        lrs = LRS(
            key_col=("route",), beg_col=None, end_col=None, loc_col="loc"
        )
    elif name == "pavement":
        rng = np.random.Generator(np.random.PCG64(73))
        routes, begs, ends, _ = _roadway_rows()
        # Re-cut the same routes at different breakpoints (14 segments).
        routes2, begs2, ends2, cond, surf = [], [], [], [], []
        for r in _ROUTES:
            hi = max(e for rr, e in zip(routes, ends) if rr == r)
            edges = np.round(
                np.sort(rng.uniform(0.5, hi - 0.1, 4)), 1
            ).tolist() + [hi]
            prev = 0.0
            for e in edges[:4] + [hi]:
                if e <= prev:
                    continue
                routes2.append(r)
                begs2.append(prev)
                ends2.append(e)
                cond.append(int(rng.integers(70, 95)))
                surf.append(str(rng.choice(["Asphalt", "Concrete"])))
                prev = e
        tbl = pa.table(
            {
                "event_id": pa.array(range(len(routes2)), pa.int64()),
                "route": pa.array(routes2),
                "beg": pa.array(begs2, pa.float64()),
                "end": pa.array(ends2, pa.float64()),
                "condition_rating": pa.array(cond, pa.int64()),
                "surface_type": pa.array(surf),
            }
        )
        lrs = LRS(key_col=("route",), closed="left_mod")
    else:
        raise ValueError(
            f"Unknown dataset {name!r}. Available: roadways, crashes, "
            "pavement"
        )
    ds = rd.from_arrow(tbl)
    if set_lrs:
        from linref_ray.api import Events

        return Events(ds, lrs)
    return ds
