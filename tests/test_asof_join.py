"""As-of join semantics: inclusive/strict boundaries, ts tie-break toward
the larger right id, tolerance window, key isolation across the
forward-fill, and partition invariance. Organic SQL parity is gated by
the `asof_join` oracle (DuckDB windowed equivalent).
"""

import pyarrow as pa
import ray.data as rd

from linref_ray.joins import asof_join


def _mk(rows, cols=("event_id", "ts", "user_id", "value")):
    arrays = {c: pa.array([r[i] for r in rows],
                          pa.float64() if c == "value" else pa.int64())
              for i, c in enumerate(cols)}
    return rd.from_arrow(pa.table(arrays))


def _run(left, right, **kw):
    out = asof_join(
        left, right, on="user_id", ts_col="ts", id_col="event_id",
        value_cols=("value",), num_partitions=4, **kw
    ).to_pandas()
    return {
        int(r.event_id): (int(r.matched_id), r.matched_value)
        for r in out.itertuples()
    }


def test_basic_latest_at_or_before(ray_session):
    left = _mk([(10, 100, 1, 0.0), (11, 50, 1, 0.0), (12, 10, 1, 0.0)])
    right = _mk([(20, 40, 1, 2.5), (21, 90, 1, 7.5)])
    got = _run(left, right)
    assert got == {10: (21, 7.5), 11: (20, 2.5), 12: (-1, 0.0)}


def test_equal_ts_inclusive_and_strict(ray_session):
    left = _mk([(10, 100, 1, 0.0)])
    right = _mk([(20, 100, 1, 3.0), (19, 60, 1, 1.0)])
    assert _run(left, right) == {10: (20, 3.0)}
    assert _run(left, right, inclusive=False) == {10: (19, 1.0)}


def test_tie_breaks_toward_larger_right_id(ray_session):
    left = _mk([(10, 100, 1, 0.0)])
    right = _mk([(20, 80, 1, 1.0), (25, 80, 1, 2.0), (22, 80, 1, 3.0)])
    assert _run(left, right) == {10: (25, 2.0)}


def test_tolerance_window(ray_session):
    left = _mk([(10, 100, 1, 0.0)])
    right = _mk([(20, 10, 1, 5.0)])
    assert _run(left, right, tolerance=200) == {10: (20, 5.0)}
    assert _run(left, right, tolerance=50) == {10: (-1, 0.0)}


def test_keys_isolated_through_forward_fill(ray_session):
    # user 2 has rights, user 6 (same partition mod 4) has none: the
    # carried last-right index must invalidate by key mismatch
    left = _mk([(10, 100, 2, 0.0), (11, 100, 6, 0.0)])
    right = _mk([(20, 90, 2, 1.5)])
    assert _run(left, right) == {10: (20, 1.5), 11: (-1, 0.0)}


def test_partition_invariance(ray_session):
    import numpy as np

    rng = np.random.Generator(np.random.PCG64(4))
    n = 500
    rows_l = [(i, int(rng.integers(0, 1000)), int(rng.integers(0, 20)), 0.0)
              for i in range(n)]
    rows_r = [(1000 + i, int(rng.integers(0, 1000)),
               int(rng.integers(0, 20)), float(i))
              for i in range(n)]
    a = _run(_mk(rows_l), _mk(rows_r))
    b = _run(_mk(rows_l).repartition(9), _mk(rows_r).repartition(3))
    assert a == b
