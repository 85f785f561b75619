#!/usr/bin/env python
"""Run EVERY queries() entry at an sf level (default sf0.1) and report
per-query wall + row count. No oracle comparison — this is the scale
sweep that catches sf-dependent bugs the sf0.01 gate misses (e.g. the
round-3 interpolate NaN cast), and the per-query timing table for
BASELINE.md.

Usage: python scripts/sweep.py [sf_dir] [num_cpus] [query ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    only = set(sys.argv[3:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    import __ray_entry__ as e

    failures = []
    timings = []
    for name, fn in e.queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = fn(sf)
            df = res.to_pandas() if hasattr(res, "to_pandas") else res
            wall = time.time() - t0
            timings.append((wall, name, len(df)))
            print(f"{name}: {wall:.2f}s rows={len(df)}", flush=True)
        except Exception as exc:  # noqa: BLE001 — sweep must survive
            wall = time.time() - t0
            failures.append((name, repr(exc)[:200]))
            print(f"{name}: FAILED after {wall:.2f}s — {exc!r}", flush=True)
    timings.sort(reverse=True)
    print("\nslowest:")
    for wall, name, nrows in timings[:10]:
        print(f"  {name}: {wall:.2f}s rows={nrows}")
    print(f"\nTOTAL {sum(t[0] for t in timings):.1f}s over "
          f"{len(timings)} queries; FAILURES: {failures}")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
