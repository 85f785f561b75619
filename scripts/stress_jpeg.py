#!/usr/bin/env python
"""JPEG decode-path throughput: N real baseline-JPEG images (pure-spec
codec) generated in distributed tasks, then verified (decode + PSNR +
caption) through the standard invariant stage in 128-image batches.

The per-image entropy decode is inherently sequential (~3.4 ms at 16×16),
so throughput is task-fan parallelism over small batches — the shape a
production deployment keeps when swapping the pure-spec codec for libjpeg
inside the same actor signature.

Usage: python scripts/stress_jpeg.py [n_images] [num_cpus]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    import logging

    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from linref_ray import synth
    from linref_ray.images import verify_invariants

    # warmup (worker pool + imports)
    verify_invariants(
        synth.make_images_jpeg_stream(512, num_blocks=cpus), batch_size=128
    ).count()

    t0 = time.time()
    corpus = synth.make_images_jpeg_stream(n, num_blocks=cpus * 2)
    out = verify_invariants(corpus, batch_size=128)
    ok = out.sum(on="invariant_ok")
    wall = time.time() - t0
    assert ok == n, f"{n - ok} invariant failures"
    print(
        f"jpeg stress: {n} images encode+decode+verify in {wall:.2f}s "
        f"= {n / wall:,.0f} img/s at {cpus} cpus (all invariants green)"
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
