#!/usr/bin/env python
"""Cluster job entrypoint — the `ray job submit` surface of the north rule.

On a real cluster:

    ray job submit --working-dir . -- python scripts/job_entry.py \
        --corpus /data/corpus_lance --out /data/out --n-images 1200000

connects to the cluster Ray (RAY_ADDRESS from the job environment), runs
the checkpointed flagship (resumable per-partition lineage), and prints a
one-line JSON summary. In this sandbox it runs identically against a
local session and the synthetic corpus.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import ray

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", default=None,
                   help="image corpus path (Lance/parquet); synthetic if unset")
    p.add_argument("--out", default="/tmp/linref_ray_job_out")
    p.add_argument("--n-images", type=int, default=120_000)
    p.add_argument("--num-partitions", type=int, default=64)
    args = p.parse_args()

    # `ray job submit` provides the cluster address; standalone runs get a
    # local session. Library code never calls ray.init itself.
    if not ray.is_initialized():
        ray.init(include_dashboard=False, logging_level="ERROR")

    import ray.data as rd

    from linref_ray import synth
    from linref_ray.images import image_pipeline_checkpointed
    from linref_ray.io import read_image_corpus

    routes = synth.make_routes(64, seed=42)
    events = rd.from_arrow(synth.make_events(routes, density=0.05))
    images = (
        read_image_corpus(args.corpus)
        if args.corpus
        else synth.images_dataset(args.n_images, w=16, h=16)
    )
    t0 = time.time()
    per_event, tiles, _, summary = image_pipeline_checkpointed(
        images, routes, events, args.out,
        buffer=6.0, cell_res=6, num_partitions=args.num_partitions,
    )
    n_tiles = tiles.count()
    n_events = per_event.count()
    print(
        json.dumps(
            {
                "wall_sec": round(time.time() - t0, 2),
                "tiles": n_tiles,
                "event_rows": n_events,
                "checkpoint": summary,
                "out_dir": args.out,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
