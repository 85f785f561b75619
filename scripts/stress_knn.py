#!/usr/bin/env python
"""kNN-graph stress: IVF-bucketed all-pairs top-k at a corpus size where
the brute-force O(N²) scan stops being reasonable, with recall measured
against brute force on a sampled query subset.

Corpus: `n` 64-d vectors in 256 clusters (deterministic). Reports IVF
wall, brute wall (for reference), and IVF recall@k vs brute on 500
sampled queries.

Usage: python scripts/stress_knn.py [n] [num_cpus]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    from linref_ray.similarity import knn_graph, knn_graph_ivf

    rng = np.random.default_rng(3)
    centers = rng.normal(size=(256, 64)) * 8
    assign = rng.integers(0, 256, n)
    m = (centers[assign] + rng.normal(size=(n, 64))).astype(np.float32)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array(list(m), pa.list_(pa.float32())),
            }
        )
    ).repartition(64).materialize()

    n_centroids = int(os.environ.get("KNN_CENTROIDS", "256"))
    nprobe = int(os.environ.get("KNN_NPROBE", "12"))
    t0 = time.time()
    ivf = knn_graph_ivf(
        ds, k=5, n_centroids=n_centroids, nprobe=nprobe, max_cell=65536,
        sample=16384,
    ).to_pandas()
    ivf_wall = time.time() - t0

    t0 = time.time()
    brute = knn_graph(ds, k=5).to_pandas()
    brute_wall = time.time() - t0

    qs = rng.choice(n, 500, replace=False)
    b = brute[brute.query_id.isin(qs)]
    a = ivf[ivf.query_id.isin(qs)]
    bset = set(zip(b.query_id, b.vec_id))
    aset = set(zip(a.query_id, a.vec_id))
    recall = len(aset & bset) / len(bset)
    print({
        "n": n,
        "ivf_wall_s": round(ivf_wall, 2),
        "brute_wall_s": round(brute_wall, 2),
        "recall_at_5": round(recall, 4),
        "num_cpus": cpus,
    })
    ray.shutdown()


if __name__ == "__main__":
    main()
