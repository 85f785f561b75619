#!/usr/bin/env python
"""Dedup-cascade stress: replicate the sf0.1 documents table R times with
per-replica suffix tokens — every base doc becomes an R-copy near-dup
family (~R*5k docs, >75% duplicates at R=4), the worst realistic shape for
candidate generation. Times the MinHash cascade and the exact n-gram
Jaccard join end-to-end and reports pair counts + walls as one JSON line.

Usage: python scripts/stress_dedup.py [R] [num_cpus]
"""

import json
import os
import sys
import time

import pyarrow as pa
import ray
import ray.data as rd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    r_factor = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    rd.DataContext.get_current().enable_progress_bars = False

    from linref_ray.dedup import minhash_near_duplicates, ngram_jaccard_pairs

    base = rd.read_parquet(
        "/root/testdata/sf0.1/documents.parquet", columns=["doc_id", "text"]
    )
    n_base = base.count()

    def replicate(t: pa.Table, rep: int) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids + rep * 1_000_000),
                "text": pa.array(
                    [s + f" rep{rep} tag{rep}_{i}" for i, s in zip(ids, texts)]
                ),
            }
        )

    parts = [base.map_batches(
        lambda t, rep=rep: replicate(t, rep), batch_format="pyarrow"
    ) for rep in range(r_factor)]
    docs = parts[0]
    for p in parts[1:]:
        docs = docs.union(p)
    docs = docs.materialize()  # stress input pinned; we time the cascades
    n_docs = docs.count()

    out = {"r_factor": r_factor, "num_cpus": num_cpus,
           "n_base": n_base, "n_docs": n_docs}
    t0 = time.time()
    out["minhash_pairs"] = minhash_near_duplicates(
        docs, threshold=0.5
    ).count()
    out["minhash_sec"] = round(time.time() - t0, 1)
    t0 = time.time()
    out["exact_pairs"] = ngram_jaccard_pairs(docs, threshold=0.5).count()
    out["exact_sec"] = round(time.time() - t0, 1)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
