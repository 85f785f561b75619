#!/usr/bin/env python
"""ExactSubstr span-removal stress: a dup-heavy synthetic corpus far above
the sf0.1 test size, exercising the content-defined-sampling scale mode.

Builds ~200k docs (~95 MB of text) where 25% embed a copy of one of 1000
shared boilerplate spans, then runs `remove_duplicate_spans(keep_mod=8)`
and reports wall, docs modified, and chars removed. Deterministic corpus
(seeded) — reruns are comparable.

Usage: python scripts/stress_spans.py [n_docs] [num_cpus]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def make_corpus(n_docs: int, seed: int = 7) -> pa.Table:
    rng = np.random.default_rng(seed)
    alpha = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz    ", dtype=np.uint8)
    spans = [
        bytes(rng.choice(alpha, size=200)).decode() for _ in range(1000)
    ]
    texts = []
    for d in range(n_docs):
        body = bytes(rng.choice(alpha, size=int(rng.integers(200, 600)))).decode()
        if d % 4 == 0:
            s = spans[int(rng.integers(0, len(spans)))]
            cut = len(body) // 2
            body = body[:cut] + s + body[cut:]
        texts.append(body)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    from linref_ray.dedup import remove_duplicate_spans

    tbl = make_corpus(n_docs)
    total_chars = int(pa.compute.sum(
        pa.compute.utf8_length(tbl["text"])).as_py())
    docs = rd.from_arrow(tbl).repartition(64).materialize()
    t0 = time.time()
    out = remove_duplicate_spans(
        docs, window=16, keep_mod=8, num_partitions=64
    ).materialize()
    wall = time.time() - t0
    kept_chars = int(out.map_batches(
        lambda t: pa.table({"n": pa.compute.utf8_length(t["text"])}),
        batch_format="pyarrow",
    ).sum("n"))
    import pandas as pd

    orig = tbl.to_pandas().set_index("doc_id")["text"]
    new = out.select_columns(["doc_id", "text"]).to_pandas().set_index(
        "doc_id")["text"]
    modified = int((orig.reindex(new.index) != new).sum())
    print({
        "n_docs": n_docs,
        "total_chars": total_chars,
        "wall_s": round(wall, 2),
        "docs_modified": modified,
        "chars_removed": total_chars - kept_chars,
        "chars_per_sec": round(total_chars / wall),
        "num_cpus": cpus,
    })
    ray.shutdown()


if __name__ == "__main__":
    main()
