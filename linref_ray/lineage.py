"""Per-partition lineage checkpointing + exact resume (north-rule item).

Output layout (resumable by construction):

    out_dir/
      part=<key>/data.parquet        ← written atomically (tmp + rename)
      _manifest/<key>.json           ← rows_in/rows_out, measure range,
                                       order-insensitive content hash,
                                       optional cell histogram

A failed run leaves only complete (parquet + manifest) pairs — the manifest
is written *after* its data file renames into place. ``resume`` anti-joins
the partition plan against the completed manifest set, so a rerun recomputes
only missing partitions; kernels are deterministic functions of their
partition (seeded synth, pure measure math), so retries are exact.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from linref_ray.partition import PID, add_partition_cols


def _content_hash(tbl: pa.Table) -> int:
    """Order-insensitive 64-bit content hash of a table."""
    acc = np.uint64(0)
    df = tbl.to_pandas()
    row_h = pd.util.hash_pandas_object(df, index=False).to_numpy()
    with np.errstate(over="ignore"):
        return int(row_h.astype(np.uint64).sum(dtype=np.uint64))


def write_partition(
    tbl: pa.Table,
    out_dir: str,
    key: str,
    rows_in: int | None = None,
    extra: dict | None = None,
) -> dict:
    """Atomically write one partition + its manifest; returns the manifest."""
    part_dir = os.path.join(out_dir, f"part={key}")
    os.makedirs(part_dir, exist_ok=True)
    man_dir = os.path.join(out_dir, "_manifest")
    os.makedirs(man_dir, exist_ok=True)
    tmp = os.path.join(part_dir, f".tmp-{uuid.uuid4().hex}.parquet")
    pq.write_table(tbl, tmp)
    final = os.path.join(part_dir, "data.parquet")
    os.replace(tmp, final)
    manifest = {
        "partition": key,
        "rows_in": rows_in if rows_in is not None else len(tbl),
        "rows_out": len(tbl),
        "content_hash": _content_hash(tbl),
        "written_at": time.time(),
    }
    for col in ("beg", "end", "loc"):
        if col in tbl.column_names and len(tbl):
            arr = tbl[col].to_numpy(zero_copy_only=False)
            manifest[f"{col}_min"] = float(np.nanmin(arr))
            manifest[f"{col}_max"] = float(np.nanmax(arr))
    if extra:
        manifest.update(extra)
    tmp_m = os.path.join(man_dir, f".tmp-{key}.json")
    with open(tmp_m, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp_m, os.path.join(man_dir, f"{key}.json"))
    return manifest


def completed_partitions(out_dir: str) -> set[str]:
    man_dir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(man_dir):
        return set()
    return {
        f[: -len(".json")]
        for f in os.listdir(man_dir)
        if f.endswith(".json") and not f.startswith(".tmp")
    }


def write_resumable(
    ds: ray.data.Dataset,
    out_dir: str,
    key_cols: tuple[str, ...],
    num_partitions: int = 64,
    cell_col: str | None = None,
) -> dict:
    """Write ``ds`` as hash partitions with lineage; skip completed ones.

    Returns a summary {written, skipped, rows}. Idempotent: re-running after
    a crash completes only the missing partitions; re-running after success
    writes nothing.
    """
    done = completed_partitions(out_dir)

    def part(t: pa.Table) -> pa.Table:
        return add_partition_cols(t, key_cols, num_partitions)

    skip_vals = {int(k) for k in done if k.isdigit()}

    def drop_done(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if not skip_vals:
            return t
        mask = pc.invert(
            pc.is_in(
                t[PID],
                value_set=pa.array(sorted(skip_vals), pa.int64()),
            )
        )
        return t.filter(mask)

    def write_group(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"partition": pa.array([], pa.string()),
                             "rows_out": pa.array([], pa.int64())})
        key = str(int(t[PID][0].as_py()))
        extra = None
        if cell_col and cell_col in t.column_names:
            vals, counts = np.unique(
                t[cell_col].to_numpy(zero_copy_only=False), return_counts=True
            )
            extra = {
                "cell_hist": {str(int(v)): int(c) for v, c in zip(vals, counts)}
            }
        body = t.drop_columns([c for c in (PID, "__key") if c in t.column_names])
        m = write_partition(body, out_dir, key, rows_in=len(t), extra=extra)
        return pa.table(
            {
                "partition": pa.array([m["partition"]]),
                "rows_out": pa.array([m["rows_out"]], pa.int64()),
            }
        )

    result = (
        ds.map_batches(part, batch_format="pyarrow")
        .map_batches(drop_done, batch_format="pyarrow")
        .repartition(num_partitions)
        .groupby(PID)
        .map_groups(write_group, batch_format="pyarrow")
    )
    written = result.to_pandas()
    return {
        "written": len(written),
        "skipped": len(done),
        "rows": int(written.rows_out.sum()) if len(written) else 0,
    }


def read_resumable(out_dir: str) -> ray.data.Dataset:
    """Read back all completed partitions."""
    paths = [
        os.path.join(out_dir, d, "data.parquet")
        for d in sorted(os.listdir(out_dir))
        if d.startswith("part=")
        and os.path.exists(os.path.join(out_dir, d, "data.parquet"))
    ]
    return ray.data.read_parquet(paths)


def validate_manifest(out_dir: str) -> list[str]:
    """Re-hash each partition file against its manifest; returns mismatches."""
    bad = []
    for key in sorted(completed_partitions(out_dir)):
        with open(os.path.join(out_dir, "_manifest", f"{key}.json")) as f:
            m = json.load(f)
        path = os.path.join(out_dir, f"part={key}", "data.parquet")
        if not os.path.exists(path):
            bad.append(key)
            continue
        tbl = pq.read_table(path)
        if _content_hash(tbl) != m["content_hash"] or len(tbl) != m["rows_out"]:
            bad.append(key)
    return bad
