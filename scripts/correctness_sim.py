#!/usr/bin/env python
"""Driver-style correctness gate, runnable locally: every queries() entry
executes at the given sf level; entries with an oracle_sql() twin are
compared against DuckDB under a STRICT bitwise equality (sorted columns,
sorted rows) — stricter than a value hash, so anything green here is green
for any reasonable hash.

Usage: python scripts/correctness_sim.py [sf_dir] [query ...]
"""

import sys

import duckdb
import pandas as pd
import ray
import ray.data

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    sys.path.insert(0, ".")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf}/{t}.parquet')"
        )
    qs, os_ = e.queries(), e.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            res = fn(sf)
            df = res.to_pandas() if isinstance(res, ray.data.Dataset) else (
                res if isinstance(res, pd.DataFrame) else res.to_pandas()
            )
            if name not in os_:
                print(f"{name}: rows-only {len(df)}")
                continue
            o = con.execute(os_[name]).df()
            cols = sorted(df.columns)
            if cols != sorted(o.columns):
                print(f"{name}: SCHEMA MISMATCH {cols} vs {sorted(o.columns)}")
                fails.append(name)
                continue
            a = df[cols].sort_values(cols).reset_index(drop=True)
            b = o[cols].sort_values(cols).reset_index(drop=True)
            ok = len(a) == len(b)
            if ok:
                try:
                    ok = a.equals(b.astype(a.dtypes.to_dict()))
                except (TypeError, ValueError):
                    ok = a.equals(b)
            print(f"{name}: rows {len(a)}/{len(b)} {'OK' if ok else 'FAIL'}")
            if not ok:
                fails.append(name)
        except Exception as exc:  # noqa: BLE001 — gate must report, not die
            print(f"{name}: ERROR {exc}")
            fails.append(name)
    print("FAILS:", fails)
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
