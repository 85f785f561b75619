#!/usr/bin/env python
"""Oracle/engine Arrow-schema parity audit (VERDICT r04 item 2).

For every queries() entry with an oracle_sql() twin, run the engine at the
given sf level and fetch the oracle's Arrow schema via DuckDB
(`select * from (<oracle>) q limit 0` — cheap, no data scanned), then compare
column-by-column Arrow types after sorting columns by name. Any decimal128 /
hugeint column in an oracle whose engine twin emits int64/float64 is a latent
driver hash-mismatch and is reported here.

Usage: python scripts/oracle_schema_audit.py [sf_dir] [query ...]
"""

import sys

import duckdb
import pandas as pd
import pyarrow as pa
import ray
import ray.data

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _engine_schema(res) -> dict[str, pa.DataType]:
    if isinstance(res, ray.data.Dataset):
        tbl = None
        for b in res.iter_batches(batch_size=1024, batch_format="pyarrow"):
            if b.num_columns > 0:
                tbl = b
                break
        if tbl is None:
            raise RuntimeError("no non-empty batch produced")
    elif isinstance(res, pa.Table):
        tbl = res
    elif isinstance(res, pd.DataFrame):
        tbl = pa.Table.from_pandas(res, preserve_index=False)
    else:
        tbl = res.to_arrow()
    return {f.name: f.type for f in tbl.schema}


def _norm(t: pa.DataType) -> str:
    # The driver's hash is over values, so width-equivalent integer types
    # (int32 vs int64) can still hash-match after its own normalization;
    # what breaks it is decimal/hugeint vs int and string vs large_string.
    if pa.types.is_decimal(t):
        return "DECIMAL"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_norm(t.value_type)}>"
    return str(t)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
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
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in os_:
            continue
        try:
            otbl = con.execute(
                f"select * from ({os_[name]}) oracle_q limit 0"
            ).arrow()
            oschema = {f.name: f.type for f in otbl.schema}
            eschema = _engine_schema(fn(sf))
        except Exception as exc:  # noqa: BLE001 — audit must report, not die
            print(f"{name}: ERROR {exc!r}")
            bad.append(name)
            continue
        if sorted(oschema) != sorted(eschema):
            print(f"{name}: COLUMN MISMATCH {sorted(eschema)} vs "
                  f"{sorted(oschema)}")
            bad.append(name)
            continue
        diffs = {
            c: (str(eschema[c]), str(oschema[c]))
            for c in oschema
            if _norm(eschema[c]) != _norm(oschema[c])
        }
        if diffs:
            print(f"{name}: TYPE MISMATCH {diffs}")
            bad.append(name)
        else:
            print(f"{name}: ok")
    print("BAD:", bad)
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
