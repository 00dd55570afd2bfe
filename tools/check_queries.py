"""Local replica of the driver's correctness harness: run every
queries() entry at a given sf and compare against oracle_sql() via
DuckDB (row-count + schema-width + order-insensitive value hash with
columns sorted by name). Usage:

    python tools/check_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(repr(tuple(r)) for r in df.itertuples(index=False, name=None))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(mine)} rows, {dt:.1f}s)")
            n_pass += 1
            continue
        try:
            ref = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {ex}")
            n_fail += 1
            continue
        problems = []
        if len(mine) != len(ref):
            problems.append(f"rows {len(mine)} != {len(ref)}")
        if sorted(mine.columns) != sorted(ref.columns):
            problems.append(f"cols {sorted(mine.columns)} != {sorted(ref.columns)}")
        elif value_hash(mine) != value_hash(ref):
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({dt:.1f}s)")
            if "value-hash mismatch" in problems and not mine.empty:
                m = mine[sorted(mine.columns)].sort_values(sorted(mine.columns)).head(3)
                r = ref[sorted(ref.columns)].sort_values(sorted(ref.columns)).head(3)
                print("  mine:", m.to_dict("records"))
                print("  ref :", r.to_dict("records"))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(mine)} rows ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
