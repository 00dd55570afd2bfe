"""Per-stage profile of a registered query: runs it and prints Ray
Data's execution stats (operator wall times, block counts, memory) so
a slow query can be attributed to read / map / shuffle stages. Usage:

    python tools/profile_query.py q_join_shuffle [sf_dir] [num_cpus]

Never run while a bench is in flight (CPU contention wrecks timings —
CLAUDE.md)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from engine.registry import QUERIES, load_catalog

    load_catalog()
    t0 = time.monotonic()
    res = QUERIES[name](sf_dir)
    if isinstance(res, rd.Dataset):
        res = res.materialize()
        print(res.stats())
        n = res.count()
    else:
        n = res.num_rows if hasattr(res, "num_rows") else len(res)
    print(f"== {name}: {n} rows in {time.monotonic() - t0:.2f}s "
          f"(sf_dir={sf_dir}, num_cpus={cpus})")
    ray.shutdown()


if __name__ == "__main__":
    main()
