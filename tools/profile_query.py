"""Per-stage profiling for a registered query: run it once and print
Ray Data's execution stats (operator wall times, block counts, memory),
the 'measure, don't guess' loop for tuning a single pipeline.

Usage:
    python tools/profile_query.py q_tpch_q5 [sf_dir]

Owns its Ray session (library code never calls ray.init).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from engine.registry import QUERIES, load_catalog

    load_catalog()
    if name not in QUERIES:
        raise SystemExit(f"unknown query {name!r}; known: {sorted(QUERIES)}")

    t0 = time.monotonic()
    res = QUERIES[name](sf_dir)
    if isinstance(res, rd.Dataset):
        res = res.materialize()
        n = res.count()
        stats = res.stats()
    else:  # driver-side Arrow table / DataFrame result
        n = len(res)
        stats = "(driver-side result — no Dataset stats)"
    wall = time.monotonic() - t0
    print(stats)
    print(f"\n== {name}: {n} rows in {wall:.2f}s at {sf_dir} ==")
    ray.shutdown()


if __name__ == "__main__":
    main()
