"""Volume soak: replay a large synthetic changelog end-to-end and report
throughput + state hash + peak RSS in one JSON line (BASELINE.md's
64M-event protocol, VERDICT r4 #4).

    python tools/soak.py --events 64000000 --epochs 8 --keys 500000 \
        --write-mode rewrite [--cpus 32] [--work-dir /tmp/graft_soak]

The changelog is generated once per (param-set, work-dir) and reused
(synth marker file), so rewrite/delta A/B runs replay the SAME log. The
state hash is parallelism- and write-mode-invariant by contract: two
soak runs over one log must print the same hash or the engine is wrong.
Each run replays into a fresh lake directory.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="CDC volume soak")
    ap.add_argument("--events", type=int, required=True)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--keys", type=int, default=500_000)
    ap.add_argument("--repos", type=int, default=256)
    ap.add_argument("--hot", type=float, default=0.4)
    ap.add_argument("--write-mode", choices=["rewrite", "delta"], default="rewrite")
    ap.add_argument("--compact-files", type=int, default=4)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--work-dir", default="/tmp/graft_soak")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--keep-lake", action="store_true")
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from engine.cdc.replay import ReplayConfig, replay
    from engine.cdc.synth import SynthConfig, synth_changelog
    from engine.cdc.verify import state_hash

    tag = f"e{args.events}_k{args.keys}_p{args.epochs}"
    log_dir = os.path.join(args.work_dir, f"log_{tag}")
    t0 = time.monotonic()
    synth_changelog(
        args.sf_dir, log_dir,
        SynthConfig(seed=42, n_events=args.events, n_epochs=args.epochs,
                    n_keys=args.keys, n_repos=args.repos,
                    hot_event_frac=args.hot, files_per_epoch=64,
                    evolve_at_epoch=max(1, args.epochs - 1)),
    )
    synth_s = time.monotonic() - t0
    log_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(log_dir) for f in fs
    )

    lake = os.path.join(args.work_dir, f"lake_{tag}_{args.write_mode}")
    if os.path.exists(lake):
        shutil.rmtree(lake)
    t1 = time.monotonic()
    out = replay(
        log_dir, lake,
        ReplayConfig(num_partitions=args.partitions, num_salts=4,
                     write_mode=args.write_mode,
                     compact_files=args.compact_files),
    )
    wall = time.monotonic() - t1
    lake_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(lake) for f in fs
    )
    h = state_hash(lake)
    report = {
        "metric": "cdc_soak",
        "events": out["events_applied"],
        "epochs": args.epochs,
        "keys": args.keys,
        "write_mode": args.write_mode,
        "num_cpus": args.cpus,
        "synth_s": round(synth_s, 1),
        "log_gb": round(log_bytes / 1e9, 2),
        "replay_wall_s": round(wall, 1),
        "events_per_sec": round(out["events_applied"] / wall, 1),
        "lake_gb": round(lake_bytes / 1e9, 2),
        "driver_peak_rss_gb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2
        ),
        "state_hash": h,
    }
    if not args.keep_lake:
        shutil.rmtree(lake, ignore_errors=True)
    ray.shutdown()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
