"""End-to-end lakehouse lifecycle tour — executable documentation.

One command drives every operational surface of the CDC engine in
sequence, asserting the invariant each step claims:

    bootstrap → incremental replay → backfill → compact → purge →
    repartition (P change) → clone + divergence → zone-map scan →
    changefeed replica ACROSS the repartition boundary → dead-letter
    requeue → metrics consistency → vacuum

Usage::

    python tools/lifecycle_demo.py [sf_dir] [work_dir]

Prints one JSON line per step and a final OK. Owns its Ray session
(library code never calls ray.init).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def step(name, t0, **kv):
    print(json.dumps({"step": name, "wall_s": round(time.monotonic() - t0, 3), **kv}))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="cdc_tour_")

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from engine.cdc import sink
    from engine.cdc.bootstrap import bootstrap, replicate
    from engine.cdc.clone import clone_lake
    from engine.cdc.maintain import backfill, compact, purge, repartition
    from engine.cdc.metrics import consistency_check, epoch_metrics
    from engine.cdc.parse import requeue_deadletters
    from engine.cdc.replay import ReplayConfig, replay
    from engine.cdc.scan import scan_lake
    from engine.cdc.synth import SynthConfig, synth_changelog
    from engine.cdc.vacuum import vacuum
    from engine.cdc.verify import lake_table, state_hash

    cfg = ReplayConfig(num_partitions=8, num_salts=2)
    log = synth_changelog(
        sf_dir, f"{work}/log",
        SynthConfig(seed=99, n_events=4000, n_epochs=3, n_keys=800),
    )

    # 1. Bootstrap an initial snapshot (epoch 0's state), then stream the rest.
    t0 = time.monotonic()
    tmp_full = f"{work}/scratch_full"
    replay(log, tmp_full, cfg, max_epoch=0)
    lake = f"{work}/lake"
    bootstrap(lake_table(tmp_full), lake, cfg, epoch=0)
    assert state_hash(lake) == state_hash(tmp_full)
    step("bootstrap", t0, rows=lake_table(lake).num_rows)

    t0 = time.monotonic()
    out = replay(log, lake, cfg)
    assert out["epochs_run"] == [1, 2]
    h_streamed = state_hash(lake)
    step("incremental_replay", t0, events=out["events_applied"])

    # 2. Maintenance chain: backfill a derived column, compact, purge a repo.
    t0 = time.monotonic()
    backfill(lake, "n_chars",
             lambda t: pc.utf8_length(t.column("content")).cast(pa.int64()),
             dtype=pa.int64())
    compact(lake)
    victim = lake_table(lake).column("repo")[0].as_py()
    purge(lake, lambda t: pc.equal(t.column("repo"), victim))
    assert victim not in set(lake_table(lake).column("repo").to_pylist())
    step("maintenance", t0, purged_repo=victim)

    # 3. Scale out: P 8 → 32; stale-config resume safety is automatic.
    t0 = time.monotonic()
    h_before = state_hash(lake)
    m = repartition(lake, 32)
    assert m["num_partitions"] == 32 and state_hash(lake) == h_before
    step("repartition", t0, new_p=32)

    # 4. Branch: clone, diverge the branch, source untouched.
    t0 = time.monotonic()
    branch = f"{work}/branch"
    clone_lake(lake, branch)
    purge(branch, lambda t: pc.is_valid(t.column("repo")))  # empty the branch
    assert state_hash(lake) == h_before
    assert lake_table(branch).num_rows == 0
    step("clone_diverge", t0)

    # 5. Zone-map scan: recent rows only, partitions pruned.
    t0 = time.monotonic()
    full = lake_table(lake)
    cut = int(pc.max(full.column("seq")).as_py()) - 100
    got = scan_lake(lake, [("seq", ">=", cut)]).materialize()
    want = full.filter(pc.fill_null(pc.greater_equal(full.column("seq"), cut), False))
    assert got.count() == want.num_rows
    step("zonemap_scan", t0, rows=got.count(),
         pruned=f"{scan_lake.last_pruned}/{scan_lake.last_total}")

    # 6. Replica follows via changefeed — across the repartition boundary.
    t0 = time.monotonic()
    rep = f"{work}/replica"
    replicate(lake, rep, cfg, to_epoch=1)   # bootstrapped at the P=8 era
    replicate(lake, rep, cfg)               # catch-up crosses the P change
    assert state_hash(rep) == state_hash(lake)
    step("replicate_across_repartition", t0)

    # 7. Dead-letter requeue: inject malformed events, repair, converge.
    t0 = time.monotonic()
    f = os.path.join(log, "epoch=00002",
                     sorted(os.listdir(f"{log}/epoch=00002"))[0])
    t = pq.read_table(f)
    hiseq = int(pc.max(full.column("seq")).as_py())
    bad = pa.table({
        "seq": pa.array([hiseq + 10, hiseq + 11], pa.int64()),
        "op": pa.array(["i", "u"], pa.string()),
        "repo": pa.array(["tour-repo", "tour-repo"], pa.string()),
        "path": pa.array(["a.py", "b.py"], pa.string()),
        "commit": pa.array(["c1", "c2"], pa.string()),
        "lang": pa.array(["py", "py"], pa.string()),
        "content": pa.array(["print(1)", "print(2)"], pa.string()),
    })
    d = f"{log}/epoch=00003"
    os.makedirs(f"{log}/.stage3", exist_ok=True)
    pq.write_table(bad, f"{log}/.stage3/events.parquet")
    os.rename(f"{log}/.stage3", d)
    replay(log, lake, cfg)  # both events quarantined (invalid ops)
    assert lake_table(lake).num_rows == full.num_rows

    def fix(tbl):
        i = tbl.schema.get_field_index("op")
        return tbl.set_column(
            i, "op", pc.ascii_upper(tbl.column("op")).combine_chunks()
        )

    n = requeue_deadletters(lake, log, epoch=4, fix_fn=fix, clear=True)
    assert n == 2
    replay(log, lake, cfg)
    assert "tour-repo" in set(lake_table(lake).column("repo").to_pylist())
    step("deadletter_requeue", t0, requeued=n)

    # 8. Metrics consistency + vacuum.
    t0 = time.monotonic()
    chk = consistency_check(lake)
    assert not chk["mismatches"], chk
    rep_v = vacuum(lake, retain_last=1)
    assert state_hash(lake) is not None  # still readable post-GC
    step("metrics_vacuum", t0, versions=chk["versions_checked"],
         reclaimed_files=rep_v["removed_files"])

    versions = epoch_metrics(lake)
    print(json.dumps({
        "ok": True,
        "final_rows": lake_table(lake).num_rows,
        "lake_versions": versions.num_rows,
        "state_hash": state_hash(lake)[:16],
        "work_dir": work,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
