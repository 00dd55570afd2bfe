"""CDC replay orchestrator — the flagship entry point (SURVEY.md §3.2).

Epoch-at-a-time replay of the changelog into the lake:

    tail epoch k → map_batches(prepare: validate/conform/partition/combine)
                 → groupby(pid, salt).map_groups(sub-LWW)          # shuffle 1 (events)
                 → groupby(pid).map_groups(MergeApply actor pool)  # shuffle 2 (winners only)
                 → driver: collect per-partition reports → two-phase manifest commit

The epoch loop and the manifest commit run in the driver; everything
else is Ray Data tasks/actors with streaming execution. Resume (C4):
committed epochs are skipped via the manifest. The module never calls
``ray.init()`` (driver contract, __ray_entry__.py:11-13).

CLI: ``python -m engine.cdc.replay --log-dir L --lake-dir K [--verify]``
(this is the job a cluster user would ``ray job submit``).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from engine.cdc import sink, tailer
from engine.cdc.merge import MergeApply, lww_collapse, merge_apply_group
from engine.cdc.parse import prepare_batch
from engine.cdc.schema import negotiate
from engine.schemas import LINEAGE_SCHEMA


@dataclass
class ReplayConfig:
    num_partitions: int = 32  # P — fixed per lake, independent of parallelism
    num_salts: int = 4        # S — sub-partition fan-out for skew (C2)
    batch_size: int = 16384
    # "tasks" (default): one elastic task per partition group with per-worker
    # stage caching; "actors": a fixed map_groups actor pool (pays actor
    # startup per epoch and must be sized below the CPU count to leave room
    # for upstream shuffle tasks).
    merge_compute: str = "tasks"
    merge_concurrency: int | None = None  # actors mode: default min(P, cpus-2)


def _cpus() -> int:
    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", 4))
    return 4


def run_epoch(
    log_dir: str,
    lake_dir: str,
    epoch: int,
    cfg: ReplayConfig,
    prev_manifest: dict | None,
) -> dict:
    """Run + commit one epoch; returns the committed manifest."""
    t0 = time.monotonic()
    eschema = tailer.epoch_schema(log_dir, epoch)
    prev_schema = (
        sink.schema_from_b64(prev_manifest["schema_b64"]) if prev_manifest else None
    )
    target = negotiate(prev_schema, eschema)  # M11 additive evolution
    target_b64 = sink.schema_to_b64(target)
    active = sink.active_files(prev_manifest)

    ds = tailer.read_epoch(log_dir, epoch, parallelism_hint=2 * _cpus())
    ds = ds.map_batches(
        prepare_batch,
        fn_kwargs=dict(
            target_schema_b64=target_b64,
            num_partitions=cfg.num_partitions,
            num_salts=cfg.num_salts,
            deadletter_dir=sink.lake_paths(lake_dir)["deadletter"],
            epoch=epoch,
        ),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )
    winners = ds.groupby(["pid", "salt"]).map_groups(
        lww_collapse, batch_format="pyarrow"
    )
    if cfg.merge_compute == "actors":
        merge_conc = cfg.merge_concurrency or max(2, min(cfg.num_partitions, _cpus() - 2))
        reports_ds = winners.groupby("pid").map_groups(
            MergeApply,
            fn_constructor_args=(lake_dir, epoch, active, target_b64),
            batch_format="pyarrow",
            concurrency=merge_conc,
        )
    else:
        reports_ds = winners.groupby("pid").map_groups(
            merge_apply_group,
            fn_kwargs=dict(
                lake_dir=lake_dir,
                epoch=epoch,
                active_files=active,
                event_schema_b64=target_b64,
            ),
            batch_format="pyarrow",
        )
    reports = reports_ds.take_all()  # ≤ P tiny rows — the commit barrier

    manifest = sink.commit_epoch(
        lake_dir,
        epoch,
        reports,
        target,
        prev_manifest,
        extra={"wall_s": time.monotonic() - t0},
    )
    _write_lineage(lake_dir, epoch, reports)
    return manifest


def _write_lineage(lake_dir: str, epoch: int, reports: list[dict]) -> None:
    rows = {
        f.name: [int(r[f.name]) if f.type != pa.float64() else float(r[f.name]) for r in reports]
        for f in LINEAGE_SCHEMA
    }
    table = pa.table(rows, schema=LINEAGE_SCHEMA)
    path = os.path.join(sink.lake_paths(lake_dir)["lineage"], f"epoch-{epoch:05d}.parquet")
    pq.write_table(table, path)


def replay(
    log_dir: str,
    lake_dir: str,
    cfg: ReplayConfig | None = None,
    max_epoch: int | None = None,
) -> dict:
    """Replay all (or up to ``max_epoch``) epochs, resuming after the last
    committed one. Returns a summary dict."""
    cfg = cfg or ReplayConfig()
    sink.init_lake(lake_dir)
    epochs = tailer.available_epochs(log_dir)
    if max_epoch is not None:
        epochs = [e for e in epochs if e <= max_epoch]
    manifest = sink.read_manifest(lake_dir)
    ran, skipped = [], []
    t0 = time.monotonic()
    for k in epochs:
        if sink.is_committed(lake_dir, k):  # C4: idempotent replay / resume
            skipped.append(k)
            manifest = sink.read_manifest(lake_dir, k)
            continue
        manifest = run_epoch(log_dir, lake_dir, k, cfg, manifest)
        ran.append(k)
    events = sum(
        r["events_in"] for k in ran for r in sink.read_manifest(lake_dir, k)["lineage"]
    )
    return {
        "epochs_run": ran,
        "epochs_skipped": skipped,
        "events_applied": events,
        "wall_s": time.monotonic() - t0,
        "last_manifest": manifest,
    }


def main(argv: list[str] | None = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description="CDC changelog replay into a lake")
    ap.add_argument("--log-dir", required=True)
    ap.add_argument("--lake-dir", required=True)
    ap.add_argument("--max-epoch", type=int, default=None)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--salts", type=int, default=4)
    ap.add_argument("--verify", action="store_true")
    args = ap.parse_args(argv)
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    cfg = ReplayConfig(num_partitions=args.partitions, num_salts=args.salts)
    summary = replay(args.log_dir, args.lake_dir, cfg, args.max_epoch)
    print(
        {
            k: summary[k]
            for k in ("epochs_run", "epochs_skipped", "events_applied", "wall_s")
        }
    )
    if args.verify:
        from engine.cdc.oracle import oracle_state_hash
        from engine.cdc.verify import state_hash

        eh, oh = state_hash(args.lake_dir), oracle_state_hash(args.log_dir)
        print({"engine_hash": eh, "oracle_hash": oh, "match": eh == oh})
        if eh != oh:
            raise SystemExit(1)
    ray.shutdown()


if __name__ == "__main__":
    main()
