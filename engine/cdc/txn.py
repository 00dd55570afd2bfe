"""Multi-table transactional CDC: one changelog per table, atomic
cross-table visibility.

A transactional source (a database emitting a binlog per table) needs its
consumers to see table states from the SAME transaction boundary — table
A at epoch k with table B at epoch k-1 is a phantom state no upstream
transaction ever produced. This module coordinates N independent lakes
(one per table, each with its own manifest chain, exactly-once semantics
untouched) under a database-level transaction log:

    db_dir/
      tables/<name>/        — an ordinary lake (engine/cdc/sink.py)
      txn/txn-<k>.json      — atomic commit point for changelog epoch k:
                              {epoch, tables: {name: lake version}}

``replay_database`` drains each epoch into every table's lake first
(per-table idempotent epoch commits — a crash between table commits
reruns as no-ops), then writes the txn manifest via tmp + ``os.replace``.
The txn file IS the cross-table commit point: ``read_database`` resolves
every table AT the version pinned by the newest (or requested) txn, so a
reader never observes a half-committed epoch even while the writer is
mid-flight — and time travel composes across tables (pin an old txn).
"""

from __future__ import annotations

import json
import os
import time

import ray.data as rd

from engine.cdc import sink, tailer
from engine.cdc.replay import ReplayConfig, run_epoch

TXN_DIR = "txn"
TABLES_DIR = "tables"


def table_dir(db_dir: str, name: str) -> str:
    return os.path.join(db_dir, TABLES_DIR, name)


def _txn_path(db_dir: str, epoch: int) -> str:
    return os.path.join(db_dir, TXN_DIR, f"txn-{epoch:05d}.json")


def committed_txns(db_dir: str) -> list[int]:
    tdir = os.path.join(db_dir, TXN_DIR)
    if not os.path.isdir(tdir):
        return []
    return sorted(
        int(n[len("txn-") : -len(".json")])
        for n in os.listdir(tdir)
        if n.startswith("txn-") and n.endswith(".json")
    )


def read_txn(db_dir: str, epoch: int | None = None) -> dict | None:
    if epoch is None:
        txns = committed_txns(db_dir)
        if not txns:
            return None
        epoch = txns[-1]
    with open(_txn_path(db_dir, epoch)) as f:
        return json.load(f)


def replay_database(
    logs: dict,
    db_dir: str,
    cfg: "ReplayConfig | dict[str, ReplayConfig] | None" = None,
    max_epoch: int | None = None,
) -> dict:
    """Replay every table's changelog with transactional epoch alignment.

    ``logs`` maps table name → changelog (path or source). Epochs are the
    upstream transaction boundaries: epoch k commits to the database only
    after EVERY table carrying events for k has committed it to its lake.
    Resume is two-level: per-table lake commits are idempotent (rerunning
    a committed epoch is a no-op), and the txn log records the last
    database-consistent epoch — a crash anywhere reruns to the identical
    state. Tables silent in an epoch carry their current version forward
    in that epoch's txn manifest."""
    os.makedirs(os.path.join(db_dir, TXN_DIR), exist_ok=True)
    srcs = {name: tailer.as_source(log) for name, log in logs.items()}
    cfgs = {
        name: (cfg.get(name) if isinstance(cfg, dict) else cfg) or ReplayConfig()
        for name in srcs
    }
    avail: dict[str, list[int]] = {n: s.available_epochs() for n, s in srcs.items()}
    epochs = sorted(set().union(*avail.values())) if avail else []
    if max_epoch is not None:
        epochs = [k for k in epochs if k <= max_epoch]
    done = set(committed_txns(db_dir))
    t0 = time.monotonic()
    ran = []
    for k in epochs:
        if k in done:
            continue
        for name, src in srcs.items():
            if k not in avail[name]:
                continue
            lake = table_dir(db_dir, name)
            sink.init_lake(lake)
            prev = sink.read_manifest(lake)
            if sink.changelog_pos(prev) is not None and sink.changelog_pos(prev) >= k:
                continue  # lake committed this epoch before a crash
            last_v = sink.last_committed_epoch(lake)
            version = k if last_v is None else last_v + 1
            run_epoch(src, lake, k, cfgs[name], prev, version=version)
        txn = {
            "epoch": k,
            "tables": {
                name: sink.last_committed_epoch(table_dir(db_dir, name))
                for name in srcs
            },
        }
        path = _txn_path(db_dir, k)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(txn, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)  # the cross-table atomic commit point
        ran.append(k)
    return {
        "txns_committed": ran,
        "wall_s": time.monotonic() - t0,
        "last_txn": read_txn(db_dir),
    }


def read_database(db_dir: str, epoch: int | None = None) -> dict[str, rd.Dataset]:
    """Every table AT the version pinned by the newest (or given) txn —
    a cross-table-consistent snapshot regardless of in-flight commits."""
    from engine.cdc.verify import read_lake

    txn = read_txn(db_dir, epoch)
    if txn is None:
        raise FileNotFoundError(f"no committed transaction under {db_dir}")
    return {
        name: read_lake(table_dir(db_dir, name), epoch=version)
        for name, version in txn["tables"].items()
        if version is not None
    }


def database_state_hash(db_dir: str, epoch: int | None = None) -> str:
    """Deterministic digest of the whole database snapshot (per-table
    state hashes combined in name order)."""
    import hashlib

    from engine.cdc.verify import state_hash

    txn = read_txn(db_dir, epoch)
    if txn is None:
        raise FileNotFoundError(f"no committed transaction under {db_dir}")
    h = hashlib.sha256()
    for name in sorted(txn["tables"]):
        v = txn["tables"][name]
        h.update(name.encode())
        h.update(
            state_hash(table_dir(db_dir, name), epoch=v).encode()
            if v is not None
            else b"-"
        )
    return h.hexdigest()
