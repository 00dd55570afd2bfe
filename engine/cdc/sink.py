"""Exactly-once lake sink: manifest-based two-phase commit (SURVEY.md §2.1 S7, §2.7 C4).

Design (BASELINE.json:6 "exactly-once sink using idempotent per-partition
epoch commits with a manifest-based two-phase write"):

- **Phase 1** — merge tasks write data files with task-unique names under
  ``lake/data/part=<pid>/base-<epoch>-<token>.parquet`` and *return* a
  report row naming the file. Writes are side-effect-free until commit:
  a retried task leaves an orphan file that no manifest ever references.
- **Phase 2** — the driver, after collecting every partition's report,
  writes ``lake/manifest/epoch-<k>.json`` via tmp-file + ``os.replace``
  (atomic on POSIX). The manifest IS the commit point: it lists the
  active data file per partition (touched partitions point at the new
  epoch's files, untouched ones carry forward), the negotiated event
  schema, and per-partition lineage.
- **Idempotence / resume** — replaying a committed epoch is a no-op
  (the manifest exists → skip); a crash between phase 1 and phase 2
  leaves only unreferenced orphans, and the rerun converges to the
  identical state (verified in tests/test_cdc_exactly_once.py).

Readers (next epoch's merge, the verifier, `read_lake`) resolve data
files ONLY through the latest committed manifest.
"""

from __future__ import annotations

import base64
import json
import os
import uuid

import pyarrow as pa

class CommitConflict(RuntimeError):
    """Another writer committed this lake version first. The manifest log
    is a compare-and-swap chain: exactly one writer wins each version;
    the loser must re-read the latest manifest and rebase (or, for a
    replay drain, re-check ``changelog_pos`` — the epoch it lost may
    already be folded)."""


MANIFEST_DIR = "manifest"
DATA_DIR = "data"
LINEAGE_DIR = "lineage"
DEADLETTER_DIR = "deadletter"
SUMMARY_DIR = "summary"


def lake_paths(lake_dir: str) -> dict:
    return {
        "manifest": os.path.join(lake_dir, MANIFEST_DIR),
        "data": os.path.join(lake_dir, DATA_DIR),
        "lineage": os.path.join(lake_dir, LINEAGE_DIR),
        "deadletter": os.path.join(lake_dir, DEADLETTER_DIR),
        "summary": os.path.join(lake_dir, SUMMARY_DIR),
    }


def init_lake(lake_dir: str) -> None:
    for p in lake_paths(lake_dir).values():
        os.makedirs(p, exist_ok=True)


def _manifest_path(lake_dir: str, epoch: int) -> str:
    return os.path.join(lake_dir, MANIFEST_DIR, f"epoch-{epoch:05d}.json")


def schema_to_b64(schema: pa.Schema) -> str:
    return base64.b64encode(schema.serialize().to_pybytes()).decode("ascii")


def schema_from_b64(s: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(s)))


def last_committed_epoch(lake_dir: str) -> int | None:
    """Highest epoch with a committed manifest, or None (C4 resume point)."""
    mdir = os.path.join(lake_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return None
    epochs = [
        int(n[len("epoch-") : -len(".json")])
        for n in os.listdir(mdir)
        if n.startswith("epoch-") and n.endswith(".json")
    ]
    return max(epochs) if epochs else None


def changelog_pos(manifest: dict | None) -> int | None:
    """Highest changelog epoch folded into this manifest's state. Replay
    commits record it explicitly; maintenance commits (backfill/compact,
    engine/cdc/maintain.py) carry it forward unchanged, so lake VERSIONS
    (manifest numbers) and changelog EPOCHS may diverge — resume reads
    this field, never the version number. Manifests written before the
    field existed were always 1:1 (version == epoch)."""
    if manifest is None:
        return None
    return int(manifest.get("changelog_pos", manifest["epoch"]))


def read_manifest(lake_dir: str, epoch: int | None = None) -> dict | None:
    if epoch is None:
        epoch = last_committed_epoch(lake_dir)
        if epoch is None:
            return None
    with open(_manifest_path(lake_dir, epoch)) as f:
        return json.load(f)


def is_committed(lake_dir: str, epoch: int) -> bool:
    return os.path.exists(_manifest_path(lake_dir, epoch))


def active_files(manifest: dict | None) -> dict[int, list[str]]:
    """pid → ordered data-file list relative to the lake dir: one base
    file optionally followed by per-epoch delta files (log-structured
    merge layout, C5). Manifests written before the delta format carried
    a single string per pid — normalized here to a one-element list."""
    if manifest is None:
        return {}
    return {
        int(k): ([v] if isinstance(v, str) else list(v))
        for k, v in manifest["active_files"].items()
    }


def commit_epoch(
    lake_dir: str,
    epoch: int,
    reports: list[dict],
    event_schema: pa.Schema,
    prev_manifest: dict | None,
    extra: dict | None = None,
) -> dict:
    """Phase-2 commit. ``reports`` are the merge stage's per-partition rows
    (pid, file, lineage fields). Atomic, idempotent (re-commit of the same
    epoch raises — callers must check :func:`is_committed` first)."""
    path = _manifest_path(lake_dir, epoch)
    if os.path.exists(path):
        raise CommitConflict(f"epoch {epoch} already committed: {path}")
    files = dict(active_files(prev_manifest))
    # Zone maps: carried-forward files keep their committed stats; each
    # report contributes stats for the file(s) it wrote this version.
    file_stats = dict((prev_manifest or {}).get("file_stats", {}))
    lineage = []
    for r in reports:
        pid = int(r["pid"])
        if r.get("rows_out", 1) == 0:
            # Partition emptied by deletes — drop it from the active set
            # (a tombstone-only delta written this epoch stays unreferenced
            # and is reclaimed by vacuum).
            files.pop(pid, None)
        elif r.get("files"):
            files[pid] = list(r["files"])
        if r.get("stats"):
            s = r["stats"]
            file_stats.update(json.loads(s) if isinstance(s, str) else s)
        lineage.append(
            {k: r[k] for k in r if k not in ("files", "summary_delta", "stats")}
        )
    active_rels = {rel for rels in files.values() for rel in rels}
    file_stats = {rel: s for rel, s in file_stats.items() if rel in active_rels}
    manifest = {
        "epoch": epoch,
        "schema_b64": schema_to_b64(event_schema),
        "schema_names": event_schema.names,
        "active_files": {str(k): v for k, v in sorted(files.items())},
        "file_stats": {k: file_stats[k] for k in sorted(file_stats)},
        "lineage": sorted(lineage, key=lambda r: r["pid"]),
        "totals": {
            "events_in": sum(r.get("events_in", 0) for r in reports),
            "rows_out_touched": sum(r.get("rows_out", 0) for r in reports),
            "partitions_touched": len(reports),
        },
    }
    if extra:
        manifest.update(extra)
    # Atomic CAS publish: the full manifest is staged under a
    # writer-unique name, then claimed via os.link, which fails with
    # EEXIST if the version was already committed — unlike os.replace
    # (last-writer-wins), two racing committers can never both "succeed"
    # and silently lose one writer's files. POSIX guarantees link() is
    # atomic; the winner's manifest is complete and fsynced before the
    # claim, so readers never observe a partial commit.
    tmp = f"{path}.{uuid.uuid4().hex[:12]}.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)  # atomic commit point (CAS on the version)
    except FileExistsError:
        raise CommitConflict(
            f"epoch {epoch} already committed by a concurrent writer: {path}"
        ) from None
    finally:
        os.unlink(tmp)
    return manifest
