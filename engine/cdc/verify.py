"""Final-state verifier (SURVEY.md §2.7 C6).

Defines the canonical, order-insensitive **state hash** of a lake /
replayed table: per-row sha256 digests over all columns except the raw
``content`` (identity of content is its ``content_sha256`` —
BASELINE.json:15), combined by modular addition so the hash is
independent of row order, file layout, parallelism and epoch history.
Both the engine lake and the single-process oracle replay
(engine/cdc/oracle.py) are hashed with this same function; equality is
the correctness gate run by pytest.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray.data as rd

from engine.cdc import sink
from engine.schemas import lake_schema_for

_MOD = 1 << 256


def canonical_digest(table: pa.Table, exclude: tuple = ("content",)) -> str:
    """Order-insensitive digest of a table's logical content."""
    cols = sorted(c for c in table.column_names if c not in exclude)
    arrs = [table.column(c).to_pylist() for c in cols]
    total = 0
    for row in zip(*arrs):
        s = "\x1e".join(f"{c}\x02{v!r}" for c, v in zip(cols, row))
        total = (total + int.from_bytes(hashlib.sha256(s.encode()).digest(), "big")) % _MOD
    return f"{total:064x}"


def lake_files(lake_dir: str, epoch: int | None = None) -> tuple[dict[int, list[str]], pa.Schema]:
    """pid → active file list (lake-relative) + the lake schema, resolved
    only through the committed manifest."""
    manifest = sink.read_manifest(lake_dir, epoch)
    if manifest is None:
        raise FileNotFoundError(f"no committed manifest under {lake_dir}")
    schema = lake_schema_for(sink.schema_from_b64(manifest["schema_b64"]))
    return sink.active_files(manifest), schema


def lake_table(lake_dir: str, epoch: int | None = None) -> pa.Table:
    """Driver-side full read of the lake state (tests / small lakes):
    per-partition LSM merge-on-read (base + deltas, engine/cdc/merge.py
    ::live_view), conformed to the latest schema, sorted by key."""
    from engine.cdc.merge import live_view

    parts, schema = lake_files(lake_dir, epoch)
    if not parts:
        return schema.empty_table()
    tables = [live_view(lake_dir, rels, schema) for _, rels in sorted(parts.items())]
    return pa.concat_tables(tables).sort_by(
        [("repo", "ascending"), ("path", "ascending")]
    )


def read_lake(
    lake_dir: str, epoch: int | None = None, columns: list[str] | None = None
) -> rd.Dataset:
    """The lake as a streaming Dataset — resolved ONLY via the committed
    manifest, so uncommitted/orphan files are invisible. One task per
    partition performs the LSM merge-on-read (a partition's base+deltas
    must co-locate for the merge — same assumption the merge stage
    itself relies on).

    ``columns`` pushes column pruning into the parquet reads themselves
    (the merge-on-read still reads its key/seq inputs): an enrichment
    that needs two columns never pulls ``content`` off storage."""
    from engine.cdc.merge import live_view

    parts, schema = lake_files(lake_dir, epoch)
    read_cols = None
    if columns is not None:
        need = {"repo", "path", "seq"} | set(columns)
        schema = pa.schema([f for f in schema if f.name in need])
        read_cols = schema.names
    if not parts:
        return rd.from_arrow(schema.empty_table())
    items = [{"rels": rels} for _, rels in sorted(parts.items())]

    def _load(batch: pa.Table) -> pa.Table:
        tables = [
            live_view(lake_dir, list(rels), schema, read_columns=read_cols)
            for rels in batch.column("rels").to_pylist()
        ]
        return pa.concat_tables(tables) if tables else schema.empty_table()

    return rd.from_items(items).map_batches(
        _load, batch_format="pyarrow", batch_size=1
    )


def state_hash(lake_dir: str, epoch: int | None = None) -> str:
    return canonical_digest(lake_table(lake_dir, epoch))


def lake_history(lake_dir: str) -> pa.Table:
    """DESCRIBE-HISTORY over the committed manifests (the lakehouse
    audit log): one row per retained version — kind ('replay' or the
    maintenance label), changelog position, wall seconds, per-version
    lineage totals (events/rows/bytes), partitions touched, and the
    manifest pins (P, update_mode). Driver-side metadata only: reads the
    manifest JSONs, never a data file; versions reclaimed by vacuum
    retention are simply absent."""
    import os

    mdir = os.path.join(lake_dir, sink.MANIFEST_DIR)
    if not os.path.isdir(mdir):
        raise FileNotFoundError(f"no manifest dir under {lake_dir}")
    versions = sorted(
        int(n[len("epoch-"):-len(".json")])
        for n in os.listdir(mdir)
        if n.startswith("epoch-") and n.endswith(".json")
    )
    rows = []
    for v in versions:
        m = sink.read_manifest(lake_dir, v)
        lin = m.get("lineage") or []
        rows.append(
            {
                "version": v,
                "kind": m.get("maintenance") or "replay",
                "changelog_pos": sink.changelog_pos(m),
                "wall_s": float(m.get("wall_s") or 0.0),
                "events_in": sum(int(r.get("events_in", 0)) for r in lin),
                "rows_out": sum(int(r.get("rows_out", 0)) for r in lin),
                "bytes_written": sum(int(r.get("bytes_written", 0)) for r in lin),
                "partitions_touched": len(lin),
                "num_partitions": m.get("num_partitions"),
                "update_mode": m.get("update_mode") or "row",
                "n_expectations": len(m.get("expectations") or []),
                "n_columns": len(sink.schema_from_b64(m["schema_b64"]).names),
            }
        )
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {"version": pa.array([], pa.int64())}
    )


def lake_lookup(
    lake_dir: str, repo: str, path: str | None = None, epoch: int | None = None
) -> pa.Table:
    """O(1) key-pruned point read: a repo's rows live in exactly ONE lake
    partition (``pid = stable_hash(repo) % num_partitions``, with
    ``num_partitions`` pinned in the committed manifest), so the lookup
    opens only that partition's active files — never the lake. Epoch
    pinning composes (time-travel point reads). Falls back to the full
    merge-on-read scan for manifests that predate the pinned field."""
    import pyarrow.compute as pc

    from engine.cdc.merge import live_view
    from engine.util.hashing import stable_hash_column

    manifest = sink.read_manifest(lake_dir, epoch)
    if manifest is None:
        raise FileNotFoundError(f"no committed manifest under {lake_dir}")
    num_partitions = manifest.get("num_partitions")
    if num_partitions:
        schema = lake_schema_for(sink.schema_from_b64(manifest["schema_b64"]))
        pid = int(stable_hash_column(pa.array([repo]), int(num_partitions))[0])
        rels = sink.active_files(manifest).get(pid, [])
        t = live_view(lake_dir, rels, schema, filters=[("repo", "=", repo)])
    else:
        t = lake_table(lake_dir, epoch)
    t = t.filter(pc.equal(t.column("repo"), repo))
    if path is not None:
        t = t.filter(pc.equal(t.column("path"), path))
    return t
