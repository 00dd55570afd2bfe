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


def fsck(lake_dir: str, deep: bool = False) -> dict:
    """Lakehouse integrity check (fsck). Metadata-first: manifests and
    parquet FOOTERS only; no data page is read unless ``deep=True``.

    Checks:

    - **manifest chain** — every retained manifest parses; versions
      strictly increase; ``changelog_pos`` never decreases.
    - **active files** (head manifest) — every referenced data file
      exists and is non-empty; every pid slot is < the pinned
      ``num_partitions``; every ``file_stats`` entry references an
      active file.
    - **LSM seq layering** — within each partition, every delta file's
      footer ``min(seq)`` should exceed the maximum ``seq`` of the files
      before it (base files first, then epoch-ordered deltas; bases are
      recognized by their footer lacking the ``op`` column). Overlap is
      reported as a WARNING, not an error: replica lakes that followed a
      changefeed backfill legitimately carry equal-seq delta rows
      (bootstrap._diff_tables), but on a primary an overlap usually
      means a producer wrote below the watermark.
    - **zone maps** — each recorded ``[lo, hi]`` must CONTAIN the file's
      actual values: footer min/max for numeric columns (string footer
      stats may be truncated upward by parquet, so strings are verified
      only in ``deep`` mode by exact column reads).
    - **schema** — the manifest schema decodes; every active file's
      footer column names are a subset of the lake schema's.

    Returns ``{"ok": bool, "errors": [...], "checked": {...counts}}``;
    ``errors`` names every violating file/partition. Driver-side and
    cheap: O(#manifests + #active files) footer reads."""
    import os

    import pyarrow.parquet as pq_

    errors: list[str] = []
    warnings: list[str] = []
    mdir = os.path.join(lake_dir, sink.MANIFEST_DIR)
    if not os.path.isdir(mdir):
        raise FileNotFoundError(f"no manifest dir under {lake_dir}")
    versions = sorted(
        int(n[len("epoch-"):-len(".json")])
        for n in os.listdir(mdir)
        if n.startswith("epoch-") and n.endswith(".json")
    )
    last_pos = None
    head = None
    for v in versions:
        try:
            head = sink.read_manifest(lake_dir, v)
        except Exception as exc:  # corrupt JSON
            errors.append(f"manifest v{v}: unreadable ({exc})")
            continue
        pos = sink.changelog_pos(head)
        if last_pos is not None and pos < last_pos:
            errors.append(f"manifest v{v}: changelog_pos regressed {last_pos}->{pos}")
        last_pos = pos
    n_files = n_stats = n_seq_pairs = 0
    if head is not None:
        try:
            schema = lake_schema_for(sink.schema_from_b64(head["schema_b64"]))
        except Exception as exc:
            errors.append(f"head manifest: schema_b64 undecodable ({exc})")
            schema = None
        files = sink.active_files(head)
        stats = head.get("file_stats", {})
        P = int(head.get("num_partitions") or 0)
        active_rels = {rel for rels in files.values() for rel in rels}
        for rel in stats:
            if rel not in active_rels:
                errors.append(f"file_stats references inactive file {rel}")
        for pid, rels in files.items():
            if P and pid >= P:
                errors.append(f"pid {pid} >= pinned num_partitions {P}")
            prev_max_seq = None
            for ordinal, rel in enumerate(rels):
                n_files += 1
                path = os.path.join(lake_dir, rel)
                if not os.path.isfile(path) or os.path.getsize(path) == 0:
                    errors.append(f"pid {pid}: missing/empty data file {rel}")
                    continue
                md = pq_.ParquetFile(path)
                fmeta = md.metadata
                fnames = set(md.schema_arrow.names)
                # delta files carry the op column on top of the lake schema
                if schema is not None and not fnames - {"op"} <= set(schema.names):
                    errors.append(
                        f"{rel}: footer columns "
                        f"{sorted(fnames - {'op'} - set(schema.names))} "
                        "not in lake schema"
                    )
                # footer min/max per column (numeric only unless deep)
                foot: dict[str, list] = {}
                for rg in range(fmeta.num_row_groups):
                    for ci in range(fmeta.num_columns):
                        cc = fmeta.row_group(rg).column(ci)
                        st = cc.statistics
                        if st is None or not st.has_min_max:
                            continue
                        name = cc.path_in_schema
                        lo, hi = st.min, st.max
                        if name in foot:
                            foot[name] = [min(foot[name][0], lo), max(foot[name][1], hi)]
                        else:
                            foot[name] = [lo, hi]
                sq = foot.get("seq")
                if sq is not None:
                    is_delta = "op" in fnames
                    if is_delta and prev_max_seq is not None:
                        n_seq_pairs += 1
                        if sq[0] <= prev_max_seq:
                            warnings.append(
                                f"pid {pid}: delta {rel} min(seq)={sq[0]} overlaps the "
                                f"preceding files' max(seq)={prev_max_seq} (legitimate "
                                "on a replica after backfill propagation; on a primary "
                                "this means a write landed below the watermark)"
                            )
                    prev_max_seq = sq[1] if prev_max_seq is None else max(prev_max_seq, sq[1])
                for col, bounds in (stats.get(rel) or {}).items():
                    n_stats += 1
                    lo, hi = bounds
                    if deep:
                        import pyarrow.compute as pc_

                        colv = pq_.read_table(path, columns=[col]).column(col)
                        if colv.null_count == len(colv):
                            continue
                        mm = pc_.min_max(colv)
                        alo, ahi = mm["min"].as_py(), mm["max"].as_py()
                    elif isinstance(lo, str):
                        continue  # parquet truncates string footer stats
                    elif col in foot:
                        alo, ahi = foot[col]
                    else:
                        continue
                    if alo < lo or ahi > hi:
                        errors.append(
                            f"{rel}: zone map {col}=[{lo}, {hi}] does not contain "
                            f"actual [{alo}, {ahi}]"
                        )
    return {
        "ok": not errors,
        "errors": errors,
        "warnings": warnings,
        "checked": {
            "manifests": len(versions),
            "files": n_files,
            "zone_map_entries": n_stats,
            "lsm_seq_pairs": n_seq_pairs,
        },
    }


def export_snapshot(lake_dir: str, dst: str, epoch: int | None = None) -> dict:
    """CDC-out: export the live state as PLAIN partitioned parquet
    (``part=<pid>/data.parquet``) for consumers that don't speak the
    manifest format (warehouse loads, downstream training jobs).

    - Resolved only through the committed manifest (pinnable ``epoch``
      = time-travel export).
    - One distributed task per partition performs the LSM merge-on-read
      and writes its own file — the dataset never funnels through the
      driver.
    - RESUMABLE: a partition whose output file already exists is
      skipped (re-run after a crash finishes only the missing ones);
      each write is tmp + ``os.rename`` so readers never see partials.
    - Deterministic: file contents are the key-sorted live view, so a
      re-export of the same epoch is byte-identical.

    Returns {"partitions": P_active, "written": n, "skipped": n}.
    """
    import os
    import uuid

    import ray

    from engine.cdc.merge import live_view

    parts, schema = lake_files(lake_dir, epoch)
    os.makedirs(dst, exist_ok=True)

    @ray.remote
    def _one(pid: int, rels: list[str]) -> str:
        import pyarrow.parquet as pq_

        out_dir = os.path.join(dst, f"part={pid}")
        out = os.path.join(out_dir, "data.parquet")
        if os.path.exists(out):
            return "skipped"
        os.makedirs(out_dir, exist_ok=True)
        t = live_view(lake_dir, rels, schema)
        tmp = os.path.join(out_dir, f".tmp-{uuid.uuid4().hex[:12]}")
        pq_.write_table(t, tmp)
        os.rename(tmp, out)
        return "written"

    results = ray.get([_one.remote(pid, rels) for pid, rels in sorted(parts.items())])
    return {
        "partitions": len(parts),
        "written": sum(r == "written" for r in results),
        "skipped": sum(r == "skipped" for r in results),
    }
