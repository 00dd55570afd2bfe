"""Maintenance commits: backfill (ALTER-style column rewrite) and compact
(OPTIMIZE) as first-class lake versions.

A maintenance commit rewrites partition data WITHOUT consuming changelog
events: it allocates the next manifest version but carries the previous
``changelog_pos`` forward, so a following ``replay()`` still applies
exactly the changelog epochs the lake hasn't folded yet (the version
chain interleaves data and maintenance commits, like any real lakehouse
log). Both ops are per-partition rewrites with ZERO shuffle — one task
per pid merge-on-reads its active file list and writes one new base —
and go through the same two-phase manifest protocol as the merge
(orphans on crash, atomic commit, time travel to every prior version).

- :func:`backfill` — populate (or recompute) one column across the whole
  lake from each row's existing columns: the "backfill the nulls after
  additive schema evolution" maintenance job the north star's evolution
  rule implies. A NEW column extends the event schema additively, so
  later change events simply carry (or null-backfill) it.
- :func:`compact` — force every partition's LSM file list (base + delta
  files) back to a single sorted base; read-amplification reset for
  delta-mode lakes, byte-identical live state.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from engine.cdc import sink
from engine.cdc.merge import _summary_delta, file_stats, live_view
from engine.schemas import lake_schema_for
from engine.util.collect import pull_arrow


def _maintenance_commit(
    lake_dir: str,
    transform,
    new_event_schema: pa.Schema | None = None,
    only_pids: list[int] | None = None,
    label: str = "maintenance",
    track_summary: bool = False,
    extra_pins: dict | None = None,
    split_fn=None,
) -> dict:
    """Shared core: rewrite selected partitions through ``transform``
    (pa.Table → pa.Table, already in the NEW lake schema) and commit the
    next version. Untouched partitions carry forward by manifest
    reference — their files are not rewritten or re-listed.

    ``track_summary=True`` is for transforms that DROP rows (purge):
    ``transform`` then returns ``(kept, removed)`` and the per-repo
    incremental summary is folded forward exactly like a merge epoch
    (so summary == full recompute stays true at every version); the
    default carries the previous summary file (rows untouched).

    ``split_fn`` (pa.Table → list[pa.Table]) optionally splits each
    rewritten partition into SEVERAL base files with KEY-DISJOINT row
    subsets (cluster_by's sorted size-targeted slices) — sound for
    live_view because an op-less base row never contends with another
    base row of the same key, and each file gets its own zone-map entry
    (that per-file granularity is the whole point: scan_lake skips
    excluded base files individually)."""
    prev = sink.read_manifest(lake_dir)
    if prev is None:
        raise FileNotFoundError(f"no committed manifest under {lake_dir}")
    t0 = time.monotonic()
    version = int(prev["epoch"]) + 1
    old_event_schema = sink.schema_from_b64(prev["schema_b64"])
    old_lake_schema = lake_schema_for(old_event_schema)
    event_schema = new_event_schema or old_event_schema
    lake_schema = lake_schema_for(event_schema)
    parts = sink.active_files(prev)
    pids = sorted(parts) if only_pids is None else sorted(only_pids)
    if pids:
        items = [{"pid": p, "rels": list(parts[p])} for p in pids]

        def _rewrite(batch: pa.Table) -> pa.Table:
            rows = []
            for pid, rels in zip(
                batch.column("pid").to_pylist(), batch.column("rels").to_pylist()
            ):
                tp = time.monotonic()
                t = transform(live_view(lake_dir, list(rels), old_lake_schema))
                removed = None
                if track_summary:
                    t, removed = t
                if t.schema != lake_schema:
                    t = t.select(lake_schema.names).cast(lake_schema)
                pieces = split_fn(t) if split_fn is not None else [t]
                rels, stats, nbytes = [], {}, 0
                for piece in pieces:
                    rel = os.path.join(
                        "data", f"part={pid}",
                        f"base-{version:05d}-{uuid.uuid4().hex[:12]}.parquet",
                    )
                    abs_path = os.path.join(lake_dir, rel)
                    os.makedirs(os.path.dirname(abs_path), exist_ok=True)
                    pq.write_table(piece, abs_path)
                    rels.append(rel)
                    stats[rel] = file_stats(piece)
                    nbytes += os.path.getsize(abs_path)
                seqs = t.column("seq")
                rows.append(
                    {
                        "pid": pid,
                        "epoch": version,
                        "files": rels,
                        "seq_lo": int(pc.min(seqs).as_py()) if t.num_rows else -1,
                        "seq_hi": int(pc.max(seqs).as_py()) if t.num_rows else -1,
                        "events_in": 0,
                        "upserts": 0,
                        "rows_out": t.num_rows,
                        "bytes_written": nbytes,
                        "duration_s": time.monotonic() - tp,
                        "deletes": int(removed.num_rows) if removed is not None else 0,
                        "summary_delta": _summary_delta(
                            removed, removed.slice(0, 0),
                            prev.get("summary_spec"),
                        )
                        if removed is not None
                        else "{}",
                        "stats": json.dumps(stats),
                    }
                )
            return pa.Table.from_pylist(rows)

        got = pull_arrow(
            rd.from_items(items).map_batches(
                _rewrite, batch_format="pyarrow", batch_size=1
            )
        )
        reports = got.to_pylist() if got is not None else []
    else:
        reports = []
    if track_summary:
        from engine.cdc.summary import fold_summary

        summary_rel = fold_summary(lake_dir, prev, reports, version)
    else:
        summary_rel = prev.get("summary_file")  # content untouched
    manifest = sink.commit_epoch(
        lake_dir,
        version,
        reports,
        event_schema,
        prev,
        extra={
            "wall_s": time.monotonic() - t0,
            "summary_file": summary_rel,
            "num_partitions": prev.get("num_partitions"),
            "changelog_pos": sink.changelog_pos(prev),
            "maintenance": label,
            # Maintenance versions carry the lake's pinned metric spec
            # forward (a dropped pin would make later folds use the
            # default spec over a custom-schema summary).
            **(
                {"summary_spec": prev["summary_spec"]}
                if prev.get("summary_spec")
                else {}
            ),
            # ... and the pinned event-fold semantics: dropping it would
            # make a resume after compact/backfill/purge re-pin the
            # caller's default update_mode='row', silently changing what
            # a NULL payload column MEANS on a patch-mode lake.
            **(
                {"update_mode": prev["update_mode"]}
                if prev.get("update_mode")
                else {}
            ),
            # ... and the cumulative column-rename map (rename_column).
            **(
                {"column_renames": prev["column_renames"]}
                if prev.get("column_renames")
                else {}
            ),
            # ... and the column-drop tombstones (drop_column).
            **(
                {"column_drops": prev["column_drops"]}
                if prev.get("column_drops")
                else {}
            ),
            # ... and the ingestion expectations (data-quality pin).
            **(
                {"expectations": prev["expectations"]}
                if prev.get("expectations")
                else {}
            ),
            **(extra_pins or {}),
        },
    )
    from engine.cdc.replay import _write_lineage

    _write_lineage(lake_dir, version, reports)
    return manifest


def backfill(lake_dir: str, column: str, fn, dtype: pa.DataType | None = None) -> dict:
    """Rewrite ``column`` for every live row as ``fn(partition_table)``
    (a vectorized pa.Table → pa.Array over the row's OTHER columns). A
    column the lake doesn't have yet requires ``dtype`` and extends the
    event schema additively (later events may carry it; events that
    don't null it for the rows they touch — the documented
    backfill-as-null evolution rule). Commits one maintenance version;
    changelog resume is unaffected."""
    prev = sink.read_manifest(lake_dir)
    if prev is None:
        raise FileNotFoundError(f"no committed manifest under {lake_dir}")
    if column in ("content_sha256", "seq", "op", "repo", "path"):
        raise ValueError(f"column {column!r} is engine-managed (or the key)")
    event_schema = sink.schema_from_b64(prev["schema_b64"])
    new_event_schema = None
    if column not in event_schema.names:
        if dtype is None:
            raise ValueError(f"new column {column!r} requires dtype=")
        new_event_schema = event_schema.append(pa.field(column, dtype))
    target_lake = lake_schema_for(new_event_schema or event_schema)

    def _transform(t: pa.Table) -> pa.Table:
        arr = fn(t)
        if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
            arr = pa.array(arr)
        idx = target_lake.get_field_index(column)
        if column in t.column_names:
            t = t.set_column(idx, target_lake.field(column), arr)
        else:
            t = t.add_column(idx, target_lake.field(column), arr)
        return t

    # Backfill of a drop-tombstoned name is the explicit re-add path:
    # clear the tombstone so later change events carrying the column
    # apply again (a producer that never stopped emitting the OLD
    # column will now write into the re-added one — inherent to name
    # reuse; pick a fresh name to avoid it).
    extra_pins = None
    drops = prev.get("column_drops") or []
    if column in drops:
        extra_pins = {"column_drops": [d for d in drops if d != column]}
    return _maintenance_commit(
        lake_dir, _transform, new_event_schema, label=f"backfill:{column}",
        extra_pins=extra_pins,
    )


def rename_column(lake_dir: str, old: str, new: str) -> dict:
    """ALTER-style column rename as one maintenance version (VERDICT r4
    #8): every partition is rewritten with the column renamed (same
    type, same values — the state is identical up to the name), the
    event schema pin is updated, and the CUMULATIVE rename map is pinned
    in the manifest as ``column_renames`` ({historical name → current
    name}, chains composed). The pin makes the rename visible to:

    - **ingestion** — later changelog epochs may still carry the OLD
      name; prepare renames event batches to the current name before
      conforming (engine/cdc/parse.py), so resume stays exact;
    - **changefeed** — a feed spanning the rename aligns the old
      version's state to the new names before diffing
      (engine/cdc/bootstrap.py), and ``replicate`` replays the rename
      on the replica as DDL before applying the feed;
    - **summary** — a pinned ``summary_spec`` metric referencing the
      old name is rewritten to the new one (same values, fold exact).

    Key/meta/engine-managed columns (repo, path, seq, op, content,
    content_sha256) cannot be renamed."""
    prev = sink.read_manifest(lake_dir)
    if prev is None:
        raise FileNotFoundError(f"no committed manifest under {lake_dir}")
    protected = ("repo", "path", "seq", "op", "content", "content_sha256")
    if old in protected or new in protected:
        raise ValueError(f"cannot rename {old!r} -> {new!r}: engine-managed/key column")
    event_schema = sink.schema_from_b64(prev["schema_b64"])
    if old not in event_schema.names:
        raise ValueError(f"no column {old!r} in the lake schema")
    if new in event_schema.names:
        raise ValueError(f"column {new!r} already exists")
    if new in (prev.get("column_drops") or []):
        # Renaming ONTO a tombstoned name is ambiguous: producers still
        # emitting the dropped column would have those stale values read
        # as the renamed column's. Re-adding a dropped name is backfill's
        # explicit job.
        raise ValueError(
            f"column {new!r} is drop-tombstoned; backfill(dtype=) re-adds it explicitly"
        )
    new_event_schema = pa.schema(
        [pa.field(new, f.type) if f.name == old else f for f in event_schema]
    )

    def _transform(t: pa.Table) -> pa.Table:
        return t.rename_columns([new if n == old else n for n in t.column_names])

    # Compose the cumulative map: x→old becomes x→new; then old→new.
    renames = dict(prev.get("column_renames") or {})
    for k, v in list(renames.items()):
        if v == old:
            renames[k] = new
    renames[old] = new
    spec = prev.get("summary_spec")
    if spec:
        spec = [
            {**m, "col": new} if m.get("col") == old else dict(m) for m in spec
        ]
    return _maintenance_commit(
        lake_dir, _transform, new_event_schema, label=f"rename:{old}>{new}",
        extra_pins={
            "column_renames": renames,
            **({"summary_spec": spec} if spec else {}),
        },
    )


def drop_column(lake_dir: str, column: str) -> dict:
    """ALTER-style column drop as one maintenance version (the
    non-additive-evolution counterpart of :func:`rename_column`): every
    partition is rewritten without the column, the event schema pin
    shrinks, and the name joins the CUMULATIVE ``column_drops`` tombstone
    list pinned in the manifest. The pin makes the drop visible to:

    - **ingestion** — later changelog epochs may still carry the dropped
      column; prepare discards it AFTER applying the rename map
      (tombstones store current names), so negotiate never re-adds it
      additively and resume stays exact (engine/cdc/parse.py);
    - **changefeed** — a feed spanning the drop aligns the old version's
      state by dropping the column before conforming
      (engine/cdc/bootstrap.py), and ``replicate`` replays the drop on
      the replica as DDL before applying the feed;
    - **re-add** — ``backfill(column, dtype=)`` clears the tombstone
      explicitly; ``rename_column`` ONTO a tombstoned name is rejected.

    Key/meta/engine-managed columns (repo, path, seq, op, content,
    content_sha256) cannot be dropped, and a column referenced by the
    pinned ``summary_spec`` must have its metric retired first (the
    incremental summary fold could no longer be maintained)."""
    prev = sink.read_manifest(lake_dir)
    if prev is None:
        raise FileNotFoundError(f"no committed manifest under {lake_dir}")
    protected = ("repo", "path", "seq", "op", "content", "content_sha256")
    if column in protected:
        raise ValueError(f"cannot drop {column!r}: engine-managed/key column")
    event_schema = sink.schema_from_b64(prev["schema_b64"])
    if column not in event_schema.names:
        raise ValueError(f"no column {column!r} in the lake schema")
    for m in prev.get("summary_spec") or []:
        if m.get("col") == column:
            raise ValueError(
                f"column {column!r} is referenced by pinned summary metric "
                f"{m.get('name')!r}; cannot drop"
            )
    new_event_schema = pa.schema([f for f in event_schema if f.name != column])

    def _transform(t: pa.Table) -> pa.Table:
        return t.drop_columns([column]) if column in t.column_names else t

    # The tombstone stores the CURRENT name; existing rename entries
    # pointing at it stay — an old-name event renames onto the dropped
    # name first, then the drop discards it (same logical column).
    drops = list(prev.get("column_drops") or [])
    if column not in drops:
        drops.append(column)
    return _maintenance_commit(
        lake_dir, _transform, new_event_schema, label=f"drop:{column}",
        extra_pins={"column_drops": drops},
    )


def purge(lake_dir: str, predicate) -> dict:
    """Retention / right-to-be-forgotten delete: drop every live row for
    which ``predicate(partition_table) -> bool mask`` is true, as one
    maintenance version. Point-in-time by design — a later change event
    can lawfully re-insert the key (that's new data, not a resurrection).
    The per-repo incremental summary is folded with the removed rows'
    negative deltas, so summary == full recompute still holds at every
    version; partitions emptied by the purge drop out of the active set.
    Note vacuum retention governs when the PRE-purge versions' files
    (which still contain the purged rows) are physically reclaimed —
    a compliance purge is complete once retention has lapsed."""

    def _transform(t: pa.Table):
        mask = predicate(t)
        if not isinstance(mask, (pa.Array, pa.ChunkedArray)):
            mask = pa.array(mask, type=pa.bool_())
        mask = pc.fill_null(mask, False)
        return t.filter(pc.invert(mask)), t.filter(mask)

    return _maintenance_commit(
        lake_dir, _transform, label="purge", track_summary=True
    )


def repartition(lake_dir: str, num_partitions: int) -> dict:
    """Change the lake's partition count P as one maintenance version —
    the scale-out/scale-in operation (P is otherwise pinned at lake
    creation; a cluster 4x the size wants 4x the partitions for 4x the
    merge writers). Rows move ACROSS partitions, so unlike backfill/
    compact this is one explicit exchange, the same shape as an epoch
    merge: one task per OLD partition merge-on-reads its live rows and
    stamps ``pid = stable_hash(repo) % newP``; one groupby(pid) shuffle;
    one task per NEW partition writes a single sorted base file. The
    live state is byte-identical (state-hash invariant — the canonical
    digest is layout-independent), the per-repo summary is untouched
    (it never depended on P), ``changelog_pos`` carries forward, and a
    following ``replay()`` adopts the new pinned P from the manifest
    (engine/cdc/replay.py::_replay_available), so resume stays exact
    with ANY caller config. Old partitions' files become unreferenced
    history reclaimed by vacuum retention."""
    prev = sink.read_manifest(lake_dir)
    if prev is None:
        raise FileNotFoundError(f"no committed manifest under {lake_dir}")
    num_partitions = int(num_partitions)
    if num_partitions < 1:
        raise ValueError(f"num_partitions must be >= 1, got {num_partitions}")
    t0 = time.monotonic()
    version = int(prev["epoch"]) + 1
    event_schema = sink.schema_from_b64(prev["schema_b64"])
    lake_schema = lake_schema_for(event_schema)
    old_parts = sink.active_files(prev)
    reports: list[dict] = []
    if old_parts:
        from engine.util.hashing import stable_hash_column

        items = [{"rels": list(rels)} for _, rels in sorted(old_parts.items())]

        def _load(batch: pa.Table) -> pa.Table:
            out = []
            for rels in batch.column("rels").to_pylist():
                t = live_view(lake_dir, list(rels), lake_schema)
                pid = stable_hash_column(t.column("repo"), num_partitions)
                out.append(t.append_column("pid", pa.array(pid, type=pa.int64())))
            if not out:
                out = [
                    lake_schema.empty_table().append_column(
                        "pid", pa.array([], type=pa.int64())
                    )
                ]
            return pa.concat_tables(out)

        loaded = rd.from_items(items).map_batches(
            _load, batch_format="pyarrow", batch_size=1
        )

        def _write(group: pa.Table) -> pa.Table:
            tp = time.monotonic()
            pid = int(group.column("pid")[0].as_py())
            t = group.drop_columns(["pid"]).sort_by(
                [("repo", "ascending"), ("path", "ascending")]
            )
            rel = os.path.join(
                "data", f"part={pid}",
                f"base-{version:05d}-{uuid.uuid4().hex[:12]}.parquet",
            )
            abs_path = os.path.join(lake_dir, rel)
            os.makedirs(os.path.dirname(abs_path), exist_ok=True)
            pq.write_table(t, abs_path)
            seqs = t.column("seq")
            return pa.Table.from_pylist(
                [
                    {
                        "pid": pid,
                        "epoch": version,
                        "files": [rel],
                        "seq_lo": int(pc.min(seqs).as_py()) if t.num_rows else -1,
                        "seq_hi": int(pc.max(seqs).as_py()) if t.num_rows else -1,
                        "events_in": 0,
                        "upserts": 0,
                        "rows_out": t.num_rows,
                        "bytes_written": os.path.getsize(abs_path),
                        "duration_s": time.monotonic() - tp,
                        "deletes": 0,
                        "stats": json.dumps({rel: file_stats(t)}),
                    }
                ]
            )

        got = pull_arrow(
            loaded.groupby("pid").map_groups(_write, batch_format="pyarrow")
        )
        reports = got.to_pylist() if got is not None else []
    # Every OLD partition's files are superseded by the rewrite; an old
    # pid that received no rows at the new layout must be dropped from
    # the active set explicitly (commit_epoch carries untouched pids
    # forward by reference).
    new_pids = {int(r["pid"]) for r in reports}
    for p in sorted(old_parts):
        if p not in new_pids:
            reports.append(
                {
                    "pid": p, "epoch": version, "files": None,
                    "seq_lo": -1, "seq_hi": -1, "events_in": 0, "upserts": 0,
                    "rows_out": 0, "bytes_written": 0, "duration_s": 0.0,
                    "deletes": 0,
                }
            )
    manifest = sink.commit_epoch(
        lake_dir,
        version,
        reports,
        event_schema,
        prev,
        extra={
            "wall_s": time.monotonic() - t0,
            "summary_file": prev.get("summary_file"),  # P-independent
            "num_partitions": num_partitions,
            "changelog_pos": sink.changelog_pos(prev),
            "maintenance": f"repartition:{num_partitions}",
            **(
                {"summary_spec": prev["summary_spec"]}
                if prev.get("summary_spec")
                else {}
            ),
            **(
                {"update_mode": prev["update_mode"]}
                if prev.get("update_mode")
                else {}
            ),
            **(
                {"column_renames": prev["column_renames"]}
                if prev.get("column_renames")
                else {}
            ),
            **(
                {"column_drops": prev["column_drops"]}
                if prev.get("column_drops")
                else {}
            ),
            **(
                {"expectations": prev["expectations"]}
                if prev.get("expectations")
                else {}
            ),
        },
    )
    from engine.cdc.replay import _write_lineage

    _write_lineage(lake_dir, version, reports)
    return manifest


def compact(lake_dir: str) -> dict:
    """Force-compact every multi-file partition (base + LSM deltas) to a
    single sorted base file; the live state is byte-identical (live_view
    is the same merge the readers apply). Single-file partitions carry
    forward untouched. One maintenance version; no-op manifest (version
    bump only) when nothing needs compacting."""
    prev = sink.read_manifest(lake_dir)
    if prev is None:
        raise FileNotFoundError(f"no committed manifest under {lake_dir}")
    multi = [p for p, rels in sink.active_files(prev).items() if len(rels) > 1]
    return _maintenance_commit(
        lake_dir, lambda t: t, only_pids=multi, label="compact"
    )


def _zorder_indices(t: pa.Table, columns: list[str]):
    """Morton/Z-order sort permutation over rank-normalized columns:
    each column's values are dense-ranked and scaled to 16 bits (nulls
    rank last), then the per-column bits are interleaved into one
    uint64 key — locality in EVERY clustered dimension, so zone maps
    prune on ANY of them, not just the leading lexicographic one.
    Rank normalization makes the interleave distribution-free (raw
    values of mixed types/scales would starve the narrow column of
    bits). Vectorized numpy; ties broken by (repo, path) for a
    deterministic rewrite."""
    import numpy as np

    n = t.num_rows
    z = np.zeros(n, dtype=np.uint64)
    ncols = len(columns)
    for ci, c in enumerate(columns):
        order = np.asarray(pc.sort_indices(t.column(c)))  # nulls last
        ranks = np.empty(n, dtype=np.int64)
        ranks[order] = np.arange(n)
        q = (ranks.astype(np.uint64) * 65535) // max(1, n - 1)
        for b in range(16):
            z |= ((q >> np.uint64(b)) & np.uint64(1)) << np.uint64(b * ncols + ci)
    key = t.select([c for c in ("repo", "path") if c in t.column_names])
    tie = np.asarray(pc.sort_indices(
        key, sort_keys=[(c, "ascending") for c in key.column_names]
    ))
    rank_tie = np.empty(n, dtype=np.int64)
    rank_tie[tie] = np.arange(n)
    return np.lexsort((rank_tie, z))


def cluster_by(
    lake_dir: str,
    columns: list[str],
    target_rows: int = 1 << 20,
    num_files: int | None = None,
    zorder: bool = False,
) -> dict:
    """OPTIMIZE-style sort-clustering as one maintenance version: rewrite
    every partition's live view SORTED by ``columns`` and SPLIT into
    size-targeted base files, so each file's manifest zone map
    (``file_stats``) covers a narrow value range of the clustered
    columns and ``scan_lake`` predicates on them skip most base files
    without touching storage. Partition assignment (pid = hash(repo) % P)
    is untouched — clustering reorders rows WITHIN partitions, zero
    shuffle, one task per partition (the same scale shape as compact;
    at any lake size the unit of work is one partition's live view).

    - ``target_rows`` bounds rows per output file (``num_files``
      overrides with an exact per-partition file count — tests/toy
      lakes); the last slice absorbs the remainder.
    - Ties sort by (repo, path) after ``columns``, so the rewrite is
      deterministic and the state hash is invariant (live state is a
      set; the canonical digest is layout-independent).
    - Deltas are folded in by the rewrite (it reads the live view), so
      the partition comes out delta-free; later epochs stack new deltas
      on the FIRST base file's list as usual and the clustering decays
      until the next run — run it after compaction windows, like any
      OPTIMIZE job. ``compact`` merges the split files back to one.
    - Clustering on ``content``/``content_sha256`` is rejected: zone
      maps exclude oversized/opaque strings (merge.file_stats), so no
      scan could ever prune on them.
    - Trade-off: the split loosens the KEY columns' per-file zone maps
      (each slice now spans the partition's whole repo range), so
      key-predicate scans read every file of the partition again —
      point reads stay O(one partition) regardless (``lake_lookup``
      prunes by pid hash + pushes the repo filter into the reads, not
      by zone maps). Cluster on the columns your reports filter by.
    - ``zorder=True`` (≥2 columns): Morton-interleaved rank order
      instead of lexicographic — every clustered column's zone maps
      tighten (lexicographic only really tightens the leading one), so
      scans filtering on ANY single clustered column prune. Classic
      OPTIMIZE ZORDER semantics; see :func:`_zorder_indices`.
    - All lake-semantics pins (P, summary_spec, update_mode, renames,
      drops) carry forward via the shared maintenance core; resume
      after a cluster_by stays exact.
    """
    prev = sink.read_manifest(lake_dir)
    if prev is None:
        raise FileNotFoundError(f"no committed manifest under {lake_dir}")
    if not columns:
        raise ValueError("cluster_by needs at least one column")
    event_schema = sink.schema_from_b64(prev["schema_b64"])
    lake_schema = lake_schema_for(event_schema)
    for c in columns:
        if c in ("content", "content_sha256"):
            raise ValueError(
                f"cannot cluster on {c!r}: zone maps never index it, no scan could prune"
            )
        if c not in lake_schema.names:
            raise ValueError(f"no column {c!r} in the lake schema")
    if num_files is not None and num_files < 1:
        raise ValueError(f"num_files must be >= 1, got {num_files}")
    if target_rows < 1:
        raise ValueError(f"target_rows must be >= 1, got {target_rows}")
    if zorder and len(columns) < 2:
        raise ValueError("zorder needs at least two cluster columns")
    keys = [(c, "ascending") for c in columns] + [
        (k, "ascending") for k in ("repo", "path") if k not in columns
    ]

    def _transform(t: pa.Table) -> pa.Table:
        if zorder and t.num_rows > 1:
            return t.take(_zorder_indices(t, columns))
        return t.sort_by(keys)

    def _split(t: pa.Table) -> list[pa.Table]:
        n = t.num_rows
        k = num_files if num_files is not None else max(1, -(-n // target_rows))
        if n == 0 or k == 1:
            return [t]
        step = -(-n // k)
        return [t.slice(off, step) for off in range(0, n, step)]

    kind = "zorder" if zorder else "cluster"
    return _maintenance_commit(
        lake_dir,
        _transform,
        label=f"{kind}:{','.join(columns)}",
        split_fn=_split,
    )


def set_expectations(lake_dir: str, rules: list | None) -> dict:
    """ALTER-style change of the lake's pinned ingestion expectations
    (data-quality contract) as one metadata-only maintenance version —
    no partition is rewritten; the pin just changes, auditable in
    ``lake_history`` like any DDL. ``rules=None`` clears enforcement.
    On an EXISTING lake this is the only way to change expectations:
    resume adopts the manifest pin over the caller's ReplayConfig in
    both directions (a stale caller config can neither relax nor
    invent rules). Rules apply to epochs folded AFTER this version —
    already-committed state is never retro-quarantined (use
    maintain.purge for that)."""
    if rules is not None:
        from engine.cdc.parse import validate_expectations

        validate_expectations(rules)
        rules = rules or None  # [] means cleared, same as None (no flapping pin)
    label = f"expectations:{len(rules)}" if rules is not None else "expectations:clear"
    return _maintenance_commit(
        lake_dir,
        lambda t: t,
        only_pids=[],
        label=label,
        extra_pins={"expectations": rules},
    )


def retry_on_conflict(fn, attempts: int = 3):
    """Run a maintenance operation, rebasing on :class:`sink.CommitConflict`.

    Maintenance commits read the latest manifest at entry, so losing the
    version race to a concurrent replay/committer is safely retryable:
    the rerun re-reads the NEW manifest and rewrites from the winner's
    state (its phase-1 files from the lost attempt are unreferenced
    orphans for vacuum). Use as
    ``retry_on_conflict(lambda: compact(lake))``. The LAST conflict is
    re-raised when attempts run out."""
    last = None
    for _ in range(attempts):
        try:
            return fn()
        except sink.CommitConflict as e:
            last = e
    raise last


def main(argv: list[str] | None = None) -> None:
    """Operational CLI for maintenance commits (the jobs an operator
    would ``ray job submit`` between replay runs)::

        python -m engine.cdc.maintain --lake-dir L compact
        python -m engine.cdc.maintain --lake-dir L repartition --partitions 128
        python -m engine.cdc.maintain --lake-dir L clone --dst /lakes/branch
    """
    import argparse

    import ray

    ap = argparse.ArgumentParser(description="CDC lake maintenance commits")
    ap.add_argument("--lake-dir", required=True)
    sub = ap.add_subparsers(dest="op", required=True)
    sub.add_parser("compact", help="force-compact every multi-file partition")
    rp = sub.add_parser("repartition", help="change the lake's partition count")
    rp.add_argument("--partitions", type=int, required=True)
    cl = sub.add_parser("clone", help="zero-copy branch at the latest version")
    cl.add_argument("--dst", required=True)
    cl.add_argument("--epoch", type=int, default=None)
    rn = sub.add_parser("rename", help="ALTER-style column rename")
    rn.add_argument("--column", required=True, help="old name")
    rn.add_argument("--to", required=True, help="new name")
    dp = sub.add_parser("drop", help="ALTER-style column drop")
    dp.add_argument("--column", required=True)
    cb = sub.add_parser("cluster", help="OPTIMIZE: sort-cluster + split for zone-map pruning")
    cb.add_argument("--by", required=True, help="comma-separated cluster columns")
    cb.add_argument("--target-rows", type=int, default=1 << 20)
    cb.add_argument("--zorder", action="store_true",
                    help="Morton-interleave the columns (OPTIMIZE ZORDER)")
    sub.add_parser("history", help="DESCRIBE HISTORY: one line per retained version")
    fs = sub.add_parser("fsck", help="integrity check: manifests, files, footers, zone maps")
    fs.add_argument("--deep", action="store_true",
                    help="re-read stated columns and verify zone maps exactly")
    args = ap.parse_args(argv)
    if args.op == "history":  # metadata-only, no Ray
        from engine.cdc.verify import lake_history

        for row in lake_history(args.lake_dir).to_pylist():
            print(json.dumps(row))
        return
    if args.op == "fsck":  # metadata + footers, no Ray
        from engine.cdc.verify import fsck

        report = fsck(args.lake_dir, deep=args.deep)
        print(json.dumps(report))
        raise SystemExit(0 if report["ok"] else 1)
    if args.op != "clone" and not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    if args.op == "compact":
        m = compact(args.lake_dir)
    elif args.op == "repartition":
        m = repartition(args.lake_dir, args.partitions)
    elif args.op == "rename":
        m = rename_column(args.lake_dir, args.column, args.to)
    elif args.op == "drop":
        m = drop_column(args.lake_dir, args.column)
    elif args.op == "cluster":
        m = cluster_by(
            args.lake_dir, args.by.split(","), target_rows=args.target_rows,
            zorder=args.zorder,
        )
    else:
        from engine.cdc.clone import clone_lake

        m = clone_lake(args.lake_dir, args.dst, args.epoch)
    print(
        {
            "version": m["epoch"],
            "num_partitions": m.get("num_partitions"),
            "changelog_pos": sink.changelog_pos(m),
            "maintenance": m.get("maintenance"),
            "wall_s": m.get("wall_s"),
        }
    )


if __name__ == "__main__":
    main()
