"""Zone-map pruned lake scans (data skipping).

Every committed manifest carries ``file_stats`` — a per-data-file
``{col: [min, max]}`` zone map recorded at write time by the merge /
maintenance stages (engine/cdc/merge.py::file_stats). :func:`scan_lake`
uses it to skip whole partitions on NON-KEY predicates (key predicates
already have O(1) pruning via ``verify.lake_lookup``) without touching
storage: the driver reads one manifest, not N parquet footers.

Soundness under the LSM layout: a live row a reader can observe is a
verbatim row of some active file (merge-on-read selects rows by max-seq
and drops tombstones — it never synthesizes values), so if EVERY active
file of a partition provably excludes the predicate, the partition's
live view contains no matching row and the partition is skipped. A file
with no stats for a referenced column (all-null column, oversized string
bounds, or a manifest that predates zone maps) is never prunable.
Partitions that survive pruning are merged-on-read in full (the merge
needs every file of the partition) and filtered exactly post-merge.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from engine.cdc import sink
from engine.schemas import lake_schema_for

_OPS = ("=", "!=", "<", "<=", ">", ">=")


def _to_dnf(filters: list) -> list[list[tuple]]:
    """Normalize a predicate to OR-of-ANDs (parquet DNF): a flat list of
    ``(col, op, value)`` is one conjunction; a list of such lists is a
    disjunction of conjunctions. Validates every term."""
    if not filters:
        return []
    dnf = (
        [list(map(tuple, conj)) for conj in filters]
        if isinstance(filters[0], (list, tuple))
        and filters[0]
        and isinstance(filters[0][0], (list, tuple))
        else [list(map(tuple, filters))]
    )
    for conj in dnf:
        for f in conj:
            if len(f) != 3 or f[1] not in _OPS:
                raise ValueError(
                    f"bad filter {f!r}: want (col, op, value), op in {_OPS}"
                )
    return dnf


def _file_excludes(stats: dict, col: str, op: str, val) -> bool:
    """True only if NO value in [lo, hi] can satisfy ``col op val``.
    Null values never satisfy any comparison, so bounds over non-null
    values are sufficient."""
    bounds = stats.get(col)
    if bounds is None:
        return False
    lo, hi = bounds
    if op == "=":
        return val < lo or val > hi
    if op == "!=":
        return False  # a range only excludes != when lo == hi == val; rare, skip
    if op == "<":
        return lo >= val
    if op == "<=":
        return lo > val
    if op == ">":
        return hi <= val
    if op == ">=":
        return hi < val
    raise ValueError(f"unsupported op {op!r} (supported: {_OPS})")


def prune_partitions(
    manifest: dict, filters: list[tuple]
) -> tuple[dict[int, list[str]], list[int]]:
    """Split the active partitions into (kept, pruned) under a
    conjunction of ``(col, op, value)`` filters. A partition is pruned
    only when EVERY active file excludes at least one conjunct; a kept
    partition's file list is additionally narrowed to drop excluded
    BASE files (deltas always stay — see the inline soundness note)."""
    stats = manifest.get("file_stats", {})
    dnf = _to_dnf(filters)
    kept: dict[int, list[str]] = {}
    pruned: list[int] = []

    def excluded(rel: str) -> bool:
        # The file excludes an OR-of-ANDs iff it excludes EVERY disjunct;
        # a conjunction is excluded when ANY of its terms is.
        if not dnf:
            return False
        fs = stats.get(rel, {})
        return all(
            any(_file_excludes(fs, c, op, v) for c, op, v in conj)
            for conj in dnf
        )

    for pid, rels in sink.active_files(manifest).items():
        if rels and all(excluded(rel) for rel in rels):
            pruned.append(pid)
        else:
            # File-level skipping inside a kept partition: a BASE file
            # whose zone map excludes the predicate is dropped from the
            # merge-on-read list entirely (sound: an op-less base row
            # either loses to a strictly-newer delta regardless of its
            # presence, or wins and would be dropped by the post-merge
            # filter anyway). Delta files are NEVER skipped — an
            # excluded tombstone must still kill its base row. Base vs
            # delta is the engine's own naming convention: every write
            # site emits base-*/delta-* (merge, maintenance,
            # repartition, bootstrap-via-merge).
            keep_rels = [
                rel
                for rel in rels
                if os.path.basename(rel).startswith("delta-") or not excluded(rel)
            ]
            kept[pid] = keep_rels
    return kept, pruned


def scan_lake(
    lake_dir: str,
    filters: list[tuple],
    epoch: int | None = None,
    columns: list[str] | None = None,
) -> rd.Dataset:
    """Filtered lake scan with zone-map partition skipping. ``filters``
    is a conjunction of ``(col, op, value)`` terms, or a LIST of such
    conjunctions (OR-of-ANDs — parquet's DNF form); the exact predicate
    is re-applied post-merge, so pruning is purely an I/O optimization.
    The pruning decision of the last call is exposed on
    ``scan_lake.last_pruned`` / ``scan_lake.last_total`` (tests,
    diagnostics — the auto_join.last_strategy pattern)."""
    from engine.cdc.merge import live_view

    manifest = sink.read_manifest(lake_dir, epoch)
    if manifest is None:
        raise FileNotFoundError(f"no committed manifest under {lake_dir}")
    dnf = _to_dnf(filters)
    schema = lake_schema_for(sink.schema_from_b64(manifest["schema_b64"]))
    kept, pruned = prune_partitions(manifest, filters)
    scan_lake.last_pruned = len(pruned)
    scan_lake.last_total = len(pruned) + len(kept)
    # File-granularity skipping diagnostics (cluster_by's win shows up
    # here even when every partition survives partition-level pruning).
    all_files = sink.active_files(manifest)
    scan_lake.last_files_total = sum(len(r) for r in all_files.values())
    scan_lake.last_files_read = sum(len(r) for r in kept.values())
    out_schema = (
        schema
        if columns is None
        else pa.schema([schema.field(c) for c in columns])
    )
    if not kept:
        return rd.from_arrow(out_schema.empty_table())
    items = [{"rels": rels} for _, rels in sorted(kept.items())]
    # Column pruning: the merge needs the key + seq; everything else is
    # read only if the caller or a filter references it (content — the
    # heavy column — is skipped entirely for metadata scans). Predicate
    # pushdown into BASE files only (see live_view.base_filters for the
    # soundness argument); the exact filter is re-applied below.
    need = (
        {"repo", "path", "seq"}
        | {c for conj in dnf for c, _, _ in conj}
        | (set(schema.names) if columns is None else set(columns))
    )
    pruned_schema = pa.schema([f for f in schema if f.name in need])

    def _load(batch: pa.Table) -> pa.Table:
        tables = []
        for rels in batch.column("rels").to_pylist():
            t = live_view(
                lake_dir, list(rels), pruned_schema,
                base_filters=dnf or None, read_columns=pruned_schema.names,
            )
            mask = None
            for conj in dnf:
                cmask = None
                for col, op, val in conj:
                    m = {
                        "=": pc.equal, "!=": pc.not_equal, "<": pc.less,
                        "<=": pc.less_equal, ">": pc.greater,
                        ">=": pc.greater_equal,
                    }[op](t.column(col), val)
                    cmask = m if cmask is None else pc.and_kleene(cmask, m)
                mask = cmask if mask is None else pc.or_kleene(mask, cmask)
            if mask is not None:
                t = t.filter(pc.fill_null(mask, False))
            if columns is not None:
                t = t.select(columns)
            tables.append(t)
        return pa.concat_tables(tables) if tables else out_schema.empty_table()

    return rd.from_items(items).map_batches(
        _load, batch_format="pyarrow", batch_size=1
    )


def lake_stats(
    lake_dir: str,
    columns: list[str] | None = None,
    epoch: int | None = None,
    exact_fallback: bool = True,
) -> dict:
    """Metadata-only lake aggregates: COUNT(*) and per-column MIN/MAX of
    the LIVE state answered from the committed manifest's zone maps plus
    parquet FOOTERS — zero data pages read — whenever that is provably
    exact, with a distributed scan fallback otherwise.

    Soundness of the metadata path (per value):

    - **rows**: a delta-free partition's base files hold EXACTLY its
      live rows (the merge writes live state; tombstones only exist in
      delta files), so COUNT(*) = Σ footer ``num_rows``. Any delta file
      anywhere → the count needs a merge-on-read → fallback.
    - **min/max of column c**: additionally requires EVERY active base
      file to carry a ``file_stats`` entry for c. Entries bound the
      file's non-null values exactly, and absence is ambiguous (all-null
      file OR oversized-string/unmapped-type skip — merge.file_stats),
      so presence-everywhere is the only case where the fold over
      ``[lo, hi]`` pairs equals MIN/MAX over all non-null live values
      (which is SQL MIN/MAX null semantics).

    Returns ``{"rows", "delta_free", "files", "columns": {c: {"min",
    "max", "source": "metadata"|"scan"}}, "rows_source"}``. With
    ``exact_fallback=False`` non-metadata answers come back as None
    (a pure metadata probe). ``content``/``content_sha256`` are never
    zone-mapped and always fall back."""
    import pyarrow.parquet as pq

    from engine.cdc.verify import lake_files

    parts, lake_schema = lake_files(lake_dir, epoch)
    manifest = sink.read_manifest(lake_dir, epoch)
    stats = manifest.get("file_stats", {})
    rels = [r for rr in parts.values() for r in rr]
    delta_free = all(
        os.path.basename(r).startswith("base-") for r in rels
    )
    cols = columns or [f.name for f in lake_schema]
    for c in cols:
        if c not in lake_schema.names:
            raise ValueError(f"no column {c!r} in the lake schema")
    out: dict = {
        "delta_free": delta_free,
        "files": len(rels),
        "columns": {},
    }
    if delta_free:
        out["rows"] = sum(
            pq.ParquetFile(os.path.join(lake_dir, r)).metadata.num_rows
            for r in rels
        )
        out["rows_source"] = "metadata"
    else:
        out["rows"] = None
        out["rows_source"] = "scan"
    need_scan = []
    for c in cols:
        ent = [stats.get(r, {}).get(c) for r in rels]
        if delta_free and rels and all(e is not None for e in ent):
            out["columns"][c] = {
                "min": min(e[0] for e in ent),
                "max": max(e[1] for e in ent),
                "source": "metadata",
            }
        else:
            out["columns"][c] = {"min": None, "max": None, "source": "scan"}
            need_scan.append(c)
    if exact_fallback and (need_scan or out["rows"] is None):
        from ray.data.aggregate import Count, Max, Min

        scan_cols = need_scan or [cols[0]]
        ds = scan_lake(lake_dir, [], epoch=epoch, columns=scan_cols)
        aggs = [Count()]
        for c in need_scan:
            aggs += [Min(c, ignore_nulls=True), Max(c, ignore_nulls=True)]
        got = ds.aggregate(*aggs) or {}
        if out["rows"] is None:
            out["rows"] = int(got.get("count()", 0))
        for c in need_scan:
            out["columns"][c]["min"] = got.get(f"min({c})")
            out["columns"][c]["max"] = got.get(f"max({c})")
    return out
