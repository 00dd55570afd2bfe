"""Operational metrics derived from the commit chain (north rule:
"resumable from checkpoint with per-partition lineage + metrics").

Everything here is read-only over artifacts the commit protocol already
writes — manifests (per-version totals, wall time, changelog position)
and lineage parquet files (per-partition event ranges and row counts) —
so metrics are exactly as trustworthy as the commits themselves and
available for any version retention hasn't reclaimed.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from engine.cdc import sink

EPOCH_METRICS_SCHEMA = pa.schema(
    [
        pa.field("version", pa.int64()),
        pa.field("changelog_pos", pa.int64()),
        pa.field("maintenance", pa.string()),  # null for replay commits
        pa.field("events_in", pa.int64()),
        pa.field("rows_out_touched", pa.int64()),
        pa.field("partitions_touched", pa.int64()),
        pa.field("wall_s", pa.float64()),
        pa.field("events_per_sec", pa.float64()),
    ]
)


def _versions(lake_dir: str) -> list[int]:
    mdir = os.path.join(lake_dir, sink.MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    return sorted(
        int(n[len("epoch-") : -len(".json")])
        for n in os.listdir(mdir)
        if n.startswith("epoch-") and n.endswith(".json")
    )


def epoch_metrics(lake_dir: str) -> pa.Table:
    """One row per committed version still under retention: throughput,
    rows touched, wall time, changelog position, maintenance label."""
    rows = []
    for v in _versions(lake_dir):
        m = sink.read_manifest(lake_dir, v)
        t = m.get("totals", {})
        wall = float(m.get("wall_s") or 0.0)
        ev = int(t.get("events_in", 0))
        rows.append(
            {
                "version": v,
                "changelog_pos": sink.changelog_pos(m),
                "maintenance": m.get("maintenance"),
                "events_in": ev,
                "rows_out_touched": int(t.get("rows_out_touched", 0)),
                "partitions_touched": int(t.get("partitions_touched", 0)),
                "wall_s": wall,
                "events_per_sec": (ev / wall) if wall > 0 else 0.0,
            }
        )
    if not rows:
        return EPOCH_METRICS_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=EPOCH_METRICS_SCHEMA)


def partition_metrics(lake_dir: str, version: int | None = None) -> pa.Table:
    """Per-(version, pid) lineage rows — event seq ranges, upsert/delete
    counts, rows and bytes written, merge duration — concatenated across
    the retained versions (or one pinned version)."""
    ldir = sink.lake_paths(lake_dir)["lineage"]
    names = sorted(os.listdir(ldir)) if os.path.isdir(ldir) else []
    if version is not None:
        names = [n for n in names if n == f"epoch-{version:05d}.parquet"]
    tables = [pq.read_table(os.path.join(ldir, n)) for n in names]
    if not tables:
        from engine.schemas import LINEAGE_SCHEMA

        return LINEAGE_SCHEMA.empty_table()
    return pa.concat_tables(tables)


def consistency_check(lake_dir: str) -> dict:
    """Cross-check the two metric sources: every version's manifest
    totals must equal the sum of its per-partition lineage rows. Returns
    {versions_checked, mismatches}; mismatches list (version, field,
    manifest_value, lineage_sum)."""
    import pyarrow.compute as pc

    mismatches = []
    checked = 0
    for v in _versions(lake_dir):
        m = sink.read_manifest(lake_dir, v)
        lin = partition_metrics(lake_dir, version=v)
        if lin.num_rows == 0 and not m.get("lineage"):
            continue
        checked += 1
        for field, key in (
            ("events_in", "events_in"),
            ("rows_out_touched", "rows_out"),
        ):
            want = int(m.get("totals", {}).get(field, 0))
            got = int(pc.sum(lin.column(key)).as_py() or 0)
            if want != got:
                mismatches.append((v, field, want, got))
    return {"versions_checked": checked, "mismatches": mismatches}
