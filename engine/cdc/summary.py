"""Incrementally-maintained per-repo summary — materialized-view
maintenance over the CDC lake (north-star "incremental-ingest engine").

The merge stage already holds each touched partition's OLD rows (being
replaced/deleted) and NEW rows in memory, so it emits per-repo deltas
(Δlive_files, Δcontent_chars) for free in its report row
(engine/cdc/merge.py::_summary_delta). This module folds those deltas
into the running summary each epoch:

- **Exactly-once**: the folded summary is written to a uniquely-named
  parquet under ``lake/summary/`` BEFORE the manifest commit, and the
  manifest's ``summary_file`` field is the only reference to it — a
  crashed epoch leaves an unreferenced orphan, identical to the data
  files' two-phase protocol (engine/cdc/sink.py).
- **Correctness**: delta math (replace = −old +new, delete = −old)
  makes the fold equal a full recompute from the lake at every epoch
  (tests/test_cdc_summary.py asserts table equality).
- **Scale**: the driver fold is O(repos touched per epoch + summary
  size). At huge repo counts the fold becomes a bucketed Ray join of
  (summary ∪ deltas) — same math, distributed; the per-partition delta
  emission already scales (partitions are hashed by repo).
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from engine.cdc import sink

SUMMARY_SCHEMA = pa.schema(
    [
        pa.field("repo", pa.string()),
        pa.field("n_files", pa.int64()),
        pa.field("n_chars", pa.int64()),
    ]
)


def _delta_rows(reports: list[dict]) -> list[dict]:
    rows = []
    for rep in reports:
        for r, (d_files, d_chars) in json.loads(rep.get("summary_delta") or "{}").items():
            rows.append({"repo": r, "n_files": int(d_files), "n_chars": int(d_chars)})
    return rows


def _write_summary(lake_dir: str, epoch: int, table: pa.Table) -> str:
    rel = os.path.join("summary", f"epoch-{epoch:05d}-{uuid.uuid4().hex[:12]}.parquet")
    abs_path = os.path.join(lake_dir, rel)
    os.makedirs(os.path.dirname(abs_path), exist_ok=True)
    pq.write_table(table, abs_path)
    return rel


def fold_summary(
    lake_dir: str,
    prev_manifest: dict | None,
    reports: list[dict],
    epoch: int,
    mode: str = "driver",
) -> str:
    """Fold this epoch's per-partition deltas into the previous epoch's
    summary; write a uniquely-named parquet and return its lake-relative
    path (active only once the referencing manifest commits).

    ``mode="driver"`` folds in driver memory — O(summary repos), the
    right call while the repo count fits the driver. ``mode="distributed"``
    folds as a Ray job: (previous summary parquet ∪ delta rows) through
    the bucketed grouped-sum combiner — the same math, shuffling
    (repo, partials) instead of holding every repo driver-side. Both
    modes write byte-identical summaries (sorted by repo, live rows
    only)."""
    if mode == "distributed":
        return _fold_distributed(lake_dir, prev_manifest, reports, epoch)
    acc: dict[str, list[int]] = {}
    prev_rel = (prev_manifest or {}).get("summary_file")
    if prev_rel:
        prev = pq.read_table(os.path.join(lake_dir, prev_rel))
        for r, f, c in zip(
            prev.column("repo").to_pylist(),
            prev.column("n_files").to_pylist(),
            prev.column("n_chars").to_pylist(),
        ):
            acc[r] = [f, c]
    for row in _delta_rows(reports):
        e = acc.setdefault(row["repo"], [0, 0])
        e[0] += row["n_files"]
        e[1] += row["n_chars"]
    live = sorted((r, v[0], v[1]) for r, v in acc.items() if v[0] > 0)
    table = pa.table(
        {
            "repo": [r for r, _, _ in live],
            "n_files": [f for _, f, _ in live],
            "n_chars": [c for _, _, c in live],
        },
        schema=SUMMARY_SCHEMA,
    )
    return _write_summary(lake_dir, epoch, table)


def _fold_distributed(
    lake_dir: str, prev_manifest: dict | None, reports: list[dict], epoch: int
) -> str:
    """Distributed fold: union the previous summary (streamed from
    parquet) with this epoch's delta rows, bucketed grouped sum by repo,
    keep live repos, sort. Output is byte-identical to the driver fold."""
    import pyarrow.compute as pc
    import ray.data as rd

    from engine.ops.agg import grouped_agg

    parts = []
    prev_rel = (prev_manifest or {}).get("summary_file")
    if prev_rel:
        parts.append(rd.read_parquet(os.path.join(lake_dir, prev_rel)))
    deltas = _delta_rows(reports)
    if deltas:
        parts.append(rd.from_arrow(pa.Table.from_pylist(deltas, schema=SUMMARY_SCHEMA)))
    if not parts:
        return _write_summary(lake_dir, epoch, SUMMARY_SCHEMA.empty_table())
    ds = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    folded = grouped_agg(
        ds, ["repo"], {"n_files": ("sum", "n_files"), "n_chars": ("sum", "n_chars")}
    )

    def _finish(t: pa.Table) -> pa.Table:
        t = pa.table(
            {f.name: t.column(f.name).cast(f.type) for f in SUMMARY_SCHEMA},
            schema=SUMMARY_SCHEMA,
        )
        return t.filter(pc.greater(t.column("n_files"), 0))

    out = folded.map_batches(_finish, batch_format="pyarrow")
    # Written straight from the Dataset as a summary DIRECTORY — the
    # folded view never lands in the driver (read_summary normalizes:
    # dir summaries are read+sorted, so both modes compare equal).
    rel = os.path.join("summary", f"epoch-{epoch:05d}-{uuid.uuid4().hex[:12]}")
    abs_path = os.path.join(lake_dir, rel)
    out.write_parquet(abs_path)
    return rel


def read_summary(lake_dir: str, epoch: int | None = None) -> pa.Table:
    """The committed summary as of ``epoch`` (default: latest), resolved
    only through the manifest — orphans from failed epochs are invisible.
    Driver-fold summaries are a single sorted parquet; distributed-fold
    summaries are a directory of part files (normalized here: concat +
    sort by repo, so both read identically)."""
    manifest = sink.read_manifest(lake_dir, epoch)
    rel = (manifest or {}).get("summary_file")
    if not rel:
        return SUMMARY_SCHEMA.empty_table()
    abs_path = os.path.join(lake_dir, rel)
    if os.path.isdir(abs_path):
        files = sorted(
            os.path.join(abs_path, n)
            for n in os.listdir(abs_path)
            if n.endswith(".parquet")
        )
        if not files:
            return SUMMARY_SCHEMA.empty_table()
        t = pa.concat_tables(pq.read_table(f) for f in files)
        return t.sort_by([("repo", "ascending")])
    return pq.read_table(abs_path)


def recompute_summary(lake_dir: str, epoch: int | None = None) -> pa.Table:
    """Full recompute from the lake's active data files (the oracle the
    incremental fold must equal)."""
    import pandas as pd
    import pyarrow.compute as pc

    from engine.cdc.merge import content_chars, live_view
    from engine.schemas import lake_schema_for

    manifest = sink.read_manifest(lake_dir, epoch)
    files = sink.active_files(manifest)
    schema = lake_schema_for(sink.schema_from_b64(manifest["schema_b64"])) if manifest else None
    acc: dict[str, list[int]] = {}
    for rels in files.values():
        t = live_view(lake_dir, rels, schema).select(["repo", "content"])
        df = pd.DataFrame(
            {
                "r": t.column("repo").to_pandas(),
                "c": content_chars(t.column("content")).to_pandas().fillna(0),
            }
        )
        for r, (cnt, chars) in df.groupby("r")["c"].agg(["count", "sum"]).iterrows():
            e = acc.setdefault(str(r), [0, 0])
            e[0] += int(cnt)
            e[1] += int(chars)
    live = sorted((r, v[0], v[1]) for r, v in acc.items() if v[0] > 0)
    return pa.table(
        {
            "repo": [r for r, _, _ in live],
            "n_files": [f for _, f, _ in live],
            "n_chars": [c for _, _, c in live],
        },
        schema=SUMMARY_SCHEMA,
    )
