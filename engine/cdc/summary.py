"""Incrementally-maintained per-repo summary — materialized-view
maintenance over the CDC lake (north-star "incremental-ingest engine").

The merge stage already holds each touched partition's OLD rows (being
replaced/deleted) and NEW rows in memory, so it emits per-repo metric
deltas for free in its report row (engine/cdc/merge.py::_summary_delta).
This module folds those deltas into the running summary each epoch:

- **Exactly-once**: the folded summary is written to a uniquely-named
  parquet under ``lake/summary/`` BEFORE the manifest commit, and the
  manifest's ``summary_file`` field is the only reference to it — a
  crashed epoch leaves an unreferenced orphan, identical to the data
  files' two-phase protocol (engine/cdc/sink.py).
- **Correctness**: delta math (replace = −old +new, delete = −old)
  makes the fold equal a full recompute from the lake at every epoch
  (tests/test_cdc_summary.py asserts table equality).
- **Configurable metrics**: the view's metric set is a spec — a list of
  ``{"name", "agg" ∈ count|chars|sum[, "col"]}`` entries with exactly
  one ``count`` metric (row liveness) — pinned in the manifest
  (``summary_spec``; absent = the default (n_files, n_chars)). All
  metrics are integers, so fold == recompute is exact, never fp-drifty.
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
from engine.cdc.merge import DEFAULT_SUMMARY_SPEC

SUMMARY_SCHEMA = pa.schema(  # the default spec's schema (back-compat alias)
    [
        pa.field("repo", pa.string()),
        pa.field("n_files", pa.int64()),
        pa.field("n_chars", pa.int64()),
    ]
)


def validate_spec(spec: list) -> list:
    names = [m.get("name") for m in spec]
    if len(set(names)) != len(names) or not all(names):
        raise ValueError(f"summary_spec needs unique non-empty names: {names}")
    if sum(1 for m in spec if m.get("agg") == "count") != 1:
        raise ValueError("summary_spec needs exactly one 'count' metric (liveness)")
    for m in spec:
        if m.get("agg") not in ("count", "chars", "sum"):
            raise ValueError(f"unknown summary agg {m.get('agg')!r}")
        if m["agg"] != "count" and not m.get("col"):
            raise ValueError(f"metric {m['name']!r} ({m['agg']}) needs 'col'")
    return spec


def spec_of(manifest: dict | None, spec: list | None = None) -> list:
    """The effective metric spec: explicit arg > manifest pin > default."""
    if spec is not None:
        return validate_spec(spec)
    if manifest is not None and manifest.get("summary_spec"):
        return validate_spec(manifest["summary_spec"])
    return DEFAULT_SUMMARY_SPEC


def summary_schema(spec: list) -> pa.Schema:
    return pa.schema(
        [pa.field("repo", pa.string())]
        + [pa.field(m["name"], pa.int64()) for m in spec]
    )


def _count_index(spec: list) -> int:
    return next(i for i, m in enumerate(spec) if m["agg"] == "count")


def _delta_rows(reports: list[dict], spec: list) -> list[dict]:
    rows = []
    names = [m["name"] for m in spec]
    for rep in reports:
        for r, vec in json.loads(rep.get("summary_delta") or "{}").items():
            rows.append({"repo": r, **dict(zip(names, (int(v) for v in vec)))})
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
    spec: list | None = None,
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
    spec = spec_of(prev_manifest, spec)
    if mode == "distributed":
        return _fold_distributed(lake_dir, prev_manifest, reports, epoch, spec)
    names = [m["name"] for m in spec]
    k, live_ix = len(spec), _count_index(spec)
    acc: dict[str, list[int]] = {}
    prev_rel = (prev_manifest or {}).get("summary_file")
    if prev_rel:
        prev = pq.read_table(os.path.join(lake_dir, prev_rel))
        cols = [prev.column("repo").to_pylist()] + [
            prev.column(n).to_pylist() for n in names
        ]
        for r, *vals in zip(*cols):
            acc[r] = list(vals)
    for row in _delta_rows(reports, spec):
        e = acc.setdefault(row["repo"], [0] * k)
        for j, n in enumerate(names):
            e[j] += row[n]
    live = sorted((r, v) for r, v in acc.items() if v[live_ix] > 0)
    table = pa.table(
        {
            "repo": [r for r, _ in live],
            **{n: [v[j] for _, v in live] for j, n in enumerate(names)},
        },
        schema=summary_schema(spec),
    )
    return _write_summary(lake_dir, epoch, table)


def _fold_distributed(
    lake_dir: str,
    prev_manifest: dict | None,
    reports: list[dict],
    epoch: int,
    spec: list,
) -> str:
    """Distributed fold: union the previous summary (streamed from
    parquet) with this epoch's delta rows, bucketed grouped sum by repo,
    keep live repos, sort. Output is byte-identical to the driver fold."""
    import pyarrow.compute as pc
    import ray.data as rd

    from engine.ops.agg import grouped_agg

    schema = summary_schema(spec)
    names = [m["name"] for m in spec]
    live_name = names[_count_index(spec)]
    parts = []
    prev_rel = (prev_manifest or {}).get("summary_file")
    if prev_rel:
        parts.append(rd.read_parquet(os.path.join(lake_dir, prev_rel)))
    deltas = _delta_rows(reports, spec)
    if deltas:
        parts.append(rd.from_arrow(pa.Table.from_pylist(deltas, schema=schema)))
    if not parts:
        return _write_summary(lake_dir, epoch, schema.empty_table())
    ds = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    folded = grouped_agg(ds, ["repo"], {n: ("sum", n) for n in names})

    def _finish(t: pa.Table) -> pa.Table:
        t = pa.table(
            {f.name: t.column(f.name).cast(f.type) for f in schema},
            schema=schema,
        )
        return t.filter(pc.greater(t.column(live_name), 0))

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
    schema = summary_schema(spec_of(manifest))
    rel = (manifest or {}).get("summary_file")
    if not rel:
        return schema.empty_table()
    abs_path = os.path.join(lake_dir, rel)
    if os.path.isdir(abs_path):
        files = sorted(
            os.path.join(abs_path, n)
            for n in os.listdir(abs_path)
            if n.endswith(".parquet")
        )
        if not files:
            return schema.empty_table()
        t = pa.concat_tables(pq.read_table(f) for f in files)
        return t.sort_by([("repo", "ascending")])
    return pq.read_table(abs_path)


def recompute_summary(lake_dir: str, epoch: int | None = None) -> pa.Table:
    """Full recompute from the lake's active data files (the oracle the
    incremental fold must equal) under the lake's pinned metric spec."""
    import pandas as pd

    from engine.cdc.merge import _metric_values, live_view
    from engine.schemas import lake_schema_for

    manifest = sink.read_manifest(lake_dir, epoch)
    spec = spec_of(manifest)
    names = [m["name"] for m in spec]
    k, live_ix = len(spec), _count_index(spec)
    files = sink.active_files(manifest)
    schema = lake_schema_for(sink.schema_from_b64(manifest["schema_b64"])) if manifest else None
    acc: dict[str, list[int]] = {}
    for rels in files.values():
        t = live_view(lake_dir, rels, schema)
        df = pd.DataFrame({"r": t.column("repo").to_pandas()})
        for j, m in enumerate(spec):
            df[f"v{j}"] = _metric_values(t, m).to_numpy()
        g = df.groupby("r", sort=False).sum()
        for r, row in zip(g.index, g.to_numpy()):
            e = acc.setdefault(str(r), [0] * k)
            for j in range(k):
                e[j] += int(row[j])
    live = sorted((r, v) for r, v in acc.items() if v[live_ix] > 0)
    return pa.table(
        {
            "repo": [r for r, _ in live],
            **{n: [v[j] for _, v in live] for j, n in enumerate(names)},
        },
        schema=summary_schema(spec),
    )
