"""Merge-apply: commit-ordered last-writer-wins upsert/delete (SURVEY.md §2.7 C3/C5).

Two-stage plan after the (pid, salt) shuffle:

- :func:`lww_collapse` — vectorized per-key LWW used as (a) the per-batch
  combiner, (b) the sub-partition LWW after the first shuffle, and
  (c) the cross-salt reconciliation inside :class:`MergeApply`. LWW is
  associative, so collapsing at every level is exact; ``n_events`` /
  ``seq_lo`` accumulator columns preserve lineage counts through the
  collapses.
- :class:`MergeApply` — actor-pool stage, one call per lake partition
  (pid): reconcile salted winners, apply deletes/upserts against the
  partition's base file (read via the committed manifest), and rewrite
  the partition (rewrite-on-touch = the log-structured-merge compaction
  policy, C5). Emits a report/lineage row, NOT data — the write is
  uncommitted until the driver's manifest commit (engine/cdc/sink.py).

Determinism: winners are decided solely by ``seq`` (unique by generator
contract); output rows are sorted by (repo, path) — both independent of
arrival order and parallelism (SURVEY.md §4 "ordering").
"""

from __future__ import annotations

import os
import time
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from engine.cdc.schema import conform_table
from engine.schemas import lake_schema_for
from engine.util.hashing import sha256_hex_column

_ACC_COLS = ("n_events", "seq_lo")

# Zone-map stats: string bounds longer than this are dropped rather than
# truncated (a truncated upper bound is UNSOUND for pruning — it sorts
# below real values it is supposed to cover).
_STATS_MAX_STR = 64


def file_stats(t: pa.Table, exclude: tuple = ("content", "content_sha256")) -> dict:
    """Per-file zone map ``{col: [min, max]}`` over int/float/string
    columns (bounds over NON-NULL values; all-null / empty columns carry
    no entry and are therefore never prunable). Stored in the committed
    manifest per data file (``file_stats``) so scans can skip whole
    partitions without touching storage — sound because every live row
    a reader can observe is a verbatim row of some active file
    (merge-on-read selects rows, it never synthesizes values)."""
    import math

    out: dict[str, list] = {}
    if t.num_rows == 0:
        return out
    for f in t.schema:
        if f.name in exclude:
            continue
        if not (
            pa.types.is_integer(f.type)
            or pa.types.is_floating(f.type)
            or pa.types.is_string(f.type)
            or pa.types.is_large_string(f.type)
        ):
            continue
        col = t.column(f.name)
        if col.null_count == t.num_rows:
            continue
        mm = pc.min_max(col)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        if isinstance(lo, str) and (
            len(lo) > _STATS_MAX_STR or len(hi) > _STATS_MAX_STR
        ):
            continue
        if isinstance(lo, float) and not (math.isfinite(lo) and math.isfinite(hi)):
            continue
        out[f.name] = [lo, hi]
    return out


def _stats_json(file_rel: str | None, written: pa.Table | None) -> str:
    import json

    if file_rel is None or written is None:
        return "{}"
    return json.dumps({file_rel: file_stats(written)})

REPORT_SCHEMA = pa.schema(
    [
        pa.field("pid", pa.int64()),
        pa.field("epoch", pa.int64()),
        pa.field("files", pa.list_(pa.string())),
        pa.field("seq_lo", pa.int64()),
        pa.field("seq_hi", pa.int64()),
        pa.field("events_in", pa.int64()),
        pa.field("upserts", pa.int64()),
        pa.field("deletes", pa.int64()),
        pa.field("rows_out", pa.int64()),
        pa.field("bytes_written", pa.int64()),
        pa.field("duration_s", pa.float64()),
        # JSON {repo: [d_files, d_chars]} — the partition's contribution to
        # the incrementally-maintained per-repo summary (engine/cdc/summary.py).
        pa.field("summary_delta", pa.string()),
        # JSON {file_rel: {col: [min, max]}} zone map of the file(s) this
        # report WROTE (carried-forward files keep their committed stats).
        pa.field("stats", pa.string()),
    ]
)


def content_chars(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """utf8_length that tolerates an all-null column (Arrow type ``null``
    has no utf8_length kernel — cast to string first)."""
    if pa.types.is_null(col.type):
        col = col.cast(pa.string())
    return pc.utf8_length(col)


# The default incrementally-maintained per-repo view. A ReplayConfig may
# override with any metric list: each entry is {"name", "agg"[, "col"]}
# with agg ∈ {"count", "chars", "sum"}; exactly one "count" metric is
# required (it defines row liveness for the fold). All metrics are
# integer-valued → the fold is exact (no fp drift vs a recompute).
DEFAULT_SUMMARY_SPEC = [
    {"name": "n_files", "agg": "count"},
    {"name": "n_chars", "agg": "chars", "col": "content"},
]


def _metric_values(tbl: pa.Table, m: dict) -> "pd.Series":
    """Per-row int64 contribution of one metric (missing column — e.g. a
    spec written before the column evolved in — contributes 0)."""
    n = tbl.num_rows
    if m["agg"] == "count":
        return pd.Series(np.ones(n, dtype=np.int64))
    col = m.get("col")
    if col not in tbl.column_names:
        return pd.Series(np.zeros(n, dtype=np.int64))
    if m["agg"] == "chars":
        return content_chars(tbl.column(col)).to_pandas().fillna(0).astype(np.int64)
    if m["agg"] == "sum":
        return (
            tbl.column(col).to_pandas().fillna(0).astype(np.int64).reset_index(drop=True)
        )
    raise ValueError(f"unknown summary agg {m['agg']!r}")


def _summary_delta(removed: pa.Table, added: pa.Table, spec: list | None = None) -> str:
    """Per-repo signed metric deltas from the rows this merge removed
    from and added to its partition. Incremental-view math: replace =
    remove old + add new, delete = remove old — so folding deltas over
    epochs reproduces a full recompute exactly, for ANY metric spec."""
    import json

    spec = spec or DEFAULT_SUMMARY_SPEC
    k = len(spec)
    acc: dict[str, list[int]] = {}
    for tbl, sign in ((removed, -1), (added, 1)):
        if tbl.num_rows == 0:
            continue
        df = pd.DataFrame({"r": tbl.column("repo").to_pandas()})
        for j, m in enumerate(spec):
            df[f"v{j}"] = _metric_values(tbl, m).to_numpy()
        g = df.groupby("r", sort=False).sum()
        for repo, row in zip(g.index, g.to_numpy()):
            e = acc.setdefault(str(repo), [0] * k)
            for j in range(k):
                e[j] += sign * int(row[j])
    zero = [0] * k
    return json.dumps({r: v for r, v in sorted(acc.items()) if v != zero})


def lww_collapse(table: pa.Table) -> pa.Table:
    """Keep the max-``seq`` row per (repo, path); sum ``n_events`` and
    min ``seq_lo`` across collapsed rows. Only the key/seq/accumulator
    columns are converted to pandas — wide ``content`` strings stay in
    Arrow and move via ``take`` (zero row-level Python)."""
    n = table.num_rows
    has_acc = _ACC_COLS[0] in table.column_names
    if n == 0:
        out = table
        if not has_acc:
            for c in _ACC_COLS:
                out = out.append_column(c, pa.array([], type=pa.int64()))
        return out
    s = table.column("seq").to_pandas()
    df = pd.DataFrame(
        {
            "r": table.column("repo").to_pandas(),
            "p": table.column("path").to_pandas(),
            "s": s,
            "n": table.column("n_events").to_pandas()
            if has_acc
            else np.ones(n, dtype=np.int64),
            "lo": table.column("seq_lo").to_pandas() if has_acc else s,
        }
    )
    g = df.groupby(["r", "p"], sort=False)
    pos = g["s"].idxmax().to_numpy()
    if len(pos) == n and not has_acc:
        # No duplicate keys in this chunk — pure column append, no take.
        out = table.append_column("n_events", pa.array(np.ones(n, dtype=np.int64)))
        return out.append_column("seq_lo", table.column("seq"))
    nsum = g["n"].sum().to_numpy().astype(np.int64)
    lmin = g["lo"].min().to_numpy().astype(np.int64)
    order = np.argsort(pos)
    pos, nsum, lmin = pos[order], nsum[order], lmin[order]
    out = table.select([c for c in table.column_names if c not in _ACC_COLS]).take(
        pa.array(pos)
    )
    out = out.append_column("n_events", pa.array(nsum))
    return out.append_column("seq_lo", pa.array(lmin))


def _key_array(table: pa.Table) -> pa.Array:
    joined = pc.binary_join_element_wise(
        table.column("repo"), table.column("path"), "\x1f"
    )
    return joined.combine_chunks() if isinstance(joined, pa.ChunkedArray) else joined


def live_view(
    lake_dir: str,
    rels: list[str],
    lake_schema: pa.Schema,
    filters: list | None = None,
    base_filters: list | None = None,
    read_columns: list[str] | None = None,
) -> pa.Table:
    """Merge-on-read of one partition's active file list — the LSM read
    path (C5). The list is one base file (no ``op`` column) plus zero or
    more per-epoch delta files (lake columns + ``op``, including ``D``
    tombstones). Later files carry strictly larger ``seq``, but the merge
    doesn't rely on list order: max-``seq`` per (repo, path) wins (seq
    TIES break in favor of the LATER file — changefeed propagates
    maintenance backfills as equal-seq U events, bootstrap._diff_tables,
    and a delta-mode replica must let that delta row supersede its base
    row), then tombstones drop out. Returns live rows in lake schema, sorted by key
    (byte-identical to what rewrite-on-touch would have produced).

    ``filters`` (pyarrow.parquet DNF) push row-group/page pruning into
    the file reads — sound for KEY-scoped predicates (e.g. repo
    equality): every row of a key, tombstones included, satisfies the
    same key predicate, so the per-key max-seq merge below sees complete
    keys.

    ``base_filters`` (same DNF) is the NON-key-scoped pushdown: applied
    ONLY to base files (no ``op`` column). Sound for arbitrary
    predicates because delta rows carry strictly larger ``seq`` — a base
    row can only (a) win when its key has no delta rows, in which case a
    post-merge filter would drop it anyway, or (b) lose to a delta row
    regardless of its presence. Delta files are never pre-filtered (a
    tombstone failing the predicate must still kill its base row).
    Callers using ``base_filters`` MUST re-apply the exact predicate
    post-merge (engine/cdc/scan.py does). Files lacking a referenced
    column (older schema) skip the pushdown.

    ``read_columns`` prunes the file reads to a column subset (pass the
    matching pruned ``lake_schema``); columns an older file lacks are
    null-injected by conform_table — the evolution semantics readers see
    anyway. The merge itself only needs repo/path/seq (+op), which the
    caller must include."""
    if not rels:
        return lake_schema.empty_table()
    parts = []
    for rel in rels:
        path = os.path.join(lake_dir, rel)
        flt = filters
        cols = read_columns
        if base_filters is not None or read_columns is not None:
            names = set(pq.read_schema(path).names)
            is_base = "op" not in names
            # base_filters may be flat [(c,op,v),...] (AND) or DNF
            # list-of-lists (OR of ANDs — engine/cdc/scan.py).
            bf_terms = [
                term
                for item in (base_filters or [])
                for term in (item if isinstance(item[0], (list, tuple)) else [item])
            ]
            if (
                base_filters is not None
                and is_base
                and all(c in names for c, _, _ in bf_terms)
            ):
                # pq can't mix a flat AND with a DNF list; only pass the
                # pushdown when no key-scoped filters accompany it (the
                # scan path always calls with filters=None).
                flt = base_filters if not filters else filters
            if read_columns is not None:
                cols = [c for c in read_columns if c in names]
                if not is_base:
                    cols.append("op")
        t = pq.read_table(path, filters=flt, columns=cols)
        if "op" in t.schema.names:
            op = t.column("op")
            t = conform_table(t.drop_columns(["op"]), lake_schema)
        else:
            op = pa.nulls(t.num_rows, pa.string())  # base rows never lose
            t = conform_table(t, lake_schema)
        parts.append(t.append_column("op", op))
    t = pa.concat_tables(parts)
    if len(parts) > 1 and t.num_rows:
        df = pd.DataFrame(
            {
                "r": t.column("repo").to_pandas(),
                "p": t.column("path").to_pandas(),
                "s": t.column("seq").to_pandas(),
            }
        )
        # Reversed-frame idxmax: pandas returns the FIRST max occurrence
        # in group order, so reversing makes equal-seq ties resolve to
        # the highest original row position = the later file (files were
        # concatenated in list order).
        pos = df.iloc[::-1].groupby(["r", "p"], sort=False)["s"].idxmax().to_numpy()
        t = t.take(pa.array(np.sort(pos)))
    live = t.filter(pc.fill_null(pc.not_equal(t.column("op"), "D"), True))
    live = live.drop_columns(["op"])
    if len(parts) > 1:
        live = live.sort_by([("repo", "ascending"), ("path", "ascending")])
    return live


class MergeApply:
    """One call per lake partition group; actor pool so manifest state /
    schemas are deserialized once per actor (BASELINE.json:6 "stateful
    actor pools holding per-partition last-writer-wins state")."""

    def __init__(
        self,
        lake_dir: str,
        epoch: int,
        active_files: dict,
        event_schema_b64: str,
        write_mode: str = "rewrite",
        compact_files: int = 4,
        update_mode: str = "row",
        summary_spec_json: str | None = None,
    ):
        import json

        from engine.cdc.sink import schema_from_b64

        self.lake_dir = lake_dir
        self.epoch = epoch
        self.active = {
            int(k): ([v] if isinstance(v, str) else list(v))
            for k, v in active_files.items()
        }
        self.event_schema = schema_from_b64(event_schema_b64)
        self.lake_schema = lake_schema_for(self.event_schema)
        self.payload_names = [
            f.name for f in self.lake_schema if f.name not in ("content_sha256", "seq")
        ]
        if write_mode not in ("rewrite", "delta"):
            raise ValueError(f"write_mode {write_mode!r}")
        if update_mode not in ("row", "column"):
            raise ValueError(f"update_mode {update_mode!r}")
        self.write_mode = write_mode
        self.compact_files = compact_files
        self.update_mode = update_mode
        self.summary_spec = (
            json.loads(summary_spec_json) if summary_spec_json else None
        )

    def _read_base(self, pid: int) -> pa.Table:
        return live_view(self.lake_dir, self.active.get(pid, []), self.lake_schema)

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        if group.num_rows == 0:
            return REPORT_SCHEMA.empty_table()
        pid = group.column("pid")[0].as_py()
        if self.update_mode == "column":
            return self._apply_column(group, pid, t0)
        winners = lww_collapse(group)  # cross-salt reconciliation (C2 pass 2)
        events_in = int(pc.sum(winners.column("n_events")).as_py())
        seq_lo = int(pc.min(winners.column("seq_lo")).as_py())
        seq_hi = int(pc.max(winners.column("seq")).as_py())
        del_mask = pc.equal(winners.column("op"), "D")
        n_del = int(pc.sum(pc.cast(del_mask, pa.int64())).as_py() or 0)
        ups = winners.filter(pc.invert(del_mask))

        cols = {name: ups.column(name) for name in self.payload_names}
        if "content_sha256" in self.lake_schema.names:
            cols["content_sha256"] = pa.array(
                sha256_hex_column(ups.column("content")), type=pa.string()
            )
        cols["seq"] = ups.column("seq")
        upsert_rows = pa.table(cols, schema=self.lake_schema)

        base = self._read_base(pid)
        removed = base.slice(0, 0)
        if base.num_rows:
            touched = _key_array(winners)
            hit = pc.is_in(_key_array(base), value_set=touched)
            removed = base.filter(hit)
            base = base.filter(pc.invert(hit))
        out = pa.concat_tables([base, upsert_rows])
        out = out.sort_by([("repo", "ascending"), ("path", "ascending")])

        # LSM write policy (C5): "rewrite" rewrites the touched partition
        # (one base file); "delta" appends only this epoch's winners —
        # upserts plus D tombstones, ~events-sized, not partition-sized —
        # and compacts back to one base when the file list would exceed
        # ``compact_files`` (bounds read amplification).
        prev = self.active.get(pid, [])
        write_delta = self.write_mode == "delta" and len(prev) + 1 <= self.compact_files
        files, nbytes = [], 0
        if out.num_rows:
            if write_delta:
                dcols = {name: winners.column(name) for name in self.payload_names}
                if "content_sha256" in self.lake_schema.names:
                    dcols["content_sha256"] = pa.array(
                        sha256_hex_column(winners.column("content")), type=pa.string()
                    )
                dcols["seq"] = winners.column("seq")
                dcols["op"] = winners.column("op")
                delta = pa.table(dcols)
                file_rel = os.path.join(
                    "data", f"part={pid}",
                    f"delta-{self.epoch:05d}-{uuid.uuid4().hex[:12]}.parquet",
                )
                abs_path = os.path.join(self.lake_dir, file_rel)
                os.makedirs(os.path.dirname(abs_path), exist_ok=True)
                pq.write_table(delta, abs_path)
                files = prev + [file_rel]
                written = delta
            else:
                file_rel = os.path.join(
                    "data", f"part={pid}",
                    f"base-{self.epoch:05d}-{uuid.uuid4().hex[:12]}.parquet",
                )
                abs_path = os.path.join(self.lake_dir, file_rel)
                os.makedirs(os.path.dirname(abs_path), exist_ok=True)
                pq.write_table(out, abs_path)
                files = [file_rel]
                written = out
            nbytes = os.path.getsize(abs_path)

        return pa.table(
            {
                "pid": [pid],
                "epoch": [self.epoch],
                "files": [files if files else None],
                "seq_lo": [seq_lo],
                "seq_hi": [seq_hi],
                "events_in": [events_in],
                "upserts": [int(ups.num_rows)],
                "deletes": [n_del],
                "rows_out": [int(out.num_rows)],
                "bytes_written": [nbytes],
                "duration_s": [time.monotonic() - t0],
                "summary_delta": [_summary_delta(removed, upsert_rows, self.summary_spec)],
                "stats": [_stats_json(file_rel if files else None,
                                      written if files else None)],
            },
            schema=REPORT_SCHEMA,
        )

    def _apply_column(self, events: pa.Table, pid: int, t0: float) -> pa.Table:
        """Column-level LWW (partial "patch" updates): a ``U`` event's
        NULL payload column means *unchanged*, not "set to null" — the
        latest non-null value per column wins. ``I`` replaces the full
        row (its nulls ARE null); ``D`` is a full tombstone (its payload
        is ignored); patches after a barrier (the key's newest I/D)
        build on the barrier, never on pre-barrier state, so a U after a
        D re-creates the row from the patched columns only.

        Unlike row-LWW this fold is NOT associative across arbitrary
        batch splits (a later batch's I must invalidate an earlier
        batch's already-collapsed patches below it), so column mode
        skips every pre-shuffle collapse and this method sees the
        partition's RAW epoch events and does ONE exact fold: winner
        ROW INDICES are computed per column in pandas (key/seq/op
        metadata only); payload values — content included — move via
        Arrow ``take``, so heavy strings never enter pandas."""
        n = events.num_rows
        events_in = (
            int(pc.sum(events.column("n_events")).as_py())
            if "n_events" in events.column_names
            else n
        )
        seq_lo = int(pc.min(events.column("seq_lo" if "seq_lo" in events.column_names else "seq")).as_py())
        seq_hi = int(pc.max(events.column("seq")).as_py())
        patchable = [c for c in self.payload_names if c not in ("repo", "path")]

        meta = pd.DataFrame(
            {
                "r": events.column("repo").to_pandas(),
                "p": events.column("path").to_pandas(),
                "s": events.column("seq").to_pandas(),
                "op": events.column("op").to_pandas(),
                "i": np.arange(n, dtype=np.int64),
            }
        )
        # Barrier = the key's max-seq I/D event.
        bmask = meta["op"] != "U"
        bar = (
            meta[bmask]
            .sort_values("s", kind="mergesort")
            .drop_duplicates(["r", "p"], keep="last")[["r", "p", "s", "op"]]
            .rename(columns={"s": "bs", "op": "bop"})
        )
        meta = meta.merge(bar, on=["r", "p"], how="left")
        eligible = (meta["bs"].isna() | (meta["s"] >= meta["bs"])).to_numpy()
        order = meta.sort_values(["r", "p", "s"], ascending=[True, True, False],
                                 kind="mergesort")
        final = order.drop_duplicates(["r", "p"])[["r", "p", "s", "bop"]].reset_index(drop=True)

        # Per-column winner row index (max-seq eligible non-null non-D).
        not_d = (order["op"] != "D").to_numpy()
        elig_sorted = eligible[order.index.to_numpy()]
        ev_idx: dict[str, pd.Series] = {}
        for c in patchable:
            valid = pc.is_valid(events.column(c)).to_numpy(zero_copy_only=False)
            m = valid[order["i"].to_numpy()] & elig_sorted & not_d
            w = order[m].drop_duplicates(["r", "p"])
            ev_idx[c] = final.merge(w[["r", "p", "i"]], on=["r", "p"], how="left")["i"]

        base = self._read_base(pid)
        bkeys = pd.DataFrame(
            {
                "r": base.column("repo").to_pandas(),
                "p": base.column("path").to_pandas(),
                "bi": np.arange(base.num_rows, dtype=np.int64),
            }
        )
        base_ix = final.merge(bkeys, on=["r", "p"], how="left")["bi"]

        has_barrier = final["bop"].notna().to_numpy()
        # A D-barrier key with no later U is a delete; any U after the
        # barrier keeps the key alive (sequential-fold semantics: every
        # U is an upsert — even an all-null no-op patch re-creates an
        # empty row after a delete). I, patched-D, and patch-only keys
        # all materialize a row.
        u_rows = order[(order["op"].to_numpy() == "U") & elig_sorted]
        ua = (
            final.merge(
                u_rows.drop_duplicates(["r", "p"])[["r", "p"]].assign(__u=True),
                on=["r", "p"],
                how="left",
            )["__u"]
            .notna()  # True where a U matched; avoids object-fillna downcast
            .to_numpy()
        )
        exists = ~((final["bop"] == "D").to_numpy() & ~ua)

        def _take(col: pa.ChunkedArray, idx: pd.Series, keep: np.ndarray) -> pa.Array:
            ia = pa.array(idx[keep].astype("Int64"), type=pa.int64())
            return pc.take(col.combine_chunks(), ia)

        use_base = ~has_barrier  # patches coalesce onto base only barrier-free
        cols: dict[str, pa.Array] = {
            "repo": pa.array(final["r"][exists], type=pa.string()),
            "path": pa.array(final["p"][exists], type=pa.string()),
        }
        for c in patchable:
            ftype = self.lake_schema.field(c).type
            ev = pc.cast(_take(events.column(c), ev_idx[c], exists), ftype)
            bv = pc.cast(_take(base.column(c), base_ix.where(pd.Series(use_base)), exists), ftype)
            cols[c] = pc.coalesce(ev, bv)
        if "content_sha256" in self.lake_schema.names:
            cols["content_sha256"] = pa.array(
                sha256_hex_column(cols["content"]), type=pa.string()
            )
        cols["seq"] = pa.array(final["s"][exists].to_numpy(), type=pa.int64())
        upsert_rows = pa.table(
            {f.name: cols[f.name] for f in self.lake_schema}, schema=self.lake_schema
        )

        removed = base.slice(0, 0)
        if base.num_rows:
            hit_ix = base_ix.dropna().astype(np.int64).to_numpy()
            hit = np.zeros(base.num_rows, dtype=bool)
            hit[hit_ix] = True
            removed = base.filter(pa.array(hit))
            base = base.filter(pa.array(~hit))
        out = pa.concat_tables([base, upsert_rows])
        out = out.sort_by([("repo", "ascending"), ("path", "ascending")])

        # The exact fold coalesced every upsert against the current
        # merge-on-read state, so the folded rows are COMPLETE — a patch
        # epoch's delta is just complete upserts + D tombstones, and the
        # row-level max-seq merge-on-read (live_view) stays correct. The
        # non-associativity only forbids collapsing RAW patches.
        prev = self.active.get(pid, [])
        write_delta = self.write_mode == "delta" and len(prev) + 1 <= self.compact_files
        files, nbytes = [], 0
        if out.num_rows:
            if write_delta:
                gone = ~exists
                tomb_cols: dict[str, pa.Array] = {}
                for f in self.lake_schema:
                    if f.name == "repo":
                        tomb_cols[f.name] = pa.array(final["r"][gone], type=pa.string())
                    elif f.name == "path":
                        tomb_cols[f.name] = pa.array(final["p"][gone], type=pa.string())
                    elif f.name == "seq":
                        tomb_cols[f.name] = pa.array(
                            final["s"][gone].to_numpy(), type=pa.int64()
                        )
                    else:
                        tomb_cols[f.name] = pa.nulls(int(gone.sum()), f.type)
                tombstones = pa.table(tomb_cols, schema=self.lake_schema)
                delta = pa.concat_tables([
                    upsert_rows.append_column(
                        "op", pa.array(["U"] * upsert_rows.num_rows, pa.string())
                    ),
                    tombstones.append_column(
                        "op", pa.array(["D"] * tombstones.num_rows, pa.string())
                    ),
                ])
                file_rel = os.path.join(
                    "data", f"part={pid}",
                    f"delta-{self.epoch:05d}-{uuid.uuid4().hex[:12]}.parquet",
                )
                abs_path = os.path.join(self.lake_dir, file_rel)
                os.makedirs(os.path.dirname(abs_path), exist_ok=True)
                pq.write_table(delta, abs_path)
                files = prev + [file_rel]
                written = delta
            else:
                file_rel = os.path.join(
                    "data", f"part={pid}",
                    f"base-{self.epoch:05d}-{uuid.uuid4().hex[:12]}.parquet",
                )
                abs_path = os.path.join(self.lake_dir, file_rel)
                os.makedirs(os.path.dirname(abs_path), exist_ok=True)
                pq.write_table(out, abs_path)
                files = [file_rel]
                written = out
            nbytes = os.path.getsize(abs_path)

        return pa.table(
            {
                "pid": [pid],
                "epoch": [self.epoch],
                "files": [files if files else None],
                "seq_lo": [seq_lo],
                "seq_hi": [seq_hi],
                "events_in": [events_in],
                "upserts": [int(upsert_rows.num_rows)],
                "deletes": [int((~exists).sum())],
                "rows_out": [int(out.num_rows)],
                "bytes_written": [nbytes],
                "duration_s": [time.monotonic() - t0],
                "summary_delta": [_summary_delta(removed, upsert_rows, self.summary_spec)],
                "stats": [_stats_json(file_rel if files else None,
                                      written if files else None)],
            },
            schema=REPORT_SCHEMA,
        )


_MERGE_CACHE: dict[tuple, MergeApply] = {}


def merge_apply_group(
    group: pa.Table,
    *,
    lake_dir,
    epoch,
    active_files,
    event_schema_b64,
    write_mode="rewrite",
    compact_files=4,
    update_mode="row",
    summary_spec_json=None,
) -> pa.Table:
    """Task-form of :class:`MergeApply` (elastic scheduling: one task per
    partition group, no pool pre-reservation — a fixed-size actor pool
    sized to the CPU count can starve the upstream shuffle tasks, and a
    per-epoch pool pays actor startup every epoch). The constructed
    stage is cached per worker process per epoch, mirroring actor-pool
    setup amortization."""
    import json

    # active_files MUST key the cache: replaying into a reused lake path
    # in one Ray session changes the manifest under the same
    # (lake, epoch) pair, and a stale entry would read deleted files
    # (found by a probe that rmtree'd and re-replayed the same lake).
    active_key = hash(json.dumps(active_files, sort_keys=True, default=str))
    key = (
        lake_dir, epoch, event_schema_b64, write_mode, update_mode,
        summary_spec_json, active_key,
    )
    fn = _MERGE_CACHE.get(key)
    if fn is None:
        _MERGE_CACHE.clear()  # previous epochs' entries are dead
        fn = _MERGE_CACHE[key] = MergeApply(
            lake_dir, epoch, active_files, event_schema_b64, write_mode,
            compact_files, update_mode, summary_spec_json,
        )
    return fn(group)
