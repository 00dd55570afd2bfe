"""Event parser / validator + per-batch combiner (SURVEY.md §2.2 M8).

One fused, vectorized ``map_batches`` stage that runs per event batch,
zero-copy Arrow in/out:

1. **validate** — op ∈ {I,U,D}, non-null key (repo, path), non-null seq;
   rejects are routed to a dead-letter directory (at-least-once by
   design: dead-letter files are diagnostics, uniquely named, and never
   read back by the engine).
2. **conform** — additive schema negotiation against the epoch's target
   schema (engine/cdc/schema.py).
3. **partition** — append (pid, salt) columns (engine/cdc/partition.py).
4. **partial LWW combiner** — collapse to one winner per key *within the
   batch* before the shuffle (pre-aggregation so the wide groupby moves
   winners, not raw events — SURVEY.md §4 "pre-aggregate inside
   map_batches"). Correct because LWW is associative: the max-seq event
   of a union is the max-seq of per-chunk max-seq winners; `n_events` /
   `seq_lo` columns carry the collapsed counts for lineage.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from engine.cdc.merge import lww_collapse
from engine.cdc.partition import assign_partitions
from engine.cdc.schema import conform_table
from engine.schemas import OPS


class PrepareEvents:
    """Actor-pool batch stage; constructor state (target schema, config)
    is built once per actor (SURVEY.md §2.3)."""

    def __init__(
        self,
        target_schema_b64: str,
        num_partitions: int,
        num_salts: int,
        deadletter_dir: str | None = None,
        epoch: int = 0,
        update_mode: str = "row",
        renames_json: str | None = None,
        drops_json: str | None = None,
        expectations_json: str | None = None,
    ):
        import json

        from engine.cdc.sink import schema_from_b64

        self.target_schema = schema_from_b64(target_schema_b64)
        self.num_partitions = num_partitions
        self.num_salts = num_salts
        self.deadletter_dir = deadletter_dir
        self.epoch = epoch
        self.update_mode = update_mode
        # Pinned column-rename map (maintain.rename_column): events may
        # still carry pre-rename names; map them before conforming.
        self.renames = json.loads(renames_json) if renames_json else None
        # Pinned column-drop tombstones (maintain.drop_column): events may
        # still carry dropped columns; discard them (after renaming — the
        # tombstones store current names) or negotiate would re-add them.
        self.drops = json.loads(drops_json) if drops_json else None
        # Pinned data-quality expectations (replay.set/first commit):
        # declarative per-column rules enforced at ingestion; failing
        # I/U events join the dead-letter queue (see _expect).
        self.expectations = (
            json.loads(expectations_json) if expectations_json else None
        )

    def _deadletter(self, bad: pa.Table) -> None:
        if self.deadletter_dir and bad.num_rows:
            ddir = os.path.join(self.deadletter_dir, f"epoch={self.epoch:05d}")
            os.makedirs(ddir, exist_ok=True)
            pq.write_table(bad, os.path.join(ddir, f"bad-{uuid.uuid4().hex}.parquet"))

    def _validate(self, batch: pa.Table) -> pa.Table:
        ok = pc.is_in(batch.column("op"), value_set=pa.array(OPS))
        for col in ("repo", "path", "seq"):
            ok = pc.and_(ok, pc.is_valid(batch.column(col)))
        if pc.all(ok).as_py() in (True, None):
            return batch
        self._deadletter(batch.filter(pc.invert(pc.fill_null(ok, False))))
        return batch.filter(pc.fill_null(ok, False))

    def _expect(self, batch: pa.Table) -> pa.Table:
        """Enforce the lake's pinned declarative expectations (data-
        quality constraints) — vectorized, pre-conform, per provided
        column. An event failing ANY applicable rule is dead-lettered
        whole (the same quarantine/requeue loop as malformed events).

        Applicability (the producer contract, mirrored by the SQL oracle
        in engine/pipelines/cdc_queries.py::q_cdc_expectations):

        - D events are ALWAYS exempt — a tombstone has no payload
          contract, and dropping one would silently resurrect its key;
        - a column the batch doesn't carry is not judged (additive
          evolution: old producers can't violate rules on columns they
          predate — the conform null-backfill is schema mechanics, not
          a data value);
        - NULL values are exempt for in/between/matches (constraints
          bind provided values; nullability is not_null's job);
        - not_null on a U event is exempt in update_mode='column'
          (patch semantics: null MEANS unchanged)."""
        ok = None
        op = batch.column("op")
        exempt = pc.equal(op, "D")
        for r in self.expectations:
            c = r["col"]
            if c not in batch.column_names:
                continue
            col, rule = batch.column(c), r["rule"]
            if rule == "not_null":
                v = pc.is_valid(col)
                if self.update_mode == "column":
                    v = pc.or_(v, pc.equal(op, "U"))
            elif rule == "in":
                v = pc.or_kleene(
                    pc.is_null(col),
                    pc.is_in(col, value_set=pa.array(r["values"], col.type)),
                )
            elif rule == "between":
                v = pc.or_kleene(
                    pc.is_null(col),
                    pc.and_kleene(
                        pc.greater_equal(col, r["lo"]),
                        pc.less_equal(col, r["hi"]),
                    ),
                )
            elif rule == "matches":
                v = pc.or_kleene(
                    pc.is_null(col),
                    pc.match_substring_regex(col, r["pattern"]),
                )
            else:  # validated driver-side; defensive for hand-built cfgs
                raise ValueError(f"unknown expectation rule {rule!r}")
            v = pc.or_kleene(v, exempt)
            ok = v if ok is None else pc.and_kleene(ok, v)
        if ok is None or pc.all(ok).as_py() in (True, None):
            return batch
        keep = pc.fill_null(ok, False)
        self._deadletter(batch.filter(pc.invert(keep)))
        return batch.filter(keep)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.renames:
            from engine.cdc.schema import rename_table

            batch = rename_table(batch, self.renames)
        if self.drops:
            from engine.cdc.schema import drop_table

            batch = drop_table(batch, self.drops)
        batch = self._validate(batch)
        if self.expectations:
            batch = self._expect(batch)
        batch = conform_table(batch, self.target_schema)
        batch = assign_partitions(batch, self.num_partitions, self.num_salts)
        if self.update_mode == "column":
            # Column-level LWW is NOT associative across batch splits (a
            # later batch's I/D barrier must invalidate patches already
            # collapsed below it in another batch), so NO pre-shuffle
            # collapse — only the lineage accumulators are appended; the
            # exact per-key fold happens once, in MergeApply._apply_column.
            n = batch.num_rows
            batch = batch.append_column(
                "n_events", pa.array(np.ones(n, dtype=np.int64))
            )
            return batch.append_column("seq_lo", batch.column("seq"))
        return lww_collapse(batch)


_WORKER_CACHE: dict[tuple, PrepareEvents] = {}

_EXPECT_RULES = {
    "not_null": (),
    "in": ("values",),
    "between": ("lo", "hi"),
    "matches": ("pattern",),
}


def validate_expectations(rules) -> None:
    """Driver-side shape check for a declarative expectations list (run
    before any pipeline launches / before pinning): each rule is
    ``{"col": name, "rule": kind, ...kind params}`` with kind one of
    not_null / in(values) / between(lo, hi) / matches(pattern). Key and
    engine-managed columns can't carry rules (the validator already
    guards keys; a rule quarantining tombstones would corrupt LWW)."""
    if not isinstance(rules, (list, tuple)):
        raise ValueError("expectations must be a list of rule dicts")
    for r in rules:
        if not isinstance(r, dict) or "col" not in r or "rule" not in r:
            raise ValueError(f"bad expectation {r!r}: need col and rule")
        if r["col"] in ("repo", "path", "seq", "op"):
            raise ValueError(
                f"expectation on {r['col']!r}: key/engine columns are "
                "guarded by the validator, not expectations"
            )
        params = _EXPECT_RULES.get(r["rule"])
        if params is None:
            raise ValueError(
                f"unknown expectation rule {r['rule']!r} "
                f"(want one of {sorted(_EXPECT_RULES)})"
            )
        missing = [p for p in params if p not in r]
        if missing:
            raise ValueError(f"expectation {r!r} missing {missing}")
        if r["rule"] == "matches":
            import re

            re.compile(r["pattern"])  # raises on a bad pattern


def prepare_batch(batch: pa.Table, **cfg) -> pa.Table:
    """Task-form of :class:`PrepareEvents` for elastic stateless scheduling
    (the parsed target schema is cached per worker process, so tasks get
    actor-like setup amortization without reserving a pool)."""
    key = tuple(sorted(cfg.items()))
    fn = _WORKER_CACHE.get(key)
    if fn is None:
        fn = _WORKER_CACHE[key] = PrepareEvents(**cfg)
    return fn(batch)


def _seq_watermark(lake_dir: str) -> int:
    """Highest changelog ``seq`` the lake has ever applied (max lineage
    ``seq_hi`` across all committed versions; -1 for an empty lake).
    Lineage rows are tiny (one per partition per version) — a driver-side
    footer-level read, never a data scan."""
    from engine.cdc import sink

    ldir = sink.lake_paths(lake_dir)["lineage"]
    wm = -1
    if os.path.isdir(ldir):
        for name in sorted(os.listdir(ldir)):
            if not name.endswith(".parquet"):
                continue
            col = pq.read_table(
                os.path.join(ldir, name), columns=["seq_hi"]
            ).column("seq_hi")
            if len(col):
                wm = max(wm, pc.max(col).as_py() or -1)
    return wm


def requeue_deadletters(
    lake_dir: str,
    out_log_dir: str,
    epoch: int,
    fix_fn=None,
    clear: bool = False,
    restamp: str = "auto",
) -> int:
    """Operational recovery for the dead-letter queue: read every
    quarantined event under ``lake/deadletter/``, optionally repair each
    batch with ``fix_fn`` (pa.Table → pa.Table), and PUBLISH them as
    sealed changelog epoch ``epoch`` of ``out_log_dir`` via the atomic
    stage-directory + ``os.rename`` protocol every producer uses — a
    following ``replay()`` folds them like any other epoch.

    **Seq position of the late redelivery**: repaired events keep their
    ORIGINAL ``seq`` only while every seq is still ABOVE the lake's
    applied watermark (max lineage ``seq_hi``) — then per-key LWW puts
    them exactly where they would have landed, and no interleaved newer
    write can exist below them. If ANY event's seq is at or below the
    watermark, the merge can no longer defend newer state against it
    (rewrite-mode compaction has already dropped the tombstones/seqs it
    would need, and a lower-seq delta row would break the
    strictly-larger-seq invariant live_view / scan base-file pruning
    rely on) — so with ``restamp="auto"`` (default) the WHOLE batch is
    re-stamped to ``watermark+1..watermark+n`` preserving the original
    seq order: the repaired events re-enter the log at the current
    position, i.e. they now WIN over writes made while they sat
    quarantined (the documented LWW position change — the same
    semantics as re-publishing to any at-least-once stream).
    ``restamp="never"`` raises instead of re-stamping. Events whose seq
    is null (unfixable) are never stamped — the next replay dead-letters
    them again. Events ``fix_fn`` leaves invalid are likewise simply
    dead-lettered again (requeue is idempotent-safe, never a bypass of
    validation).

    ``clear=True`` removes the quarantined files after the sealed epoch
    is published (crash between publish and clear re-delivers — which
    LWW absorbs: identical (seq, key) rows fold identically).

    Returns the number of events requeued (0 → nothing published)."""
    import shutil

    import numpy as np

    from engine.cdc import sink

    if restamp not in ("auto", "never"):
        raise ValueError(f"restamp {restamp!r} (want 'auto' or 'never')")
    ddir = sink.lake_paths(lake_dir)["deadletter"]
    files = []
    for dirpath, _, names in os.walk(ddir):
        files += [os.path.join(dirpath, n) for n in sorted(names) if n.endswith(".parquet")]
    if not files:
        return 0
    batches = [pq.read_table(f) for f in sorted(files)]
    out = pa.concat_tables(batches, promote_options="permissive")
    if fix_fn is not None:
        out = fix_fn(out)
    wm = _seq_watermark(lake_dir)
    seqs = out.column("seq")
    stale = pc.fill_null(pc.less_equal(seqs, wm), False)
    if pc.any(stale).as_py():
        if restamp == "never":
            raise ValueError(
                f"{pc.sum(pc.cast(stale, pa.int64())).as_py()} requeued "
                f"event(s) carry seq <= the lake's applied watermark {wm}; "
                "pass restamp='auto' to re-stamp them above it"
            )
        s = seqs.to_numpy(zero_copy_only=False).astype("float64")
        valid = ~np.isnan(s)
        order = np.argsort(s[valid], kind="stable")
        new = np.full(len(s), np.nan)
        idx = np.flatnonzero(valid)[order]
        new[idx] = wm + 1 + np.arange(len(idx), dtype=np.int64)
        out = out.set_column(
            out.schema.get_field_index("seq"),
            "seq",
            pa.array([None if np.isnan(v) else int(v) for v in new], pa.int64()),
        )
    epoch_dir = os.path.join(out_log_dir, f"epoch={epoch:05d}")
    if os.path.isdir(epoch_dir):
        raise FileExistsError(f"changelog epoch already sealed: {epoch_dir}")
    stage = os.path.join(out_log_dir, f".staging-{uuid.uuid4().hex[:12]}")
    os.makedirs(stage, exist_ok=True)
    pq.write_table(out, os.path.join(stage, "requeued-00000.parquet"))
    os.rename(stage, epoch_dir)  # atomic seal
    if clear:
        for f in files:
            os.remove(f)
        for dirpath, dirnames, names in os.walk(ddir, topdown=False):
            if dirpath != ddir and not dirnames and not names:
                os.rmdir(dirpath)
    return int(out.num_rows)


def deadletter_stats(lake_dir: str) -> dict[int, int]:
    """Quarantine observability: rows dead-lettered per changelog epoch,
    from the dead-letter parquet FOOTERS only (no data pages) — the
    ops-dashboard companion to lake_history (which shows what applied;
    this shows what didn't and why it's sitting in quarantine for the
    fix → requeue loop). Empty dict = clean lake."""
    from engine.cdc import sink

    ddir = sink.lake_paths(lake_dir)["deadletter"]
    out: dict[int, int] = {}
    if not os.path.isdir(ddir):
        return out
    for name in sorted(os.listdir(ddir)):
        edir = os.path.join(ddir, name)
        if not (name.startswith("epoch=") and os.path.isdir(edir)):
            continue
        k = int(name.split("=")[1])
        n = 0
        for f in os.listdir(edir):
            if f.endswith(".parquet"):
                n += pq.ParquetFile(os.path.join(edir, f)).metadata.num_rows
        out[k] = out.get(k, 0) + n
    return out
