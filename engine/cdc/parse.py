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
    ):
        from engine.cdc.sink import schema_from_b64

        self.target_schema = schema_from_b64(target_schema_b64)
        self.num_partitions = num_partitions
        self.num_salts = num_salts
        self.deadletter_dir = deadletter_dir
        self.epoch = epoch
        self.update_mode = update_mode

    def _validate(self, batch: pa.Table) -> pa.Table:
        ok = pc.is_in(batch.column("op"), value_set=pa.array(OPS))
        for col in ("repo", "path", "seq"):
            ok = pc.and_(ok, pc.is_valid(batch.column(col)))
        if pc.all(ok).as_py() in (True, None):
            return batch
        bad = batch.filter(pc.invert(pc.fill_null(ok, False)))
        if self.deadletter_dir and bad.num_rows:
            ddir = os.path.join(self.deadletter_dir, f"epoch={self.epoch:05d}")
            os.makedirs(ddir, exist_ok=True)
            pq.write_table(bad, os.path.join(ddir, f"bad-{uuid.uuid4().hex}.parquet"))
        return batch.filter(pc.fill_null(ok, False))

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = self._validate(batch)
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


def prepare_batch(batch: pa.Table, **cfg) -> pa.Table:
    """Task-form of :class:`PrepareEvents` for elastic stateless scheduling
    (the parsed target schema is cached per worker process, so tasks get
    actor-like setup amortization without reserving a pool)."""
    key = tuple(sorted(cfg.items()))
    fn = _WORKER_CACHE.get(key)
    if fn is None:
        fn = _WORKER_CACHE[key] = PrepareEvents(**cfg)
    return fn(batch)


def requeue_deadletters(
    lake_dir: str,
    out_log_dir: str,
    epoch: int,
    fix_fn=None,
    clear: bool = False,
) -> int:
    """Operational recovery for the dead-letter queue: read every
    quarantined event under ``lake/deadletter/``, optionally repair each
    batch with ``fix_fn`` (pa.Table → pa.Table), and PUBLISH them as
    sealed changelog epoch ``epoch`` of ``out_log_dir`` via the atomic
    stage-directory + ``os.rename`` protocol every producer uses — a
    following ``replay()`` folds them like any other epoch.

    Soundness of the late redelivery: repaired events keep their
    ORIGINAL ``seq``, so per-key LWW puts them exactly where they would
    have landed — they win over older state and lose to any newer write
    that happened while they sat quarantined. Events ``fix_fn`` leaves
    invalid are simply dead-lettered again by the next replay (requeue
    is idempotent-safe, never a bypass of validation).

    ``clear=True`` removes the quarantined files after the sealed epoch
    is published (crash between publish and clear re-delivers — which
    LWW absorbs: identical (seq, key) rows fold identically).

    Returns the number of events requeued (0 → nothing published)."""
    import shutil

    from engine.cdc import sink

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
