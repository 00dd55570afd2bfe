"""CDC replay orchestrator — the flagship entry point (SURVEY.md §3.2).

Epoch-at-a-time replay of the changelog into the lake:

    tail epoch k → map_batches(prepare: validate/conform/partition/combine)
                 → groupby(pid, salt).map_groups(sub-LWW)          # shuffle 1 (events)
                 → groupby(pid).map_groups(MergeApply actor pool)  # shuffle 2 (winners only)
                 → driver: collect per-partition reports → two-phase manifest commit

The epoch loop and the manifest commit run in the driver; everything
else is Ray Data tasks/actors with streaming execution. Resume (C4):
committed epochs are skipped via the manifest. The module never calls
``ray.init()`` (driver contract, __ray_entry__.py:11-13).

**Pipelined epochs**: epoch k+1's read→prepare→shuffle-1→sub-LWW stage
depends only on the changelog and the negotiated schema chain — never on
epoch k's data files — so it is prefetched (materialized) concurrently
with epoch k's merge+commit. Commit ORDER is untouched: the merge of
k+1 starts only after k's manifest is committed, so exactly-once and
resume semantics are identical to the serial loop; the overlap only
hides shuffle latency behind merge work.

CLI: ``python -m engine.cdc.replay --log-dir L --lake-dir K [--verify]``
(this is the job a cluster user would ``ray job submit``).
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, replace as _dc_replace

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from engine.cdc import sink, tailer
from engine.cdc.merge import MergeApply, lww_collapse, merge_apply_group
from engine.cdc.parse import prepare_batch
from engine.cdc.schema import drop_schema, negotiate, rename_schema
from engine.schemas import LINEAGE_SCHEMA


@dataclass
class ReplayConfig:
    num_partitions: int = 32  # P — fixed per lake, independent of parallelism
    num_salts: int = 4        # S — sub-partition fan-out for skew (C2)
    batch_size: int = 16384
    # "tasks" (default): one elastic task per partition group with per-worker
    # stage caching; "actors": a fixed map_groups actor pool (pays actor
    # startup per epoch and must be sized below the CPU count to leave room
    # for upstream shuffle tasks).
    merge_compute: str = "tasks"
    merge_concurrency: int | None = None  # actors mode: default min(P, cpus-2)
    # Ray Data shuffle backend for the groupby exchanges. Push-based sort
    # shuffle measured ~10-15% faster end-to-end at every parallelism on
    # the bench changelog; "pull" restores the Ray default.
    shuffle: str = "push"
    # Prefetch epoch k+1's winners concurrently with epoch k's merge.
    # Measured SLOWER on the bench box (materialize() pays an extra
    # object-store round-trip that outweighs the hidden latency; the
    # serial path streams winners straight into the merge shuffle) —
    # kept as an option for real multi-node clusters where exchange
    # latency is higher relative to store bandwidth.
    pipeline_epochs: bool = False
    # LSM write policy (C5). "rewrite": every touched partition is
    # rewritten whole (best when epochs are huge — the nominal 10^10-event
    # regime — since each write is already mostly new data). "delta":
    # append only the epoch's winners as a delta file (upserts + delete
    # tombstones) and merge base+deltas on read — bounds write
    # amplification to O(events) for small/frequent epochs; compaction
    # back to one base file triggers when a partition's file list would
    # exceed ``compact_files``.
    write_mode: str = "rewrite"
    compact_files: int = 4
    # Per-repo summary maintenance: "driver" folds deltas in driver memory
    # (O(live repos) — right while the repo count fits); "distributed"
    # runs the fold as a bucketed Ray grouped-sum over (summary ∪ deltas)
    # and writes the summary straight from the Dataset (huge-repo-count
    # path; adds a small per-epoch Ray job).
    summary_fold: str = "driver"
    # Metric spec of the incrementally-maintained per-repo summary:
    # list of {"name", "agg" ∈ count|chars|sum[, "col"]} with exactly one
    # "count" metric (row liveness). None → merge.DEFAULT_SUMMARY_SPEC
    # (n_files, n_chars). Pinned in the manifest on first commit; resume
    # adopts the lake's pinned spec over the caller's (like P).
    summary_spec: list | None = None
    # Winners exchange strategy. "full": the prepared events (content
    # included) flow through the (pid, salt) sort shuffle. "late":
    # late materialization — only the LWW METADATA (key/seq/locator,
    # ~70 B/row) crosses the exchange; winner rows are then fetched
    # zero-copy from the materialized prepare output via a broadcast
    # locator set, so content strings cross an exchange exactly once
    # (the final per-pid merge shuffle), not twice. Gated: above
    # ``late_max_winners`` locators the epoch falls back to "full"
    # (the broadcast must stay bounded). Measured SLOWER single-node
    # (4M events/32 CPUs, interleaved A/B: late 22-39 s vs full
    # 19-27 s): the per-batch combiner already collapses the stream
    # before the shuffle, so "full" moves winners only, and the extra
    # materialize round-trip costs the same heavy bytes the meta
    # exchange saves. Kept for multi-node, where the exchange is
    # network but the materialize stays local. State hash identical
    # on both paths (tested, incl. skew + the gate fallback).
    exchange: str = "full"
    late_max_winners: int = 4_000_000
    # Winners-exchange topology. "direct" (default): prepared batch-winners
    # flow through ONE all-to-all — the merge's own groupby(pid) — and the
    # cross-batch LWW reconciliation happens inside the merge task (it was
    # already there as the cross-salt pass). "staged": the original
    # two-exchange plan — a (pid, salt) sort shuffle + sub-LWW collapse
    # feeding a second groupby(pid) of winners. Measured (4M events,
    # same-process interleaved A/B, hash-identical): direct 10.9 s vs
    # staged 21.5 s at 32 CPUs; 14.5 vs 29.6 s at 8; and 12.1 vs 30.2 s
    # at 32 CPUs under 80% hot-repo skew — the per-batch combiner already
    # collapses hot keys (few distinct keys absorb the hot volume), so the
    # extra exchange is pure cost even in the regime salting was built
    # for. "staged" is kept for multi-node regimes where collapsing
    # before the wire is worth a second exchange (winners cross the
    # network once instead of batch-winners).
    winners_exchange: str = "direct"
    # Upsert semantics. "row" (default): an event's payload replaces the
    # whole row — classic LWW by seq. "column": partial "patch" updates —
    # a U event's NULL payload column means UNCHANGED (latest non-null
    # value per column wins); I replaces the full row, D is a full
    # tombstone, and patches after a barrier build on the barrier only.
    # Column mode is NOT an associative collapse, so it skips the
    # per-batch combiner AND the (pid, salt) sub-LWW exchange: raw
    # events flow through ONE pid shuffle into an exact per-key fold in
    # MergeApply._apply_column. Composes with write_mode="delta" (the
    # fold emits COMPLETE rows, so delta files are ordinary upserts +
    # tombstones and merge-on-read stays row-level max-seq). Requires
    # exchange="full" (the late-materialization locator path assumes
    # row-level collapse).
    update_mode: str = "row"
    # Declarative data-quality expectations, enforced at ingestion
    # (engine/cdc/parse.py::PrepareEvents._expect): a list of
    # {"col", "rule", ...} dicts — not_null / in / between / matches.
    # Failing I/U events are dead-lettered (same quarantine/requeue loop
    # as malformed events); D events are always exempt. PINNED in the
    # manifest at lake creation like update_mode — on an existing lake
    # the pin wins over this field in both directions (use
    # maintain.set_expectations to change it as an audited DDL version).
    expectations: list | None = None


def _cpus() -> int:
    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", 4))
    return 4


def _shuffle_ctx(cfg: ReplayConfig):
    """Set the session's shuffle strategy per config; returns a restore fn."""
    import ray.data as rd
    from ray.data.context import ShuffleStrategy

    ctx = rd.DataContext.get_current()
    old = ctx.shuffle_strategy
    if cfg.shuffle == "push":
        ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED

    def restore():
        ctx.shuffle_strategy = old

    return restore


def build_winners(log, lake_dir: str, epoch: int, cfg: ReplayConfig, target_b64: str,
                  renames: dict | None = None, drops: list | None = None):
    """The commit-independent half of an epoch: tail → prepare (validate/
    conform/partition/per-batch LWW) → (pid, salt) shuffle → sub-LWW.
    Safe to run before earlier epochs have committed. ``log`` is a path
    or any changelog source (tailer.as_source). ``renames`` is the lake's
    pinned column-rename map (maintain.rename_column) applied to event
    batches before conforming; ``drops`` the pinned column-drop
    tombstones (maintain.drop_column) discarded after renaming."""
    import json as _json

    if cfg.expectations:
        from engine.cdc.parse import validate_expectations

        validate_expectations(cfg.expectations)
    src = tailer.as_source(log)
    ds = src.read_epoch(epoch, parallelism_hint=2 * _cpus())
    ds = ds.map_batches(
        prepare_batch,
        fn_kwargs=dict(
            target_schema_b64=target_b64,
            num_partitions=cfg.num_partitions,
            num_salts=cfg.num_salts,
            deadletter_dir=sink.lake_paths(lake_dir)["deadletter"],
            epoch=epoch,
            update_mode=cfg.update_mode,
            renames_json=_json.dumps(renames, sort_keys=True) if renames else None,
            drops_json=_json.dumps(sorted(drops)) if drops else None,
            expectations_json=(
                _json.dumps(cfg.expectations, sort_keys=True)
                if cfg.expectations
                else None
            ),
        ),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )
    if cfg.update_mode == "column":
        if cfg.exchange != "full":
            raise ValueError(
                "update_mode='column' requires exchange='full' (the late-"
                "materialization locator path assumes row-level collapse)"
            )
        # No sub-LWW exchange: the fold is not associative; the merge's
        # own groupby(pid) is the single all-to-all for raw events.
        return ds
    if cfg.exchange == "late":
        # Late materialization IS a staged winners build — it takes
        # precedence over winners_exchange.
        return _late_winners(ds, cfg)
    if cfg.winners_exchange == "direct":
        # ONE all-to-all: batch-winners go straight to the merge's
        # groupby(pid); MergeApply's cross-salt lww_collapse is the
        # reconciliation. See ReplayConfig.winners_exchange for the
        # measured A/B (2-2.5x end-to-end, hash-identical, incl. skew).
        return ds
    # NOTE on groupby(num_partitions=...): measured WORSE at every level
    # (explicit num_partitions forces a slower exchange path in Ray
    # 2.49's sort shuffle — 3x at 32 CPUs). The default (reduce count =
    # input blocks) is right as long as epochs are big enough that
    # per-task scheduling overhead amortizes; sizing epochs is the
    # correct knob, not reduce-task count.
    return ds.groupby(["pid", "salt"]).map_groups(lww_collapse, batch_format="pyarrow")


_META_COLS = ["pid", "salt", "repo", "path", "seq", "n_events", "seq_lo"]


def _tag_locators(t: pa.Table) -> pa.Table:
    """Append a (block id, row id) locator to every prepared row. The
    block id only needs UNIQUENESS (winner selection never depends on
    its value — LWW is decided by seq alone), so 63 random bits are
    sound at any scale."""
    import uuid

    import numpy as np

    bid = uuid.uuid4().int & ((1 << 63) - 1)
    t = t.append_column("__bid", pa.array(np.full(t.num_rows, bid, np.int64)))
    return t.append_column("__rid", pa.array(np.arange(t.num_rows, dtype=np.int64)))


def _late_winners(prepared, cfg: ReplayConfig):
    """Late-materialization winners: content never crosses the wide
    (pid, salt) exchange.

    1. materialize prepare output once (the full exchange would
       materialize the same bytes inside the sort shuffle anyway);
    2. shuffle ONLY the LWW metadata + locator (~70 B/row vs ~500 B
       with content) and sub-LWW it per (pid, salt);
    3. pull the winning locators (bounded by the epoch's touched-key
       count — gated by ``late_max_winners``), broadcast them, and
       fetch winner rows zero-copy from the materialized blocks with
       the folded n_events / seq_lo accumulators attached.

    Output rows, accumulators and dtypes are identical to the full
    path (same lww_collapse on the same seq values); the CDC state
    hash is the regression oracle."""
    import numpy as np

    from engine.util.collect import pull_arrow

    prepared = prepared.map_batches(
        _tag_locators, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    meta = prepared.select_columns(_META_COLS + ["__bid", "__rid"])
    wm = (
        meta.groupby(["pid", "salt"])
        .map_groups(lww_collapse, batch_format="pyarrow")
        .materialize()
    )
    if wm.count() > cfg.late_max_winners:
        # Locator broadcast would be unbounded — run the classic full
        # exchange over the already-materialized prepare output.
        return prepared.drop_columns(["__bid", "__rid"]).groupby(
            ["pid", "salt"]
        ).map_groups(lww_collapse, batch_format="pyarrow")
    tbl = pull_arrow(wm.select_columns(["__bid", "__rid", "n_events", "seq_lo"]))
    loc: dict[int, tuple] = {}
    if tbl is not None:
        bids = tbl.column("__bid").to_numpy()
        rids = tbl.column("__rid").to_numpy()
        nev = tbl.column("n_events").to_numpy()
        slo = tbl.column("seq_lo").to_numpy()
        order = np.lexsort((rids, bids))
        bids, rids, nev, slo = bids[order], rids[order], nev[order], slo[order]
        cuts = np.flatnonzero(np.diff(bids)) + 1
        for s, e in zip(np.r_[0, cuts], np.r_[cuts, len(bids)]):
            loc[int(bids[s])] = (rids[s:e], nev[s:e], slo[s:e])
    ref = ray.put(loc)

    def _fetch(t: pa.Table) -> pa.Table:
        from engine.ops.join import _cached_get

        d = _cached_get(ref)
        b = t.column("__bid").to_numpy()
        r = t.column("__rid").to_numpy()
        keep, ns, los = [], [], []
        cuts = np.flatnonzero(np.diff(b)) + 1
        for s, e in zip(np.r_[0, cuts], np.r_[cuts, len(b)]):
            ent = d.get(int(b[s])) if len(b) else None
            if ent is None:
                continue
            wr, wn, wl = ent
            seg = r[s:e]
            pos = np.searchsorted(wr, seg)
            pos_c = np.minimum(pos, len(wr) - 1)
            ok = wr[pos_c] == seg
            keep.append(np.flatnonzero(ok) + s)
            sel = pos_c[ok]
            ns.append(wn[sel])
            los.append(wl[sel])
        idx = np.concatenate(keep) if keep else np.array([], np.int64)
        base = t.drop_columns(["__bid", "__rid", "n_events", "seq_lo"]).take(
            pa.array(idx)
        )
        base = base.append_column(
            "n_events", pa.array(np.concatenate(ns) if ns else np.array([], np.int64))
        )
        return base.append_column(
            "seq_lo", pa.array(np.concatenate(los) if los else np.array([], np.int64))
        )

    return prepared.map_batches(
        _fetch, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def merge_and_commit(
    lake_dir: str,
    epoch: int,
    winners,
    target: pa.Schema,
    cfg: ReplayConfig,
    prev_manifest: dict | None,
    t0: float,
    changelog_pos: int | None = None,
) -> dict:
    """The commit-dependent half: reconcile salted winners per pid against
    the base files named by the PREVIOUS manifest, write new partition
    files, then the two-phase manifest commit. ``epoch`` is the lake
    VERSION being committed; ``changelog_pos`` the changelog epoch it
    folds (equal unless maintenance commits interleaved — sink.changelog_pos)."""
    import json as _json

    target_b64 = sink.schema_to_b64(target)
    active = sink.active_files(prev_manifest)
    spec_json = _json.dumps(cfg.summary_spec) if cfg.summary_spec else None
    if cfg.merge_compute == "actors":
        merge_conc = cfg.merge_concurrency or max(2, min(cfg.num_partitions, _cpus() - 2))
        reports_ds = winners.groupby("pid").map_groups(
            MergeApply,
            fn_constructor_args=(
                lake_dir, epoch, active, target_b64, cfg.write_mode,
                cfg.compact_files, cfg.update_mode, spec_json,
            ),
            batch_format="pyarrow",
            concurrency=merge_conc,
        )
    else:
        reports_ds = winners.groupby("pid").map_groups(
            merge_apply_group,
            fn_kwargs=dict(
                lake_dir=lake_dir,
                epoch=epoch,
                active_files=active,
                event_schema_b64=target_b64,
                write_mode=cfg.write_mode,
                compact_files=cfg.compact_files,
                update_mode=cfg.update_mode,
                summary_spec_json=spec_json,
            ),
            batch_format="pyarrow",
        )
    reports = reports_ds.take_all()  # ≤ P tiny rows — the commit barrier

    from engine.cdc.summary import fold_summary

    summary_rel = fold_summary(
        lake_dir, prev_manifest, reports, epoch, mode=cfg.summary_fold,
        spec=cfg.summary_spec,
    )
    manifest = sink.commit_epoch(
        lake_dir,
        epoch,
        reports,
        target,
        prev_manifest,
        extra={
            "wall_s": time.monotonic() - t0,
            "summary_file": summary_rel,
            # Pins the lake's partitioning so readers can key-prune:
            # pid = stable_hash(repo) % num_partitions (verify.lake_lookup).
            "num_partitions": cfg.num_partitions,
            # Pins the event-fold semantics (row vs column LWW): the
            # producer's contract for what a NULL payload column MEANS.
            # Resume adopts the pin — mixing modes mid-lake silently
            # changes every later fold's semantics.
            "update_mode": cfg.update_mode,
            "changelog_pos": int(changelog_pos if changelog_pos is not None else epoch),
            # Pins the summary metric spec (like P): resume and
            # maintenance commits fold with the lake's own spec.
            **({"summary_spec": cfg.summary_spec} if cfg.summary_spec else {}),
            # Pins the ingestion expectations (data-quality contract):
            # a stale-config resume must keep enforcing — or keep NOT
            # enforcing — exactly what the lake committed to.
            **(
                {"expectations": cfg.expectations} if cfg.expectations else {}
            ),
            # Carries the cumulative column-rename map forward
            # (maintain.rename_column pins it; every commit keeps it).
            **(
                {"column_renames": prev_manifest["column_renames"]}
                if prev_manifest and prev_manifest.get("column_renames")
                else {}
            ),
            # ... and the column-drop tombstones (maintain.drop_column).
            **(
                {"column_drops": prev_manifest["column_drops"]}
                if prev_manifest and prev_manifest.get("column_drops")
                else {}
            ),
        },
    )
    _write_lineage(lake_dir, epoch, reports)
    return manifest


def run_epoch(
    log,
    lake_dir: str,
    epoch: int,
    cfg: ReplayConfig,
    prev_manifest: dict | None,
    version: int | None = None,
) -> dict:
    """Run + commit one epoch serially; returns the committed manifest.
    ``version`` is the lake version to commit as (default: the changelog
    epoch itself — they diverge only after maintenance commits)."""
    t0 = time.monotonic()
    src = tailer.as_source(log)
    if prev_manifest is not None:
        # The lake's pinned partitioning and metric spec win over the
        # caller's config on EVERY commit path (this covers the txn and
        # replicate paths, which call run_epoch directly; the drain loop
        # in _replay_available adopts for itself) — a mismatched P folds
        # winners against the wrong partitions' bases.
        pinned = prev_manifest.get("num_partitions")
        if pinned and int(pinned) != cfg.num_partitions:
            cfg = _dc_replace(cfg, num_partitions=int(pinned))
        if prev_manifest.get("summary_spec") != cfg.summary_spec:
            cfg = _dc_replace(cfg, summary_spec=prev_manifest.get("summary_spec"))
        pin_um = prev_manifest.get("update_mode")
        if pin_um and pin_um != cfg.update_mode:
            cfg = _dc_replace(cfg, update_mode=pin_um)
        if prev_manifest.get("expectations") != cfg.expectations:
            cfg = _dc_replace(cfg, expectations=prev_manifest.get("expectations"))
    prev_schema = (
        sink.schema_from_b64(prev_manifest["schema_b64"]) if prev_manifest else None
    )
    renames = (prev_manifest or {}).get("column_renames")
    drops = (prev_manifest or {}).get("column_drops")
    target = negotiate(
        prev_schema,
        drop_schema(rename_schema(src.epoch_schema(epoch), renames), drops),
    )  # M11
    winners = build_winners(
        src, lake_dir, epoch, cfg, sink.schema_to_b64(target), renames, drops
    )
    v = version if version is not None else epoch
    return merge_and_commit(
        lake_dir, v, winners, target, cfg, prev_manifest, t0, changelog_pos=epoch
    )


def _write_lineage(lake_dir: str, epoch: int, reports: list[dict]) -> None:
    rows = {
        f.name: [int(r[f.name]) if f.type != pa.float64() else float(r[f.name]) for r in reports]
        for f in LINEAGE_SCHEMA
    }
    table = pa.table(rows, schema=LINEAGE_SCHEMA)
    path = os.path.join(sink.lake_paths(lake_dir)["lineage"], f"epoch-{epoch:05d}.parquet")
    pq.write_table(table, path)


def replay(
    log_dir,
    lake_dir: str,
    cfg: ReplayConfig | None = None,
    max_epoch: int | None = None,
    follow: bool = False,
    poll_s: float = 1.0,
    stop=None,
    idle_timeout_s: float | None = None,
) -> dict:
    """Replay all (or up to ``max_epoch``) epochs, resuming after the last
    committed one. Returns a summary dict. ``log_dir`` is a path (the
    sealed-epoch-directory protocol) or any pluggable changelog source
    exposing the tailer trio (tailer.as_source) — e.g.
    ``tailer.MemorySource`` for an in-process producer queue.

    ``follow=True`` turns the bounded replay into a continuous tail (the
    north-star binlog/WAL tailer): after draining the epochs present, the
    loop polls ``log_dir`` every ``poll_s`` seconds for newly sealed
    epochs and replays them as they appear, until ``stop``
    (a ``threading.Event``) is set or no new epoch has arrived for
    ``idle_timeout_s``. An epoch is *sealed* when its ``epoch=<k>``
    directory exists — writers must stage elsewhere and ``os.rename`` the
    directory in (atomic on POSIX), exactly how the follow tests and any
    real producer should publish. Exactly-once / resume semantics are
    untouched: each drain is the same idempotent manifest-gated loop.

    The schema chain target_k = negotiate(target_{k-1}, schema(epoch k))
    is computed driver-side from parquet footers, so the whole chain is
    known upfront and epoch k+1's winners can be prefetched while epoch
    k merges (see module docstring)."""
    cfg = cfg or ReplayConfig()
    src = tailer.as_source(log_dir)
    if follow:
        t0 = time.monotonic()
        ran_total: list[int] = []
        skipped0: list[int] | None = None
        events_total = 0
        last: dict = {}
        last_progress = time.monotonic()
        while not (stop is not None and stop.is_set()):
            out = _replay_available(src, lake_dir, cfg, max_epoch)
            ran_total += out["epochs_run"]
            events_total += out["events_applied"]
            if skipped0 is None:
                skipped0 = out["epochs_skipped"]
            if out["last_manifest"] is not None:
                last = out["last_manifest"]
            now = time.monotonic()
            if out["epochs_run"]:
                last_progress = now
            elif idle_timeout_s is not None and now - last_progress >= idle_timeout_s:
                break
            if stop is not None:
                stop.wait(poll_s)
            else:
                time.sleep(poll_s)
        return {
            "epochs_run": ran_total,
            "epochs_skipped": skipped0 or [],
            "events_applied": events_total,
            "wall_s": time.monotonic() - t0,
            "last_manifest": last or sink.read_manifest(lake_dir),
        }
    return _replay_available(src, lake_dir, cfg, max_epoch)


def state_asof(log_dir: str, out_lake: str, seq: int, cfg: ReplayConfig | None = None) -> dict:
    """Seq-granular point-in-time recovery: materialize the lake state
    AS OF an arbitrary changelog position ``seq`` (inclusive) into
    ``out_lake`` — finer than version time travel (which lands on epoch
    boundaries). One bounded replay of the log truncated at ``seq``:
    epochs entirely above the bound are pruned from parquet footer
    column statistics (no data pages), the boundary epoch contributes
    exactly its prefix, and everything downstream is the ordinary
    machinery — so the result is byte-identical to what a replay would
    have produced had the log stopped at ``seq`` (oracle-checked:
    q_cdc_asof_seq mirrors the bound as ``events_where seq <= S``).

    Ops story: "recover the table to just before the bad write at
    seq S" = ``state_asof(log, scratch, S - 1)`` + inspect/clone —
    the log, not the lake, is the source of truth."""
    return replay(tailer.SeqBoundSource(log_dir, seq), out_lake, cfg)


def _replay_available(
    src,
    lake_dir: str,
    cfg: ReplayConfig,
    max_epoch: int | None = None,
) -> dict:
    """One bounded drain: replay every currently sealed, not-yet-committed
    epoch in order."""
    sink.init_lake(lake_dir)
    epochs = src.available_epochs()
    if max_epoch is not None:
        epochs = [e for e in epochs if e <= max_epoch]
    manifest = sink.read_manifest(lake_dir)
    # The lake's partition layout is pinned in the committed manifest
    # (merge_and_commit writes it; maintain.repartition may change it).
    # A resume MUST fold new events at the pinned P — grouping winners by
    # a pid computed at a different P than the active file layout would
    # merge rows against the wrong partitions' bases (silent duplicate
    # keys across partitions). The manifest, not the caller's config, is
    # authoritative once the lake exists.
    pinned = manifest.get("num_partitions") if manifest else None
    if pinned and int(pinned) != cfg.num_partitions:
        cfg = _dc_replace(cfg, num_partitions=int(pinned))
    # Same rule for the summary metric spec: the lake's committed spec
    # (or its absence) wins — folding a previous summary with a
    # different metric set would be silently wrong.
    if manifest is not None and manifest.get("summary_spec") != cfg.summary_spec:
        cfg = _dc_replace(cfg, summary_spec=manifest.get("summary_spec"))
    # And the event-fold semantics (row vs column LWW) — a producer
    # contract, not a per-run tuning knob.
    pin_um = manifest.get("update_mode") if manifest else None
    if pin_um and pin_um != cfg.update_mode:
        cfg = _dc_replace(cfg, update_mode=pin_um)
    # And the ingestion expectations (data-quality contract) — enforced
    # or not per the lake's committed pin, never per the caller's mood.
    if manifest is not None and manifest.get("expectations") != cfg.expectations:
        cfg = _dc_replace(cfg, expectations=manifest.get("expectations"))
    ran, ran_versions, skipped = [], [], []
    t0 = time.monotonic()
    todo = []
    # C4 resume: epochs fold strictly in order, so anything at or below
    # the latest manifest's changelog position is done — even if that
    # epoch's own manifest was pruned by vacuum's retention policy
    # (re-running an old epoch against a newer base would corrupt the
    # lake). The position, not the version number, is authoritative:
    # maintenance commits (backfill/compact) advance versions without
    # consuming changelog epochs.
    last = sink.changelog_pos(manifest)
    for k in epochs:
        if last is not None and k <= last:
            skipped.append(k)
            continue
        todo.append(k)
    last_version = sink.last_committed_epoch(lake_dir)

    restore = _shuffle_ctx(cfg)
    try:
        # Negotiate the full schema chain upfront (footer metadata only).
        # The pinned column-rename map (maintain.rename_column) applies
        # to every incoming epoch: producers may still emit pre-rename
        # names after a lake-side ALTER.
        renames = manifest.get("column_renames") if manifest else None
        drops = manifest.get("column_drops") if manifest else None
        targets: dict[int, pa.Schema] = {}
        prev_schema = sink.schema_from_b64(manifest["schema_b64"]) if manifest else None
        for k in todo:
            prev_schema = negotiate(
                prev_schema,
                drop_schema(rename_schema(src.epoch_schema(k), renames), drops),
            )
            targets[k] = prev_schema

        def _prefetch(k: int):
            return build_winners(
                src, lake_dir, k, cfg, sink.schema_to_b64(targets[k]), renames, drops
            ).materialize()

        with ThreadPoolExecutor(max_workers=1) as pool:
            pending = None  # (epoch, Future)
            for i, k in enumerate(todo):
                tk = time.monotonic()
                if pending is not None and pending[0] == k:
                    winners = pending[1].result()
                else:
                    winners = build_winners(
                        src, lake_dir, k, cfg, sink.schema_to_b64(targets[k]),
                        renames, drops,
                    )
                pending = None
                if cfg.pipeline_epochs and i + 1 < len(todo):
                    nxt = todo[i + 1]
                    pending = (nxt, pool.submit(_prefetch, nxt))
                v = k if last_version is None else last_version + 1
                manifest = merge_and_commit(
                    lake_dir, v, winners, targets[k], cfg, manifest, tk,
                    changelog_pos=k,
                )
                last_version = v
                ran.append(k)
                ran_versions.append(v)
            if pending is not None:  # max_epoch edge: drop unused prefetch
                pending[1].cancel()
    finally:
        restore()

    events = sum(
        r["events_in"]
        for v in ran_versions
        for r in sink.read_manifest(lake_dir, v)["lineage"]
    )
    return {
        "epochs_run": ran,
        "epochs_skipped": skipped,
        "events_applied": events,
        "wall_s": time.monotonic() - t0,
        "last_manifest": manifest,
    }


def main(argv: list[str] | None = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description="CDC changelog replay into a lake")
    ap.add_argument("--log-dir", required=True)
    ap.add_argument("--lake-dir", required=True)
    ap.add_argument("--max-epoch", type=int, default=None)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--salts", type=int, default=4)
    ap.add_argument("--write-mode", choices=["rewrite", "delta"], default="rewrite")
    ap.add_argument(
        "--update-mode", choices=["row", "column"], default="row",
        help="column: partial patch updates — a U event's NULL column means unchanged",
    )
    ap.add_argument("--follow", action="store_true", help="tail the log for new epochs")
    ap.add_argument("--poll-s", type=float, default=1.0)
    ap.add_argument(
        "--idle-timeout-s", type=float, default=None,
        help="with --follow: exit after this long without a new epoch (default: run forever)",
    )
    ap.add_argument("--verify", action="store_true")
    args = ap.parse_args(argv)
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    cfg = ReplayConfig(
        num_partitions=args.partitions, num_salts=args.salts,
        write_mode=args.write_mode, update_mode=args.update_mode,
    )
    summary = replay(
        args.log_dir,
        args.lake_dir,
        cfg,
        args.max_epoch,
        follow=args.follow,
        poll_s=args.poll_s,
        idle_timeout_s=args.idle_timeout_s,
    )
    print(
        {
            k: summary[k]
            for k in ("epochs_run", "epochs_skipped", "events_applied", "wall_s")
        }
    )
    if args.verify:
        from engine.cdc.oracle import oracle_state_hash
        from engine.cdc.verify import state_hash

        eh = state_hash(args.lake_dir)
        oh = oracle_state_hash(args.log_dir, update_mode=args.update_mode)
        print({"engine_hash": eh, "oracle_hash": oh, "match": eh == oh})
        if eh != oh:
            raise SystemExit(1)
    ray.shutdown()


if __name__ == "__main__":
    main()
