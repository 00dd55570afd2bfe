"""Snapshot bootstrap (initial full load) and changefeed export (CDC-out).

Two lifecycle endpoints the replay loop itself doesn't cover:

- :func:`bootstrap` — the classic CDC onboarding path: load a FULL
  snapshot of the source (e.g. a consistent table export) into an empty
  lake as one committed epoch, then ``replay(log, lake)`` applies only
  the changelog epochs after it (the ordinary C4 resume logic skips
  everything at or below the bootstrap epoch). The snapshot flows
  through the standard epoch machinery — prepare → (pid) exchange →
  merge-apply → two-phase manifest commit — as a streaming Dataset via
  :class:`engine.cdc.tailer.DatasetSource`, so a 100-TB initial load
  streams and shuffles exactly like a huge epoch; nothing is pulled to
  the driver.

- :func:`changefeed` — the inverse: export the delta between two
  committed lake epochs as insert/update/delete change events (the
  downstream changelog, à la Delta Lake's change data feed). Both
  epochs' states are partitioned by the SAME ``pid = hash(repo) % P``
  (P is pinned in the manifest), so the diff is computed per partition
  with ZERO shuffle: one task per pid merge-on-reads both epochs' file
  lists and diffs locally. Round-trip contract (tested): applying the
  feed onto the older state reproduces the newer state byte-identically
  (same canonical state hash, including per-row winning ``seq``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from engine.cdc import sink, tailer
from engine.cdc.replay import ReplayConfig, run_epoch
from engine.cdc.schema import conform_table
from engine.schemas import META_COLS


def _event_schema_for(payload_schema: pa.Schema) -> pa.Schema:
    """Event schema (seq, op, payload…) from a payload or lake schema —
    meta and computed columns (content_sha256) never ride in events."""
    skip = set(META_COLS) | {"content_sha256"}
    fields = [pa.field("seq", pa.int64()), pa.field("op", pa.string())]
    fields += [payload_schema.field(n) for n in payload_schema.names if n not in skip]
    return pa.schema(fields)


def bootstrap(
    snapshot: "rd.Dataset | pa.Table",
    lake_dir: str,
    cfg: ReplayConfig | None = None,
    epoch: int = 0,
    schema: pa.Schema | None = None,
    base_seq: int = -1,
) -> dict:
    """Load a full snapshot into an empty lake as committed ``epoch``.

    ``snapshot`` holds the lake payload columns (e.g. repo, path, commit,
    lang, content). An optional ``seq`` column is honored (re-seeding
    from another lake's state keeps each row's winning seq, so later
    changelog events LWW against it exactly); absent, every row gets the
    constant ``base_seq`` — sound because a snapshot is key-unique by
    definition (one row per (repo, path)), so no LWW tie can arise, and
    the default -1 ranks below changelog seqs (which start at 0). A
    ``content_sha256`` column, if present (lake re-seed), is dropped —
    the merge stage recomputes it from ``content``.

    Idempotent: if ``epoch`` is already committed the call is a no-op
    returning the existing manifest. After bootstrapping at epoch B,
    ``replay(log, lake)`` skips changelog epochs ≤ B and applies the
    rest — the snapshot must have been taken at that changelog position
    (the producer's responsibility, as with any CDC initial load).
    """
    cfg = cfg or ReplayConfig()
    sink.init_lake(lake_dir)
    if sink.is_committed(lake_dir, epoch):
        return sink.read_manifest(lake_dir, epoch)
    last = sink.last_committed_epoch(lake_dir)
    if last is not None:
        raise RuntimeError(
            f"bootstrap requires an empty lake (epoch {last} already committed "
            f"under {lake_dir})"
        )

    if isinstance(snapshot, pa.Table):
        if schema is None:
            schema = snapshot.schema
        snapshot = rd.from_arrow(snapshot)
    if schema is None:
        # Sound only for materialized / read-rooted datasets; a lazy map
        # chain should pass schema= explicitly (CLAUDE.md: schema() on a
        # lazy chain executes the upstream plan).
        s = snapshot.schema()
        schema = pa.schema([pa.field(n, t) for n, t in zip(s.names, s.types)])
    drop = [c for c in ("content_sha256", "op") if c in schema.names]
    event_schema = _event_schema_for(schema)

    def _to_events(t: pa.Table) -> pa.Table:
        t = t.drop_columns([c for c in drop if c in t.column_names])
        if "seq" not in t.column_names:
            t = t.append_column(
                "seq", pa.array(np.full(t.num_rows, base_seq, dtype=np.int64))
            )
        t = t.append_column("op", pa.nulls(t.num_rows, pa.string()).fill_null("I"))
        return conform_table(t, event_schema)

    events = snapshot.map_batches(_to_events, batch_format="pyarrow")
    src = tailer.DatasetSource(epoch, events, event_schema)
    return run_epoch(src, lake_dir, epoch, cfg, prev_manifest=None)


def replicate(
    src_lake: str,
    dst_lake: str,
    cfg: ReplayConfig | None = None,
    to_epoch: int | None = None,
) -> dict:
    """Catch a replica lake up to a source lake (CDC-out consumption):
    an empty replica is bootstrapped from the source's target state in
    one shot; an existing replica applies ``changefeed(src, from=replica
    position, to=target)`` as its next epoch. Idempotent — a caught-up
    replica is a no-op. The replica's own version numbers track its
    replication steps (it records the SOURCE version it mirrors as its
    ``changelog_pos``), and its state hash equals the source's at the
    mirrored version after every call (tested)."""
    cfg = cfg or ReplayConfig()
    target = sink.read_manifest(src_lake, to_epoch)
    if target is None:
        raise FileNotFoundError(f"no committed manifest under {src_lake}")
    target_v = int(target["epoch"])
    dst_m = sink.read_manifest(dst_lake)
    at = sink.changelog_pos(dst_m)
    if at is not None and at >= target_v:
        return {"applied": 0, "at_version": at}
    if dst_m is None:
        from engine.cdc.verify import read_lake
        from engine.schemas import lake_schema_for

        snap = read_lake(src_lake, epoch=target_v)  # streams, never pulled
        schema = lake_schema_for(sink.schema_from_b64(target["schema_b64"]))
        m = bootstrap(snap, dst_lake, cfg, epoch=target_v, schema=schema)
        return {
            "applied": int(m["totals"]["events_in"]),
            "at_version": target_v,
            "bootstrapped": True,
        }
    # DDL replication: the feed's events use the source's CURRENT column
    # names; replay any rename the source committed (its cumulative
    # column_renames pin) onto the replica FIRST — otherwise negotiate
    # would treat the renamed column as a new additive one.
    src_renames = target.get("column_renames") or {}
    if src_renames:
        from engine.cdc.maintain import rename_column

        dst_schema = sink.schema_from_b64(dst_m["schema_b64"])
        for old_name, new_name in src_renames.items():
            if old_name in dst_schema.names and new_name not in dst_schema.names:
                rename_column(dst_lake, old_name, new_name)
                dst_m = sink.read_manifest(dst_lake)
                dst_schema = sink.schema_from_b64(dst_m["schema_b64"])
    # ... and any drop (the source's cumulative column_drops tombstones),
    # after renames — tombstones store post-rename names.
    src_drops = target.get("column_drops") or []
    if src_drops:
        from engine.cdc.maintain import drop_column

        dst_schema = sink.schema_from_b64(dst_m["schema_b64"])
        for name in src_drops:
            if name in dst_schema.names:
                drop_column(dst_lake, name)
                dst_m = sink.read_manifest(dst_lake)
                dst_schema = sink.schema_from_b64(dst_m["schema_b64"])
    cf = changefeed(src_lake, from_epoch=at, to_epoch=target_v)
    # The feed STREAMS into the ordinary epoch machinery — never pulled
    # to the driver (a busy interval's delta can be arbitrarily large).
    # Its schema is known without executing the lazy chain.
    from engine.schemas import lake_schema_for

    ev_schema = _event_schema_for(
        lake_schema_for(sink.schema_from_b64(target["schema_b64"]))
    )
    next_v = int(dst_m["epoch"]) + 1
    src_tail = tailer.DatasetSource(target_v, cf, ev_schema)
    m = run_epoch(src_tail, dst_lake, target_v, cfg, dst_m, version=next_v)
    return {
        "applied": int(m["totals"]["events_in"]),
        "at_version": target_v,
    }


def changefeed(
    lake_dir: str, from_epoch: int, to_epoch: int | None = None
) -> rd.Dataset:
    """Change events that transform committed state ``from_epoch`` into
    committed state ``to_epoch`` (default: latest). One I/U/D event per
    changed key; I/U carry the new row's full payload AND its winning
    ``seq`` (so applying the feed reproduces the target state's seq
    column byte-exactly); D events carry the key with null payload and
    ``old seq + 1`` (any seq above the old row's wins the delete — per-key
    LWW needs no global uniqueness inside one feed).

    A row counts as changed iff its winning ``seq`` differs — seqs are
    unique per key and monotone under LWW, so equal seq ⇔ identical row
    (in patch mode a no-op patch may bump seq and emit a redundant U;
    harmless, the round-trip stays exact). Zero-shuffle when both epochs
    share the manifest-pinned partitioning (each pid diffs locally);
    across a repartition boundary the old state is re-keyed to the new
    layout through one exchange first (_changefeed_rekeyed).
    """
    from engine.cdc.merge import live_view
    from engine.cdc.verify import lake_files

    parts_old, schema_old = lake_files(lake_dir, from_epoch)
    parts_new, schema_new = lake_files(lake_dir, to_epoch)
    m_old = sink.read_manifest(lake_dir, from_epoch)
    m_new = sink.read_manifest(lake_dir, to_epoch)
    # Additive evolution: conform the old state to the new lake schema
    # (backfilled columns are null on both sides for untouched rows).
    event_schema = _event_schema_for(schema_new)
    if m_old.get("num_partitions") != m_new.get("num_partitions"):
        # A repartition (maintain.repartition) lies between the two
        # versions: per-pid local diffs would pair DIFFERENT key sets.
        # Fall back to one explicit exchange: re-key the OLD state to the
        # NEW layout, then diff each new partition locally as usual.
        return _changefeed_rekeyed(
            lake_dir, from_epoch, to_epoch, parts_new, schema_new,
            event_schema, int(m_new["num_partitions"]),
            renames=m_new.get("column_renames"),
            drops=m_new.get("column_drops"),
        )
    pids = sorted(set(parts_old) | set(parts_new))
    if not pids:
        return rd.from_arrow(event_schema.empty_table())
    items = [
        {"old": list(parts_old.get(p, [])), "new": list(parts_new.get(p, []))}
        for p in pids
    ]
    # Align the OLD state across any rename/drop boundary (the new
    # manifest's cumulative pins) before conforming.
    renames = m_new.get("column_renames")
    drops = m_new.get("column_drops")

    def _diff(batch: pa.Table) -> pa.Table:
        from engine.cdc.schema import drop_table, rename_table

        out = []
        for old_rels, new_rels in zip(
            batch.column("old").to_pylist(), batch.column("new").to_pylist()
        ):
            old = conform_table(
                drop_table(
                    rename_table(live_view(lake_dir, old_rels, schema_old), renames),
                    drops,
                ),
                schema_new,
            )
            new = live_view(lake_dir, new_rels, schema_new)
            out.append(_diff_tables(old, new, schema_new, event_schema))
        return (
            pa.concat_tables(out) if out else event_schema.empty_table()
        )

    return rd.from_items(items).map_batches(
        _diff, batch_format="pyarrow", batch_size=1
    )


def _diff_tables(
    old: pa.Table, new: pa.Table, schema_new: pa.Schema, event_schema: pa.Schema
) -> pa.Table:
    """I/U/D events turning ``old`` into ``new`` (both in the new lake
    schema, covering the same key range). A row is changed when its
    winning ``seq`` differs (the replay case: seqs are unique per key
    and monotone under LWW) OR any payload value differs at EQUAL seq —
    maintenance commits (backfill) rewrite row contents without
    consuming changelog events, so seq alone under-detects across a
    maintenance boundary (a replica following through a backfill missed
    the backfilled values; found by the lifecycle tour). Applying an
    equal-seq U is exact: the merge replaces the base row for every
    touched key regardless of seq ties."""
    import pandas as pd
    import pyarrow.compute as pc

    okey = pd.MultiIndex.from_arrays(
        [old.column("repo").to_pandas(), old.column("path").to_pandas()]
    )
    nkey = pd.MultiIndex.from_arrays(
        [new.column("repo").to_pandas(), new.column("path").to_pandas()]
    )
    oseq = pd.Series(old.column("seq").to_pandas().to_numpy(), index=okey)
    nseq = pd.Series(new.column("seq").to_pandas().to_numpy(), index=nkey)
    aligned_old = oseq.reindex(nkey)
    is_ins = aligned_old.isna().to_numpy()
    is_upd = (~is_ins) & (aligned_old.to_numpy() != nseq.to_numpy())
    # Value-compare the seq-equal matches (null-safe, vectorized Arrow).
    same_seq = (~is_ins) & ~is_upd
    if same_seq.any():
        pos = okey.get_indexer(nkey)  # unique keys per side
        idx = pa.array(np.where(same_seq, pos, 0).astype(np.int64))
        differ = np.zeros(new.num_rows, dtype=bool)
        for name in schema_new.names:
            if name in ("repo", "path", "seq"):
                continue
            a = pc.take(old.column(name).combine_chunks(), idx)
            b = new.column(name)
            try:
                neq = pc.fill_null(pc.not_equal(a, b), False)
            except pa.lib.ArrowNotImplementedError:
                # No compare kernel for this type (e.g. a list column):
                # fall back to null-mismatch only — same gating rule as
                # file_stats (a missed equal-seq value rewrite for such
                # a column is the pre-r4 seq-only behavior, never a crash).
                neq = pa.array(np.zeros(new.num_rows, dtype=bool))
            null_mm = pc.xor(pc.is_null(a), pc.is_null(b))
            differ |= pc.or_(neq, null_mm).to_numpy(zero_copy_only=False)
        is_upd = is_upd | (same_seq & differ)
    gone = ~np.asarray(okey.isin(nkey), dtype=bool)

    payload_names = [n for n in schema_new.names if n != "content_sha256"]
    changed = new.select(payload_names).filter(pa.array(is_ins | is_upd))
    op = np.where(is_ins[is_ins | is_upd], "I", "U")
    ev = changed.append_column("op", pa.array(op, type=pa.string()))

    out = []
    dels = old.filter(pa.array(gone))
    if dels.num_rows:
        dcols = {
            "repo": dels.column("repo"),
            "path": dels.column("path"),
            "seq": pa.array(
                dels.column("seq").to_pandas().to_numpy() + 1,
                type=pa.int64(),
            ),
        }
        dtab = pa.table(dcols)
        for n in payload_names:
            if n not in dtab.column_names:
                dtab = dtab.append_column(
                    n, pa.nulls(dtab.num_rows, schema_new.field(n).type)
                )
        dtab = dtab.append_column(
            "op", pa.nulls(dtab.num_rows, pa.string()).fill_null("D")
        )
        out.append(conform_table(dtab, event_schema))
    out.append(conform_table(ev, event_schema))
    return pa.concat_tables(out)


def _changefeed_rekeyed(
    lake_dir: str,
    from_epoch: int,
    to_epoch: int | None,
    parts_new: dict,
    schema_new: pa.Schema,
    event_schema: pa.Schema,
    num_partitions: int,
    renames: dict | None = None,
    drops: list | None = None,
) -> rd.Dataset:
    """Changefeed across a repartition boundary: stream the OLD state
    through one groupby(pid) exchange keyed at the NEW layout, then diff
    each new partition against its local files. A marker row per new
    partition guarantees insert-only partitions (no old rows hash there)
    still form a group. The old state crosses the exchange once — the
    price of a one-off layout migration; same-layout feeds stay
    zero-shuffle."""
    from engine.cdc.merge import live_view
    from engine.cdc.verify import read_lake
    from engine.util.hashing import stable_hash_column

    aug = pa.schema(
        list(schema_new) + [pa.field("pid", pa.int64()), pa.field("__m", pa.int8())]
    )

    def _key(t: pa.Table) -> pa.Table:
        from engine.cdc.schema import drop_table, rename_table

        t = conform_table(drop_table(rename_table(t, renames), drops), schema_new)
        pid = stable_hash_column(t.column("repo"), num_partitions)
        t = t.append_column("pid", pa.array(pid, type=pa.int64()))
        return t.append_column("__m", pa.nulls(t.num_rows, pa.int8()).fill_null(0))

    old_keyed = read_lake(lake_dir, epoch=from_epoch).map_batches(
        _key, batch_format="pyarrow"
    )
    markers = pa.table(
        {
            **{
                f.name: pa.nulls(len(parts_new), f.type)
                for f in schema_new
            },
            "pid": pa.array(sorted(parts_new), type=pa.int64()),
            "__m": pa.array([1] * len(parts_new), type=pa.int8()),
        },
        schema=aug,
    )
    both = old_keyed.union(rd.from_arrow(markers))

    def _diff_group(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        pid = int(group.column("pid")[0].as_py())
        old = group.filter(
            pc.equal(group.column("__m"), 0)
        ).drop_columns(["pid", "__m"])
        new = live_view(lake_dir, list(parts_new.get(pid, [])), schema_new)
        return _diff_tables(old, new, schema_new, event_schema)

    return both.groupby("pid").map_groups(_diff_group, batch_format="pyarrow")
