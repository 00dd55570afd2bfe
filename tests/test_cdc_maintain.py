"""Maintenance commits (engine/cdc/maintain.py): backfill + compact as
interleaved lake versions, and the version/changelog_pos decoupling that
keeps replay resume exact across them."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from engine.cdc import sink
from engine.cdc.maintain import backfill, compact
from engine.cdc.replay import ReplayConfig, replay
from engine.cdc.synth import SynthConfig, synth_changelog
from engine.cdc.verify import canonical_digest, lake_table, state_hash

CFG = dict(num_partitions=8, num_salts=2)


def _log(tmp, sf_dir, name="log", **kw):
    return synth_changelog(
        sf_dir, f"{tmp}/{name}",
        SynthConfig(seed=21, n_events=3000, n_epochs=3, n_keys=600, **kw),
    )


def test_backfill_new_column_and_replay_resume(tmp_path, sf_dir):
    log = _log(tmp_path, sf_dir)
    lake, lake_ref = f"{tmp_path}/lake", f"{tmp_path}/lake_ref"
    replay(log, lake_ref, ReplayConfig(**CFG))  # uninterrupted reference
    replay(log, lake, ReplayConfig(**CFG), max_epoch=1)
    h_before = canonical_digest(lake_table(lake))

    m = backfill(
        lake, "n_chars",
        lambda t: pc.utf8_length(t.column("content")).cast(pa.int64()),
        dtype=pa.int64(),
    )
    # Version advanced, changelog position did not.
    assert m["epoch"] == 2 and sink.changelog_pos(m) == 1
    assert m["maintenance"] == "backfill:n_chars"
    t = lake_table(lake)
    assert t.column("n_chars").to_pylist() == pc.utf8_length(
        t.column("content")
    ).cast(pa.int64()).to_pylist()
    # Everything except the new column is untouched.
    assert canonical_digest(t, exclude=("content", "n_chars")) == h_before

    # Resume must apply changelog epoch 2 (as version 3), NOT skip it
    # because version 2 is committed.
    out = replay(log, lake, ReplayConfig(**CFG))
    assert out["epochs_run"] == [2] and out["epochs_skipped"] == [0, 1]
    assert sink.last_committed_epoch(lake) == 3
    assert sink.changelog_pos(sink.read_manifest(lake)) == 2
    final = lake_table(lake)
    assert canonical_digest(final, exclude=("content", "n_chars")) == state_hash(
        lake_ref
    )
    # Backfill-as-null evolution semantics: rows rewritten by epoch-2
    # events carry null (their events had no n_chars); untouched rows
    # keep the backfilled value, which still matches their content.
    n = final.column("n_chars")
    filled = final.filter(pc.is_valid(n))
    assert 0 < filled.num_rows < final.num_rows
    assert filled.column("n_chars").to_pylist() == pc.utf8_length(
        filled.column("content")
    ).cast(pa.int64()).to_pylist()


def test_backfill_existing_column_values(tmp_path, sf_dir):
    log = _log(tmp_path, sf_dir, name="log_e")
    lake = f"{tmp_path}/lake_e"
    replay(log, lake, ReplayConfig(**CFG))
    h_before = canonical_digest(lake_table(lake), exclude=("content", "lang"))
    backfill(lake, "lang", lambda t: pc.utf8_upper(t.column("lang")))
    t = lake_table(lake)
    assert canonical_digest(t, exclude=("content", "lang")) == h_before
    langs = [v for v in t.column("lang").to_pylist() if v is not None]
    assert langs and all(v == v.upper() for v in langs)


def test_backfill_requires_dtype_and_rejects_managed(tmp_path, sf_dir):
    log = _log(tmp_path, sf_dir, name="log_g")
    lake = f"{tmp_path}/lake_g"
    replay(log, lake, ReplayConfig(**CFG), max_epoch=0)
    with pytest.raises(ValueError, match="requires dtype"):
        backfill(lake, "brand_new", lambda t: t.column("seq"))
    with pytest.raises(ValueError, match="engine-managed"):
        backfill(lake, "seq", lambda t: t.column("seq"))


def test_compact_is_byte_identical_and_resets_lsm(tmp_path, sf_dir):
    log = _log(tmp_path, sf_dir, name="log_c")
    lake = f"{tmp_path}/lake_c"
    # Delta mode with a high threshold so deltas pile up uncompacted.
    replay(log, lake, ReplayConfig(write_mode="delta", compact_files=10, **CFG))
    before = sink.active_files(sink.read_manifest(lake))
    assert any(len(rels) > 1 for rels in before.values())
    h = state_hash(lake)
    v_prev = sink.last_committed_epoch(lake)

    m = compact(lake)
    assert m["maintenance"] == "compact" and m["epoch"] == v_prev + 1
    after = sink.active_files(m)
    assert set(after) == set(before)
    assert all(len(rels) == 1 for rels in after.values())
    assert state_hash(lake) == h
    # Time travel to the pre-compact version still works.
    assert state_hash(lake, epoch=v_prev) == h
    # And a second compact is a version bump with zero rewrites.
    m2 = compact(lake)
    assert sink.active_files(m2) == after


def test_purge_removes_rows_and_keeps_summary_exact(tmp_path, sf_dir):
    from engine.cdc.maintain import purge
    from engine.cdc.summary import read_summary, recompute_summary

    log = _log(tmp_path, sf_dir, name="log_p")
    lake = f"{tmp_path}/lake_p"
    replay(log, lake, ReplayConfig(**CFG))
    t0 = lake_table(lake)
    victim = t0.column("repo")[0].as_py()
    n_victim = pc.sum(
        pc.cast(pc.equal(t0.column("repo"), victim), pa.int64())
    ).as_py()
    assert n_victim > 0
    h_keep = canonical_digest(
        t0.filter(pc.invert(pc.equal(t0.column("repo"), victim)))
    )

    m = purge(lake, lambda t: pc.equal(t.column("repo"), victim))
    assert m["maintenance"] == "purge"
    assert sum(r["deletes"] for r in m["lineage"]) == n_victim
    t1 = lake_table(lake)
    assert pc.sum(
        pc.cast(pc.equal(t1.column("repo"), victim), pa.int64())
    ).as_py() in (0, None)
    assert canonical_digest(t1) == h_keep  # survivors byte-identical
    # Incremental summary folded with the negative deltas == recompute.
    assert read_summary(lake).equals(recompute_summary(lake))
    assert victim not in read_summary(lake).column("repo").to_pylist()
    # Replay after the purge is a no-op (changelog fully consumed).
    out = replay(log, lake, ReplayConfig(**CFG))
    assert out["epochs_run"] == []


def test_purge_can_empty_partitions(tmp_path, sf_dir):
    from engine.cdc.maintain import purge

    log = _log(tmp_path, sf_dir, name="log_pe")
    lake = f"{tmp_path}/lake_pe"
    replay(log, lake, ReplayConfig(**CFG))
    m = purge(lake, lambda t: pa.array([True] * t.num_rows))
    assert sink.active_files(m) == {}
    assert lake_table(lake).num_rows == 0


def test_metrics_surface_spans_replay_and_maintenance(tmp_path, sf_dir):
    from engine.cdc.metrics import (
        consistency_check,
        epoch_metrics,
        partition_metrics,
    )

    log = _log(tmp_path, sf_dir, name="log_m")
    lake = f"{tmp_path}/lake_m"
    replay(log, lake, ReplayConfig(**CFG), max_epoch=1)
    backfill(lake, "lang", lambda t: pc.utf8_upper(t.column("lang")))
    replay(log, lake, ReplayConfig(**CFG))
    m = epoch_metrics(lake)
    assert m.column("version").to_pylist() == [0, 1, 2, 3]
    assert m.column("changelog_pos").to_pylist() == [0, 1, 1, 2]
    assert m.column("maintenance").to_pylist() == [None, None, "backfill:lang", None]
    ev = m.column("events_in").to_pylist()
    assert ev[0] > 0 and ev[2] == 0 and ev[3] > 0
    chk = consistency_check(lake)
    assert chk["versions_checked"] == 4 and chk["mismatches"] == []
    lin = partition_metrics(lake, version=3)
    assert lin.num_rows > 0
    assert sum(lin.column("events_in").to_pylist()) == ev[3]


def test_vacuum_after_maintenance_keeps_resume_exact(tmp_path, sf_dir):
    # Retention may prune every pre-maintenance manifest; resume must
    # still skip the already-folded changelog epochs (changelog_pos rides
    # the retained latest manifest) and apply only the new one.
    from engine.cdc.vacuum import vacuum

    log = _log(tmp_path, sf_dir, name="log_v")
    lake, ref = f"{tmp_path}/lake_v", f"{tmp_path}/lake_vref"
    replay(log, ref, ReplayConfig(**CFG))
    replay(log, lake, ReplayConfig(**CFG), max_epoch=1)
    backfill(lake, "lang", lambda t: pc.utf8_upper(t.column("lang")))
    rep = vacuum(lake, retain_last=1)
    assert rep["removed_manifests"] == [0, 1]  # only the backfill version survives
    out = replay(log, lake, ReplayConfig(**CFG))
    assert out["epochs_run"] == [2] and out["epochs_skipped"] == [0, 1]
    assert canonical_digest(lake_table(lake), exclude=("content", "lang")) == \
        canonical_digest(lake_table(ref), exclude=("content", "lang"))


def test_replay_continues_after_compact_in_delta_mode(tmp_path, sf_dir):
    log = _log(tmp_path, sf_dir, name="log_d")
    lake, lake_ref = f"{tmp_path}/lake_d", f"{tmp_path}/lake_dref"
    cfg = ReplayConfig(write_mode="delta", compact_files=10, **CFG)
    replay(log, lake_ref, cfg)
    replay(log, lake, cfg, max_epoch=1)
    compact(lake)
    out = replay(log, lake, cfg)
    assert out["epochs_run"] == [2]
    assert state_hash(lake) == state_hash(lake_ref)


def test_maintenance_loses_version_race_then_rebases(tmp_path, sf_dir):
    """A replay commits the next version between a compact's manifest
    read and its commit: the compact gets CommitConflict (no silent
    clobber), and retry_on_conflict reruns it against the winner's
    manifest — final state byte-identical, both commits in the chain."""
    from engine.cdc.maintain import retry_on_conflict

    log = _log(tmp_path, sf_dir, name="log_race")
    lake = f"{tmp_path}/lake_race"
    # Delta mode so compact has real work (multi-file partitions).
    cfg = ReplayConfig(num_partitions=8, num_salts=2, write_mode="delta")
    replay(log, lake, cfg, max_epoch=1)

    calls = {"n": 0}
    orig = sink.commit_epoch

    def race_once(*a, **k):
        if calls["n"] == 0:
            calls["n"] += 1
            sink.commit_epoch = orig
            replay(log, lake, cfg)  # the replay wins the version
            sink.commit_epoch = race_once
        return orig(*a, **k)

    from engine.cdc import maintain

    sink.commit_epoch = race_once
    maintain.sink.commit_epoch = race_once
    try:
        # Attempt 1 loses the race (CommitConflict), attempt 2 rebases.
        m = retry_on_conflict(lambda: compact(lake))
    finally:
        sink.commit_epoch = orig
        maintain.sink.commit_epoch = orig

    assert calls["n"] == 1  # the race really happened
    assert m["maintenance"] == "compact"
    ref = f"{tmp_path}/lake_race_ref"
    replay(log, ref, cfg)
    assert state_hash(lake) == state_hash(ref)
    # Every partition is back to one file post-compact.
    assert all(len(v) == 1 for v in sink.active_files(m).values())


def test_maintenance_carries_update_mode_pin(tmp_path, sf_dir):
    """ADVICE r4 (high): a compact/backfill on a column-mode (patch) lake
    must carry the update_mode pin forward — a resume after maintenance
    with the caller's default row-mode config would otherwise re-pin
    'row' and silently change what a NULL payload column means."""
    from engine.cdc.oracle import oracle_state_hash

    log = synth_changelog(
        sf_dir, f"{tmp_path}/log_ump",
        SynthConfig(seed=33, n_events=2500, n_epochs=3, n_keys=500,
                    op_mix=(30, 60, 10), patch_null_frac=0.5),
    )
    lake = f"{tmp_path}/lake_ump"
    replay(log, lake, ReplayConfig(**CFG, update_mode="column",
                                   write_mode="delta", compact_files=8),
           max_epoch=1)
    compact(lake)
    assert sink.read_manifest(lake)["update_mode"] == "column"
    # Resume with the DEFAULT (row-mode) config: the pin must win.
    replay(log, lake, ReplayConfig(**CFG))
    assert sink.read_manifest(lake)["update_mode"] == "column"
    assert state_hash(lake) == oracle_state_hash(log, update_mode="column")


def test_lake_history_audit_log(tmp_path, sf_dir):
    """lake_history (DESCRIBE HISTORY) reads the version chain straight
    off the committed manifests: kinds in operation order, changelog_pos
    advancing only on replay versions, pins visible, per-version lineage
    totals consistent, and the CLI prints one JSON line per version."""
    import json as _json

    from engine.cdc.maintain import drop_column, main as maintain_cli, rename_column, repartition
    from engine.cdc.verify import lake_history

    log = synth_changelog(
        sf_dir, f"{tmp_path}/log_hist",
        SynthConfig(seed=7, n_events=1800, n_epochs=2, n_keys=400),
    )
    lake = f"{tmp_path}/lake_hist"
    replay(log, lake, ReplayConfig(**CFG), max_epoch=0)
    compact(lake)
    rename_column(lake, "lang", "language")
    drop_column(lake, "language")
    replay(log, lake, ReplayConfig(**CFG))  # epoch 1 resumes after DDL
    repartition(lake, 4)
    from engine.cdc.maintain import cluster_by, set_expectations

    set_expectations(lake, [{"col": "content", "rule": "not_null"}])
    cluster_by(lake, ["seq"], num_files=2)
    h = lake_history(lake).to_pylist()
    assert [r["kind"] for r in h] == [
        "replay", "compact", "rename:lang>language", "drop:language",
        "replay", "repartition:4", "expectations:1", "cluster:seq",
    ]
    assert [r["version"] for r in h] == list(range(8))
    assert [r["changelog_pos"] for r in h] == [0, 0, 0, 0, 1, 1, 1, 1]
    assert h[-1]["num_partitions"] == 4
    assert all(r["update_mode"] == "row" for r in h)
    # The expectations pin appears in the audit log from its DDL version
    # on (and cluster_by carries it forward).
    assert [r["n_expectations"] for r in h] == [0, 0, 0, 0, 0, 0, 1, 1]
    # The drop version really shrank the schema by one column.
    assert h[3]["n_columns"] == h[2]["n_columns"] - 1
    # Replay versions carry events; pure-maintenance versions don't.
    assert h[0]["events_in"] > 0 and h[4]["events_in"] > 0
    assert h[1]["events_in"] == h[2]["events_in"] == h[3]["events_in"] == 0
    # compact is a no-op version here (rewrite mode leaves one file per
    # partition), so it touches nothing; every other version writes rows.
    assert h[1]["partitions_touched"] == 0
    assert all(r["rows_out"] > 0 for r in h if r["partitions_touched"] > 0)
    assert {r["kind"] for r in h if r["partitions_touched"] > 0} == {
        "replay", "rename:lang>language", "drop:language", "repartition:4",
        "cluster:seq",
    }
    # CLI twin: one JSON line per version (metadata-only, no Ray).
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        maintain_cli(["--lake-dir", lake, "history"])
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(lines) == 8
    assert _json.loads(lines[-1])["kind"] == "cluster:seq"


def test_fsck_clean_and_corruptions(tmp_path, sf_dir):
    """fsck passes a healthy lake (incl. after cluster_by's multi-base
    split and a delta-mode replay), then detects: a missing data file, a
    zone map that no longer contains the file's values, and a manifest
    whose changelog position regressed. The delta-mode lake yields zero
    seq-layering warnings (deltas genuinely layer above bases)."""
    import json
    import os

    from engine.cdc.replay import ReplayConfig, replay
    from engine.cdc.synth import SynthConfig, synth_changelog
    from engine.cdc.verify import fsck
    from engine.cdc import sink as sink_mod

    log = synth_changelog(
        sf_dir, f"{tmp_path}/log_fsck",
        SynthConfig(seed=55, n_events=3000, n_epochs=3, n_keys=600),
    )
    lake = f"{tmp_path}/lake_fsck"
    replay(log, lake, ReplayConfig(num_partitions=8, num_salts=2, write_mode="delta"))
    rep = fsck(lake)
    assert rep["ok"] and not rep["errors"] and not rep["warnings"]
    assert rep["checked"]["files"] > 8 and rep["checked"]["zone_map_entries"] > 0
    assert rep["checked"]["lsm_seq_pairs"] > 0  # deltas actually checked

    deep = fsck(lake, deep=True)
    assert deep["ok"]

    # corruption 1: delete one active data file
    m = sink_mod.read_manifest(lake)
    rel = next(iter(sink_mod.active_files(m).values()))[0]
    os.rename(os.path.join(lake, rel), os.path.join(lake, rel) + ".hidden")
    rep = fsck(lake)
    assert not rep["ok"] and any("missing/empty" in e for e in rep["errors"])
    os.rename(os.path.join(lake, rel) + ".hidden", os.path.join(lake, rel))

    # corruption 2: narrow a zone map below the file's actual range
    mpath = os.path.join(lake, sink_mod.MANIFEST_DIR,
                         f"epoch-{m['epoch']:05d}.json")
    raw = json.load(open(mpath))
    narrowed = False
    for r, st in raw.get("file_stats", {}).items():
        if "seq" in st:
            st["seq"] = [st["seq"][0], st["seq"][0]]  # hi := lo
            narrowed = True
            break
    assert narrowed
    os.chmod(mpath, 0o644)
    json.dump(raw, open(mpath, "w"))
    rep = fsck(lake)
    assert not rep["ok"] and any("zone map" in e for e in rep["errors"])

    # corruption 3: regress the head manifest's changelog position
    raw["changelog_pos"] = -1
    json.dump(raw, open(mpath, "w"))
    rep = fsck(lake)
    assert any("regressed" in e for e in rep["errors"])


def test_export_snapshot_resumable_and_exact(tmp_path, sf_dir):
    """export_snapshot writes the exact live state as plain partitioned
    parquet (readable without the manifest), skips already-written
    partitions on re-run (crash resume), and honors epoch pinning."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.cdc.replay import ReplayConfig, replay
    from engine.cdc.synth import SynthConfig, synth_changelog
    from engine.cdc.verify import canonical_digest, export_snapshot, lake_table

    log = synth_changelog(
        sf_dir, f"{tmp_path}/log_exp",
        SynthConfig(seed=91, n_events=3000, n_epochs=2, n_keys=600),
    )
    lake = f"{tmp_path}/lake_exp"
    replay(log, lake, ReplayConfig(num_partitions=8, num_salts=2))

    dst = f"{tmp_path}/export"
    rep = export_snapshot(lake, dst)
    assert rep["written"] == rep["partitions"] and rep["skipped"] == 0

    got = pq.read_table(dst).drop_columns(["part"]) if "part" in pq.read_table(dst).column_names else pq.read_table(dst)
    want = lake_table(lake)
    got = got.select(want.column_names).sort_by(
        [("repo", "ascending"), ("path", "ascending")]
    )
    assert canonical_digest(got) == canonical_digest(want)

    # resume: drop one partition file, re-export writes ONLY that one
    import os

    victim = next(p for p in os.listdir(dst) if p.startswith("part="))
    os.remove(os.path.join(dst, victim, "data.parquet"))
    rep2 = export_snapshot(lake, dst)
    assert rep2["written"] == 1 and rep2["skipped"] == rep["partitions"] - 1

    # epoch pinning = time-travel export
    dst0 = f"{tmp_path}/export0"
    export_snapshot(lake, dst0, epoch=0)
    got0 = pq.read_table(dst0)
    got0 = got0.select([c for c in got0.column_names if c != "part"])
    want0 = lake_table(lake, epoch=0)
    got0 = got0.select(want0.column_names).sort_by(
        [("repo", "ascending"), ("path", "ascending")]
    )
    assert canonical_digest(got0) == canonical_digest(want0)
