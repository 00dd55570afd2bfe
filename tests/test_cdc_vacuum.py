"""Lake vacuum: orphan GC + manifest retention must never change the
committed state, and resume must survive a vacuumed lake."""

import os

import pyarrow.parquet as pq

from engine.cdc import sink
from engine.cdc.oracle import oracle_state_hash
from engine.cdc.replay import ReplayConfig, replay
from engine.cdc.synth import SynthConfig, synth_changelog
from engine.cdc.vacuum import vacuum
from engine.cdc.verify import state_hash


def _setup(tmp, sf_dir, name, n_epochs=4, **rkw):
    log = synth_changelog(
        sf_dir, f"{tmp}/log_{name}",
        SynthConfig(seed=42, n_events=1600, n_epochs=n_epochs, n_keys=400),
    )
    lake = f"{tmp}/lake_{name}"
    cfg = ReplayConfig(num_partitions=4, num_salts=2, **rkw)
    return log, lake, cfg


def _all_data_files(lake):
    out = []
    for dirpath, _, names in os.walk(os.path.join(lake, "data")):
        out += [os.path.relpath(os.path.join(dirpath, n), lake) for n in names]
    return set(out)


def test_vacuum_removes_orphans_and_superseded_keeps_state(tmp_path, sf_dir):
    log, lake, cfg = _setup(tmp_path, sf_dir, "gc", write_mode="delta", compact_files=2)
    replay(log, lake, cfg)
    h0 = state_hash(lake)

    # Crash-sim orphans: a phase-1 data file and a summary file no
    # manifest references.
    ref = sorted(_all_data_files(lake))[0]
    orphan_data = os.path.join(lake, "data", "part=0", "base-99999-deadbeef.parquet")
    os.makedirs(os.path.dirname(orphan_data), exist_ok=True)
    pq.write_table(pq.read_table(os.path.join(lake, ref)), orphan_data)
    orphan_summary = os.path.join(lake, "summary", "epoch-99999-deadbeef.parquet")
    pq.write_table(pq.read_table(os.path.join(lake, ref)), orphan_summary)

    before = _all_data_files(lake)
    report = vacuum(lake, retain_last=1)
    after = _all_data_files(lake)

    assert state_hash(lake) == h0  # state untouched
    assert "data/part=0/base-99999-deadbeef.parquet" in report["removed"]
    assert "summary/epoch-99999-deadbeef.parquet" in report["removed"]
    # Superseded files (4 epochs of rewrites/compactions) were reclaimed.
    assert len(after) < len(before)
    # Every surviving data file is referenced by the latest manifest.
    refs = {f for v in sink.active_files(sink.read_manifest(lake)).values() for f in v}
    assert after == refs
    # Old manifests pruned, latest kept.
    assert report["removed_manifests"] == [0, 1, 2]
    assert sink.last_committed_epoch(lake) == 3


def test_vacuum_dry_run_touches_nothing(tmp_path, sf_dir):
    log, lake, cfg = _setup(tmp_path, sf_dir, "dry", n_epochs=2)
    replay(log, lake, cfg)
    before = _all_data_files(lake)
    report = vacuum(lake, retain_last=1, dry_run=True)
    assert report["removed_files"] > 0  # superseded epoch-0 bases exist
    assert _all_data_files(lake) == before
    assert sink.last_committed_epoch(lake) == 1


def test_vacuum_min_age_protects_fresh_files(tmp_path, sf_dir):
    log, lake, cfg = _setup(tmp_path, sf_dir, "age", n_epochs=2)
    replay(log, lake, cfg)
    report = vacuum(lake, retain_last=1, min_age_s=3600)
    assert report["removed_files"] == 0  # everything written seconds ago


def test_resume_after_vacuum(tmp_path, sf_dir):
    """Vacuum mid-stream (old manifests gone), then replay the remaining
    epochs: the resume point survives and the final state matches the
    oracle."""
    log, lake, cfg = _setup(
        tmp_path, sf_dir, "res", n_epochs=6, write_mode="delta", compact_files=3
    )
    replay(log, lake, cfg, max_epoch=3)
    vacuum(lake, retain_last=1)
    out = replay(log, lake, cfg)
    assert out["epochs_skipped"] == [0, 1, 2, 3] and out["epochs_run"] == [4, 5]
    assert state_hash(lake) == oracle_state_hash(log)
