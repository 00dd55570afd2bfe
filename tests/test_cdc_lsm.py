"""Delta-file LSM write mode (C5): per-epoch delta files + merge-on-read
+ threshold compaction. State must be byte-identical to rewrite-on-touch
and to the sequential oracle at every configuration."""

import pyarrow.parquet as pq

from engine.cdc import sink
from engine.cdc.oracle import oracle_state_hash
from engine.cdc.replay import ReplayConfig, replay
from engine.cdc.synth import SynthConfig, synth_changelog
from engine.cdc.verify import state_hash


def _log(tmp, sf_dir, name="lsm", **kw):
    base = dict(seed=42, n_events=1500, n_epochs=3, n_keys=400)
    base.update(kw)
    return synth_changelog(sf_dir, f"{tmp}/log_{name}", SynthConfig(**base))


def test_delta_mode_matches_rewrite_and_oracle(tmp_path, sf_dir):
    log = _log(tmp_path, sf_dir)
    lake_rw, lake_d = f"{tmp_path}/lake_rw", f"{tmp_path}/lake_d"
    replay(log, lake_rw, ReplayConfig(num_partitions=8, num_salts=2, write_mode="rewrite"))
    replay(
        log, lake_d,
        ReplayConfig(num_partitions=8, num_salts=2, write_mode="delta", compact_files=99),
    )
    assert state_hash(lake_rw) == state_hash(lake_d) == oracle_state_hash(log)
    # Delta mode really produced layered files (base + deltas per pid).
    files = sink.active_files(sink.read_manifest(lake_d))
    assert any(len(v) > 1 for v in files.values())
    assert any("delta-" in f for v in files.values() for f in v)


def test_delta_compaction_bounds_file_lists(tmp_path, sf_dir):
    log = _log(tmp_path, sf_dir, name="cmp", n_epochs=6, n_events=1800)
    lake = f"{tmp_path}/lake_cmp"
    replay(
        log, lake,
        ReplayConfig(num_partitions=4, num_salts=2, write_mode="delta", compact_files=3),
    )
    assert state_hash(lake) == oracle_state_hash(log)
    files = sink.active_files(sink.read_manifest(lake))
    assert files and all(len(v) <= 3 for v in files.values())
    # Compaction actually rewrote bases mid-stream (a base newer than epoch 0).
    assert any(
        f.rsplit("/", 1)[-1].startswith("base-0000") and "base-00000-" not in f
        for v in files.values() for f in v
    )


def test_delta_mode_write_amplification(tmp_path, sf_dir):
    """Many tiny epochs against a sizeable lake: delta mode's written
    bytes must be a small fraction of rewrite-on-touch's (the whole point
    of the LSM path — VERDICT.md round 2, Missing #3)."""
    # 10 epochs of ~300 events against a 2000-key lake: each epoch
    # touches ~15% of the keys, so rewrite-on-touch rewrites ~7x more
    # rows than actually changed while delta writes only the winners.
    log = _log(tmp_path, sf_dir, name="amp", n_epochs=10, n_events=3000, n_keys=2000)

    def total_bytes(lake):
        total = 0
        for k in range(10):
            for r in sink.read_manifest(lake, k)["lineage"]:
                total += r["bytes_written"]
        return total

    lake_rw, lake_d = f"{tmp_path}/lake_arw", f"{tmp_path}/lake_ad"
    replay(log, lake_rw, ReplayConfig(num_partitions=4, num_salts=2, write_mode="rewrite"))
    replay(
        log, lake_d,
        ReplayConfig(num_partitions=4, num_salts=2, write_mode="delta", compact_files=99),
    )
    assert state_hash(lake_rw) == state_hash(lake_d)
    assert total_bytes(lake_d) < 0.6 * total_bytes(lake_rw)


def test_delta_mode_resume_and_evolution(tmp_path, sf_dir):
    """Resume mid-stream + additive schema evolution, all in delta mode:
    partial replay commits survive, the second run only replays the
    remaining epochs, final state matches the oracle."""
    log = _log(tmp_path, sf_dir, name="res", n_epochs=4, evolve_at_epoch=2)
    lake = f"{tmp_path}/lake_res"
    cfg = ReplayConfig(num_partitions=8, num_salts=2, write_mode="delta", compact_files=3)
    replay(log, lake, cfg, max_epoch=1)
    assert sink.last_committed_epoch(lake) == 1
    out = replay(log, lake, cfg)
    assert out["epochs_skipped"] == [0, 1] and out["epochs_run"] == [2, 3]
    assert state_hash(lake) == oracle_state_hash(log)
    m = sink.read_manifest(lake)
    assert "size_bytes" in m["schema_names"]


def test_delta_tombstones_drop_keys(tmp_path, sf_dir):
    """A key deleted in a later epoch must vanish from the merged view
    even though the base file still holds its old row (tombstone wins on
    seq)."""
    from engine.cdc.verify import lake_table

    log = _log(tmp_path, sf_dir, name="del", op_mix=(40, 20, 40))
    lake = f"{tmp_path}/lake_del"
    replay(
        log, lake,
        ReplayConfig(num_partitions=4, num_salts=2, write_mode="delta", compact_files=99),
    )
    assert state_hash(lake) == oracle_state_hash(log)
    # Sanity: some delta file really contains D tombstones.
    files = sink.active_files(sink.read_manifest(lake))
    deltas = [f for v in files.values() for f in v if "delta-" in f]
    assert deltas
    has_tomb = any(
        "D" in set(pq.read_table(f"{lake}/{f}", columns=["op"]).column("op").to_pylist())
        for f in deltas
    )
    assert has_tomb
