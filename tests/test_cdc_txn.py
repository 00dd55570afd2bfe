"""Multi-table transactional CDC (engine/cdc/txn.py): per-table lakes
under an atomic cross-table transaction log."""

from engine.cdc import sink
from engine.cdc.replay import ReplayConfig, replay
from engine.cdc.synth import SynthConfig, synth_changelog
from engine.cdc.txn import (
    committed_txns,
    database_state_hash,
    read_database,
    read_txn,
    replay_database,
    table_dir,
)
from engine.cdc.verify import state_hash

CFG = ReplayConfig(num_partitions=8, num_salts=2)


def _logs(tmp, sf_dir, epochs_b=3):
    la = synth_changelog(
        sf_dir, f"{tmp}/log_a",
        SynthConfig(seed=5, n_events=2000, n_epochs=3, n_keys=400),
    )
    lb = synth_changelog(
        sf_dir, f"{tmp}/log_b",
        SynthConfig(seed=9, n_events=1200, n_epochs=epochs_b, n_keys=250),
    )
    return {"files": la, "issues": lb}


def test_database_matches_independent_replays(tmp_path, sf_dir):
    logs = _logs(tmp_path, sf_dir)
    db = f"{tmp_path}/db"
    out = replay_database(logs, db, CFG)
    assert out["txns_committed"] == [0, 1, 2]
    for name, log in logs.items():
        ref = f"{tmp_path}/ref_{name}"
        replay(log, ref, CFG)
        assert state_hash(table_dir(db, name)) == state_hash(ref)
    # Idempotent rerun: no new txns, same database hash.
    h = database_state_hash(db)
    again = replay_database(logs, db, CFG)
    assert again["txns_committed"] == [] and database_state_hash(db) == h


def test_reader_pinned_to_txn_never_sees_phantom_state(tmp_path, sf_dir):
    logs = _logs(tmp_path, sf_dir)
    db = f"{tmp_path}/db"
    replay_database(logs, db, CFG, max_epoch=0)
    assert committed_txns(db) == [0]
    h0 = database_state_hash(db)

    # Crash simulation: table "files" commits epoch 1 to its lake, but the
    # txn manifest for epoch 1 was never written.
    replay(logs["files"], table_dir(db, "files"), CFG, max_epoch=1)
    assert sink.last_committed_epoch(table_dir(db, "files")) == 1
    # Readers still resolve through txn-0: the phantom (files@1, issues@0)
    # state is invisible — database hash unchanged, pinned version = 0.
    assert database_state_hash(db) == h0
    assert read_txn(db)["tables"]["files"] == 0
    tables = read_database(db)
    assert set(tables) == {"files", "issues"}

    # Recovery: the rerun treats files@1 as already done (idempotent),
    # finishes issues@1..2 and the txn log, and converges byte-identically
    # to a never-crashed database.
    replay_database(logs, db, CFG)
    db2 = f"{tmp_path}/db2"
    replay_database(logs, db2, CFG)
    assert committed_txns(db) == [0, 1, 2]
    assert database_state_hash(db) == database_state_hash(db2)


def test_tables_with_uneven_epoch_sets(tmp_path, sf_dir):
    # "issues" stops at epoch 1; txn-2 must pin it at its last version
    # while "files" advances.
    logs = _logs(tmp_path, sf_dir, epochs_b=2)
    db = f"{tmp_path}/db"
    out = replay_database(logs, db, CFG)
    assert out["txns_committed"] == [0, 1, 2]
    txn2 = read_txn(db, 2)
    assert txn2["tables"]["issues"] == read_txn(db, 1)["tables"]["issues"]
    ref = f"{tmp_path}/ref_b"
    replay(logs["issues"], ref, CFG)
    assert state_hash(table_dir(db, "issues")) == state_hash(ref)


def test_table_repartition_between_txns_resumes_exact(tmp_path, sf_dir):
    """One table repartitions between database epochs; the next
    replay_database with the ORIGINAL (stale-P) config must adopt the
    table's pinned layout (run_epoch-level adoption) and converge to the
    same database hash as an uninterrupted run."""
    from engine.cdc.maintain import repartition

    logs = _logs(tmp_path, sf_dir)
    db_ref, db = f"{tmp_path}/db_ref", f"{tmp_path}/db"
    replay_database(logs, db_ref, CFG)
    replay_database(logs, db, CFG, max_epoch=1)
    repartition(table_dir(db, "files"), 32)
    replay_database(logs, db, CFG)  # stale P=8 config for 'files'
    m = sink.read_manifest(table_dir(db, "files"))
    assert m["num_partitions"] == 32
    assert all(0 <= int(p) < 32 for p in m["active_files"])
    assert database_state_hash(db) == database_state_hash(db_ref)
