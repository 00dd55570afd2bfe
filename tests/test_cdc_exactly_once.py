"""Exactly-once / idempotence / resume tests (SURVEY.md §5, §2.7 C4/S7)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from engine.cdc import sink
from engine.cdc.oracle import oracle_state_hash
from engine.cdc.replay import ReplayConfig, replay
from engine.cdc.synth import SynthConfig, synth_changelog
from engine.cdc.verify import state_hash

CFG = dict(num_partitions=8, num_salts=2)


def _log(tmp, sf_dir, name="log", **kw):
    return synth_changelog(
        sf_dir, f"{tmp}/{name}", SynthConfig(seed=42, n_events=1500, n_epochs=3, n_keys=400, **kw)
    )


def test_rerun_of_committed_epochs_is_noop(tmp_path, sf_dir):
    log = _log(tmp_path, sf_dir)
    lake = f"{tmp_path}/lake"
    replay(log, lake, ReplayConfig(**CFG))
    m1 = json.dumps(sink.read_manifest(lake), sort_keys=True)
    h1 = state_hash(lake)
    s2 = replay(log, lake, ReplayConfig(**CFG))
    assert s2["epochs_run"] == [] and s2["epochs_skipped"] == [0, 1, 2]
    assert json.dumps(sink.read_manifest(lake), sort_keys=True) == m1
    assert state_hash(lake) == h1


def test_resume_from_checkpoint_equals_uninterrupted(tmp_path, sf_dir):
    log = _log(tmp_path, sf_dir)
    lake_a, lake_b = f"{tmp_path}/lake_a", f"{tmp_path}/lake_b"
    replay(log, lake_a, ReplayConfig(**CFG))  # uninterrupted
    replay(log, lake_b, ReplayConfig(**CFG), max_epoch=0)  # "crash" after epoch 0
    assert sink.last_committed_epoch(lake_b) == 0
    replay(log, lake_b, ReplayConfig(**CFG))  # new run resumes 1..2
    assert state_hash(lake_a) == state_hash(lake_b) == oracle_state_hash(log)


def test_orphan_uncommitted_files_are_invisible(tmp_path, sf_dir):
    # Simulate a task that wrote data but whose epoch never committed
    # (crash between phase 1 and phase 2): the orphan must never be read.
    log = _log(tmp_path, sf_dir)
    lake = f"{tmp_path}/lake"
    replay(log, lake, ReplayConfig(**CFG))
    h1 = state_hash(lake)
    orphan_dir = os.path.join(lake, "data", "part=0")
    os.makedirs(orphan_dir, exist_ok=True)
    junk = pa.table(
        {
            "repo": ["evil"],
            "path": ["x"],
            "commit": ["0"],
            "lang": ["py"],
            "content": ["boom"],
            "content_sha256": ["0"],
            "seq": pa.array([10**9], pa.int64()),
        }
    )
    pq.write_table(junk, os.path.join(orphan_dir, "base-99999-deadbeef.parquet"))
    assert state_hash(lake) == h1  # manifest-resolved read ignores orphans


def test_crashed_epoch_rerun_converges(tmp_path, sf_dir):
    # Phase-1 files written, phase-2 commit never happened → rerun of the
    # epoch writes fresh files and commits; state equals a clean run.
    log = _log(tmp_path, sf_dir)
    lake_a, lake_b = f"{tmp_path}/ca", f"{tmp_path}/cb"
    replay(log, lake_a, ReplayConfig(**CFG))

    from engine.cdc import replay as replay_mod

    calls = {"n": 0}
    orig = sink.commit_epoch

    def flaky_commit(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:  # crash the second epoch's commit, post-data-write
            raise RuntimeError("simulated crash before manifest commit")
        return orig(*a, **k)

    sink.commit_epoch = flaky_commit
    replay_mod.sink.commit_epoch = flaky_commit
    try:
        try:
            replay(log, lake_b, ReplayConfig(**CFG))
        except RuntimeError:
            pass
    finally:
        sink.commit_epoch = orig
        replay_mod.sink.commit_epoch = orig
    assert sink.last_committed_epoch(lake_b) == 0
    replay(log, lake_b, ReplayConfig(**CFG))  # rerun epochs 1..2
    assert state_hash(lake_a) == state_hash(lake_b)


def test_deadletter_rejects_invalid_events(tmp_path, sf_dir):
    # Corrupt one epoch file with invalid ops/null keys; engine must
    # dead-letter them and still match an oracle that skips them.
    log = _log(tmp_path, sf_dir, name="log_dl")
    f = os.path.join(log, "epoch=00000", "part-0000.parquet")
    t = pq.read_table(f)
    bad = pa.table(
        {
            "seq": pa.array([10_000_000, 10_000_001], pa.int64()),
            "op": pa.array(["X", None], pa.string()),
            "repo": pa.array(["r", None], pa.string()),
            "path": pa.array(["p", "q"], pa.string()),
            "commit": pa.array(["c", "c"], pa.string()),
            "lang": pa.array(["py", "py"], pa.string()),
            "content": pa.array(["z", "z"], pa.string()),
        }
    )
    pq.write_table(pa.concat_tables([t, bad]), f)
    lake = f"{tmp_path}/lake_dl"
    replay(log, lake, ReplayConfig(**CFG))
    assert state_hash(lake) == oracle_state_hash(log)
    ddir = os.path.join(lake, "deadletter", "epoch=00000")
    dead = pa.concat_tables(
        pq.read_table(os.path.join(ddir, p)) for p in os.listdir(ddir)
    )
    assert dead.num_rows == 2


def test_concurrent_commit_is_compare_and_swap(tmp_path, sf_dir):
    """Two writers racing to commit the same lake version: exactly ONE
    wins the atomic os.link claim; the loser gets CommitConflict and the
    winner's manifest content is what readers see (no last-writer-wins
    clobber). The race is driven through a barrier so both writers have
    staged their manifests before either claims."""
    import threading

    log = _log(tmp_path, sf_dir, name="log_cas")
    lake = f"{tmp_path}/lake_cas"
    replay(log, lake, ReplayConfig(**CFG), max_epoch=0)
    prev = sink.read_manifest(lake)
    schema = sink.schema_from_b64(prev["schema_b64"])
    version = prev["epoch"] + 1

    barrier = threading.Barrier(2)
    results: dict[str, object] = {}

    real_fsync = os.fsync

    def sync_then_wait(fd):
        real_fsync(fd)
        barrier.wait(timeout=10)  # both manifests staged before either links

    def commit(tag):
        report = [{
            "pid": 0, "epoch": version, "files": [f"data/part=0/{tag}.parquet"],
            "seq_lo": 0, "seq_hi": 0, "events_in": 0, "upserts": 0,
            "rows_out": 1, "bytes_written": 0, "duration_s": 0.0, "deletes": 0,
        }]
        try:
            sink.commit_epoch(lake, version, report, schema, prev)
            results[tag] = "committed"
        except sink.CommitConflict:
            results[tag] = "conflict"

    os.fsync = sync_then_wait
    try:
        threads = [threading.Thread(target=commit, args=(t,)) for t in ("a", "b")]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
    finally:
        os.fsync = real_fsync

    assert sorted(results.values()) == ["committed", "conflict"]
    winner = next(t for t, r in results.items() if r == "committed")
    m = sink.read_manifest(lake, version)
    assert m["active_files"]["0"] == [f"data/part=0/{winner}.parquet"]
    # No staged tmp files linger after the race (finally-unlink).
    mdir = os.path.join(lake, sink.MANIFEST_DIR)
    assert not [n for n in os.listdir(mdir) if n.endswith(".tmp")]


def test_deadletter_requeue_after_fix_converges(tmp_path, sf_dir):
    """The dead-letter loop closes: malformed events are quarantined,
    repaired by an operator fix, republished as a sealed changelog epoch
    with their ORIGINAL seqs, and the next replay folds them — final
    state equals an oracle replay of the log with the events corrected
    at the source."""
    import pyarrow as pa

    from engine.cdc.parse import requeue_deadletters

    log = _log(tmp_path, sf_dir, name="log_rq")
    f = os.path.join(log, "epoch=00000", "part-0000.parquet")
    t = pq.read_table(f)
    bad = pa.table(
        {
            "seq": pa.array([10_000_000, 10_000_001], pa.int64()),
            "op": pa.array(["i", "u"], pa.string()),  # fixable: uppercase
            "repo": pa.array(["fix-repo", "fix-repo"], pa.string()),
            "path": pa.array(["a.py", "b.py"], pa.string()),
            "commit": pa.array(["c1", "c2"], pa.string()),
            "lang": pa.array(["py", "py"], pa.string()),
            "content": pa.array(["print(1)", "print(2)"], pa.string()),
        }
    )
    pq.write_table(pa.concat_tables([t, bad]), f)
    lake = f"{tmp_path}/lake_rq"
    replay(log, lake, ReplayConfig(**CFG))
    assert state_hash(lake) == oracle_state_hash(log)  # bad rows skipped

    def fix(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        i = tbl.schema.get_field_index("op")
        return tbl.set_column(i, "op", pc.ascii_upper(tbl.column("op")).combine_chunks())

    n = requeue_deadletters(lake, log, epoch=3, fix_fn=fix, clear=True)
    assert n == 2
    replay(log, lake, ReplayConfig(**CFG))

    # Oracle: the same log with the two events corrected in place.
    fixed_log = f"{tmp_path}/log_rq_fixed"
    import shutil

    shutil.copytree(log, fixed_log)
    shutil.rmtree(os.path.join(fixed_log, "epoch=00003"))
    ff = os.path.join(fixed_log, "epoch=00000", "part-0000.parquet")
    tt = pq.read_table(ff)
    i = tt.schema.get_field_index("op")
    import pyarrow.compute as pc

    tt = tt.set_column(i, "op", pc.ascii_upper(tt.column("op")).combine_chunks())
    pq.write_table(tt, ff)
    assert state_hash(lake) == oracle_state_hash(fixed_log)
    # Quarantine is empty and requeue is a no-op now.
    assert requeue_deadletters(lake, log, epoch=4) == 0


def test_requeue_restamps_stale_seqs_above_watermark(tmp_path, sf_dir):
    """ADVICE r4 (high): a requeued event whose ORIGINAL seq is at or
    below the lake's applied watermark must be re-stamped above it —
    republishing it at the old seq would overwrite newer state in
    rewrite mode (the merge replaces touched keys without a base seq
    compare) and break the strictly-larger-seq delta invariant. The
    re-stamped batch re-enters the log at the current position (it now
    wins over writes made while quarantined — the documented semantics),
    and the final state equals the oracle of the log as published."""
    import pyarrow.compute as pc

    from engine.cdc.parse import _seq_watermark, requeue_deadletters
    from engine.cdc.verify import lake_table

    log = _log(tmp_path, sf_dir, name="log_stale")
    # A STALE fixable event (seq 5 is consumed by the log's real events)
    # targeting a key that exists in the final state.
    f = os.path.join(log, "epoch=00000", "part-0000.parquet")
    t = pq.read_table(f)
    lake_probe = f"{tmp_path}/lake_probe"
    replay(log, lake_probe, ReplayConfig(**CFG))
    probe = lake_table(lake_probe)
    repo0 = probe.column("repo")[0].as_py()
    path0 = probe.column("path")[0].as_py()
    bad = pa.table(
        {
            "seq": pa.array([5], pa.int64()),
            "op": pa.array(["u"], pa.string()),  # fixable: uppercase
            "repo": pa.array([repo0], pa.string()),
            "path": pa.array([path0], pa.string()),
            "commit": pa.array(["c-stale"], pa.string()),
            "lang": pa.array(["py"], pa.string()),
            "content": pa.array(["STALE-REPAIRED"], pa.string()),
        }
    )
    pq.write_table(pa.concat_tables([t, bad]), f)

    lake = f"{tmp_path}/lake_stale"
    replay(log, lake, ReplayConfig(**CFG))
    wm = _seq_watermark(lake)
    assert wm == 1499  # all real events applied

    def fix(tbl: pa.Table) -> pa.Table:
        i = tbl.schema.get_field_index("op")
        return tbl.set_column(
            i, "op", pc.ascii_upper(tbl.column("op")).combine_chunks()
        )

    # restamp="never" refuses (seq 5 <= watermark) and publishes nothing.
    import pytest

    with pytest.raises(ValueError, match="watermark"):
        requeue_deadletters(lake, log, epoch=3, fix_fn=fix, restamp="never")
    assert not os.path.isdir(os.path.join(log, "epoch=00003"))

    assert requeue_deadletters(lake, log, epoch=3, fix_fn=fix, clear=True) == 1
    # The published epoch carries the re-stamped seq, not the stale one.
    pub = pq.read_table(os.path.join(log, "epoch=00003", "requeued-00000.parquet"))
    assert pub.column("seq").to_pylist() == [wm + 1]

    replay(log, lake, ReplayConfig(**CFG))
    final = lake_table(lake)
    mask = pc.and_(
        pc.equal(final.column("repo"), repo0), pc.equal(final.column("path"), path0)
    )
    row = final.filter(mask)
    assert row.column("content").to_pylist() == ["STALE-REPAIRED"]
    assert row.column("seq").to_pylist() == [wm + 1]
    # Whole-state equality vs the sequential oracle of the log as
    # published (the stale lowercase original is skipped as invalid).
    assert state_hash(lake) == oracle_state_hash(log)
