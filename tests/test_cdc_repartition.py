"""Lake repartitioning (engine/cdc/maintain.py::repartition): change P
as a maintenance version — state-hash invariant, stale pids dropped,
resume adopts the manifest's pinned P even with a stale caller config
(engine/cdc/replay.py::_replay_available)."""

import pyarrow.compute as pc

from engine.cdc import sink
from engine.cdc.maintain import repartition
from engine.cdc.replay import ReplayConfig, replay
from engine.cdc.synth import SynthConfig, synth_changelog
from engine.cdc.verify import lake_lookup, lake_table, state_hash

CFG = dict(num_partitions=8, num_salts=2)


def _log(tmp, sf_dir, name="log", **kw):
    return synth_changelog(
        sf_dir, f"{tmp}/{name}",
        SynthConfig(seed=33, n_events=3000, n_epochs=3, n_keys=600, **kw),
    )


def test_repartition_up_preserves_state_and_resume(tmp_path, sf_dir):
    log = _log(tmp_path, sf_dir)
    lake, lake_ref = f"{tmp_path}/lake", f"{tmp_path}/lake_ref"
    replay(log, lake_ref, ReplayConfig(**CFG))  # uninterrupted reference
    replay(log, lake, ReplayConfig(**CFG), max_epoch=1)
    h_before = state_hash(lake)

    m = repartition(lake, 16)
    assert m["num_partitions"] == 16
    assert m["epoch"] == 2 and sink.changelog_pos(m) == 1
    assert m["maintenance"] == "repartition:16"
    # Live state byte-identical; layout actually moved to the new P.
    assert state_hash(lake) == h_before
    pids = set(sink.active_files(m))
    assert pids and all(0 <= p < 16 for p in pids) and max(pids) >= 8

    # Resume with the STALE P=8 config: the pinned manifest P must win,
    # and the final state must equal the uninterrupted reference.
    out = replay(log, lake, ReplayConfig(**CFG))
    assert out["epochs_run"] == [2]
    m2 = sink.read_manifest(lake)
    assert m2["num_partitions"] == 16
    assert all(0 <= int(p) < 16 for p in m2["active_files"])
    assert state_hash(lake) == state_hash(lake_ref)


def test_repartition_down_drops_stale_pids_and_lookup(tmp_path, sf_dir):
    log = _log(tmp_path, sf_dir, name="log_d")
    lake = f"{tmp_path}/lake_d"
    replay(log, lake, ReplayConfig(num_partitions=16, num_salts=2))
    h_before = state_hash(lake)
    full = lake_table(lake)

    m = repartition(lake, 4)
    assert m["num_partitions"] == 4
    pids = set(sink.active_files(m))
    assert pids and all(0 <= p < 4 for p in pids)
    assert state_hash(lake) == h_before

    # Key-pruned point reads agree with a full-scan filter at the new P.
    repo = full.column("repo")[0].as_py()
    got = lake_lookup(lake, repo).sort_by([("path", "ascending")])
    want = full.filter(pc.equal(full.column("repo"), repo)).sort_by(
        [("path", "ascending")]
    )
    assert got.equals(want)


def test_repartition_fuzz_any_split_any_p(tmp_path, sf_dir):
    """Hypothesis: for random (P_before, P_after, split point) — including
    P=1 at either end and repartitioning twice — the final lake hash
    equals the sequential oracle's."""
    from hypothesis import given, settings, strategies as st

    from engine.cdc.oracle import oracle_state_hash

    log = _log(tmp_path, sf_dir, name="log_fz")
    want = oracle_state_hash(log)
    runs = [0]

    @settings(max_examples=5, deadline=None)
    @given(
        p1=st.sampled_from([1, 3, 8, 16]),
        p2=st.sampled_from([1, 4, 7, 32]),
        split=st.sampled_from([0, 1]),
        twice=st.booleans(),
    )
    def check(p1, p2, split, twice):
        runs[0] += 1
        lake = f"{tmp_path}/lake_fz_{runs[0]}"
        cfg = ReplayConfig(num_partitions=p1, num_salts=2)
        replay(log, lake, cfg, max_epoch=split)
        repartition(lake, p2)
        if twice:
            repartition(lake, p1)
        replay(log, lake, cfg)  # stale config; pinned P wins
        assert state_hash(lake) == want
        m = sink.read_manifest(lake)
        p_final = p1 if twice else p2
        assert m["num_partitions"] == p_final
        assert all(0 <= int(p) < p_final for p in m["active_files"])

    check()


def test_repartition_preserves_summary_invariant(tmp_path, sf_dir):
    """The per-repo incremental summary is P-independent: after a
    repartition (rows unchanged, layout moved) the carried-forward
    summary still equals a full recompute from the new layout."""
    from engine.cdc.summary import read_summary, recompute_summary

    log = _log(tmp_path, sf_dir, name="log_sum")
    lake = f"{tmp_path}/lake_sum"
    replay(log, lake, ReplayConfig(**CFG))
    repartition(lake, 32)
    assert read_summary(lake).equals(recompute_summary(lake))


def test_repartition_patch_mode_lake(tmp_path, sf_dir):
    """Column-LWW lakes repartition like any other (the exact fold emits
    COMPLETE rows, so moved rows carry full payloads); resume continues
    in patch mode at the new P and still matches the patch oracle."""
    from engine.cdc.oracle import oracle_state_hash

    log = synth_changelog(
        sf_dir, f"{tmp_path}/log_pm",
        SynthConfig(seed=13, n_events=2500, n_epochs=3, n_keys=500,
                    op_mix=(30, 60, 10), patch_null_frac=0.5),
    )
    lake = f"{tmp_path}/lake_pm"
    cfg = ReplayConfig(num_partitions=8, num_salts=2, update_mode="column")
    replay(log, lake, cfg, max_epoch=1)
    repartition(lake, 16)
    replay(log, lake, cfg)
    assert state_hash(lake) == oracle_state_hash(log, update_mode="column")


def test_repartition_crash_before_commit_then_retry(tmp_path, sf_dir):
    """Phase-1 repartition files written, manifest commit crashed: the
    lake still reads at the old layout (orphans invisible); the retried
    repartition converges; vacuum reclaims the orphaned first attempt."""
    from engine.cdc import maintain
    from engine.cdc.vacuum import vacuum

    log = _log(tmp_path, sf_dir, name="log_cr")
    lake = f"{tmp_path}/lake_cr"
    replay(log, lake, ReplayConfig(**CFG))
    h = state_hash(lake)
    m_before = sink.read_manifest(lake)

    orig = sink.commit_epoch

    def crash(*a, **k):
        raise RuntimeError("simulated crash before manifest commit")

    sink.commit_epoch = crash
    maintain.sink.commit_epoch = crash
    try:
        try:
            repartition(lake, 32)
        except RuntimeError:
            pass
    finally:
        sink.commit_epoch = orig
        maintain.sink.commit_epoch = orig

    # Nothing committed; the lake is untouched at the old layout.
    assert sink.read_manifest(lake) == m_before
    assert state_hash(lake) == h

    m = repartition(lake, 32)  # retry converges
    assert m["num_partitions"] == 32 and state_hash(lake) == h
    rep = vacuum(lake, retain_last=1)
    assert rep["removed_files"] > 0  # the crashed attempt's orphans
    assert state_hash(lake) == h
