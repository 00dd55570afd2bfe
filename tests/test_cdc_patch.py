"""Column-level LWW (patch-update) CDC mode: a U event's NULL payload
column means UNCHANGED — latest non-null value per column wins; I
replaces the full row; D is a full tombstone; patches after a barrier
build on the barrier. Engine state must equal the sequential
single-process oracle with the same merge semantics, at any
partitioning / batch split / arrival order."""

import pytest

from engine.cdc.oracle import oracle_state_hash, oracle_table
from engine.cdc.replay import ReplayConfig, replay
from engine.cdc.synth import SynthConfig, synth_changelog
from engine.cdc.verify import lake_table, state_hash


def _run(tmp, sf_dir, name, synth_kw=None, replay_kw=None):
    cfg = SynthConfig(
        seed=7, n_events=1600, n_epochs=2, n_keys=300,
        op_mix=(30, 60, 10), patch_null_frac=0.6, **(synth_kw or {})
    )
    log = synth_changelog(sf_dir, f"{tmp}/log_{name}", cfg)
    lake = f"{tmp}/lake_{name}"
    rkw = dict(num_partitions=8, num_salts=2, update_mode="column")
    rkw.update(replay_kw or {})
    replay(log, lake, ReplayConfig(**rkw))
    return log, lake


def test_patch_replay_matches_oracle(tmp_path, sf_dir):
    log, lake = _run(tmp_path, sf_dir, "a")
    assert state_hash(lake) == oracle_state_hash(log, update_mode="column")


def test_patch_full_row_equality(tmp_path, sf_dir):
    # Every surviving column value — patched or inherited — matches the
    # sequential fold, per key, including recomputed content sha256.
    log, lake = _run(tmp_path, sf_dir, "rows")

    def snap(t):
        return {
            (r["repo"], r["path"]): (
                r["commit"], r["lang"], r["content"], r["content_sha256"], r["seq"]
            )
            for r in t.to_pylist()
        }

    eng = snap(lake_table(lake))
    ora = snap(oracle_table(log, update_mode="column"))
    assert eng == ora


def test_patch_invariant_to_partitioning_batch_and_order(tmp_path, sf_dir):
    _, lake1 = _run(tmp_path, sf_dir, "p1")
    _, lake2 = _run(
        tmp_path, sf_dir, "p2",
        replay_kw=dict(num_partitions=3, num_salts=1, batch_size=128),
    )
    _, lake3 = _run(
        tmp_path, sf_dir, "p3", synth_kw=dict(shuffle_within_epochs=True)
    )
    assert state_hash(lake1) == state_hash(lake2) == state_hash(lake3)


def test_patch_semantics_differ_from_row_mode(tmp_path, sf_dir):
    # Guard against silently running the row-LWW collapse: with partial
    # updates present, the two semantics must produce different states
    # (row mode would null out the unpatched columns).
    log, lake = _run(tmp_path, sf_dir, "diff")
    assert state_hash(lake) != oracle_state_hash(log, update_mode="row")


def test_patch_delta_lsm_equals_rewrite(tmp_path, sf_dir):
    # Patch mode composes with the delta-LSM write path: the exact fold
    # emits COMPLETE rows, so deltas are ordinary upserts + tombstones
    # and merge-on-read stays row-level. Aggressive compaction included.
    log, lake_rw = _run(tmp_path, sf_dir, "d_rw")
    # compact_files=2: both epochs write deltas (pure merge-on-read path);
    # compact_files=1: epoch 1 exceeds the list bound and compacts back to
    # one base — both shapes must equal the rewrite lake and the oracle.
    _, lake_d = _run(
        tmp_path, sf_dir, "d_delta",
        replay_kw=dict(write_mode="delta", compact_files=2),
    )
    _, lake_c = _run(
        tmp_path, sf_dir, "d_compact",
        replay_kw=dict(write_mode="delta", compact_files=1),
    )
    h = state_hash(lake_rw)
    assert state_hash(lake_d) == h
    assert state_hash(lake_c) == h
    assert h == oracle_state_hash(log, update_mode="column")


def test_patch_mode_rejects_late_exchange(tmp_path, sf_dir):
    with pytest.raises(ValueError, match="update_mode"):
        _run(tmp_path, sf_dir, "bad2", replay_kw=dict(exchange="late"))


def test_patch_with_schema_evolution(tmp_path, sf_dir):
    # Additive evolution mid-stream under patch semantics: pre-evolution
    # rows backfill the new column as null; patches that set it propagate
    # through the per-column fold; the sequential oracle agrees.
    log, lake = _run(
        tmp_path, sf_dir, "evo", synth_kw=dict(evolve_at_epoch=1)
    )
    assert state_hash(lake) == oracle_state_hash(log, update_mode="column")
    # and with int32 -> int64 type widening mid-stream on the evolved column
    log2, lake2 = _run(
        tmp_path, sf_dir, "widen",
        synth_kw=dict(evolve_at_epoch=0, widen_at_epoch=1),
    )
    assert state_hash(lake2) == oracle_state_hash(log2, update_mode="column")


def test_patch_property_random_streams(tmp_path, sf_dir):
    """Hypothesis over the patch fold: random I/U/D streams with random
    per-column null masks, split randomly into two epochs, must replay to
    the sequential oracle's state — any interleaving of barriers and
    patches, any key reuse pattern."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from hypothesis import given, settings, strategies as st

    events = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),                 # key id
            st.sampled_from(["I", "U", "D"]),
            st.one_of(st.none(), st.sampled_from(["c1", "c2"])),   # commit
            st.one_of(st.none(), st.sampled_from(["en", "fr"])),   # lang
            st.one_of(st.none(), st.sampled_from(["x", "yy"])),    # content
        ),
        min_size=1, max_size=24,
    )

    case = [0]

    @settings(max_examples=5, deadline=None)
    @given(evs=events, split=st.integers(min_value=0, max_value=24))
    def _check(evs, split):
        case[0] += 1
        log = f"{tmp_path}/fz_{case[0]}/log"
        rows = {
            "seq": list(range(len(evs))),
            "op": [e[1] for e in evs],
            "repo": [f"r{e[0] % 2}" for e in evs],
            "path": [f"p{e[0]}" for e in evs],
            "commit": [e[2] if e[1] == "U" else (e[2] or "c0") for e in evs],
            "lang": [e[3] if e[1] == "U" else (e[3] or "en") for e in evs],
            "content": [e[4] if e[1] == "U" else (e[4] or "x") for e in evs],
        }
        t = pa.table(rows)
        cut = min(split, len(evs))
        for k, tbl in enumerate((t.slice(0, cut), t.slice(cut))):
            d = f"{log}/epoch={k:05d}"
            os.makedirs(d, exist_ok=True)
            pq.write_table(tbl, f"{d}/part-0000.parquet")
        lake = f"{tmp_path}/fz_{case[0]}/lake"
        replay(log, lake, ReplayConfig(num_partitions=2, num_salts=2,
                                       update_mode="column"))
        assert state_hash(lake) == oracle_state_hash(log, update_mode="column")

    _check()


def test_patch_all_null_payload_epoch(tmp_path, sf_dir):
    # Pinned hypothesis falsifier: an epoch whose payload columns are ALL
    # null arrives as Arrow type `null` (no utf8_length kernel) — the
    # summary-delta path must tolerate it. A lone U-patch on a key with no
    # prior barrier folds to nothing; pair it with an I in the same epoch
    # so the merge actually touches state.
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    log = f"{tmp_path}/nullpay/log"
    t = pa.table(
        {
            "seq": [0, 1],
            "op": ["U", "U"],
            "repo": ["r0", "r1"],
            "path": ["p0", "p1"],
            "commit": pa.array([None, None], type=pa.null()),
            "lang": pa.array([None, None], type=pa.null()),
            "content": pa.array([None, None], type=pa.null()),
        }
    )
    d = f"{log}/epoch=00000"
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, f"{d}/part-0000.parquet")
    lake = f"{tmp_path}/nullpay/lake"
    replay(log, lake, ReplayConfig(num_partitions=2, num_salts=2,
                                   update_mode="column"))
    assert state_hash(lake) == oracle_state_hash(log, update_mode="column")


def test_patch_summary_matches_recompute(tmp_path, sf_dir):
    # The incremental per-repo summary (materialized view) must stay
    # exact under column-LWW deltas too: _apply_column's summary_delta
    # accounts for inherited-column rows the same as replaced ones.
    from engine.cdc.summary import read_summary, recompute_summary

    _, lake = _run(tmp_path, sf_dir, "sum")
    for epoch in (0, 1):
        inc = read_summary(lake, epoch)
        full = recompute_summary(lake, epoch)
        assert inc.equals(full), f"epoch {epoch}: incremental != recompute"


def test_update_mode_pinned_on_resume(tmp_path, sf_dir):
    """A column-LWW lake resumed with a row-mode config must keep its
    pinned fold semantics (like P and summary_spec) — mixing modes
    mid-lake silently changes what a NULL payload column means."""
    from engine.cdc import sink
    from engine.cdc.oracle import oracle_state_hash
    from engine.cdc.verify import state_hash

    log = synth_changelog(
        sf_dir, f"{tmp_path}/log_pin",
        SynthConfig(seed=15, n_events=2500, n_epochs=3, n_keys=500,
                    op_mix=(30, 60, 10), patch_null_frac=0.5),
    )
    lake = f"{tmp_path}/lake_pin"
    replay(log, lake, ReplayConfig(num_partitions=8, num_salts=2,
                                   update_mode="column"), max_epoch=1)
    assert sink.read_manifest(lake)["update_mode"] == "column"
    # Resume with the DEFAULT (row) config: pinned column mode must win.
    replay(log, lake, ReplayConfig(num_partitions=8, num_salts=2))
    assert sink.read_manifest(lake)["update_mode"] == "column"
    assert state_hash(lake) == oracle_state_hash(log, update_mode="column")
