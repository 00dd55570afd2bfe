"""ALTER-style column drop (engine/cdc/maintain.py::drop_column): a
manifest-pinned maintenance version that removes a payload column and
tombstones the name, so later changelog epochs still carrying it have it
discarded (never re-added additively by negotiate), resume stays exact,
and the drop replicates as DDL through the changefeed. Re-adding the
name is backfill's explicit job."""

import pyarrow as pa
import pytest

from engine.cdc import sink
from engine.cdc.maintain import backfill, compact, drop_column, rename_column
from engine.cdc.replay import ReplayConfig, replay
from engine.cdc.synth import SynthConfig, synth_changelog
from engine.cdc.verify import lake_table, state_hash

CFG = dict(num_partitions=8, num_salts=2)


def _log(tmp, sf_dir, name="log", **kw):
    return synth_changelog(
        sf_dir, f"{tmp}/{name}",
        SynthConfig(seed=42, n_events=2400, n_epochs=3, n_keys=500, **kw),
    )


def test_drop_midstream_resume_with_dropped_column_events(tmp_path, sf_dir):
    """Replay part of the log, drop 'lang', resume — the remaining epochs
    still carry 'lang' and must have it DISCARDED via the tombstone pin
    (negotiate must not re-add it); the final state equals an
    uninterrupted replay dropped at the END (the dropped column's values
    never influence any other column under row-LWW)."""
    log = _log(tmp_path, sf_dir)
    lake, ref = f"{tmp_path}/lake", f"{tmp_path}/ref"
    replay(log, ref, ReplayConfig(**CFG))
    drop_column(ref, "lang")

    replay(log, lake, ReplayConfig(**CFG), max_epoch=1)
    m = drop_column(lake, "lang")
    assert m["maintenance"] == "drop:lang"
    assert m["column_drops"] == ["lang"]
    assert sink.changelog_pos(m) == 1  # no changelog consumed
    assert "lang" not in lake_table(lake).column_names

    out = replay(log, lake, ReplayConfig(**CFG))  # epoch 2 still says 'lang'
    assert out["epochs_run"] == [2]
    assert "lang" not in lake_table(lake).column_names
    assert state_hash(lake) == state_hash(ref)
    assert sink.read_manifest(lake)["column_drops"] == ["lang"]  # pin carried


def test_drop_pin_survives_maintenance_and_composes_with_rename(tmp_path, sf_dir):
    log = _log(tmp_path, sf_dir, name="log_chain")
    lake = f"{tmp_path}/lake_chain"
    replay(log, lake, ReplayConfig(**CFG), max_epoch=0)
    rename_column(lake, "lang", "language")
    drop_column(lake, "language")
    compact(lake)  # maintenance must carry both pins
    m = sink.read_manifest(lake)
    assert m["column_renames"] == {"lang": "language"}
    assert m["column_drops"] == ["language"]
    # Old-name 'lang' events rename onto 'language' FIRST, then the
    # tombstone discards them — same logical column, one rule.
    replay(log, lake, ReplayConfig(**CFG))
    ref = f"{tmp_path}/ref_chain"
    replay(log, ref, ReplayConfig(**CFG))
    drop_column(ref, "lang")
    assert state_hash(lake) == state_hash(ref)


def test_drop_rejections(tmp_path, sf_dir):
    log = _log(tmp_path, sf_dir, name="log_rej", evolve_at_epoch=1)
    lake = f"{tmp_path}/lake_rej"
    spec = [
        {"name": "n_live", "agg": "count"},
        {"name": "total_bytes", "agg": "sum", "col": "size_bytes"},
    ]
    replay(log, lake, ReplayConfig(**CFG, summary_spec=spec), max_epoch=1)
    for col in ("repo", "path", "seq", "op", "content", "content_sha256"):
        with pytest.raises(ValueError, match="engine-managed"):
            drop_column(lake, col)
    with pytest.raises(ValueError, match="no column"):
        drop_column(lake, "nope")
    with pytest.raises(ValueError, match="summary metric"):
        drop_column(lake, "size_bytes")  # pinned metric reads it
    drop_column(lake, "lang")
    with pytest.raises(ValueError, match="tombstoned"):
        rename_column(lake, "commit", "lang")  # rename ONTO a tombstone


def test_backfill_readds_dropped_name_and_clears_tombstone(tmp_path, sf_dir):
    """backfill(column, dtype=) is the explicit re-add path: the
    tombstone clears, and the remaining epochs' values for the column
    apply again (rows they touch), while rows last written before the
    re-add keep the backfilled value."""
    log = _log(tmp_path, sf_dir, name="log_readd")
    lake = f"{tmp_path}/lake_readd"
    replay(log, lake, ReplayConfig(**CFG), max_epoch=1)
    drop_column(lake, "lang")
    backfill(lake, "lang", lambda t: pa.nulls(t.num_rows, pa.string()),
             dtype=pa.string())
    assert not sink.read_manifest(lake).get("column_drops")
    replay(log, lake, ReplayConfig(**CFG))  # epoch 2 carries lang again
    got = lake_table(lake)
    assert "lang" in got.column_names
    # Rows whose winning write came from epoch 2 carry real lang values;
    # earlier winners keep the backfilled null.
    ref = f"{tmp_path}/ref_readd"
    replay(log, ref, ReplayConfig(**CFG))
    want = lake_table(ref)
    key = lambda t: {  # noqa: E731
        (r, p): (l, s)
        for r, p, l, s in zip(
            t.column("repo").to_pylist(), t.column("path").to_pylist(),
            t.column("lang").to_pylist(), t.column("seq").to_pylist(),
        )
    }
    got_k, want_k = key(got), key(want)
    assert got_k.keys() == want_k.keys()
    # Determine each key's winning epoch from its seq: epoch 2's events
    # hold a contiguous seq range (synth stamps seq = global order).
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    e2 = pq.read_table(f"{tmp_path}/log_readd/epoch=00002", columns=["seq"])
    e2_lo = pc.min(e2.column("seq")).as_py()
    for k, (lang, seq) in want_k.items():
        got_lang = got_k[k][0]
        if seq >= e2_lo:
            assert got_lang == lang  # re-applied by epoch 2
        else:
            assert got_lang is None  # backfilled


def test_drop_on_patch_mode_lake(tmp_path, sf_dir):
    """Column-mode (patch) lake × drop: each payload column folds
    independently and the row seq is the latest post-barrier I/U seq
    regardless of payload, so a patch whose only change was the dropped
    column becomes a seq-bump no-op — mid-stream drop still equals
    drop-at-end, and both pins (update_mode, column_drops) must survive a
    resume with the caller's DEFAULT row-mode config."""
    log = synth_changelog(
        sf_dir, f"{tmp_path}/log_patch",
        SynthConfig(seed=33, n_events=2500, n_epochs=3, n_keys=500,
                    op_mix=(30, 60, 10), patch_null_frac=0.5),
    )
    lake, ref = f"{tmp_path}/lake_patch", f"{tmp_path}/ref_patch"
    replay(log, ref, ReplayConfig(**CFG, update_mode="column"))
    drop_column(ref, "lang")
    replay(log, lake, ReplayConfig(**CFG, update_mode="column"), max_epoch=1)
    drop_column(lake, "lang")
    replay(log, lake, ReplayConfig(**CFG))  # default cfg: pins must win
    m = sink.read_manifest(lake)
    assert m["update_mode"] == "column"
    assert m["column_drops"] == ["lang"]
    assert state_hash(lake) == state_hash(ref)


def test_ddl_chain_property(tmp_path, sf_dir):
    """Hypothesis: ANY valid interleaved chain of renames/drops (no
    re-add) over the payload columns, applied mid-stream with the rest
    of the changelog still emitting ORIGINAL names, yields the same
    state as the uninterrupted replay with the same chain applied at the
    end — i.e. the rename map + drop tombstones compose associatively
    with row-LWW replay."""
    from hypothesis import assume, given, settings
    from hypothesis import strategies as st

    log = synth_changelog(
        sf_dir, f"{tmp_path}/log_fuzz",
        SynthConfig(seed=42, n_events=1200, n_epochs=2, n_keys=300),
    )
    case = [0]

    ops_strategy = st.lists(
        st.tuples(st.sampled_from(["rename", "drop"]), st.integers(0, 1)),
        min_size=1, max_size=4,
    )

    @settings(max_examples=5, deadline=None)
    @given(ops=ops_strategy)
    def _check(ops):
        cols = {0: "commit", 1: "lang"}  # logical column -> current name
        applied = []
        fresh = iter(f"col_{i}" for i in range(10))
        for kind, idx in ops:
            cur = cols.get(idx)
            if cur is None:
                continue  # already dropped — invalid op, skip
            if kind == "rename":
                new = next(fresh)
                applied.append(("rename", cur, new))
                cols[idx] = new
            else:
                applied.append(("drop", cur))
                cols[idx] = None
        assume(applied)
        case[0] += 1
        lake, ref = f"{tmp_path}/fz{case[0]}", f"{tmp_path}/fzr{case[0]}"

        def run_chain(lk):
            for op in applied:
                if op[0] == "rename":
                    rename_column(lk, op[1], op[2])
                else:
                    drop_column(lk, op[1])

        replay(log, lake, ReplayConfig(**CFG), max_epoch=0)
        run_chain(lake)
        replay(log, lake, ReplayConfig(**CFG))  # epoch 1: original names
        replay(log, ref, ReplayConfig(**CFG))
        run_chain(ref)
        assert state_hash(lake) == state_hash(ref)

    _check()


def test_replicate_follows_source_through_drop(tmp_path, sf_dir):
    """Changefeed DDL replication: a replica caught up pre-drop must
    follow the source through drop + further epochs and stay
    hash-identical (replicate replays the drop before the feed)."""
    from engine.cdc.bootstrap import replicate

    log = _log(tmp_path, sf_dir, name="log_rep")
    src, rep = f"{tmp_path}/src", f"{tmp_path}/rep"
    replay(log, src, ReplayConfig(**CFG), max_epoch=1)
    replicate(src, rep, ReplayConfig(**CFG))
    assert state_hash(rep) == state_hash(src)
    drop_column(src, "lang")
    replay(log, src, ReplayConfig(**CFG))  # epoch 2, events still carry lang
    out = replicate(src, rep, ReplayConfig(**CFG))
    assert out["applied"] > 0
    assert state_hash(rep) == state_hash(src)
    assert "lang" not in lake_table(rep).column_names
