"""ALTER-style column rename (engine/cdc/maintain.py::rename_column,
VERDICT r4 #8): a manifest-pinned maintenance version that renames a
payload column state-hash-invariantly (up to the name), keeps resume
exact when the producer still emits the OLD name, and replicates as DDL
through the changefeed."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from engine.cdc import sink
from engine.cdc.maintain import rename_column
from engine.cdc.replay import ReplayConfig, replay
from engine.cdc.synth import SynthConfig, synth_changelog
from engine.cdc.verify import lake_table, state_hash

CFG = dict(num_partitions=8, num_salts=2)


def _log(tmp, sf_dir, name="log", **kw):
    return synth_changelog(
        sf_dir, f"{tmp}/{name}",
        SynthConfig(seed=42, n_events=2400, n_epochs=3, n_keys=500, **kw),
    )


def test_rename_midstream_resume_with_old_name_events(tmp_path, sf_dir):
    """Replay part of the log, rename lang→language, resume — the
    remaining epochs still carry 'lang' and must map onto 'language'
    via the pinned rename map; the final state equals an uninterrupted
    replay renamed at the END (values identical, name applied)."""
    log = _log(tmp_path, sf_dir)
    lake, ref = f"{tmp_path}/lake", f"{tmp_path}/ref"
    replay(log, ref, ReplayConfig(**CFG))
    rename_column(ref, "lang", "language")

    replay(log, lake, ReplayConfig(**CFG), max_epoch=1)
    pre = lake_table(lake)
    m = rename_column(lake, "lang", "language")
    assert m["maintenance"] == "rename:lang>language"
    assert m["column_renames"] == {"lang": "language"}
    assert sink.changelog_pos(m) == 1  # no changelog consumed
    post = lake_table(lake)
    assert post.column("language").to_pylist() == pre.column("lang").to_pylist()
    assert "lang" not in post.column_names

    out = replay(log, lake, ReplayConfig(**CFG))  # epoch 2 still says 'lang'
    assert out["epochs_run"] == [2]
    assert state_hash(lake) == state_hash(ref)
    final = sink.read_manifest(lake)
    assert final["column_renames"] == {"lang": "language"}  # pin carried


def test_rename_chain_composes_and_survives_maintenance(tmp_path, sf_dir):
    from engine.cdc.maintain import compact

    log = _log(tmp_path, sf_dir, name="log_chain")
    lake = f"{tmp_path}/lake_chain"
    replay(log, lake, ReplayConfig(**CFG), max_epoch=0)
    rename_column(lake, "lang", "language")
    compact(lake)  # maintenance must carry the pin
    assert sink.read_manifest(lake)["column_renames"] == {"lang": "language"}
    rename_column(lake, "language", "tongue")
    m = sink.read_manifest(lake)
    assert m["column_renames"] == {"lang": "tongue", "language": "tongue"}
    replay(log, lake, ReplayConfig(**CFG))  # 'lang' events map across the chain
    ref = f"{tmp_path}/ref_chain"
    replay(log, ref, ReplayConfig(**CFG))
    rename_column(ref, "lang", "tongue")
    assert state_hash(lake) == state_hash(ref)


def test_rename_rejects_managed_and_invalid(tmp_path, sf_dir):
    log = _log(tmp_path, sf_dir, name="log_rej")
    lake = f"{tmp_path}/lake_rej"
    replay(log, lake, ReplayConfig(**CFG), max_epoch=0)
    for old, new in (("repo", "r"), ("content", "body"), ("seq", "s"),
                     ("lang", "content_sha256")):
        with pytest.raises(ValueError):
            rename_column(lake, old, new)
    with pytest.raises(ValueError, match="no column"):
        rename_column(lake, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        rename_column(lake, "lang", "commit")


def test_replicate_follows_source_through_rename(tmp_path, sf_dir):
    """Changefeed DDL replication: a replica caught up pre-rename must
    follow the source through rename + further epochs and stay
    hash-identical (replicate replays the rename before the feed)."""
    from engine.cdc.bootstrap import replicate

    log = _log(tmp_path, sf_dir, name="log_rep")
    src, rep = f"{tmp_path}/src", f"{tmp_path}/rep"
    replay(log, src, ReplayConfig(**CFG), max_epoch=1)
    replicate(src, rep, ReplayConfig(**CFG))
    assert state_hash(rep) == state_hash(src)
    rename_column(src, "lang", "language")
    replay(log, src, ReplayConfig(**CFG))  # epoch 2, old-name events
    out = replicate(src, rep, ReplayConfig(**CFG))
    assert out["applied"] > 0
    assert state_hash(rep) == state_hash(src)
    assert "language" in lake_table(rep).column_names


def test_rename_updates_pinned_summary_spec(tmp_path, sf_dir):
    from engine.cdc.summary import read_summary, recompute_summary

    log = _log(tmp_path, sf_dir, name="log_sum", evolve_at_epoch=1)
    lake = f"{tmp_path}/lake_sum"
    spec = [
        {"name": "n_live", "agg": "count"},
        {"name": "total_bytes", "agg": "sum", "col": "size_bytes"},
    ]
    replay(log, lake, ReplayConfig(**CFG, summary_spec=spec), max_epoch=1)
    rename_column(lake, "size_bytes", "nbytes")
    m = sink.read_manifest(lake)
    assert m["summary_spec"][1]["col"] == "nbytes"
    replay(log, lake, ReplayConfig(**CFG, summary_spec=spec))
    assert read_summary(lake).equals(recompute_summary(lake))
    # The metric really still counts bytes (non-zero after evolution).
    t = read_summary(lake)
    assert pc.sum(t.column("total_bytes")).as_py() > 0
