"""Additive schema evolution through the full replay (SURVEY.md §5)."""

from engine.cdc import sink
from engine.cdc.oracle import oracle_state_hash
from engine.cdc.replay import ReplayConfig, replay
from engine.cdc.synth import SynthConfig, synth_changelog
from engine.cdc.verify import lake_table, state_hash


def test_mid_stream_column_backfills_as_null(tmp_path, sf_dir):
    log = synth_changelog(
        sf_dir,
        f"{tmp_path}/log",
        SynthConfig(seed=42, n_events=1800, n_epochs=3, n_keys=500, evolve_at_epoch=1),
    )
    lake = f"{tmp_path}/lake"
    replay(log, lake, ReplayConfig(num_partitions=8, num_salts=2))
    assert state_hash(lake) == oracle_state_hash(log)

    t = lake_table(lake)
    assert "size_bytes" in t.column_names
    rows = t.to_pylist()
    # Keys last written before the evolution epoch carry null; later ones
    # carry the populated value.
    pre = [r for r in rows if r["seq"] < 600]
    post = [r for r in rows if r["seq"] >= 600]
    assert pre and all(r["size_bytes"] is None for r in pre)
    assert post and all(r["size_bytes"] == len(r["content"]) for r in post)

    # The negotiated schema is recorded in the manifest and carried forward.
    m = sink.read_manifest(lake)
    assert "size_bytes" in m["schema_names"]


def test_schema_stable_when_no_evolution(tmp_path, sf_dir):
    log = synth_changelog(
        sf_dir,
        f"{tmp_path}/log2",
        SynthConfig(seed=42, n_events=900, n_epochs=2, n_keys=300),
    )
    lake = f"{tmp_path}/lake2"
    replay(log, lake, ReplayConfig(num_partitions=4, num_salts=1))
    t = lake_table(lake)
    assert t.column_names == [
        "repo",
        "path",
        "commit",
        "lang",
        "content",
        "content_sha256",
        "seq",
    ]
