"""Incremental per-repo summary (materialized-view maintenance):
the epoch-folded summary must equal a full recompute from the lake at
every commit point, survive resume, and be idempotent under re-replay."""

from __future__ import annotations

import tempfile

from engine.cdc.replay import ReplayConfig, replay
from engine.cdc.summary import read_summary, recompute_summary
from engine.cdc.synth import SynthConfig, synth_changelog

CFG = ReplayConfig(num_partitions=8, num_salts=2)


def _mini_log(sf_dir: str, work: str) -> str:
    return synth_changelog(
        sf_dir,
        f"{work}/log",
        SynthConfig(seed=7, n_events=6000, n_epochs=3, n_keys=900,
                    hot_event_frac=0.5, evolve_at_epoch=2),
    )


def test_summary_matches_recompute_every_epoch(ray_session, sf_dir):
    work = tempfile.mkdtemp(prefix="cdc_sum_")
    log = _mini_log(sf_dir, work)
    lake = f"{work}/lake"
    replay(log, lake, CFG)
    for epoch in (0, 1, 2):
        inc = read_summary(lake, epoch)
        full = recompute_summary(lake, epoch)
        assert inc.equals(full), f"epoch {epoch}: incremental != recompute"
    assert read_summary(lake).num_rows > 0


def test_summary_resume_and_idempotence(ray_session, sf_dir):
    work = tempfile.mkdtemp(prefix="cdc_sumr_")
    log = _mini_log(sf_dir, work)
    lake = f"{work}/lake"
    replay(log, lake, CFG, max_epoch=0)          # partial run
    mid = read_summary(lake)
    assert mid.equals(recompute_summary(lake))
    replay(log, lake, CFG)                        # resume to completion
    final = read_summary(lake)
    assert final.equals(recompute_summary(lake))
    again = replay(log, lake, CFG)                # full re-replay = no-op
    assert again["epochs_run"] == []
    assert read_summary(lake).equals(final)


def test_summary_distributed_fold_matches_driver(ray_session, sf_dir):
    """Bucketed Ray fold (summary ∪ deltas) at P=16 must produce the same
    committed summary as the driver fold and equal a full recompute at
    every epoch."""
    work = tempfile.mkdtemp(prefix="cdc_sumd_")
    log = _mini_log(sf_dir, work)
    cfg_d = ReplayConfig(num_partitions=16, num_salts=2, summary_fold="distributed")
    cfg_v = ReplayConfig(num_partitions=16, num_salts=2, summary_fold="driver")
    lake_d, lake_v = f"{work}/lake_d", f"{work}/lake_v"
    replay(log, lake_d, cfg_d)
    replay(log, lake_v, cfg_v)
    for epoch in (0, 1, 2):
        dist = read_summary(lake_d, epoch)
        assert dist.equals(read_summary(lake_v, epoch)), f"epoch {epoch}: fold modes differ"
        assert dist.equals(recompute_summary(lake_d, epoch)), f"epoch {epoch}: != recompute"


def test_summary_custom_metric_spec(ray_session, sf_dir):
    """User-defined metric spec (count + SUM(size_bytes) + chars): the
    fold equals a recompute at every epoch (including epochs before
    size_bytes evolved in — missing column contributes 0), the spec is
    pinned in the manifest, survives purge + repartition maintenance,
    and a resume with a stale default config adopts the pinned spec."""
    import pyarrow.compute as pc

    from engine.cdc import sink
    from engine.cdc.maintain import purge, repartition

    spec = [
        {"name": "n_live", "agg": "count"},
        {"name": "total_bytes", "agg": "sum", "col": "size_bytes"},
        {"name": "n_chars", "agg": "chars", "col": "content"},
    ]
    work = tempfile.mkdtemp(prefix="cdc_sumc_")
    log = _mini_log(sf_dir, work)
    lake = f"{work}/lake"
    cfg = ReplayConfig(num_partitions=8, num_salts=2, summary_spec=spec)
    replay(log, lake, cfg, max_epoch=1)
    m = sink.read_manifest(lake)
    assert m["summary_spec"] == spec
    assert read_summary(lake).column_names == ["repo", "n_live", "total_bytes", "n_chars"]
    for epoch in (0, 1):
        assert read_summary(lake, epoch).equals(recompute_summary(lake, epoch))

    # Resume with a config that DOESN'T declare the spec: pinned wins.
    replay(log, lake, CFG)
    assert sink.read_manifest(lake).get("summary_spec") == spec
    assert read_summary(lake).equals(recompute_summary(lake))
    # size_bytes evolved at epoch 2 → some non-zero sums now exist.
    assert pc.sum(read_summary(lake).column("total_bytes")).as_py() > 0

    # Maintenance keeps the pin and the invariant.
    victim = read_summary(lake).column("repo")[0].as_py()
    purge(lake, lambda t: pc.equal(t.column("repo"), victim))
    repartition(lake, 16)
    m2 = sink.read_manifest(lake)
    assert m2["summary_spec"] == spec
    s = read_summary(lake)
    assert s.equals(recompute_summary(lake))
    assert victim not in s.column("repo").to_pylist()


def test_summary_spec_validation_errors():
    import pytest

    from engine.cdc.summary import validate_spec

    with pytest.raises(ValueError, match="exactly one 'count'"):
        validate_spec([{"name": "a", "agg": "count"}, {"name": "b", "agg": "count"}])
    with pytest.raises(ValueError, match="exactly one 'count'"):
        validate_spec([{"name": "a", "agg": "chars", "col": "content"}])
    with pytest.raises(ValueError, match="unique non-empty"):
        validate_spec([{"name": "a", "agg": "count"}, {"name": "a", "agg": "sum", "col": "x"}])
    with pytest.raises(ValueError, match="unknown summary agg"):
        validate_spec([{"name": "a", "agg": "count"}, {"name": "b", "agg": "avg", "col": "x"}])
    with pytest.raises(ValueError, match="needs 'col'"):
        validate_spec([{"name": "a", "agg": "count"}, {"name": "b", "agg": "sum"}])
