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
