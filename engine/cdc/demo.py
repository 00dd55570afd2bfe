"""Flagship demo pipeline for the driver's smoke check (SURVEY.md §3.1).

Synthesises a deterministic changelog from the sf documents table,
replays it through the full CDC pipeline (validate → conform → partition
→ salted sub-LWW shuffle → merge-apply actor pool → two-phase manifest
commit) and returns the lake as a streaming Dataset. Never calls
``ray.init`` (driver contract)."""

from __future__ import annotations

import tempfile

import ray.data as rd

from engine.cdc.replay import ReplayConfig, replay
from engine.cdc.synth import SynthConfig, synth_changelog
from engine.cdc.verify import read_lake


def flagship(
    sf_dir: str,
    work_dir: str | None = None,
    n_events: int = 6000,
    n_epochs: int = 3,
    num_partitions: int = 16,
    num_salts: int = 2,
) -> rd.Dataset:
    work_dir = work_dir or tempfile.mkdtemp(prefix="cdc_flagship_")
    log_dir = synth_changelog(
        sf_dir,
        f"{work_dir}/log",
        SynthConfig(
            seed=42,
            n_events=n_events,
            n_epochs=n_epochs,
            n_keys=max(100, n_events // 5),
            hot_event_frac=0.3,
            evolve_at_epoch=max(1, n_epochs - 1),
        ),
    )
    lake_dir = f"{work_dir}/lake"
    replay(log_dir, lake_dir, ReplayConfig(num_partitions=num_partitions, num_salts=num_salts))
    return read_lake(lake_dir)
