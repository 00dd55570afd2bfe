"""Stream-table enrichment: events joined against committed lake state
must read exactly what the lake holds (incl. nulls for deleted keys),
and time-travel enrichment must read the pinned epoch's state."""

import pandas as pd

from engine.cdc.enrich import enrich_with_lake
from engine.cdc.replay import ReplayConfig, replay
from engine.cdc.synth import SynthConfig, synth_changelog
from engine.cdc.tailer import read_epoch
from engine.cdc.verify import lake_table


def test_enrich_matches_lake_state(tmp_path, sf_dir):
    log = synth_changelog(
        sf_dir, f"{tmp_path}/log",
        SynthConfig(seed=42, n_events=1200, n_epochs=2, n_keys=300),
    )
    lake = f"{tmp_path}/lake"
    replay(log, lake, ReplayConfig(num_partitions=4, num_salts=2))

    stream = read_epoch(log, 0).select_columns(["repo", "path", "seq"])
    out = enrich_with_lake(
        stream, lake, keys=("repo", "path"), columns=["content_sha256"]
    ).to_pandas()

    state = (
        lake_table(lake)
        .to_pandas()
        .set_index(["repo", "path"])["content_sha256"]
        .to_dict()
    )
    assert len(out) == stream.count()  # left join: every stream row survives
    checked_live = checked_deleted = 0
    for _, row in out.iterrows():
        want = state.get((row["repo"], row["path"]))
        got = row["content_sha256"]
        if want is None:
            assert pd.isna(got), (row["repo"], row["path"])
            checked_deleted += 1
        else:
            assert got == want, (row["repo"], row["path"])
            checked_live += 1
    assert checked_live > 0 and checked_deleted > 0  # both branches exercised

    # time travel: pin epoch 0 — enrichment must read epoch-0 state, which
    # differs from the final state for keys updated in epoch 1.
    out0 = enrich_with_lake(
        stream, lake, keys=("repo", "path"), columns=["content_sha256"], epoch=0
    ).to_pandas()
    state0 = (
        lake_table(lake, epoch=0)
        .to_pandas()
        .set_index(["repo", "path"])["content_sha256"]
        .to_dict()
    )
    diffs = 0
    for _, row in out0.iterrows():
        want = state0.get((row["repo"], row["path"]))
        got = row["content_sha256"]
        assert (pd.isna(got) and want is None) or got == want
        if want != state.get((row["repo"], row["path"])):
            diffs += 1
    assert diffs > 0  # epoch-0 state genuinely differs from final
