"""Zero-copy lake clones (engine/cdc/clone.py): branch-at-version via
hardlinks, independent divergence, vacuum isolation."""

import os

import pyarrow.compute as pc
import pytest

from engine.cdc import sink
from engine.cdc.clone import clone_lake
from engine.cdc.maintain import purge
from engine.cdc.replay import ReplayConfig, replay
from engine.cdc.synth import SynthConfig, synth_changelog
from engine.cdc.vacuum import vacuum
from engine.cdc.verify import state_hash

CFG = dict(num_partitions=8, num_salts=2)


def _log(tmp, sf_dir, name="log", **kw):
    return synth_changelog(
        sf_dir, f"{tmp}/{name}",
        SynthConfig(seed=27, n_events=3000, n_epochs=3, n_keys=600, **kw),
    )


def test_clone_resumes_and_diverges_independently(tmp_path, sf_dir):
    log = _log(tmp_path, sf_dir)
    src, dst = f"{tmp_path}/src", f"{tmp_path}/dst"
    replay(log, src, ReplayConfig(**CFG), max_epoch=1)
    h_branch = state_hash(src)

    m = clone_lake(src, dst)
    assert m["epoch"] == sink.read_manifest(src)["epoch"]
    assert state_hash(dst) == h_branch
    # Data files share inodes (no pages copied).
    rels = next(iter(sink.active_files(m).values()))
    s1 = os.stat(os.path.join(src, rels[0]))
    s2 = os.stat(os.path.join(dst, rels[0]))
    assert (s1.st_dev, s1.st_ino) == (s2.st_dev, s2.st_ino)

    # Both sides resume the same changelog to the same state...
    replay(log, src, ReplayConfig(**CFG))
    replay(log, dst, ReplayConfig(**CFG))
    assert state_hash(src) == state_hash(dst)
    # ...then diverge: purge on the branch leaves the source untouched.
    h_src = state_hash(src)
    purge(dst, lambda t: pc.equal(t.column("lang"), t.column("lang")))  # drop all
    assert state_hash(src) == h_src
    assert state_hash(dst) != h_src


def test_clone_survives_source_vacuum(tmp_path, sf_dir):
    log = _log(tmp_path, sf_dir, name="log_v")
    src, dst = f"{tmp_path}/src_v", f"{tmp_path}/dst_v"
    replay(log, src, ReplayConfig(**CFG), max_epoch=0)
    clone_lake(src, dst)
    h_clone = state_hash(dst)

    # Source advances (rewrite-on-touch retires the branch point's files)
    # and vacuums aggressively: the clone's hardlinks must keep its
    # version readable, byte-identical.
    replay(log, src, ReplayConfig(**CFG))
    vacuum(src, retain_last=1)
    assert state_hash(dst) == h_clone

    # Cloning onto an existing lake fails loudly.
    with pytest.raises((RuntimeError, sink.CommitConflict)):
        clone_lake(src, dst)
