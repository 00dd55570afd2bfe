"""Continuous tail mode: replay(follow=True) must pick up epochs sealed
while it runs (atomic directory rename = the seal), converge to the
sequential oracle, and stop cleanly."""

import os
import shutil
import threading
import time

from engine.cdc import sink
from engine.cdc.oracle import oracle_state_hash
from engine.cdc.replay import ReplayConfig, replay
from engine.cdc.synth import SynthConfig, synth_changelog
from engine.cdc.verify import state_hash


def test_follow_converges_and_stops(tmp_path, sf_dir):
    # Stage the full 4-epoch changelog, then publish epochs one at a time
    # into the live log dir by atomic rename while the follower runs.
    staging = synth_changelog(
        sf_dir, f"{tmp_path}/staging",
        SynthConfig(seed=42, n_events=1600, n_epochs=4, n_keys=400),
    )
    live = f"{tmp_path}/live"
    os.makedirs(live)
    epochs = sorted(os.listdir(staging))
    epochs = [e for e in epochs if e.startswith("epoch=")]
    os.rename(os.path.join(staging, epochs[0]), os.path.join(live, epochs[0]))

    lake = f"{tmp_path}/lake"
    stop = threading.Event()
    result = {}

    def _follow():
        result["out"] = replay(
            live, lake,
            ReplayConfig(num_partitions=4, num_salts=2, write_mode="delta"),
            follow=True, poll_s=0.1, stop=stop,
        )

    t = threading.Thread(target=_follow)
    t.start()
    try:
        for e in epochs[1:]:
            time.sleep(0.3)
            os.rename(os.path.join(staging, e), os.path.join(live, e))
        deadline = time.time() + 120
        while time.time() < deadline and sink.last_committed_epoch(lake) != 3:
            time.sleep(0.2)
        assert sink.last_committed_epoch(lake) == 3, "follower never caught up"
    finally:
        stop.set()
        t.join(timeout=60)
    assert not t.is_alive()
    out = result["out"]
    assert out["epochs_run"] == [0, 1, 2, 3]
    assert state_hash(lake) == oracle_state_hash(live)
    # Restart the follower over the fully-sealed log: everything skipped.
    out2 = replay(
        live, lake, ReplayConfig(num_partitions=4, num_salts=2, write_mode="delta"),
        follow=True, poll_s=0.05, idle_timeout_s=0.2,
    )
    assert out2["epochs_run"] == [] and out2["epochs_skipped"] == [0, 1, 2, 3]
    shutil.rmtree(staging)


def test_follow_idle_timeout_exits_without_stop_event(tmp_path, sf_dir):
    log = synth_changelog(
        sf_dir, f"{tmp_path}/log",
        SynthConfig(seed=42, n_events=800, n_epochs=2, n_keys=200),
    )
    lake = f"{tmp_path}/lake"
    t0 = time.time()
    out = replay(
        log, lake, ReplayConfig(num_partitions=4, num_salts=2),
        follow=True, poll_s=0.05, idle_timeout_s=0.3,
    )
    assert out["epochs_run"] == [0, 1]
    assert time.time() - t0 < 60
    assert state_hash(lake) == oracle_state_hash(log)


def test_follow_from_memory_source(tmp_path, sf_dir):
    """replay(follow=True) driven by the NON-directory source: a producer
    thread appends Arrow tables into a MemorySource and seals epochs
    while the follower runs; the final lake state must converge to the
    sequential oracle replay of the same changelog."""
    import pyarrow.parquet as pq

    from engine.cdc.tailer import MemorySource, epoch_files

    log = synth_changelog(
        sf_dir, f"{tmp_path}/log",
        SynthConfig(seed=42, n_events=1600, n_epochs=4, n_keys=400),
    )
    src = MemorySource()
    # Epoch 0 sealed before the follower starts; the rest stream in.
    for f in epoch_files(log, 0):
        src.append(0, pq.read_table(f))
    src.seal(0)

    lake = f"{tmp_path}/lake"
    stop = threading.Event()
    result = {}

    def _follow():
        result["out"] = replay(
            src, lake,
            ReplayConfig(num_partitions=4, num_salts=2, write_mode="delta"),
            follow=True, poll_s=0.1, stop=stop,
        )

    t = threading.Thread(target=_follow)
    t.start()
    try:
        for k in (1, 2, 3):
            time.sleep(0.3)
            for f in epoch_files(log, k):
                src.append(k, pq.read_table(f))
            src.seal(k)
        deadline = time.time() + 120
        while time.time() < deadline and sink.last_committed_epoch(lake) != 3:
            time.sleep(0.2)
        assert sink.last_committed_epoch(lake) == 3, "memory follower never caught up"
    finally:
        stop.set()
        t.join(timeout=60)
    assert not t.is_alive()
    assert result["out"]["epochs_run"] == [0, 1, 2, 3]
    assert state_hash(lake) == oracle_state_hash(log)


def test_follow_patch_mode_from_memory_source(tmp_path, sf_dir):
    """Continuous tail x column-level LWW: patch events streamed through
    a MemorySource with replay(follow=True, update_mode='column')
    converge to the patch-semantics sequential oracle."""
    import pyarrow.parquet as pq

    from engine.cdc.tailer import MemorySource, epoch_files

    log = synth_changelog(
        sf_dir, f"{tmp_path}/plog",
        SynthConfig(seed=9, n_events=1600, n_epochs=3, n_keys=400,
                    op_mix=(30, 60, 10), patch_null_frac=0.6),
    )
    src = MemorySource()
    for f in epoch_files(log, 0):
        src.append(0, pq.read_table(f))
    src.seal(0)

    lake = f"{tmp_path}/plake"
    stop = threading.Event()
    result = {}

    def _follow():
        result["out"] = replay(
            src, lake,
            ReplayConfig(num_partitions=4, num_salts=2, update_mode="column"),
            follow=True, poll_s=0.1, stop=stop,
        )

    t = threading.Thread(target=_follow)
    t.start()
    try:
        for k in (1, 2):
            time.sleep(0.3)
            for f in epoch_files(log, k):
                src.append(k, pq.read_table(f))
            src.seal(k)
        deadline = time.time() + 120
        while time.time() < deadline and sink.last_committed_epoch(lake) != 2:
            time.sleep(0.2)
        assert sink.last_committed_epoch(lake) == 2
    finally:
        stop.set()
        t.join(timeout=60)
    assert not t.is_alive()
    assert state_hash(lake) == oracle_state_hash(log, update_mode="column")


PRODUCER = r'''
import json, os, sys, time
import pyarrow.parquet as pq

log = sys.argv[1]
sys.stdout.write("this is not json\n")  # wire noise: must be skipped
for name in sorted(os.listdir(log)):
    if not name.startswith("epoch="):
        continue
    edir = os.path.join(log, name)
    for f in sorted(os.listdir(edir)):
        if not f.endswith(".parquet"):
            continue
        for row in pq.read_table(os.path.join(edir, f)).to_pylist():
            sys.stdout.write(json.dumps(row) + "\n")
    sys.stdout.write(json.dumps({"__seal__": int(name.split("=")[1])}) + "\n")
    sys.stdout.flush()
    time.sleep(0.2)
# Uncommitted tail after the last seal: must be discarded, not applied.
sys.stdout.write(json.dumps({"seq": 999999, "op": "D", "repo": "repo-001",
                             "path": "ghost", "commit": "x", "lang": "py",
                             "content": "x"}) + "\n")
sys.stdout.flush()
'''


def test_follow_from_subprocess_stream(tmp_path, sf_dir):
    """External tail connector (VERDICT r4 #6): an NDJSON producer
    subprocess streams the changelog through tailer.StreamSource;
    replay(follow=True) converges to the sequential oracle. Wire noise
    is skipped, the unsealed tail is discarded."""
    import sys as _sys

    from engine.cdc import tailer

    log = synth_changelog(
        sf_dir, f"{tmp_path}/log_ext",
        SynthConfig(seed=42, n_events=1200, n_epochs=3, n_keys=300),
    )
    schema = tailer.epoch_schema(log, 0)
    src = tailer.StreamSource.from_subprocess(
        [_sys.executable, "-c", PRODUCER, log], schema=schema
    )
    lake = f"{tmp_path}/lake_ext"
    try:
        out = replay(
            src, lake, ReplayConfig(num_partitions=4, num_salts=2),
            follow=True, poll_s=0.1, idle_timeout_s=3.0,
        )
    finally:
        src.close()
    assert out["epochs_run"] == [0, 1, 2]
    assert src.lines_skipped == 1  # the garbage line
    assert src.tail_discarded == 1  # the post-seal ghost delete
    assert state_hash(lake) == oracle_state_hash(log)

    # Reconnect semantics: a fresh producer over the same log is a pure
    # duplicate delivery — every epoch skips via the manifest.
    src2 = tailer.StreamSource.from_subprocess(
        [_sys.executable, "-c", PRODUCER, log], schema=schema
    )
    try:
        out2 = replay(
            src2, lake, ReplayConfig(num_partitions=4, num_salts=2),
            follow=True, poll_s=0.1, idle_timeout_s=3.0,
        )
    finally:
        src2.close()
    # epochs_skipped reflects the FIRST drain (which may poll before the
    # producer's first seal) — the binding assertion is zero re-runs.
    assert out2["epochs_run"] == []
    assert state_hash(lake) == oracle_state_hash(log)
