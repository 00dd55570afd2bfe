"""Snapshot bootstrap + changefeed export (engine/cdc/bootstrap.py) and
at-least-once delivery idempotence.

The round-trip contracts under test:
- bootstrap(state@B) then replay(log) == full replay (byte-identical hash);
- state@A + changefeed(A→B) applied as one epoch == state@B;
- delivering every event TWICE (at-least-once transport) converges to the
  exactly-once state hash (LWW on unique seq is delivery-idempotent).
"""

import pyarrow as pa
import pytest

from engine.cdc import tailer
from engine.cdc.bootstrap import bootstrap, changefeed
from engine.cdc.replay import ReplayConfig, replay
from engine.cdc.synth import SynthConfig, synth_changelog, epoch_dirs
from engine.cdc.verify import lake_table, state_hash
from engine.util.collect import pull_arrow

CFG = dict(num_partitions=8, num_salts=2)


@pytest.fixture(scope="module")
def replayed(tmp_path_factory, sf_dir):
    """One 3-epoch changelog (schema evolves at epoch 2) fully replayed."""
    tmp = str(tmp_path_factory.mktemp("boot"))
    log = synth_changelog(
        sf_dir, f"{tmp}/log",
        SynthConfig(seed=11, n_events=4000, n_epochs=3, n_keys=700, evolve_at_epoch=2),
    )
    lake = f"{tmp}/lake"
    replay(log, lake, ReplayConfig(**CFG))
    return tmp, log, lake


def test_bootstrap_then_incremental_equals_full_replay(replayed):
    tmp, log, lake = replayed
    snap = lake_table(lake, epoch=1)  # consistent snapshot at changelog pos 1
    lake_b = f"{tmp}/lake_boot"
    bootstrap(snap, lake_b, ReplayConfig(**CFG), epoch=1)
    assert state_hash(lake_b) == state_hash(lake, epoch=1)
    out = replay(log, lake_b, ReplayConfig(**CFG))
    assert out["epochs_run"] == [2] and out["epochs_skipped"] == [0, 1]
    assert state_hash(lake_b) == state_hash(lake)


def test_bootstrap_idempotent_and_refuses_nonempty(replayed):
    tmp, log, lake = replayed
    snap = lake_table(lake, epoch=0)
    lake_b = f"{tmp}/lake_idem"
    m1 = bootstrap(snap, lake_b, ReplayConfig(**CFG), epoch=0)
    m2 = bootstrap(snap, lake_b, ReplayConfig(**CFG), epoch=0)  # no-op
    assert m1["active_files"] == m2["active_files"]
    with pytest.raises(RuntimeError, match="empty lake"):
        bootstrap(snap, lake, ReplayConfig(**CFG), epoch=7)


def test_bootstrap_without_seq_ranks_below_changelog(replayed, sf_dir):
    # A source-export snapshot (payload only, no seq column): constant
    # seq=-1 must lose LWW to every changelog event that later touches
    # the key, and win (persist) where no event does.
    tmp, log, lake = replayed
    snap = lake_table(lake, epoch=0).drop_columns(["seq", "content_sha256"])
    lake_b = f"{tmp}/lake_noseq"
    bootstrap(snap, lake_b, ReplayConfig(**CFG), epoch=0)
    replay(log, lake_b, ReplayConfig(**CFG))
    # Rebuild the reference: epoch-0 state WITH its real seqs + epochs 1-2
    # gives the canonical state; the payload must match per key except the
    # seq column (untouched keys keep seq=-1 instead of their original).
    eng = {
        (r["repo"], r["path"]): r["content_sha256"]
        for r in lake_table(lake_b).to_pylist()
    }
    ora = {
        (r["repo"], r["path"]): r["content_sha256"]
        for r in lake_table(lake).to_pylist()
    }
    assert eng == ora


def test_changefeed_roundtrip(replayed):
    tmp, log, lake = replayed
    cf = pull_arrow(changefeed(lake, from_epoch=0, to_epoch=2))
    assert cf.num_rows > 0 and set(cf.column("op").to_pylist()) <= {"I", "U", "D"}
    lake_c = f"{tmp}/lake_cf"
    bootstrap(lake_table(lake, epoch=0), lake_c, ReplayConfig(**CFG), epoch=0)
    src = tailer.MemorySource()
    src.append(1, cf)
    src.seal(1)
    replay(src, lake_c, ReplayConfig(**CFG))
    assert state_hash(lake_c) == state_hash(lake, epoch=2)


def test_changefeed_empty_and_adjacent(replayed):
    tmp, log, lake = replayed
    assert pull_arrow(changefeed(lake, from_epoch=2, to_epoch=2)) is None
    # Adjacent epochs compose: (0→1 then 1→2) == 0→2 final state.
    cf01 = pull_arrow(changefeed(lake, from_epoch=0, to_epoch=1))
    cf12 = pull_arrow(changefeed(lake, from_epoch=1, to_epoch=2))
    lake_c = f"{tmp}/lake_cf2"
    bootstrap(lake_table(lake, epoch=0), lake_c, ReplayConfig(**CFG), epoch=0)
    src = tailer.MemorySource()
    src.append(1, cf01)
    src.seal(1)
    src.append(2, cf12)
    src.seal(2)
    replay(src, lake_c, ReplayConfig(**CFG))
    assert state_hash(lake_c) == state_hash(lake)


def test_bootstrap_crash_retry_converges(replayed):
    # A bootstrap attempt that crashed between phase 1 (data files
    # written) and phase 2 (manifest commit) leaves orphans; the retry
    # must ignore them and converge to the clean-bootstrap state.
    import os

    import pyarrow.parquet as pq

    tmp, log, lake = replayed
    snap = lake_table(lake, epoch=0)
    lake_b = f"{tmp}/lake_crash"
    orphan_dir = os.path.join(lake_b, "data", "part=3")
    os.makedirs(orphan_dir, exist_ok=True)
    pq.write_table(
        snap.slice(0, 5), os.path.join(orphan_dir, "base-00000-deadbeef.parquet")
    )
    bootstrap(snap, lake_b, ReplayConfig(**CFG), epoch=0)
    assert state_hash(lake_b) == state_hash(lake, epoch=0)


def test_replicate_follows_source(replayed):
    from engine.cdc.bootstrap import replicate

    tmp, log, lake = replayed
    rep = f"{tmp}/replica"
    out = replicate(lake, rep, ReplayConfig(**CFG), to_epoch=0)
    assert out.get("bootstrapped") and out["at_version"] == 0
    assert state_hash(rep) == state_hash(lake, epoch=0)
    out = replicate(lake, rep, ReplayConfig(**CFG), to_epoch=1)
    assert out["applied"] > 0 and out["at_version"] == 1
    assert state_hash(rep) == state_hash(lake, epoch=1)
    out = replicate(lake, rep, ReplayConfig(**CFG))  # to latest
    assert state_hash(rep) == state_hash(lake)
    # Caught up → no-op.
    assert replicate(lake, rep, ReplayConfig(**CFG))["applied"] == 0


def test_changefeed_property_random_streams(tmp_path, sf_dir):
    """Hypothesis over the changefeed: ANY random I/U/D stream split into
    two epochs must round-trip — state@0 + changefeed(0→1) == state@1 —
    including key reuse, delete-then-reinsert, and epochs that change
    nothing for some keys."""
    import os

    import pyarrow.parquet as pq
    from hypothesis import given, settings, strategies as st

    from engine.cdc.replay import ReplayConfig as RC

    events = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),               # key id
            st.sampled_from(["I", "U", "D"]),
            st.sampled_from(["x", "yy", "zzz"]),                 # content
        ),
        min_size=1, max_size=20,
    )

    case = [0]

    @settings(max_examples=5, deadline=None)
    @given(evs=events, split=st.integers(min_value=1, max_value=20))
    def _check(evs, split):
        case[0] += 1
        base = f"{tmp_path}/cffz_{case[0]}"
        log = f"{base}/log"
        rows = {
            "seq": list(range(len(evs))),
            "op": [e[1] for e in evs],
            "repo": [f"r{e[0] % 2}" for e in evs],
            "path": [f"p{e[0]}" for e in evs],
            "commit": ["c0"] * len(evs),
            "lang": ["en"] * len(evs),
            "content": [e[2] for e in evs],
        }
        t = pa.table(rows)
        cut = min(split, len(evs))
        for k, tbl in enumerate((t.slice(0, cut), t.slice(cut))):
            d = f"{log}/epoch={k:05d}"
            os.makedirs(d, exist_ok=True)
            pq.write_table(tbl, f"{d}/part-0000.parquet")
        cfg = RC(num_partitions=2, num_salts=2)
        lake = f"{base}/lake"
        replay(log, lake, cfg)
        cf = pull_arrow(changefeed(lake, from_epoch=0, to_epoch=1))
        lake2 = f"{base}/lake2"
        t0 = lake_table(lake, epoch=0)
        if t0.num_rows:
            bootstrap(t0, lake2, cfg, epoch=0)
        else:
            # Epoch 0 deleted everything (or inserted nothing): start the
            # replica empty by replaying just epoch 0.
            replay(log, lake2, cfg, max_epoch=0)
        if cf is not None:
            src = tailer.MemorySource()
            src.append(1, cf)
            src.seal(1)
            replay(src, lake2, cfg)
        assert state_hash(lake2) == state_hash(lake, epoch=1)

    _check()


def test_duplicate_delivery_idempotent(replayed):
    # At-least-once transport: every epoch's events delivered twice
    # (duplicated rows) must converge to the exactly-once state — LWW on
    # seq is insensitive to duplicates by construction.
    import pyarrow.parquet as pq

    tmp, log, lake = replayed
    src = tailer.MemorySource()
    for epoch, d in epoch_dirs(log):
        t = pa.concat_tables(
            [pq.read_table(f) for f in tailer.epoch_files(log, epoch)]
        )
        src.append(epoch, t)
        src.append(epoch, t)  # the duplicate delivery
        src.seal(epoch)
    lake_d = f"{tmp}/lake_dup"
    replay(src, lake_d, ReplayConfig(**CFG))
    assert state_hash(lake_d) == state_hash(lake)


def test_changefeed_across_repartition(replayed):
    """A repartition between the two versions switches changefeed onto
    the re-keyed exchange path; the feed still round-trips the old state
    to the new state exactly, and composes with post-repartition
    changes."""
    import pyarrow.compute as pc

    from engine.cdc.maintain import purge, repartition

    tmp, log, lake = replayed
    lake_r = f"{tmp}/lake_repart_cf"
    replay(log, lake_r, ReplayConfig(**CFG))  # versions 0..2 at P=8
    v0 = 0
    repartition(lake_r, 32)  # version 3, same state, new layout
    # Post-repartition change so the feed isn't layout-noise only.
    purge(lake_r, lambda t: pc.equal(t.column("repo"), t.column("repo")[0]))
    # ^ version 4 drops one repo

    cf = pull_arrow(changefeed(lake_r, from_epoch=v0))
    assert cf.num_rows > 0 and set(cf.column("op").to_pylist()) <= {"I", "U", "D"}
    lake_c = f"{tmp}/lake_cf_repart"
    bootstrap(lake_table(lake_r, epoch=v0), lake_c, ReplayConfig(**CFG), epoch=0)
    src = tailer.MemorySource()
    src.append(1, cf)
    src.seal(1)
    replay(src, lake_c, ReplayConfig(**CFG))
    assert state_hash(lake_c) == state_hash(lake_r)


def test_replicate_across_source_repartition(replayed):
    """A replica keeps following after the source scales out (repartition
    bumps the source version without consuming changelog; the catch-up
    feed crosses the layout boundary via the re-keyed path)."""
    import pyarrow.compute as pc

    from engine.cdc.bootstrap import replicate
    from engine.cdc.maintain import purge, repartition

    tmp, log, lake = replayed
    lake_s = f"{tmp}/src_rp"
    replay(log, lake_s, ReplayConfig(**CFG))
    rep = f"{tmp}/replica_rp"
    replicate(lake_s, rep, ReplayConfig(**CFG), to_epoch=1)
    repartition(lake_s, 32)
    purge(lake_s, lambda t: pc.equal(t.column("repo"), t.column("repo")[0]))
    out = replicate(lake_s, rep, ReplayConfig(**CFG))
    assert out["applied"] > 0
    assert state_hash(rep) == state_hash(lake_s)


def test_changefeed_detects_maintenance_rewrites(replayed):
    """Backfill mutates row contents WITHOUT consuming changelog seqs;
    the changefeed's seq-compare alone under-detected it (a replica
    following through a backfill missed the backfilled values — found by
    the lifecycle tour). Value comparison at equal seq closes it."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from engine.cdc.bootstrap import replicate
    from engine.cdc.maintain import backfill

    tmp, log, lake = replayed
    lake_s = f"{tmp}/src_bf"
    replay(log, lake_s, ReplayConfig(**CFG))
    rep = f"{tmp}/replica_bf"
    replicate(lake_s, rep, ReplayConfig(**CFG))  # caught up pre-backfill
    backfill(
        lake_s, "n_chars",
        lambda t: pc.utf8_length(t.column("content")).cast(pa.int64()),
        dtype=pa.int64(),
    )
    out = replicate(lake_s, rep, ReplayConfig(**CFG))
    assert out["applied"] > 0  # every live row's n_chars changed
    assert state_hash(rep) == state_hash(lake_s)


def test_lifecycle_fuzz_replica_follows_any_history(tmp_path, sf_dir):
    """Hypothesis over lake HISTORIES: random interleavings of replay
    chunks, backfill, compact, purge and repartition, with a replica
    catching up via changefeeds at random points — replica hash must
    equal the source after every catch-up, whatever the history."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from hypothesis import given, settings, strategies as st

    from engine.cdc.bootstrap import replicate
    from engine.cdc.maintain import backfill, compact, purge, repartition

    log = synth_changelog(
        sf_dir, f"{tmp_path}/log_lf",
        SynthConfig(seed=57, n_events=2400, n_epochs=4, n_keys=500),
    )
    runs = [0]

    @settings(max_examples=5, deadline=None)
    @given(
        ops=st.lists(
            st.sampled_from(["replay", "backfill", "compact", "purge",
                             "repartition", "catchup"]),
            min_size=4, max_size=8,
        ),
        p2=st.sampled_from([4, 16, 32]),
    )
    def check(ops, p2):
        runs[0] += 1
        src = f"{tmp_path}/lf_src{runs[0]}"
        rep = f"{tmp_path}/lf_rep{runs[0]}"
        cfg = ReplayConfig(num_partitions=8, num_salts=2)
        next_epoch = 0
        replay(log, src, cfg, max_epoch=0)
        next_epoch = 1
        for op in ops:
            if op == "replay" and next_epoch <= 3:
                replay(log, src, cfg, max_epoch=next_epoch)
                next_epoch += 1
            elif op == "backfill":
                backfill(
                    src, "n_chars",
                    lambda t: pc.utf8_length(t.column("content")).cast(pa.int64()),
                    dtype=pa.int64(),
                )
            elif op == "compact":
                compact(src)
            elif op == "purge":
                t0 = lake_table(src)
                if t0.num_rows:
                    victim = t0.column("repo")[0].as_py()
                    purge(src, lambda t: pc.equal(t.column("repo"), victim))
            elif op == "repartition":
                repartition(src, p2)
            elif op == "catchup":
                replicate(src, rep, cfg)
                assert state_hash(rep) == state_hash(src), (ops, p2)
        replicate(src, rep, cfg)
        assert state_hash(rep) == state_hash(src), (ops, p2)

    check()


def test_lifecycle_fuzz_dml_quality_clustering(tmp_path, sf_dir):
    """Hypothesis over histories including the round-5 continuation ops:
    random interleavings of replay chunks, merge_into batches (through a
    per-example hardlink copy of the log), set_expectations toggles,
    cluster_by, compact and purge — the replica must hash-equal the
    source after every catch-up, whatever the interleaving."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    from hypothesis import given, settings, strategies as st

    from engine.cdc import sink
    from engine.cdc.bootstrap import replicate
    from engine.cdc.dml import merge_into
    from engine.cdc.maintain import cluster_by, compact, purge, set_expectations

    log0 = synth_changelog(
        sf_dir, f"{tmp_path}/log_dq",
        SynthConfig(seed=83, n_events=2000, n_epochs=4, n_keys=400),
    )
    runs = [0]

    @settings(max_examples=4, deadline=None)
    @given(
        ops=st.lists(
            st.sampled_from(["replay", "merge", "expect", "cluster",
                             "compact", "purge", "catchup"]),
            min_size=4, max_size=8,
        ),
    )
    def check(ops):
        runs[0] += 1
        # Per-example log copy: merge_into PUBLISHES epochs; the shared
        # synth log must stay pristine across examples.
        log = f"{tmp_path}/dq_log{runs[0]}"
        shutil.copytree(log0, log, copy_function=os.link)
        src, rep = f"{tmp_path}/dq_src{runs[0]}", f"{tmp_path}/dq_rep{runs[0]}"
        cfg = ReplayConfig(num_partitions=8, num_salts=2)
        replay(log, src, cfg, max_epoch=0)
        next_epoch, n_merge = 1, 0
        for op in ops:
            if op == "replay" and next_epoch <= 3:
                replay(log, src, cfg, max_epoch=next_epoch)
                next_epoch += 1
            elif op == "merge":
                n_merge += 1
                rows = [
                    {"repo": f"fz-{n_merge}", "path": f"p{j}",
                     "lang": "en", "content": f"m{n_merge}.{j}"}
                    for j in range(3)
                ]
                t0 = lake_table(src)
                if t0.num_rows:  # one delete of an existing key
                    rows.append({
                        "repo": t0.column("repo")[0].as_py(),
                        "path": t0.column("path")[0].as_py(),
                        "op": "D", "lang": None, "content": None,
                    })
                for i, r in enumerate(rows):
                    r.setdefault("op", "U")
                merge_into(src, log, pa.Table.from_pylist(rows))
                next_epoch = 4  # merge_into's replay folded everything
            elif op == "expect":
                pin = sink.read_manifest(src).get("expectations")
                set_expectations(
                    src,
                    None if pin else [
                        {"col": "lang", "rule": "in",
                         "values": ["en", "fr", "es"]}
                    ],
                )
            elif op == "cluster":
                cluster_by(src, ["lang"], num_files=2)
            elif op == "compact":
                compact(src)
            elif op == "purge":
                t0 = lake_table(src)
                if t0.num_rows:
                    victim = t0.column("repo")[0].as_py()
                    purge(src, lambda t: pc.equal(t.column("repo"), victim))
            elif op == "catchup":
                replicate(src, rep, cfg)
                assert state_hash(rep) == state_hash(src), ops
        replicate(src, rep, cfg)
        assert state_hash(rep) == state_hash(src), ops

    check()


def test_delta_mode_replica_follows_backfill(replayed):
    """ADVICE r4 (medium): the changefeed propagates a maintenance
    backfill as EQUAL-seq U events; a delta-mode replica lands them in a
    delta file whose seq ties the base row — live_view must break the
    tie in favor of the later file or the replica silently keeps the
    stale pre-backfill values."""
    import pyarrow.compute as pc

    from engine.cdc.bootstrap import replicate
    from engine.cdc.maintain import backfill

    tmp, log, lake = replayed
    lake_s = f"{tmp}/src_bf_delta"
    replay(log, lake_s, ReplayConfig(**CFG))
    dcfg = ReplayConfig(**CFG, write_mode="delta", compact_files=16)
    rep = f"{tmp}/replica_bf_delta"
    replicate(lake_s, rep, dcfg)  # bootstrap (base files)
    backfill(
        lake_s, "n_chars",
        lambda t: pc.utf8_length(t.column("content")).cast(pa.int64()),
        dtype=pa.int64(),
    )
    out = replicate(lake_s, rep, dcfg)  # equal-seq U feed → delta files
    assert out["applied"] > 0
    assert state_hash(rep) == state_hash(lake_s)
