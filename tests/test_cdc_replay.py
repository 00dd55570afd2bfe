"""Golden CDC replay tests: engine lake state vs the single-process
oracle (SURVEY.md §5 — this is the `python -m pytest -x -q` correctness
gate of BASELINE.json:15: per-row content sha256 equality)."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from engine.cdc.oracle import oracle_state_hash, oracle_table
from engine.cdc.replay import ReplayConfig, replay
from engine.cdc.synth import SynthConfig, synth_changelog
from engine.cdc.verify import canonical_digest, lake_table, state_hash


def _run(tmp, sf_dir, synth_kw=None, replay_kw=None, name="a"):
    cfg = SynthConfig(
        seed=42, n_events=1500, n_epochs=2, n_keys=400, **(synth_kw or {})
    )
    log = synth_changelog(sf_dir, f"{tmp}/log_{name}", cfg)
    lake = f"{tmp}/lake_{name}"
    rkw = dict(num_partitions=8, num_salts=2)
    rkw.update(replay_kw or {})
    replay(log, lake, ReplayConfig(**rkw))
    return log, lake


def test_replay_matches_oracle_uniform(tmp_path, sf_dir):
    log, lake = _run(tmp_path, sf_dir)
    assert state_hash(lake) == oracle_state_hash(log)


def test_replay_matches_oracle_hot_repo_skew(tmp_path, sf_dir):
    # 80% of events hit the hot repo (SURVEY.md §5 skew profile):
    # exercises salted sub-partitioning + reconciliation (C2).
    log, lake = _run(tmp_path, sf_dir, synth_kw=dict(hot_event_frac=0.8), name="skew")
    assert state_hash(lake) == oracle_state_hash(log)


def test_per_row_content_sha256_equality(tmp_path, sf_dir):
    log, lake = _run(tmp_path, sf_dir, name="sha")
    eng = lake_table(lake).to_pylist()
    ora = oracle_table(log).to_pylist()
    ekeys = {(r["repo"], r["path"]): r["content_sha256"] for r in eng}
    okeys = {(r["repo"], r["path"]): r["content_sha256"] for r in ora}
    assert ekeys == okeys  # same key set AND equal sha256 per key


def test_replay_invariant_to_arrival_order(tmp_path, sf_dir):
    # W4: within-epoch arrival order must not affect the final state.
    log1, lake1 = _run(tmp_path, sf_dir, name="ord1")
    log2, lake2 = _run(
        tmp_path, sf_dir, synth_kw=dict(shuffle_within_epochs=True), name="ord2"
    )
    assert state_hash(lake1) == state_hash(lake2)


def test_replay_invariant_to_partitioning_and_batch_size(tmp_path, sf_dir):
    # State hash is independent of P, S and batch size (parallelism /
    # layout invariance — the in-process half of the N-vs-4N claim;
    # the cross-process half is bench.py --scaling).
    log1, lake1 = _run(tmp_path, sf_dir, name="p1")
    _, lake2 = _run(
        tmp_path,
        sf_dir,
        replay_kw=dict(num_partitions=3, num_salts=1, batch_size=256),
        name="p2",
    )
    assert state_hash(lake1) == state_hash(lake2)


def test_deletes_remove_keys(tmp_path, sf_dir):
    log, lake = _run(tmp_path, sf_dir, synth_kw=dict(op_mix=(30, 20, 50)), name="del")
    t = lake_table(lake)
    o = oracle_table(log)
    assert t.num_rows == o.num_rows
    assert canonical_digest(t) == canonical_digest(o)


def test_lineage_totals_match_event_count(tmp_path, sf_dir):
    import pyarrow.parquet as pq

    log, lake = _run(tmp_path, sf_dir, name="lin")
    total = 0
    for k in (0, 1):
        t = pq.read_table(f"{lake}/lineage/epoch-{k:05d}.parquet")
        total += pc.sum(t.column("events_in")).as_py()
        assert pc.min(t.column("seq_lo")).as_py() >= 0
    assert total == 1500  # every valid event accounted once


def test_late_materialization_exchange_matches_full(tmp_path, sf_dir):
    # exchange="late": only LWW metadata + locators cross the wide
    # shuffle; winner rows are fetched from the materialized prepare
    # output via a broadcast locator set. Must be byte-identical to the
    # full-exchange path (same lww_collapse on the same seq values) —
    # including with skew and deletes in play.
    log, lake_full = _run(
        tmp_path, sf_dir, synth_kw=dict(hot_event_frac=0.8), name="lm_full"
    )
    _, lake_late = _run(
        tmp_path,
        sf_dir,
        synth_kw=dict(hot_event_frac=0.8),
        replay_kw=dict(exchange="late"),
        name="lm_late",
    )
    assert state_hash(lake_late) == state_hash(lake_full) == oracle_state_hash(log)


def test_late_exchange_gate_falls_back_to_full(tmp_path, sf_dir):
    # Above late_max_winners the locator broadcast would be unbounded —
    # the epoch must fall back to the full exchange, same state.
    log, lake = _run(
        tmp_path,
        sf_dir,
        replay_kw=dict(exchange="late", late_max_winners=10),
        name="lm_gate",
    )
    assert state_hash(lake) == oracle_state_hash(log)


def test_winners_exchange_topologies_agree(tmp_path, sf_dir):
    # "direct" (one all-to-all, default) and "staged" (two-exchange
    # sub-LWW plan) must produce byte-identical lakes — uniform AND
    # hot-repo skew.
    for name, skw in (("uni", {}), ("skw", dict(hot_event_frac=0.8))):
        _, lake_d = _run(tmp_path, sf_dir, synth_kw=skw, name=f"tx_d_{name}")
        _, lake_s = _run(
            tmp_path, sf_dir, synth_kw=skw,
            replay_kw=dict(winners_exchange="staged"), name=f"tx_s_{name}",
        )
        assert state_hash(lake_d) == state_hash(lake_s)



def test_lake_lookup_key_pruned(tmp_path, sf_dir):
    """Point reads open only the key's own partition and agree with the
    full-state scan — current AND time-travel epoch, present AND absent
    keys, repo-only AND (repo, path) lookups."""
    from engine.cdc.verify import lake_lookup, lake_table

    _, lake = _run(tmp_path, sf_dir, name="lkp")
    full = lake_table(lake).to_pandas()
    some = full.iloc[0]
    got = lake_lookup(lake, some["repo"]).to_pandas()
    ref = full[full["repo"] == some["repo"]]
    assert len(got) == len(ref) and set(got["path"]) == set(ref["path"])
    one = lake_lookup(lake, some["repo"], some["path"]).to_pandas()
    assert len(one) == 1
    assert one["content_sha256"].iloc[0] == some["content_sha256"]
    assert len(lake_lookup(lake, "repo-does-not-exist").to_pandas()) == 0
    # time travel: epoch-0 lookup equals the epoch-0 state
    full0 = lake_table(lake, epoch=0).to_pandas()
    r0 = full0["repo"].iloc[0]
    got0 = lake_lookup(lake, r0, epoch=0).to_pandas()
    assert set(got0["path"]) == set(full0[full0["repo"] == r0]["path"])


def test_bad_events_deadlettered_not_applied(tmp_path, sf_dir):
    """Malformed events (unknown op, null key) must be routed to the
    dead-letter directory and excluded from state — engine hash equals
    the oracle (which skips them by the same validation rule), and the
    dead-letter files account for every corrupted row."""
    import os

    import pyarrow.parquet as pq

    log, lake = _run(
        tmp_path, sf_dir, synth_kw=dict(bad_event_frac=0.05), name="bad"
    )
    assert state_hash(lake) == oracle_state_hash(log)
    # count corrupted rows in the log
    n_bad = 0
    for root, _, files in os.walk(log):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(root, f), columns=["op", "repo"])
            ops = t.column("op").to_pylist()
            repos = t.column("repo").to_pylist()
            n_bad += sum(1 for o, r in zip(ops, repos)
                         if o not in ("I", "U", "D") or r is None)
    assert n_bad > 0, "fixture should contain corrupted events"
    dl_root = f"{lake}/deadletter"
    dl = 0
    for root, _, files in os.walk(dl_root):
        for f in files:
            dl += pq.read_table(os.path.join(root, f)).num_rows
    assert dl == n_bad


def test_state_asof_arbitrary_seq(tmp_path, sf_dir):
    """Seq-granular point-in-time recovery: state_asof(S) must equal a
    replay of a log that simply STOPPED at S — for a mid-epoch S, an
    epoch-boundary S, and S beyond the log (full state)."""
    import pyarrow.compute as pc

    from engine.cdc.replay import state_asof
    from engine.cdc.verify import lake_table, state_hash

    log = synth_changelog(
        sf_dir, f"{tmp_path}/log_asof",
        SynthConfig(seed=47, n_events=3000, n_epochs=3, n_keys=600),
    )
    cfg = ReplayConfig(num_partitions=8, num_salts=2)
    for s in (1499, 1999, 99999):  # mid-epoch, boundary, beyond
        lake = f"{tmp_path}/asof_{s}"
        state_asof(log, lake, s, cfg)
        t = lake_table(lake)
        assert pc.max(t.column("seq")).as_py() <= s
        # Independent truth: sequential fold of the truncated stream.
        ref = f"{tmp_path}/ref_{s}"
        import os

        import pyarrow.parquet as pq

        os.makedirs(ref)
        k = 0
        for e in sorted(os.listdir(log)):
            if not e.startswith("epoch="):
                continue
            parts = [
                pq.read_table(os.path.join(log, e, f))
                for f in sorted(os.listdir(os.path.join(log, e)))
            ]
            tt = pa.concat_tables(parts, promote_options="permissive")
            tt = tt.filter(pc.less_equal(tt.column("seq"), s))
            if tt.num_rows:
                edir = os.path.join(ref, f"epoch={k:05d}")
                os.makedirs(edir)
                pq.write_table(tt, os.path.join(edir, "part-0.parquet"))
                k += 1
        ref_lake = f"{tmp_path}/reflake_{s}"
        replay(ref, ref_lake, cfg)
        assert state_hash(lake) == state_hash(ref_lake), s
    # Footer pruning really skipped the above-bound epochs.
    from engine.cdc.tailer import SeqBoundSource

    assert SeqBoundSource(log, 999).available_epochs() == [0]
    assert SeqBoundSource(log, 1000).available_epochs() == [0, 1]
