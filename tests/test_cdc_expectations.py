"""Declarative ingestion expectations (engine/cdc/parse.py::_expect,
pinned like update_mode): enforcement vs an independent fold, the
dead-letter → fix → requeue loop, pin-over-stale-config adoption, and
set_expectations DDL."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from engine.cdc import sink
from engine.cdc.maintain import set_expectations
from engine.cdc.parse import validate_expectations
from engine.cdc.replay import ReplayConfig, replay
from engine.cdc.synth import SynthConfig, synth_changelog
from engine.cdc.verify import lake_table, state_hash

CFG = dict(num_partitions=8, num_salts=2)
ALLOWED = ["en", "fr"]
RULES = [{"col": "lang", "rule": "in", "values": ALLOWED}]


def _log(tmp, sf_dir, name="log", **kw):
    return synth_changelog(
        sf_dir, f"{tmp}/{name}",
        SynthConfig(seed=29, n_events=3000, n_epochs=3, n_keys=600, **kw),
    )


def _events(log):
    parts = []
    for e in sorted(os.listdir(log)):
        d = os.path.join(log, e)
        if not e.startswith("epoch="):
            continue
        for f in sorted(os.listdir(d)):
            parts.append(pq.read_table(os.path.join(d, f)))
    return pa.concat_tables(parts, promote_options="permissive").to_pandas()


def _fold(ev: pd.DataFrame, keep_mask) -> pd.DataFrame:
    """Independent sequential LWW fold over rule-surviving events."""
    ev = ev[keep_mask].sort_values("seq")
    last = ev.groupby(["repo", "path"], as_index=False).tail(1)
    live = last[last["op"] != "D"]
    return live[["repo", "path", "seq", "content"]].reset_index(drop=True)


def _state(lake) -> pd.DataFrame:
    t = lake_table(lake).select(["repo", "path", "seq", "content"])
    return t.to_pandas().reset_index(drop=True)


def _eq(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    key = ["repo", "path"]
    a, b = a.sort_values(key).reset_index(drop=True), b.sort_values(key).reset_index(drop=True)
    return a.equals(b)


def test_expectations_enforced_matches_independent_fold(tmp_path, sf_dir):
    log = _log(tmp_path, sf_dir)
    lake = f"{tmp_path}/lake"
    replay(log, lake, ReplayConfig(expectations=RULES, **CFG))
    m = sink.read_manifest(lake)
    assert m["expectations"] == RULES
    ev = _events(log)
    keep = (ev["op"] == "D") | ev["lang"].isin(ALLOWED)
    assert (~keep).sum() > 0  # the rule actually bites
    assert _eq(_state(lake), _fold(ev, keep))
    # Every rejected I/U event is quarantined, none lost.
    ddir = sink.lake_paths(lake)["deadletter"]
    dl = []
    for dp, _, names in os.walk(ddir):
        dl += [pq.read_table(os.path.join(dp, n)) for n in names if n.endswith(".parquet")]
    n_dl = sum(t.num_rows for t in dl)
    assert n_dl == int((~keep).sum())


def test_deadletter_fix_requeue_loop(tmp_path, sf_dir):
    import pyarrow.compute as pc

    from engine.cdc.parse import requeue_deadletters

    log = _log(tmp_path, sf_dir, name="log_q")
    lake = f"{tmp_path}/lake_q"
    replay(log, lake, ReplayConfig(expectations=RULES, **CFG))

    def fix(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("lang")
        return t.set_column(i, "lang", pa.array(["en"] * t.num_rows, pa.string()))

    n = requeue_deadletters(lake, log, epoch=3, fix_fn=fix, clear=True)
    assert n > 0
    out = replay(log, lake, ReplayConfig(**CFG))  # pin enforces the rules
    assert out["epochs_run"] == [3]
    final = lake_table(lake)
    # The fixed events re-entered above the watermark: they now win their
    # keys, and every surviving lang is allowed.
    assert set(final.column("lang").to_pylist()) <= set(ALLOWED)
    assert pc.max(final.column("seq")).as_py() >= 3000  # restamped region
    # Nothing re-quarantined (the fix made every event pass).
    ddir = sink.lake_paths(lake)["deadletter"]
    left = [n_ for _, _, ns in os.walk(ddir) for n_ in ns if n_.endswith(".parquet")]
    assert not left


def test_pin_wins_over_stale_config_both_directions(tmp_path, sf_dir):
    log = _log(tmp_path, sf_dir, name="log_p")
    # Lake created WITH rules; resumed with a DEFAULT config → still filtered.
    lake = f"{tmp_path}/lake_p"
    replay(log, lake, ReplayConfig(expectations=RULES, **CFG), max_epoch=0)
    replay(log, lake, ReplayConfig(**CFG))  # stale: no expectations
    ref = f"{tmp_path}/ref_p"
    replay(log, ref, ReplayConfig(expectations=RULES, **CFG))
    assert state_hash(lake) == state_hash(ref)
    # Lake created WITHOUT rules; resumed WITH rules → caller's ignored.
    lake2, ref2 = f"{tmp_path}/lake_p2", f"{tmp_path}/ref_p2"
    replay(log, lake2, ReplayConfig(**CFG), max_epoch=0)
    replay(log, lake2, ReplayConfig(expectations=RULES, **CFG))
    replay(log, ref2, ReplayConfig(**CFG))
    assert state_hash(lake2) == state_hash(ref2)


def test_set_expectations_ddl_and_clear(tmp_path, sf_dir):
    log = _log(tmp_path, sf_dir, name="log_d")
    lake = f"{tmp_path}/lake_d"
    replay(log, lake, ReplayConfig(**CFG), max_epoch=0)
    m = set_expectations(lake, RULES)
    assert m["maintenance"] == "expectations:1"
    assert m["expectations"] == RULES and sink.changelog_pos(m) == 0
    replay(log, lake, ReplayConfig(**CFG))  # epochs 1-2 now filtered
    ev = _events(log)
    es = 1000  # epoch size for n_events=3000 / 3 epochs
    keep = (ev["seq"] < es) | (ev["op"] == "D") | ev["lang"].isin(ALLOWED)
    assert _eq(_state(lake), _fold(ev, keep))
    # Compact carries the pin; clearing stops enforcement for new epochs.
    from engine.cdc.maintain import compact

    assert compact(lake)["expectations"] == RULES
    m2 = set_expectations(lake, None)
    assert m2.get("expectations") is None


def test_not_null_rule_and_patch_mode_exemption(tmp_path, sf_dir):
    # Hand-built log: one epoch, row-mode lake, null content on a U event.
    log = f"{tmp_path}/log_n"
    os.makedirs(f"{log}/epoch=00000")
    t = pa.table({
        "seq": pa.array([0, 1, 2], pa.int64()),
        "op": ["I", "U", "I"],
        "repo": ["r", "r", "r"],
        "path": ["a", "a", "b"],
        "lang": ["en", "en", "en"],
        "content": ["first", None, "ok"],
    })
    pq.write_table(t, f"{log}/epoch=00000/part-0.parquet")
    lake = f"{tmp_path}/lake_n"
    rules = [{"col": "content", "rule": "not_null"}]
    replay(log, lake, ReplayConfig(expectations=rules, **CFG))
    st = _state(lake)
    # The null-content U was quarantined: key (r, a) keeps seq 0.
    assert sorted(zip(st["path"], st["seq"])) == [("a", 0), ("b", 2)]
    # Same stream in patch mode: the U's null means UNCHANGED and passes.
    lake2 = f"{tmp_path}/lake_n2"
    replay(
        log, lake2,
        ReplayConfig(expectations=rules, update_mode="column", **CFG),
    )
    st2 = _state(lake2)
    assert sorted(zip(st2["path"], st2["seq"], st2["content"])) == [
        ("a", 1, "first"), ("b", 2, "ok"),
    ]


def test_validate_expectations_errors():
    with pytest.raises(ValueError, match="list"):
        validate_expectations({"col": "lang"})
    with pytest.raises(ValueError, match="need col and rule"):
        validate_expectations([{"col": "lang"}])
    with pytest.raises(ValueError, match="key/engine"):
        validate_expectations([{"col": "repo", "rule": "not_null"}])
    with pytest.raises(ValueError, match="unknown expectation rule"):
        validate_expectations([{"col": "lang", "rule": "positive"}])
    with pytest.raises(ValueError, match="missing"):
        validate_expectations([{"col": "lang", "rule": "between", "lo": 0}])
    with pytest.raises(Exception):
        validate_expectations([{"col": "lang", "rule": "matches", "pattern": "("}])
    validate_expectations(RULES)  # well-formed passes


def test_deadletter_stats_per_epoch(tmp_path, sf_dir):
    """deadletter_stats reports quarantined rows per changelog epoch from
    footers only; epochs and totals match the actual rejected events."""
    from engine.cdc.parse import deadletter_stats

    log = _log(tmp_path, sf_dir, name="log_s")
    lake = f"{tmp_path}/lake_s"
    replay(log, lake, ReplayConfig(expectations=RULES, **CFG))
    ev = _events(log)
    rej = ev[~((ev["op"] == "D") | ev["lang"].isin(ALLOWED))]
    per_epoch = rej.groupby(rej["seq"] // 1000).size().to_dict()
    got = deadletter_stats(lake)
    assert got == {int(k): int(v) for k, v in per_epoch.items()}
    assert deadletter_stats(f"{tmp_path}/lake_never") == {}
