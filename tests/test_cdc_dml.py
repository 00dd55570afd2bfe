"""merge_into (engine/cdc/dml.py): changelog-routed batch DML — upsert/
update/delete semantics, deterministic seq stamping, watermark guards,
and log-replay equivalence (a fresh replay of the same log reproduces
the merged state byte-identically)."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from engine.cdc.dml import merge_into
from engine.cdc.parse import _seq_watermark
from engine.cdc.replay import ReplayConfig, replay
from engine.cdc.synth import SynthConfig, synth_changelog
from engine.cdc.verify import lake_lookup, lake_table, state_hash

CFG = dict(num_partitions=8, num_salts=2)


def _build(tmp_path, sf_dir, name="m", **kw):
    log = synth_changelog(
        sf_dir, f"{tmp_path}/log_{name}",
        SynthConfig(seed=33, n_events=3000, n_epochs=2, n_keys=600, **kw),
    )
    lake = f"{tmp_path}/lake_{name}"
    replay(log, lake, ReplayConfig(**CFG))
    return log, lake


def test_merge_upsert_update_delete_and_replay_equivalence(tmp_path, sf_dir):
    log, lake = _build(tmp_path, sf_dir)
    wm = _seq_watermark(lake)
    base = lake_table(lake)
    del_keys = lake_lookup(lake, "repo-001")
    upd_keys = lake_lookup(lake, "repo-002")
    assert del_keys.num_rows and upd_keys.num_rows
    rows = (
        [
            {"repo": "merge-00", "path": f"new/f{i:03d}.py", "op": "U",
             "content": f"merged #{i}"}
            for i in range(5)
        ]
        + [
            {"repo": "repo-002", "path": p, "op": "U", "content": f"rewritten {p}"}
            for p in upd_keys.column("path").to_pylist()
        ]
        + [
            {"repo": "repo-001", "path": p, "op": "D", "content": None}
            for p in del_keys.column("path").to_pylist()
        ]
    )
    out = merge_into(lake, log, pa.Table.from_pylist(rows))
    assert out["rows"] == len(rows)
    assert out["seq_lo"] == wm + 1 and out["seq_hi"] == wm + len(rows)
    assert out["replay"]["epochs_run"] == [out["epoch"]]

    final = lake_table(lake)
    # Deletes removed every repo-001 key; upserts added 5 new keys.
    assert "repo-001" not in set(final.column("repo").to_pylist())
    merged = final.filter(pc.equal(final.column("repo"), "merge-00"))
    assert merged.num_rows == 5
    assert sorted(merged.column("content").to_pylist()) == [
        f"merged #{i}" for i in range(5)
    ]
    # Updated rows carry the new content and a stamped (post-wm) seq.
    upd = final.filter(pc.equal(final.column("repo"), "repo-002"))
    assert upd.num_rows == upd_keys.num_rows
    assert all(c.startswith("rewritten ") for c in upd.column("content").to_pylist())
    assert pc.min(upd.column("seq")).as_py() > wm
    # Row count: base - deleted + new (updates replace in place).
    assert final.num_rows == base.num_rows - del_keys.num_rows + 5

    # The merge is ordinary log history: a FRESH replay of the same log
    # reproduces the merged state byte-identically.
    lake2 = f"{tmp_path}/lake_fresh"
    replay(log, lake2, ReplayConfig(**CFG))
    assert state_hash(lake2) == state_hash(lake)


def test_merge_seq_stamping_is_key_sorted(tmp_path, sf_dir):
    log, lake = _build(tmp_path, sf_dir, name="s")
    wm = _seq_watermark(lake)
    rows = [  # deliberately unsorted input
        {"repo": "zz", "path": "b", "content": "3"},
        {"repo": "aa", "path": "x", "content": "1"},
        {"repo": "mm", "path": "k", "content": "2"},
    ]
    merge_into(lake, log, pa.Table.from_pylist(rows))  # default_op='U'
    final = lake_table(lake)
    got = {
        r: s
        for r, s in zip(
            final.column("repo").to_pylist(), final.column("seq").to_pylist()
        )
        if r in ("zz", "aa", "mm")
    }
    assert got == {"aa": wm + 1, "mm": wm + 2, "zz": wm + 3}


def test_merge_duplicate_key_last_wins(tmp_path, sf_dir):
    log, lake = _build(tmp_path, sf_dir, name="d")
    rows = [
        {"repo": "dup", "path": "p", "content": "first"},
        {"repo": "dup", "path": "p", "content": "second"},
    ]
    merge_into(lake, log, pa.Table.from_pylist(rows))
    final = lake_table(lake)
    dup = final.filter(pc.equal(final.column("repo"), "dup"))
    assert dup.num_rows == 1
    assert dup.column("content").to_pylist() == ["second"]


def test_changefeed_across_merge_matches_batch(tmp_path, sf_dir):
    """A feed spanning a merge_into carries exactly the DML: I/U for the
    upserts with their stamped seqs, D for the deletes — nothing else."""
    from engine.cdc import sink
    from engine.cdc.bootstrap import changefeed
    from engine.util.collect import pull_arrow

    log, lake = _build(tmp_path, sf_dir, name="f")
    v0 = sink.last_committed_epoch(lake)
    dels = lake_lookup(lake, "repo-003")
    assert dels.num_rows
    rows = [
        {"repo": "feed", "path": f"p{i}", "op": "U", "content": f"c{i}"}
        for i in range(3)
    ] + [
        {"repo": "repo-003", "path": p, "op": "D", "content": None}
        for p in dels.column("path").to_pylist()
    ]
    out = merge_into(lake, log, pa.Table.from_pylist(rows))
    feed = pull_arrow(changefeed(lake, from_epoch=v0))
    assert feed.num_rows == len(rows)
    by_op = {}
    for op, repo, seq in zip(
        feed.column("op").to_pylist(),
        feed.column("repo").to_pylist(),
        feed.column("seq").to_pylist(),
    ):
        by_op.setdefault(op, []).append((repo, seq))
    ups = by_op.get("I", []) + by_op.get("U", [])
    assert sorted(r for r, _ in ups) == ["feed"] * 3
    # Upsert feed rows carry the stamped winning seqs.
    assert all(out["seq_lo"] <= s <= out["seq_hi"] for _, s in ups)
    assert sorted(r for r, _ in by_op.get("D", [])) == ["repo-003"] * dels.num_rows


def test_merge_into_respects_pinned_expectations(tmp_path, sf_dir):
    """DML goes through the changelog, so the lake's pinned data-quality
    contract applies to it like to any producer: a violating merge row
    is quarantined, the rest of the batch lands."""
    import os

    from engine.cdc import sink

    log = synth_changelog(
        sf_dir, f"{tmp_path}/log_e",
        SynthConfig(seed=33, n_events=3000, n_epochs=2, n_keys=600),
    )
    lake = f"{tmp_path}/lake_e"
    rules = [{"col": "lang", "rule": "in", "values": ["en", "fr"]}]
    replay(log, lake, ReplayConfig(expectations=rules, **CFG))
    dl_before = _deadletter_rows(lake)
    rows = [
        {"repo": "dml", "path": "good", "lang": "en", "content": "ok"},
        {"repo": "dml", "path": "bad", "lang": "xx", "content": "nope"},
    ]
    merge_into(lake, log, pa.Table.from_pylist(rows))
    final = lake_table(lake)
    dml = final.filter(pc.equal(final.column("repo"), "dml"))
    assert dml.column("path").to_pylist() == ["good"]
    assert _deadletter_rows(lake) == dl_before + 1


def _deadletter_rows(lake) -> int:
    import os

    import pyarrow.parquet as pq

    from engine.cdc import sink

    ddir = sink.lake_paths(lake)["deadletter"]
    n = 0
    for dp, _, names in os.walk(ddir):
        for f in names:
            if f.endswith(".parquet"):
                n += pq.read_table(os.path.join(dp, f)).num_rows
    return n


def test_merge_guards(tmp_path, sf_dir):
    log, lake = _build(tmp_path, sf_dir, name="g")
    wm = _seq_watermark(lake)
    with pytest.raises(ValueError, match="key column"):
        merge_into(lake, log, pa.table({"repo": ["a"], "content": ["x"]}))
    with pytest.raises(ValueError, match="empty"):
        merge_into(lake, log, pa.table({"repo": pa.array([], pa.string()),
                                        "path": pa.array([], pa.string())}))
    with pytest.raises(ValueError, match="op values"):
        merge_into(
            lake, log,
            pa.table({"repo": ["a"], "path": ["p"], "op": ["X"]}),
        )
    with pytest.raises(ValueError, match="watermark"):
        merge_into(
            lake, log,
            pa.table({"repo": ["a"], "path": ["p"], "seq": [wm]}),
        )
    # Producer-assigned seqs above the watermark are accepted verbatim.
    out = merge_into(
        lake, log,
        pa.table({"repo": ["a"], "path": ["p"], "seq": [wm + 100],
                  "content": ["explicit"]}),
    )
    assert out["seq_lo"] == out["seq_hi"] == wm + 100
    final = lake_table(lake)
    row = final.filter(pc.equal(final.column("repo"), "a"))
    assert row.column("seq").to_pylist() == [wm + 100]


def test_merge_into_bootstraps_empty_lake_and_cli(tmp_path, sf_dir):
    """DML is just another producer: merging into a lake that doesn't
    exist yet stamps seqs from 0 (watermark -1) and the replay creates
    the lake. The CLI twin publishes + applies the same way."""
    import contextlib
    import io
    import json

    import pyarrow.parquet as pq

    from engine.cdc.dml import main as dml_cli

    lake, log = f"{tmp_path}/lake_new", f"{tmp_path}/log_new"
    rows = [
        {"repo": "boot", "path": f"p{i}", "lang": "en", "content": f"c{i}"}
        for i in range(4)
    ]
    out = merge_into(lake, log, pa.Table.from_pylist(rows))
    assert out["epoch"] == 0 and (out["seq_lo"], out["seq_hi"]) == (0, 3)
    t = lake_table(lake)
    assert t.num_rows == 4 and set(t.column("repo").to_pylist()) == {"boot"}

    batch = f"{tmp_path}/batch.parquet"
    pq.write_table(
        pa.Table.from_pylist(
            [{"repo": "boot", "path": "p0", "op": "D", "lang": None,
              "content": None},
             {"repo": "cli", "path": "x", "lang": "en", "content": "via cli"}]
        ),
        batch,
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        dml_cli(["--lake-dir", lake, "--log-dir", log, "--parquet", batch])
    got = json.loads(buf.getvalue().strip())
    assert got == {"epoch": 1, "rows": 2, "seq_lo": 4, "seq_hi": 5,
                   "applied": True}
    t = lake_table(lake)
    assert t.num_rows == 4  # one deleted, one inserted
    assert "cli" in set(t.column("repo").to_pylist())


def test_delete_where_retention_pass(tmp_path, sf_dir):
    """delete_where removes exactly the predicate-matching live rows via
    D events through the log: survivors (and their seqs) untouched, a
    second pass matches nothing, and a fresh replay of the whole log
    reproduces the post-delete state byte-identically."""
    from engine.cdc.dml import delete_where

    log, lake = _build(tmp_path, sf_dir, name="dw")
    base = lake_table(lake).to_pandas()
    victims = base[base["lang"] == "en"]
    survivors = base[base["lang"] != "en"]
    assert len(victims) and len(survivors)

    rep = delete_where(lake, log, [("lang", "=", "en")], replay_cfg=ReplayConfig(**CFG))
    assert rep["rows"] == len(victims)
    after = lake_table(lake).to_pandas()
    key = lambda df: set(zip(df["repo"], df["path"], df["seq"]))
    assert key(after) == key(survivors)  # seqs of survivors untouched

    # idempotent: nothing matches any more, nothing published
    rep2 = delete_where(lake, log, [("lang", "=", "en")])
    assert rep2["rows"] == 0 and rep2["epoch"] is None

    # log-replay equivalence: a fresh lake from the same log converges
    lake2 = f"{tmp_path}/lake_dw2"
    replay(log, lake2, ReplayConfig(**CFG))
    assert state_hash(lake2) == state_hash(lake)
