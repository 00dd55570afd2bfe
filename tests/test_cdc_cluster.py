"""cluster_by (engine/cdc/maintain.py): OPTIMIZE-style sort-clustering —
state-hash invariance, per-file zone-map pruning payoff, resume exactness
across the maintenance version, and interplay with compact."""

import pyarrow.compute as pc
import pytest

from engine.cdc import sink
from engine.cdc.maintain import cluster_by, compact
from engine.cdc.replay import ReplayConfig, replay
from engine.cdc.scan import scan_lake
from engine.cdc.synth import SynthConfig, synth_changelog
from engine.cdc.verify import state_hash
from engine.util.collect import pull_arrow

CFG = dict(num_partitions=8, num_salts=2)


def _log(tmp, sf_dir, name="log", **kw):
    return synth_changelog(
        sf_dir, f"{tmp}/{name}",
        SynthConfig(seed=21, n_events=3000, n_epochs=3, n_keys=600, **kw),
    )


def _scan_sorted(lake, filters):
    ds = scan_lake(lake, filters, columns=["repo", "path", "seq", "lang"])
    t = pull_arrow(ds)
    return t.sort_by([("repo", "ascending"), ("path", "ascending")])


def test_cluster_by_invariant_state_and_file_pruning(tmp_path, sf_dir):
    log = _log(tmp_path, sf_dir)
    lake = f"{tmp_path}/lake"
    replay(log, lake, ReplayConfig(**CFG))
    h0 = state_hash(lake)
    before = _scan_sorted(lake, [("lang", "=", "de")])
    files_before = scan_lake.last_files_read

    m = cluster_by(lake, ["lang"], num_files=4)
    assert m["maintenance"] == "cluster:lang"
    # Version advanced; changelog position did not (maintenance commit).
    assert sink.changelog_pos(m) == 2
    # Every non-empty partition split into 4 key-disjoint base files.
    parts = sink.active_files(m)
    assert all(len(rels) == 4 for rels in parts.values() if rels)
    # Live state is byte-identical.
    assert state_hash(lake) == h0

    after = _scan_sorted(lake, [("lang", "=", "de")])
    assert after.equals(before)
    # The payoff: the same scan now reads strictly fewer base files than
    # the lake holds (zone maps per sorted slice exclude the predicate).
    assert scan_lake.last_files_total == sum(len(r) for r in parts.values())
    assert scan_lake.last_files_read < scan_lake.last_files_total
    # 'de' sorts first of the five langs: at 4 slices per partition a
    # correct zone map keeps at most ~2 files per partition.
    assert scan_lake.last_files_read <= 2 * len(parts)
    assert files_before >= scan_lake.last_files_read


def test_cluster_by_folds_deltas_and_resume_stays_exact(tmp_path, sf_dir):
    log = _log(tmp_path, sf_dir, name="log_r")
    lake, ref = f"{tmp_path}/lake_r", f"{tmp_path}/ref_r"
    replay(log, ref, ReplayConfig(**CFG))  # uninterrupted reference
    replay(
        log, lake,
        ReplayConfig(write_mode="delta", compact_files=99, **CFG),
        max_epoch=1,
    )
    # Delta-mode partial replay leaves multi-file (base+delta) lists.
    assert any(len(r) > 1 for r in sink.active_files(sink.read_manifest(lake)).values())
    m = cluster_by(lake, ["lang", "seq"], num_files=2)
    # The rewrite consumed the deltas: exactly the 2 sorted bases remain.
    assert all(len(r) == 2 for r in sink.active_files(m).values() if r)
    # Resume applies the remaining changelog epoch exactly (pins carried).
    out = replay(log, lake, ReplayConfig(write_mode="delta", compact_files=99, **CFG))
    assert out["epochs_run"] == [2]
    assert state_hash(lake) == state_hash(ref)


def test_cluster_then_compact_round_trip(tmp_path, sf_dir):
    log = _log(tmp_path, sf_dir, name="log_c")
    lake = f"{tmp_path}/lake_c"
    replay(log, lake, ReplayConfig(**CFG))
    h0 = state_hash(lake)
    cluster_by(lake, ["lang"], num_files=3)
    m = compact(lake)  # merges the split files back to one base
    assert all(len(r) == 1 for r in sink.active_files(m).values() if r)
    assert state_hash(lake) == h0


def test_changefeed_across_cluster_is_empty(tmp_path, sf_dir):
    """cluster_by rewrites layout, not state: a feed spanning it must
    carry zero events (the seq-diff sees identical winners), and time
    travel to the pre-cluster version still reads exactly."""
    from engine.cdc import sink
    from engine.cdc.bootstrap import changefeed
    from engine.cdc.verify import canonical_digest, lake_table

    log = _log(tmp_path, sf_dir, name="log_f")
    lake = f"{tmp_path}/lake_f"
    replay(log, lake, ReplayConfig(**CFG))
    v0 = sink.last_committed_epoch(lake)
    cluster_by(lake, ["lang"], num_files=3)
    feed = pull_arrow(changefeed(lake, from_epoch=v0))
    assert feed is None or feed.num_rows == 0
    assert canonical_digest(lake_table(lake, epoch=v0)) == canonical_digest(
        lake_table(lake)
    )


def test_cluster_by_rejects_bad_arguments(tmp_path, sf_dir):
    log = _log(tmp_path, sf_dir, name="log_b")
    lake = f"{tmp_path}/lake_b"
    replay(log, lake, ReplayConfig(**CFG))
    with pytest.raises(ValueError, match="zone maps never index"):
        cluster_by(lake, ["content"])
    with pytest.raises(ValueError, match="no column"):
        cluster_by(lake, ["nope"])
    with pytest.raises(ValueError, match="at least one column"):
        cluster_by(lake, [])
    with pytest.raises(ValueError, match="num_files"):
        cluster_by(lake, ["lang"], num_files=0)


def test_target_rows_splits_by_size(tmp_path, sf_dir):
    log = _log(tmp_path, sf_dir, name="log_t")
    lake = f"{tmp_path}/lake_t"
    replay(log, lake, ReplayConfig(**CFG))
    m = cluster_by(lake, ["lang"], target_rows=25)
    reports = {int(r["pid"]): r for r in m["lineage"] if r.get("rows_out")}
    parts = sink.active_files(m)
    for pid, r in reports.items():
        want = -(-int(r["rows_out"]) // 25)
        assert len(parts[pid]) == want
    assert state_hash(lake)  # still readable end-to-end


def test_zorder_prunes_on_every_clustered_column(tmp_path, sf_dir):
    """OPTIMIZE ZORDER: Morton-interleaved clustering over (lang, seq)
    must keep the state hash invariant, match the exact scan, and let
    single-column predicates on EITHER dimension skip base files —
    lexicographic (lang, seq) order only tightens lang's zone maps."""
    log = _log(tmp_path, sf_dir, name="log_z")
    lake = f"{tmp_path}/lake_z"
    replay(log, lake, ReplayConfig(**CFG))
    h0 = state_hash(lake)
    from engine.cdc.verify import lake_table

    full = lake_table(lake)
    import pyarrow.compute as pc

    seq_cut = int(pc.max(full.column("seq")).as_py()) - 400

    m = cluster_by(lake, ["lang", "seq"], num_files=4, zorder=True)
    assert m["maintenance"] == "zorder:lang,seq"
    assert state_hash(lake) == h0

    for flt in ([("lang", "=", "de")], [("seq", ">", seq_cut)]):
        got = _scan(lake, flt)
        want = full.filter(
            {"=": pc.equal, ">": pc.greater}[flt[0][1]](
                full.column(flt[0][0]), flt[0][2]
            )
        )
        assert got.num_rows == want.num_rows, flt
        assert scan_lake.last_files_read < scan_lake.last_files_total, flt


def _scan(lake, flt):
    t = pull_arrow(scan_lake(lake, flt, columns=["repo", "path", "seq", "lang"]))
    import pyarrow as pa

    return t if t is not None else pa.table(
        {"repo": [], "path": [], "seq": [], "lang": []}
    )


def test_zorder_requires_two_columns(tmp_path, sf_dir):
    log = _log(tmp_path, sf_dir, name="log_z1")
    lake = f"{tmp_path}/lake_z1"
    replay(log, lake, ReplayConfig(**CFG))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least two"):
        cluster_by(lake, ["lang"], zorder=True)
