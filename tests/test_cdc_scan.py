"""Zone-map data skipping (engine/cdc/scan.py): manifests carry per-file
min/max stats; scan_lake prunes whole partitions on non-key predicates
and stays exact under the LSM delta layout."""

import pyarrow as pa
import pytest
import pyarrow.compute as pc

from engine.cdc import sink
from engine.cdc.bootstrap import bootstrap
from engine.cdc.replay import ReplayConfig, replay
from engine.cdc.scan import prune_partitions, scan_lake
from engine.cdc.tailer import MemorySource
from engine.cdc.verify import canonical_digest, lake_table

P = 8


def _snapshot(zz_repo="repo-03") -> pa.Table:
    rows = []
    for r in range(12):
        repo = f"repo-{r:02d}"
        for k in range(5):
            rows.append(
                {
                    "repo": repo,
                    "path": f"src/f{k}.py",
                    "commit": f"c{r:02d}{k}",
                    "lang": "zz" if repo == zz_repo else "aa",
                    "content": f"def f{k}(): return {r * k}",
                }
            )
    return pa.Table.from_pylist(rows)


def _filtered(lake, flt):
    t = lake_table(lake)
    mask = None
    for col, op, val in flt:
        fn = {"=": pc.equal, ">": pc.greater, ">=": pc.greater_equal,
              "<": pc.less, "<=": pc.less_equal, "!=": pc.not_equal}[op]
        m = fn(t.column(col), val)
        mask = m if mask is None else pc.and_kleene(mask, m)
    return t.filter(pc.fill_null(mask, False))


def _digest(t):
    return canonical_digest(t, exclude=())


def test_scan_prunes_partitions_and_matches_full_filter(tmp_path, ray_session):
    lake = f"{tmp_path}/lake"
    bootstrap(_snapshot(), lake, ReplayConfig(num_partitions=P, num_salts=1))
    m = sink.read_manifest(lake)
    assert m["file_stats"]  # zone maps recorded at bootstrap-merge write

    flt = [("lang", "=", "zz")]
    kept, pruned = prune_partitions(m, flt)
    assert len(kept) == 1 and len(pruned) == len(sink.active_files(m)) - 1

    got = scan_lake(lake, flt).materialize()
    assert scan_lake.last_pruned == len(pruned)
    want = _filtered(lake, flt)
    assert got.count() == want.num_rows == 5
    g = pa.Table.from_pandas(
        got.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    ).select(want.column_names)
    assert _digest(g) == _digest(want)


def test_scan_exact_and_pruned_counts(tmp_path, ray_session):
    lake = f"{tmp_path}/lake2"
    bootstrap(_snapshot(), lake, ReplayConfig(num_partitions=P, num_salts=1))

    for flt, want_rows in [
        ([("lang", "=", "zz")], 5),
        ([("lang", "=", "aa"), ("repo", "=", "repo-05")], 5),
        ([("lang", "=", "zzz")], 0),  # above every range -> empty, no tasks
    ]:
        got = scan_lake(lake, flt).materialize()
        want = _filtered(lake, flt)
        assert got.count() == want.num_rows == want_rows
        if want_rows:
            g = pa.Table.from_pandas(
                got.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
            ).select(want.column_names)
            assert _digest(g) == _digest(want)
    assert scan_lake.last_pruned == scan_lake.last_total  # the 'zzz' scan


def test_scan_sound_under_lsm_delta_updates(tmp_path, ray_session):
    """A delta epoch moves a row INTO the predicate ('aa' -> 'zz' in a
    previously-pruned partition) and deletes a matching row elsewhere:
    the delta file's stats must un-prune the touched partition, and the
    tombstone must not resurrect anything."""
    lake = f"{tmp_path}/lake3"
    cfg = ReplayConfig(num_partitions=P, num_salts=1, write_mode="delta")
    bootstrap(_snapshot(), lake, cfg)

    src = MemorySource()
    src.append(
        1,
        pa.Table.from_pylist(
            [
                {  # flip one repo-07 row into the zz set
                    "repo": "repo-07", "path": "src/f0.py", "commit": "c070b",
                    "lang": "zz", "content": "def f0(): return 1",
                    "seq": 100, "op": "U",
                },
                {  # delete one original zz row
                    "repo": "repo-03", "path": "src/f4.py", "commit": "c034",
                    "lang": "zz", "content": "", "seq": 101, "op": "D",
                },
            ]
        ),
    )
    src.seal(1)
    replay(src, lake, cfg)

    flt = [("lang", "=", "zz")]
    got = scan_lake(lake, flt).materialize()
    want = _filtered(lake, flt)
    assert got.count() == want.num_rows == 5  # 5 - 1 deleted + 1 flipped
    assert scan_lake.last_pruned >= 1  # untouched 'aa' partitions still skip
    g = pa.Table.from_pandas(
        got.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    ).select(want.column_names)
    assert _digest(g) == _digest(want)
    repos = set(g.column("repo").to_pylist())
    assert repos == {"repo-03", "repo-07"}
    assert ("repo-03", "src/f4.py") not in {
        (r, p) for r, p in zip(g.column("repo").to_pylist(), g.column("path").to_pylist())
    }


def test_scan_seq_range_changed_since(tmp_path, ray_session):
    """seq >= X data skipping: only partitions rewritten since version X
    can contain high-seq rows... with write_mode='rewrite' a rewritten
    partition keeps old rows too, so pruning uses the per-FILE seq hi —
    untouched partitions' bases have hi < X and are skipped."""
    lake = f"{tmp_path}/lake4"
    cfg = ReplayConfig(num_partitions=P, num_salts=1)
    bootstrap(_snapshot(), lake, cfg, base_seq=0)

    src = MemorySource()
    src.append(1, pa.Table.from_pylist([{
        "repo": "repo-00", "path": "src/f9.py", "commit": "cx", "lang": "aa",
        "content": "x = 9", "seq": 500, "op": "I",
    }]))
    src.seal(1)
    replay(src, lake, cfg)

    flt = [("seq", ">=", 500)]
    got = scan_lake(lake, flt).materialize()
    assert got.count() == 1
    assert scan_lake.last_pruned == scan_lake.last_total - 1


def test_zone_map_pruning_soundness_property():
    """Pure-function property (no Ray): for random columns (nulls, NaNs,
    unicode strings, extreme ints) and random (op, value) predicates, a
    file that file_stats + _file_excludes declares prunable contains NO
    row satisfying the predicate."""
    from hypothesis import given, settings, strategies as st

    from engine.cdc.merge import file_stats
    from engine.cdc.scan import _OPS, _file_excludes

    ints = st.one_of(st.none(), st.integers(-2**62, 2**62))
    strs = st.one_of(st.none(), st.text(max_size=80))
    floats = st.one_of(
        st.none(), st.floats(allow_nan=True, allow_infinity=True, width=64)
    )

    @settings(max_examples=60, deadline=None)
    @given(
        data=st.one_of(
            st.lists(ints, max_size=30).map(lambda v: (v, pa.int64())),
            st.lists(strs, max_size=30).map(lambda v: (v, pa.string())),
            st.lists(floats, max_size=30).map(lambda v: (v, pa.float64())),
        ),
        op=st.sampled_from(_OPS),
        data2=st.data(),
    )
    def check(data, op, data2):
        values, typ = data
        t = pa.table({"c": pa.array(values, type=typ)})
        stats = file_stats(t, exclude=())
        if pa.types.is_integer(typ):
            val = data2.draw(st.integers(-2**62, 2**62))
        elif pa.types.is_string(typ):
            val = data2.draw(st.text(max_size=80))
        else:
            val = data2.draw(st.floats(allow_nan=False, allow_infinity=True))
        if _file_excludes(stats, "c", op, val):
            fn = {"=": pc.equal, "!=": pc.not_equal, "<": pc.less,
                  "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal}[op]
            mask = pc.fill_null(fn(t.column("c"), pa.scalar(val, typ)), False)
            assert int(pc.sum(pc.cast(mask, pa.int64())).as_py() or 0) == 0, (
                values, op, val, stats
            )

    check()


def test_scan_column_pruning_and_base_pushdown(tmp_path, ray_session):
    """columns= skips reading the heavy content column entirely, and the
    base-file predicate pushdown (non-key-scoped) stays exact under LSM
    deltas — the same flip/delete stream as the LSM test."""
    lake = f"{tmp_path}/lake5"
    cfg = ReplayConfig(num_partitions=P, num_salts=1, write_mode="delta")
    bootstrap(_snapshot(), lake, cfg)
    src = MemorySource()
    src.append(1, pa.Table.from_pylist([
        {"repo": "repo-07", "path": "src/f0.py", "commit": "c070b",
         "lang": "zz", "content": "def f0(): return 1", "seq": 100, "op": "U"},
        {"repo": "repo-03", "path": "src/f4.py", "commit": "c034",
         "lang": "zz", "content": "", "seq": 101, "op": "D"},
    ]))
    src.seal(1)
    replay(src, lake, cfg)

    flt = [("lang", "=", "zz")]
    cols = ["repo", "path", "lang", "seq"]
    got = scan_lake(lake, flt, columns=cols).materialize()
    want = _filtered(lake, flt).select(cols)
    g = pa.Table.from_pandas(
        got.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    ).select(cols)
    assert g.column_names == cols  # content never materialized
    assert _digest(g) == _digest(want)
    assert g.num_rows == 5


def test_scan_skips_excluded_base_files_in_kept_partitions(tmp_path, ray_session):
    """Delta-mode: repo-09's partition (no other zz repo hashes there) is
    kept only because its DELTA carries lang='zz' — its base (all 'aa')
    must be dropped from the merge-on-read list; deltas never are."""
    lake = f"{tmp_path}/lake6"
    bootstrap(_snapshot(), lake, ReplayConfig(num_partitions=P, num_salts=1))
    cfg = ReplayConfig(num_partitions=P, num_salts=1, write_mode="delta")
    src = MemorySource()
    src.append(1, pa.Table.from_pylist([
        {"repo": "repo-09", "path": "src/f0.py", "commit": "c090b",
         "lang": "zz", "content": "x", "seq": 100, "op": "U"},
    ]))
    src.seal(1)
    replay(src, lake, cfg)

    m = sink.read_manifest(lake)
    kept, pruned = prune_partitions(m, [("lang", "=", "zz")])
    active = sink.active_files(m)
    # Exactly the partitions holding 'zz' rows survive; at least one of
    # them lists FEWER files than its active set, and every skipped file
    # is a base (delta names always survive).
    skipped = {
        pid: [r for r in active[pid] if r not in rels]
        for pid, rels in kept.items()
        if len(rels) < len(active[pid])
    }
    assert skipped, f"no base files were skipped: kept={kept}"
    for pid, gone in skipped.items():
        assert all(r.split("/")[-1].startswith("base-") for r in gone)
        assert all(r.split("/")[-1].startswith("delta-") for r in kept[pid])

    got = scan_lake(lake, [("lang", "=", "zz")]).materialize()
    want = _filtered(lake, [("lang", "=", "zz")])
    g = pa.Table.from_pandas(
        got.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    ).select(want.column_names)
    assert _digest(g) == _digest(want)
    assert want.num_rows == 6  # 5 original zz + the flipped repo-09 row


def test_scan_filter_on_evolved_column(tmp_path, ray_session):
    """Filter on a column added AFTER the base files were written: old
    bases have no stats for it (never prunable via it), conform injects
    nulls (which never match), and the delta that introduced the column
    is found."""
    lake = f"{tmp_path}/lake7"
    bootstrap(_snapshot(), lake, ReplayConfig(num_partitions=P, num_salts=1))
    src = MemorySource()
    src.append(1, pa.Table.from_pylist([{
        "repo": "repo-09", "path": "src/f0.py", "commit": "c2", "lang": "aa",
        "content": "y", "size_bytes": 777, "seq": 100, "op": "U",
    }]))
    src.seal(1)
    replay(src, lake, ReplayConfig(num_partitions=P, num_salts=1))

    got = scan_lake(lake, [("size_bytes", ">=", 500)]).materialize()
    assert got.count() == 1
    row = got.take_all()[0]
    assert (row["repo"], row["size_bytes"]) == ("repo-09", 777)


def test_scan_fuzz_random_lakes_and_filters(tmp_path, ray_session):
    """Integration fuzz: random snapshots (nulls included), random delta
    epochs (U flips / D deletes), random conjunctive filters — the
    pruned scan must equal the exact post-merge filter every time."""
    from hypothesis import given, settings, strategies as st

    runs = [0]
    langs = ["aa", "bb", "zz", None]

    @settings(max_examples=5, deadline=None)
    @given(
        seed=st.integers(0, 10_000),
        write_mode=st.sampled_from(["rewrite", "delta"]),
        data=st.data(),
    )
    def check(seed, write_mode, data):
        import random

        rng = random.Random(seed)
        runs[0] += 1
        lake = f"{tmp_path}/fz{runs[0]}"
        rows = [
            {
                "repo": f"r{rng.randrange(9):01d}",
                "path": f"f{i}.py",
                "commit": f"c{i}",
                "lang": rng.choice(langs),
                "content": f"x = {rng.randrange(50)}",
            }
            for i in range(rng.randrange(5, 40))
        ]
        cfg = ReplayConfig(num_partitions=4, num_salts=1, write_mode=write_mode)
        bootstrap(pa.Table.from_pylist(rows), lake, cfg, base_seq=0)
        n_epochs = rng.randrange(0, 3)
        src = MemorySource()
        seq = 1000
        for e in range(1, n_epochs + 1):
            evs = []
            for _ in range(rng.randrange(1, 6)):
                base = rng.choice(rows)
                op = rng.choice(["U", "D", "I"])
                seq += 1
                evs.append({
                    "repo": base["repo"],
                    "path": base["path"] if op != "I" else f"new{seq}.py",
                    "commit": f"cc{seq}", "lang": rng.choice(langs),
                    "content": f"y = {seq}", "seq": seq, "op": op,
                })
            src.append(e, pa.Table.from_pylist(evs))
            src.seal(e)
        if n_epochs:
            replay(src, lake, cfg)

        # Optionally OPTIMIZE-cluster the lake (sorted multi-file bases):
        # exercises file-granularity skipping + multi-base merge-on-read.
        clus = data.draw(st.sampled_from(
            [None, (["lang"], 2, False), (["lang"], 3, False),
             (["seq"], 2, False), (["lang", "seq"], 3, True)]
        ))
        if clus is not None:
            from engine.cdc.maintain import cluster_by

            cols, k, z = clus
            cluster_by(lake, cols, num_files=k, zorder=z)

        n_conj = data.draw(st.integers(1, 2))
        flt = []
        for _ in range(n_conj):
            col = data.draw(st.sampled_from(["lang", "repo", "seq"]))
            if col == "seq":
                flt.append(("seq", data.draw(st.sampled_from([">=", "<", ">"])),
                            data.draw(st.integers(-5, 1100))))
            else:
                flt.append((col, "=", data.draw(st.sampled_from(
                    ["aa", "zz", "r1", "r7", "nope"]))))

        got = scan_lake(lake, flt).materialize()
        want = _filtered(lake, flt)
        assert got.count() == want.num_rows, (flt, write_mode, seed)
        if want.num_rows:
            g = pa.Table.from_pandas(
                got.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
            ).select(want.column_names)
            assert _digest(g) == _digest(want), (flt, write_mode, seed)

    check()


def test_scan_time_travel_epoch_pin(tmp_path, ray_session):
    """scan_lake(epoch=) composes zone-map pruning with time travel: the
    pre-update version sees neither the flipped row nor the insert."""
    lake = f"{tmp_path}/lake_tt"
    cfg = ReplayConfig(num_partitions=P, num_salts=1)
    bootstrap(_snapshot(), lake, cfg)
    src = MemorySource()
    src.append(1, pa.Table.from_pylist([{
        "repo": "repo-09", "path": "src/f0.py", "commit": "c2", "lang": "zz",
        "content": "w", "seq": 100, "op": "U",
    }]))
    src.seal(1)
    replay(src, lake, cfg)

    flt = [("lang", "=", "zz")]
    now = scan_lake(lake, flt).materialize()
    then = scan_lake(lake, flt, epoch=0).materialize()
    assert now.count() == 6 and then.count() == 5
    assert "repo-09" not in {
        r["repo"] for r in then.take_all()
    } and "repo-09" in {r["repo"] for r in now.take_all()}


def test_scan_dnf_or_filters(tmp_path, ray_session):
    """OR-of-ANDs predicates: rows from EITHER disjunct return; a
    partition is pruned only when its files exclude EVERY disjunct."""
    lake = f"{tmp_path}/lake_dnf"
    bootstrap(_snapshot(), lake, ReplayConfig(num_partitions=P, num_salts=1))

    dnf = [
        [("lang", "=", "zz")],
        [("repo", "=", "repo-06"), ("path", ">=", "src/f3.py")],
    ]
    got = scan_lake(lake, dnf).materialize()
    t = lake_table(lake)
    m1 = pc.equal(t.column("lang"), "zz")
    m2 = pc.and_kleene(
        pc.equal(t.column("repo"), "repo-06"),
        pc.greater_equal(t.column("path"), "src/f3.py"),
    )
    want = t.filter(pc.fill_null(pc.or_kleene(m1, m2), False))
    assert got.count() == want.num_rows == 7  # 5 zz + f3/f4 of repo-06
    g = pa.Table.from_pandas(
        got.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    ).select(want.column_names)
    assert _digest(g) == _digest(want)
    # Partitions whose repo RANGE can't contain repo-06 and whose lang
    # range can't contain zz are pruned (a range spanning repo-00..08
    # legitimately covers repo-06 — zone maps bound, they don't enumerate).
    assert scan_lake.last_pruned >= 3

    # A disjunct matching nothing anywhere prunes to the other one.
    got2 = scan_lake(lake, [[("lang", "=", "zzz")], [("lang", "=", "zz")]]).materialize()
    assert got2.count() == 5


def test_lake_stats_metadata_only_and_fallback(tmp_path, sf_dir, ray_session):
    """lake_stats answers COUNT/MIN/MAX from manifest zone maps + parquet
    footers when provably exact (delta-free + full stats coverage), and
    falls back to a distributed exact scan otherwise — both must agree
    with the materialized live state."""
    import pyarrow.compute as pc

    from engine.cdc.replay import ReplayConfig, replay
    from engine.cdc.scan import lake_stats
    from engine.cdc.synth import SynthConfig, synth_changelog
    from engine.cdc.verify import lake_table

    log = synth_changelog(
        sf_dir, f"{tmp_path}/log_ls",
        SynthConfig(seed=37, n_events=3000, n_epochs=3, n_keys=600,
                    evolve_at_epoch=2),
    )
    lake = f"{tmp_path}/lake_ls"
    replay(log, lake, ReplayConfig(num_partitions=8, num_salts=2))
    t = lake_table(lake)

    got = lake_stats(lake, ["seq", "lang", "repo", "size_bytes", "content"])
    assert got["delta_free"] and got["rows_source"] == "metadata"
    assert got["rows"] == t.num_rows
    # Rewrite mode rewrote every partition post-evolution, so even the
    # evolution column has full stats coverage -> metadata everywhere;
    # content is NEVER zone-mapped -> exact scan fallback.
    for c in ("seq", "lang", "repo", "size_bytes"):
        assert got["columns"][c]["source"] == "metadata", c
    assert got["columns"]["content"]["source"] == "scan"
    for c in ("seq", "lang", "repo", "size_bytes", "content"):
        mm = pc.min_max(t.column(c))
        assert got["columns"][c]["min"] == mm["min"].as_py(), c
        assert got["columns"][c]["max"] == mm["max"].as_py(), c

    # Pure metadata probe: fallback answers stay None.
    probe = lake_stats(lake, ["content"], exact_fallback=False)
    assert probe["columns"]["content"] == {
        "min": None, "max": None, "source": "scan",
    }

    # Delta-mode lake: footers alone can't count live rows -> scan path,
    # same exact answers.
    lake_d = f"{tmp_path}/lake_ls_d"
    replay(
        log, lake_d,
        ReplayConfig(num_partitions=8, num_salts=2, write_mode="delta",
                     compact_files=99),
    )
    got_d = lake_stats(lake_d, ["seq"])
    assert not got_d["delta_free"] and got_d["rows_source"] == "scan"
    assert got_d["rows"] == t.num_rows
    assert got_d["columns"]["seq"]["source"] == "scan"
    assert got_d["columns"]["seq"]["max"] == got["columns"]["seq"]["max"]

    with pytest.raises(ValueError, match="no column"):
        lake_stats(lake, ["nope"])


def test_lake_stats_on_clustered_lake(tmp_path, sf_dir, ray_session):
    """cluster_by splits partitions into several base files — still
    delta-free, so lake_stats stays on the metadata path and the folded
    per-file zone maps remain exact."""
    import pyarrow.compute as pc

    from engine.cdc.maintain import cluster_by
    from engine.cdc.replay import ReplayConfig, replay
    from engine.cdc.scan import lake_stats
    from engine.cdc.synth import SynthConfig, synth_changelog
    from engine.cdc.verify import lake_table

    log = synth_changelog(
        sf_dir, f"{tmp_path}/log_lc",
        SynthConfig(seed=41, n_events=2000, n_epochs=2, n_keys=400),
    )
    lake = f"{tmp_path}/lake_lc"
    replay(log, lake, ReplayConfig(num_partitions=8, num_salts=2))
    cluster_by(lake, ["lang"], num_files=3)
    t = lake_table(lake)
    got = lake_stats(lake, ["seq", "lang"])
    assert got["delta_free"] and got["rows_source"] == "metadata"
    assert got["rows"] == t.num_rows
    for c in ("seq", "lang"):
        assert got["columns"][c]["source"] == "metadata"
        mm = pc.min_max(t.column(c))
        assert got["columns"][c]["min"] == mm["min"].as_py()
        assert got["columns"][c]["max"] == mm["max"].as_py()
