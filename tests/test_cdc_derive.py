"""Derived lakes (engine/cdc/derive.py): the incrementally-maintained
MinHash-LSH signature index over a changelog."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from engine.cdc.derive import index_candidate_pairs, sig_index_source
from engine.cdc.replay import ReplayConfig, replay
from engine.cdc.synth import SynthConfig, synth_changelog
from engine.cdc.verify import lake_table, read_lake
from engine.ops.dedup import minhash_candidate_pairs
from engine.util.collect import pull_arrow

CFG = dict(num_partitions=8, num_salts=2)


def _pairs(t):
    return set(zip(t.column("a").to_pylist(), t.column("b").to_pylist())) if t is not None else set()


@pytest.fixture(scope="module")
def lakes(tmp_path_factory, sf_dir):
    tmp = str(tmp_path_factory.mktemp("derive"))
    log = synth_changelog(
        sf_dir, f"{tmp}/log",
        SynthConfig(seed=3, n_events=4000, n_epochs=3, n_keys=600),
    )
    replay(log, f"{tmp}/main", ReplayConfig(**CFG))
    src = sig_index_source(log)
    # Maintained INCREMENTALLY: two epochs first, then resume folds only
    # the third (signatures are computed once per changed row).
    replay(src, f"{tmp}/sigs", ReplayConfig(**CFG), max_epoch=1)
    out = replay(src, f"{tmp}/sigs", ReplayConfig(**CFG))
    assert out["epochs_run"] == [2] and out["epochs_skipped"] == [0, 1]
    return tmp, log


def test_index_lake_mirrors_main_lake_winners(lakes):
    tmp, log = lakes
    mt = lake_table(f"{tmp}/main")
    st = lake_table(f"{tmp}/sigs")
    assert mt.select(["repo", "path", "seq"]).equals(
        st.select(["repo", "path", "seq"])
    )
    # Live rows always have text → no null signature survives.
    assert st.column("bh00").null_count == 0


def test_index_pairs_equal_batch_pipeline(lakes):
    tmp, log = lakes
    pi = pull_arrow(index_candidate_pairs(f"{tmp}/sigs"))
    docs = read_lake(f"{tmp}/main").map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.binary_join_element_wise(
                    t.column("repo"), t.column("path"), "\x1f"
                ),
                "content": t.column("content"),
            }
        ),
        batch_format="pyarrow",
    )
    pb = pull_arrow(minhash_candidate_pairs(docs, "content", "doc_id"))
    assert _pairs(pi) and _pairs(pi) == _pairs(pb)


def test_index_time_travel_pairs(lakes):
    # The index is a lake: pinning an epoch gives the pairs AS OF that
    # epoch, which must equal the batch pipeline over the main lake's
    # state at the same epoch.
    tmp, log = lakes
    pi = pull_arrow(index_candidate_pairs(f"{tmp}/sigs", epoch=0))
    docs0 = read_lake(f"{tmp}/main", epoch=0).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.binary_join_element_wise(
                    t.column("repo"), t.column("path"), "\x1f"
                ),
                "content": t.column("content"),
            }
        ),
        batch_format="pyarrow",
    )
    pb = pull_arrow(minhash_candidate_pairs(docs0, "content", "doc_id"))
    assert _pairs(pi) == _pairs(pb)


def test_spec_derived_lake_matches_batch_transform(lakes):
    """A DECLARATIVE derived lake (spec steps over the changelog) must
    equal the same spec applied to the source lake's live rows — for
    every committed epoch (incremental maintenance == batch recompute)."""
    from engine.cdc.derive import spec_derived_source
    from engine.spec import compile_expr

    tmp, log = lakes
    steps = [
        {"op": "with_column", "name": "n_chars",
         "expr": {"len": {"col": "content"}}},
        {"op": "with_column", "name": "lang_u",
         "expr": {"upper": {"coalesce": [{"col": "lang"}, {"lit": "??"}]}}},
        {"op": "select",
         "columns": ["seq", "op", "repo", "path", "n_chars", "lang_u"]},
    ]
    src = spec_derived_source(log, steps)
    view = f"{tmp}/specview"
    replay(src, view, ReplayConfig(**CFG), max_epoch=1)
    out = replay(src, view, ReplayConfig(**CFG))  # incremental resume
    assert out["epochs_run"] == [2]

    for epoch in (0, 1, 2):
        got = lake_table(view, epoch).select(["repo", "path", "seq", "n_chars", "lang_u"])
        main = lake_table(f"{tmp}/main", epoch)
        want = pa.table({
            "repo": main.column("repo"),
            "path": main.column("path"),
            "seq": main.column("seq"),
            "n_chars": compile_expr({"len": {"col": "content"}})(main),
            "lang_u": compile_expr(
                {"upper": {"coalesce": [{"col": "lang"}, {"lit": "??"}]}}
            )(main),
        })
        assert got.equals(want), f"epoch {epoch} diverged"


def test_spec_derived_lake_rejects_unsafe_steps(lakes):
    from engine.cdc.derive import spec_derived_source

    tmp, log = lakes
    with pytest.raises(ValueError, match="not allowed"):
        spec_derived_source(log, [{"op": "filter", "column": "lang", "cmp": "==", "value": "py"}])
    with pytest.raises(ValueError, match="keep meta columns"):
        spec_derived_source(log, [{"op": "select", "columns": ["repo", "path"]}])
    with pytest.raises(ValueError, match="must not touch"):
        spec_derived_source(log, [{"op": "rename", "mapping": {"seq": "s"}}])


def test_spec_derived_lake_rename_payload(lakes):
    """Positive rename path: payload columns may be renamed (meta may
    not); the derived lake carries the renamed column."""
    from engine.cdc.derive import spec_derived_source

    tmp, log = lakes
    steps = [
        {"op": "rename", "mapping": {"lang": "language"}},
        {"op": "select", "columns": ["seq", "op", "repo", "path", "language"]},
    ]
    view = f"{tmp}/renamed"
    replay(spec_derived_source(log, steps), view, ReplayConfig(**CFG))
    t = lake_table(view)
    assert "language" in t.column_names and "lang" not in t.column_names
    main = lake_table(f"{tmp}/main")
    assert t.column("language").to_pylist() == main.column("lang").to_pylist()
