"""DuckDB SQL mirror of the synth changelog (engine/cdc/sqloracle.py)
vs the sequential Python oracle (engine/cdc/oracle.py) — two independent
derivations of the replayed final state, compared value-exactly. No Ray
needed: both sides are driver-local.
"""

import duckdb
import numpy as np
import pytest

from engine.cdc.oracle import oracle_table
from engine.cdc.sqloracle import (
    _sm64_cols, changefeed_sql, lww_state_sql, patch_state_sql,
)
from engine.cdc.synth import SynthConfig, synth_changelog
from engine.util.hashing import splitmix64

COLS = ["repo", "path", "content_sha256", "seq"]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    c.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return c


def test_splitmix64_sql_bit_exact(con):
    xc = 42 * 0x10001
    cols = _sm64_cols("u", f"xor(CAST(t.i AS UBIGINT), {xc}::UBIGINT)")
    got = con.sql(
        "SELECT u FROM (SELECT " + ", ".join(cols)
        + " FROM generate_series(0, 19999) t(i))"
    ).df()["u"].to_numpy().astype(np.uint64)
    i = np.arange(0, 20000, dtype=np.uint64)
    assert (got == splitmix64(i ^ np.uint64(xc))).all()


def _compare(con, tmp_path, sf_dir, cfg, sql, cols, update_mode="row", upto=None):
    log = synth_changelog(sf_dir, f"{tmp_path}/log", cfg)
    ot = oracle_table(log, upto_epoch=upto, update_mode=update_mode)
    want = ot.select(cols).to_pandas()
    got = con.sql(sql).df()[want.columns.tolist()]
    for df in (want, got):
        df.sort_values(["repo", "path"], inplace=True, ignore_index=True)
    assert want.equals(got), f"SQL mirror diverged ({len(want)} vs {len(got)} rows)"
    return len(want)


def test_lww_state_with_evolution_and_skew(con, tmp_path, sf_dir):
    cfg = SynthConfig(seed=42, n_events=4000, n_epochs=3, n_keys=800,
                      hot_event_frac=0.4, evolve_at_epoch=2)
    cols = COLS + ["size_bytes"]
    n = _compare(con, tmp_path, sf_dir, cfg, lww_state_sql(cfg, cols), cols)
    assert n > 0


def test_lww_state_time_travel_epoch0(con, tmp_path, sf_dir):
    cfg = SynthConfig(seed=42, n_events=4000, n_epochs=3, n_keys=800)
    _compare(con, tmp_path, sf_dir, cfg,
             lww_state_sql(cfg, COLS, upto_epoch=0), COLS, upto=0)


def test_patch_state_column_lww(con, tmp_path, sf_dir):
    cfg = SynthConfig(seed=11, n_events=3000, n_epochs=3, n_keys=600,
                      op_mix=(30, 60, 10), patch_null_frac=0.6)
    _compare(con, tmp_path, sf_dir, cfg, patch_state_sql(cfg, COLS), COLS,
             update_mode="column")


def test_bad_events_excluded_like_validator(con, tmp_path, sf_dir):
    cfg = SynthConfig(seed=31, n_events=3000, n_epochs=2, n_keys=600,
                      bad_event_frac=0.02)
    _compare(con, tmp_path, sf_dir, cfg, lww_state_sql(cfg, COLS), COLS)


def test_changefeed_sql_is_exact_delta(con, tmp_path, sf_dir):
    """Applying the SQL-mirrored feed onto the epoch-0 LWW state must
    reproduce the final LWW state (same algebra as the engine's
    changefeed round-trip contract)."""
    cfg = SynthConfig(seed=7, n_events=3000, n_epochs=3, n_keys=600)
    synth_changelog(sf_dir, f"{tmp_path}/log", cfg)

    old = con.sql(lww_state_sql(cfg, COLS, upto_epoch=0)).df()
    new = con.sql(lww_state_sql(cfg, COLS)).df()
    feed = con.sql(changefeed_sql(cfg, 0)).df()

    state = {
        (r.repo, r.path): r.seq for r in old.itertuples(index=False)
    }
    for r in feed.sort_values("seq").itertuples(index=False):
        if r.op == "D":
            state.pop((r.repo, r.path), None)
        else:
            state[(r.repo, r.path)] = r.seq
    want = {(r.repo, r.path): r.seq for r in new.itertuples(index=False)}
    assert state == want
