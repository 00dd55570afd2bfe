"""Unit tests for the relational op modules (tiny in-memory tables vs
pandas/duckdb ground truth — SURVEY.md §5)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from engine.ops.agg import distinct, global_agg, grouped_agg, partial_grouped_sum, topk_per_group
from engine.ops.dedup import exact_dedup, jaccard, shingle_hashes, simhash64
from engine.ops.join import asof_join, broadcast_join, semi_join, shuffle_join
from engine.ops.map import cast_column, explode, filter_expr, rename, select, with_columns
from engine.ops.order import seeded_sample, top_k
from engine.ops.setops import except_distinct, intersect_distinct, union_all
from engine.ops.sketch import approx_count_distinct


def _pdf(ds):
    pdf = ds.to_pandas()
    if len(pdf.columns) == 0:
        # Ray's to_pandas drops the schema for zero-row results; rebuild
        # the empty frame from the Dataset's (correct) Arrow schema.
        sch = ds.schema()
        base = getattr(sch, "base_schema", None)
        if isinstance(base, pa.Schema):
            pdf = base.empty_table().to_pandas()
        elif sch is not None:
            pdf = pd.DataFrame({n: pd.Series(dtype="object") for n in sch.names})
    return pdf


@pytest.fixture
def sales():
    rng = np.random.RandomState(0)
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 20, 500),
            "g": rng.choice(list("abc"), 500),
            "v": rng.randint(0, 100, 500).astype("int64"),
        }
    )
    return df


def test_map_select_rename_cast_filter(sales):
    ds = rd.from_pandas(sales)
    out = select(ds, ["k", "v"])
    out = rename(out, {"v": "val"})
    out = cast_column(out, "val", pa.float64())
    out = filter_expr(out, lambda t: pc.greater(t.column("val"), 50.0))
    pdf = _pdf(out)
    assert list(pdf.columns) == ["k", "val"]
    assert (pdf["val"] > 50).all()
    assert len(pdf) == (sales["v"] > 50).sum()


def test_with_columns_vectorized(sales):
    ds = rd.from_pandas(sales)
    out = with_columns(ds, {"v2": lambda t: pc.multiply(t.column("v"), 2)})
    pdf = _pdf(out).sort_values(["k", "v"]).reset_index(drop=True)
    ref = sales.assign(v2=sales["v"] * 2).sort_values(["k", "v"]).reset_index(drop=True)
    assert (pdf["v2"].to_numpy() == ref["v2"].to_numpy()).all()


def test_explode_matches_duckdb():
    t = pa.table({"id": [1, 2], "xs": [[1.0, 2.0], [3.0]]})
    out = _pdf(explode(rd.from_arrow(t), "xs", value_name="x", pos_name="pos"))
    out = out.sort_values(["id", "pos"]).reset_index(drop=True)
    assert out.to_dict("records") == [
        {"id": 1, "pos": 0, "x": 1.0},
        {"id": 1, "pos": 1, "x": 2.0},
        {"id": 2, "pos": 0, "x": 3.0},
    ]


def test_grouped_and_partial_agg_agree(sales):
    ds = rd.from_pandas(sales)
    a = _pdf(grouped_agg(ds, ["g"], {"s": ("sum", "v"), "n": ("count", None)}))
    from engine.ops.map import rename as _rn
    b = _pdf(_rn(partial_grouped_sum(ds, ["g"], ["v"], count_alias="n"), {"v": "s"}))
    ref = sales.groupby("g").agg(s=("v", "sum"), n=("v", "size")).reset_index()
    for out in (a, b):
        m = out.sort_values("g").reset_index(drop=True)
        assert (m["s"].to_numpy() == ref["s"].to_numpy()).all()
        assert (m["n"].to_numpy() == ref["n"].to_numpy()).all()


def test_global_agg(sales):
    out = global_agg(rd.from_pandas(sales), {"s": ("sum", "v"), "mx": ("max", "v"), "n": ("count", None)})
    assert out.column("s")[0].as_py() == sales["v"].sum()
    assert out.column("mx")[0].as_py() == sales["v"].max()
    assert out.column("n")[0].as_py() == len(sales)


def test_distinct_and_topk(sales):
    d = _pdf(distinct(rd.from_pandas(sales), ["g"]))
    assert sorted(d["g"]) == ["a", "b", "c"]
    t = _pdf(topk_per_group(rd.from_pandas(sales), ["g"], "v", 2, tiebreak=["k"]))
    ref = sales.sort_values(["v", "k"], ascending=[False, True]).groupby("g").head(2)
    assert len(t) == len(ref)
    assert set(map(tuple, t[["g", "v"]].values)) == set(map(tuple, ref[["g", "v"]].values))


def test_top_k_partial_heap(sales):
    out = _pdf(top_k(rd.from_pandas(sales), "v", 5))
    ref = sales.nlargest(5, "v")["v"].tolist()
    assert sorted(out["v"], reverse=True) == ref


def test_seeded_sample_deterministic(sales):
    a = _pdf(seeded_sample(rd.from_pandas(sales), "v", 20))
    b = _pdf(seeded_sample(rd.from_pandas(sales), "v", 20))
    assert sorted(a["v"]) == sorted(b["v"])


def test_setops_match_duckdb(sales):
    left = sales[sales["v"] > 30][["k"]]
    right = sales[sales["v"] < 70][["k"]]
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    ri = sorted(x[0] for x in con.sql("SELECT k FROM l INTERSECT SELECT k FROM r").fetchall())
    re_ = sorted(x[0] for x in con.sql("SELECT k FROM l EXCEPT SELECT k FROM r").fetchall())
    i = sorted(_pdf(intersect_distinct(rd.from_pandas(left), rd.from_pandas(right), ["k"]))["k"])
    e = sorted(_pdf(except_distinct(rd.from_pandas(left), rd.from_pandas(right), ["k"]))["k"])
    assert i == ri and e == re_
    u = _pdf(union_all(rd.from_pandas(left), rd.from_pandas(right)))
    assert len(u) == len(left) + len(right)


def test_joins_match_pandas(sales):
    dim = pd.DataFrame({"g": ["a", "b", "c"], "label": ["A", "B", "C"]})
    out = _pdf(broadcast_join(rd.from_pandas(sales), pa.Table.from_pandas(dim), keys=["g"]))
    assert len(out) == len(sales)
    assert set(out["label"]) == {"A", "B", "C"}

    right = sales.groupby("k", as_index=False).agg(tot=("v", "sum"))
    out2 = _pdf(shuffle_join(rd.from_pandas(sales), rd.from_pandas(right), key="k"))
    ref2 = sales.merge(right, on="k")
    assert len(out2) == len(ref2)
    assert out2["tot"].sum() == ref2["tot"].sum()

    keys = pa.table({"k": [1, 2, 3]})
    s = _pdf(semi_join(rd.from_pandas(sales), keys, "k"))
    assert set(s["k"]) <= {1, 2, 3} and len(s) == sales["k"].isin([1, 2, 3]).sum()
    a = _pdf(semi_join(rd.from_pandas(sales), keys, "k", anti=True))
    assert len(a) == len(sales) - len(s)


def test_asof_join_matches_merge_asof():
    left = pd.DataFrame(
        {"u": [1, 1, 2, 2], "t": pd.to_datetime(["2024-01-02", "2024-01-05", "2024-01-03", "2024-01-01"]).astype("datetime64[us]"), "x": [1, 2, 3, 4]}
    )
    right = pd.DataFrame(
        {"u": [1, 1, 2], "t2": pd.to_datetime(["2024-01-01", "2024-01-04", "2024-01-02"]).astype("datetime64[us]"), "y": [10, 20, 30]}
    )
    out = _pdf(asof_join(rd.from_pandas(left), rd.from_pandas(right), on="t", by="u", right_on="t2", right_by="u"))
    out = out.sort_values(["u", "t"]).reset_index(drop=True)
    got = list(out["y"].fillna(-1))
    assert got == [10, 20, -1, 30]


def test_hll_close_to_exact(sales):
    est = approx_count_distinct(rd.from_pandas(sales), "v", p=12).column("approx_n")[0].as_py()
    exact = sales["v"].nunique()
    assert abs(est - exact) / exact < 0.1


def test_hll_grouped_close_to_exact(sales):
    from engine.ops.sketch import approx_count_distinct_grouped

    out = _pdf(approx_count_distinct_grouped(rd.from_pandas(sales), ["g"], "v", p=12))
    exact = sales.groupby("g")["v"].nunique()
    assert len(out) == len(exact)
    for _, row in out.iterrows():
        e = exact[row["g"]]
        assert abs(row["approx_n"] - e) / e < 0.1


def test_exact_dedup_deterministic_winner():
    df = pd.DataFrame({"key": ["a", "a", "b"], "id": [5, 2, 9], "x": [1, 2, 3]})
    out = _pdf(exact_dedup(rd.from_pandas(df), ["key"], "id", keep="min")).sort_values("key")
    assert list(out["id"]) == [2, 9]


def test_shingle_jaccard_simhash_properties():
    assert jaccard("hello world", "hello world") == 1.0
    assert jaccard("hello world", "entirely different text") < 0.2
    a = shingle_hashes("abcdefg", 5)
    assert len(a) == 3
    assert simhash64("same tokens here") == simhash64("same tokens here")
    h1 = simhash64("the quick brown fox jumps over the lazy dog")
    h2 = simhash64("the quick brown fox jumps over the lazy cat")
    assert bin(h1 ^ h2).count("1") < 20


def test_analytic_window_matches_pandas(sales):
    from engine.ops.window import analytic

    out = _pdf(
        analytic(
            rd.from_pandas(sales),
            partition_by=["g"],
            order_by=["v", "k"],
            specs={"rn": ("row_number",), "prev_v": ("lag", "v", 1), "cum_v": ("cumsum", "v")},
        )
    ).sort_values(["g", "v", "k"]).reset_index(drop=True)
    ref = sales.sort_values(["v", "k"], kind="mergesort")
    gg = ref.groupby("g", sort=False)
    ref = ref.assign(rn=gg.cumcount() + 1, prev_v=gg["v"].shift(1), cum_v=gg["v"].cumsum())
    ref = ref.sort_values(["g", "v", "k"]).reset_index(drop=True)
    assert (out["rn"].to_numpy() == ref["rn"].to_numpy()).all()
    assert out["prev_v"].fillna(-1).tolist() == ref["prev_v"].fillna(-1).tolist()
    assert (out["cum_v"].to_numpy() == ref["cum_v"].to_numpy()).all()


def test_reshape_ops_match_pandas(sales):
    from engine.ops.reshape import percentile_disc_by_group, pivot_count, unpivot

    ds = rd.from_pandas(sales.assign(v2=sales["v"] * 2))
    long = _pdf(unpivot(ds, ["k", "g"], ["v", "v2"]))
    assert len(long) == 2 * len(sales)
    assert set(long["name"]) == {"v", "v2"}
    assert long[long["name"] == "v"]["value"].sum() == sales["v"].sum()

    wide = _pdf(pivot_count(rd.from_pandas(sales), "k", "g", ["a", "b", "c"], prefix="n_"))
    ref = pd.crosstab(sales["k"], sales["g"]).reindex(columns=["a", "b", "c"], fill_value=0)
    wide = wide.sort_values("k").reset_index(drop=True)
    assert (wide[["n_a", "n_b", "n_c"]].to_numpy() == ref.to_numpy()).all()

    med = _pdf(percentile_disc_by_group(rd.from_pandas(sales), ["g"], "v", 0.5))
    import math
    for _, row in med.iterrows():
        v = np.sort(sales[sales["g"] == row["g"]]["v"].to_numpy())
        assert row["percentile"] == v[max(0, math.ceil(0.5 * len(v)) - 1)]


def test_shuffle_join_left_outer_types():
    l = pd.DataFrame({"k": [1, 2, 3], "x": [10, 20, 30]})
    r = pd.DataFrame({"k": [1, 1, 4], "y": [100, 200, 400]})
    joined = shuffle_join(rd.from_pandas(l), rd.from_pandas(r), key="k", join_type="left")
    # Arrow-native bucket join: int columns stay int64 with typed nulls
    # (never 10.0/NaN float upcasts).
    sch = joined.schema()
    types = dict(zip(sch.names, sch.types))
    assert str(types["x"]) == "int64" and str(types["y"]) == "int64"
    out = _pdf(joined).sort_values(["k", "y"]).reset_index(drop=True)
    assert out["y"].isna().sum() == 2 and len(out) == 4
    o = _pdf(shuffle_join(rd.from_pandas(l), rd.from_pandas(r), key="k", join_type="outer"))
    assert len(o) == 5  # 2 matches + k=2,3 left-only + k=4 right-only
    assert sorted(o["k"].fillna(-1)) == [1, 1, 2, 3, 4]  # outer keys coalesced


def test_rollup_levels():
    from engine.ops.agg import rollup

    df = pd.DataFrame(
        {"k1": ["a", "a", "b"], "k2": ["x", "y", "x"], "v": [1, 2, 4]}
    )
    out = _pdf(
        rollup(rd.from_pandas(df), ["k1", "k2"], {"s": ("sum", "v"), "n": ("count", None)})
    )
    rows = {(r.k1, r.k2): (r.s, r.n) for r in out.itertuples()}
    assert rows[("a", "x")] == (1, 1) and rows[("a", "y")] == (2, 1)
    assert rows[("a", None)] == (3, 2) and rows[("b", None)] == (4, 1)
    assert rows[(None, None)] == (7, 3)
    assert len(rows) == 6  # 3 finest + 2 mid + 1 grand total


def test_ntile_split_matches_sql_rule():
    from engine.ops.window import analytic

    df = pd.DataFrame({"g": ["a"] * 7, "v": list(range(7))})
    out = _pdf(
        analytic(rd.from_pandas(df), ["g"], ["v"], {"t": ("ntile", 3)})
    ).sort_values("v")
    # SQL NTILE(3) over 7 rows → tile sizes 3,2,2
    assert list(out["t"]) == [1, 1, 1, 2, 2, 3, 3]


def test_string_agg_ordered():
    from engine.ops.agg import string_agg_by_group

    df = pd.DataFrame({"k": [1, 1, 1, 2], "o": [3, 1, 2, 9], "s": ["c", "a", "b", "z"]})
    out = _pdf(
        string_agg_by_group(rd.from_pandas(df), ["k"], "s", sep="-", order_by=["o"], out="agg")
    ).sort_values("k")
    assert list(out["agg"]) == ["a-b-c", "z"]


def test_range_join_band():
    from engine.ops.join import range_join

    left = pd.DataFrame({"u": [1, 1, 2], "ts": [100, 200, 100], "lid": [10, 11, 12]})
    right = pd.DataFrame({"u": [1, 1, 2], "rts": [95, 160, 300], "rid": [20, 21, 22]})
    out = _pdf(
        range_join(rd.from_pandas(left), rd.from_pandas(right),
                   by="u", on="ts", right_on="rts", lower_us=50, upper_us=0)
    )
    got = sorted(zip(out["lid"], out["rid"]))
    # lid10@100 matches rts95 (d=5); lid11@200 matches rts160 (d=40);
    # rts95 is 105 before 200 (out of band); u=2 rts300 is after ts100.
    assert got == [(10, 20), (11, 21)]


def test_grouped_mean_std_matches_pandas():
    from engine.ops.agg import grouped_agg

    rng = np.random.RandomState(7)
    df = pd.DataFrame({"k": rng.randint(0, 5, 300), "v": rng.randint(0, 1000, 300)})
    out = _pdf(
        grouped_agg(rd.from_pandas(df), ["k"], {"m": ("mean", "v"), "s": ("std", "v")})
    ).sort_values("k").reset_index(drop=True)
    exp = df.groupby("k")["v"].agg(["mean", "std"]).reset_index()
    assert np.allclose(out["m"], exp["mean"]) and np.allclose(out["s"], exp["std"])


def test_percent_rank_cume_dist_match_duckdb():
    from engine.ops.window import analytic

    df = pd.DataFrame({"g": ["a"] * 5 + ["b"], "v": [10, 20, 20, 30, 40, 7]})
    out = (
        _pdf(
            analytic(
                rd.from_pandas(df), ["g"], ["v"],
                {"pr": ("percent_rank", "v"), "cd": ("cume_dist", "v")},
            )
        )
        .sort_values(["g", "v"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    exp = con.sql(
        """SELECT g, v, percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
           FROM t WINDOW w AS (PARTITION BY g ORDER BY v) ORDER BY g, v"""
    ).df()
    assert np.allclose(out["pr"], exp["pr"]) and np.allclose(out["cd"], exp["cd"])


def test_approx_percentile_within_bin_width(sales):
    from engine.ops.sketch import approx_percentile

    out = approx_percentile(rd.from_pandas(sales), "v", [0.5, 0.9], bins=256)
    lo, hi = sales["v"].min(), sales["v"].max()
    width = (hi - lo) / 256
    for q, name in ((0.5, "p50"), (0.9, "p90")):
        exact = np.quantile(sales["v"], q, method="inverted_cdf")
        assert abs(out.column(name)[0].as_py() - exact) <= width + 1e-9


def test_rollup_integer_keys_typed_nulls():
    from engine.ops.agg import rollup

    df = pd.DataFrame({"k": [1, 1, 2], "v": [10, 20, 30]})
    ds = rollup(rd.from_pandas(df), ["k"], {"s": ("sum", "v")})
    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))
    assert str(types["k"]) == "int64"  # not string — typed from the data
    out = _pdf(ds)
    rows = {(-1 if pd.isna(r.k) else int(r.k)): int(r.s) for r in out.itertuples()}
    assert rows == {1: 30, 2: 30, -1: 60}


def test_grouped_std_single_row_group_is_null():
    """n==1 groups: decomposed std must yield null, matching DuckDB's
    STDDEV (x/0 -> NULL), not a NaN-from-0/0 warning (ADVICE round 2)."""
    df = pd.DataFrame({"k": ["a", "a", "b"], "v": [1.0, 3.0, 7.0]})
    out = _pdf(grouped_agg(rd.from_pandas(df), ["k"], {"sd": ("std", "v")}))
    ref = duckdb.sql(
        "SELECT k, stddev(v) AS sd FROM df GROUP BY k ORDER BY k"
    ).df()
    out = out.sort_values("k").reset_index(drop=True)
    assert np.isclose(out.loc[0, "sd"], ref.loc[0, "sd"])
    assert pd.isna(out.loc[1, "sd"]) and pd.isna(ref.loc[1, "sd"])


def test_heavy_hitters_null_key_candidate():
    """A NULL key above min_count is reported (SQL GROUP BY forms a null
    group); below-threshold values are pruned (ADVICE round 2)."""
    from engine.ops.sketch import heavy_hitters

    df = pd.DataFrame({"x": [None] * 40 + ["hot"] * 50 + ["cold"] * 3})
    out = _pdf(heavy_hitters(rd.from_pandas(df), "x", min_count=10, k=8))
    got = {(-1 if pd.isna(r.x) else r.x): int(r.n) for r in out.itertuples()}
    assert got == {-1: 40, "hot": 50}


def test_json_get_nested_and_escaped_fallback():
    """Vectorized fast path must fall back to real JSON parsing for
    nested docs and regex-missed rows — results identical to json.loads."""
    from engine.ops import scalar as F

    vals = [
        '{"k": 5}',                      # fast path
        '{"a": {"k": 99}, "k": 7}',      # nested: regex unsound -> loop
        '{"a": {"k": 99}}',              # nested, key only inside -> None
        '{"k": null}',                   # null literal -> loop -> None
        None,
        "bad",
    ]
    out = F.json_get(pa.array(vals), "k").to_pylist()
    assert out == [5, 7, None, None, None, None]
    s = F.json_get(pa.array(['{"k": "x"}', '{"k": "a\\"b"}']), "k", pa.string())
    assert s.to_pylist() == ["x", 'a"b']


def test_bottomk_sample_order_independent():
    """The seeded bottom-k sample must pick the same rows regardless of
    input ordering (ADVICE round 2: limit() on a clustered corpus gave
    unrepresentative centroids)."""
    from engine.ops.ann import bottomk_sample_rows

    df = pd.DataFrame({"id": np.arange(1000), "v": np.arange(1000) * 2})
    a = bottomk_sample_rows(rd.from_pandas(df), "id", 50, seed="t")
    b = bottomk_sample_rows(
        rd.from_pandas(df.sample(frac=1.0, random_state=7)), "id", 50, seed="t"
    )
    ka, kb = {r["id"] for r in a}, {r["id"] for r in b}
    assert ka == kb and len(ka) == 50
    c = bottomk_sample_rows(rd.from_pandas(df), "id", 50, seed="other")
    assert {r["id"] for r in c} != ka  # seed-dependent for int ids


def test_salted_join_right_outer_match_pandas():
    """Salted right/outer joins must equal the plain pandas merge,
    including unmatched-right rows (carried once, not once per salt) and
    null-key right rows (always unmatched)."""
    from engine.ops.join import salted_join

    l = pd.DataFrame({"k": [1, 1, 2, 3], "lv": [10, 11, 20, 30]})
    r = pd.DataFrame({"k": [1, 2, 2, 9, None], "rv": [100, 200, 201, 900, 999]})
    for how in ("right", "outer"):
        got = (
            salted_join(rd.from_pandas(l), rd.from_pandas(r), "k", how, num_salts=4)
            .to_pandas()
            .sort_values(["k", "lv", "rv"], na_position="last")
            .reset_index(drop=True)
        )
        ref = (
            l.merge(r, on="k", how=how)
            .sort_values(["k", "lv", "rv"], na_position="last")
            .reset_index(drop=True)
        )
        assert len(got) == len(ref), how
        for col in ("k", "lv", "rv"):
            ga = got[col].astype("float64").to_numpy()
            rf = ref[col].astype("float64").to_numpy()
            assert ((ga == rf) | (np.isnan(ga) & np.isnan(rf))).all(), (how, col)


def test_auto_join_strategy_pick_same_result():
    """auto_join must produce identical rows whether the size gate picks
    broadcast (small right) or shuffle (threshold forced to 0), with
    shuffle_join's column naming either way."""
    from engine.ops.join import auto_join

    l = pd.DataFrame({"k": [1, 1, 2, 4], "v": [10, 11, 20, 40]})
    r = pd.DataFrame({"k": [1, 2, 3], "v": [100, 200, 300]})

    def _norm(ds):
        return (
            ds.to_pandas()
            .sort_values(["k", "v", "v_r"])
            .reset_index(drop=True)
            .astype("int64")
        )

    small = _norm(auto_join(rd.from_pandas(l), rd.from_pandas(r), "k", "inner"))
    big = _norm(
        auto_join(
            rd.from_pandas(l), rd.from_pandas(r), "k", "inner",
            broadcast_threshold_rows=0,
        )
    )
    assert list(small.columns) == list(big.columns) == ["k", "v", "v_r"]
    assert small.equals(big)
    ref = l.merge(r, on="k", how="inner", suffixes=("", "_r"))
    assert len(small) == len(ref) == 3


def test_cube_and_grouping_sets_match_duckdb():
    from engine.ops.agg import cube, grouping_sets

    df = pd.DataFrame(
        {"a": ["x", "x", "y"], "b": ["p", "q", "p"], "v": [1, 2, 4]}
    )

    def _norm(d):
        d = d.fillna("∅")
        return set(map(tuple, d[["a", "b", "s", "n"]].values))

    got = _pdf(cube(rd.from_pandas(df), ["a", "b"], {"s": ("sum", "v"), "n": ("count", None)}))
    ref = duckdb.sql(
        "SELECT a, b, CAST(SUM(v) AS BIGINT) s, CAST(COUNT(*) AS BIGINT) n "
        "FROM df GROUP BY CUBE(a, b)"
    ).df()
    assert _norm(got) == _norm(ref)

    got2 = _pdf(
        grouping_sets(
            rd.from_pandas(df), ["a", "b"], [["a"], []], {"s": ("sum", "v"), "n": ("count", None)}
        )
    )
    ref2 = duckdb.sql(
        "SELECT a, CAST(NULL AS VARCHAR) AS b, CAST(SUM(v) AS BIGINT) s, "
        "CAST(COUNT(*) AS BIGINT) n FROM df GROUP BY GROUPING SETS ((a), ())"
    ).df()
    assert _norm(got2) == _norm(ref2)


def test_grouped_quantile_matches_duckdb():
    from engine.ops.agg import grouped_quantile

    rng = np.random.RandomState(3)
    df = pd.DataFrame({"k": rng.choice(["a", "b", "c"], 500), "v": rng.rand(500) * 100})
    got = _pdf(grouped_quantile(rd.from_pandas(df), ["k"], "v", q=0.9, out="p90"))
    ref = duckdb.sql(
        "SELECT k, round(quantile_cont(v, 0.9), 6) AS p90 FROM df GROUP BY k"
    ).df()
    m = got.merge(ref, on="k", suffixes=("", "_ref"))
    assert len(m) == 3 and np.allclose(m["p90"], m["p90_ref"])


def test_redact_and_normalize_edges():
    from engine.ops.text import normalize_text, redact_pii

    df = pd.DataFrame(
        {"text": ["mail a.b-c@x.co.uk now", "ip 10.0.0.1 ok", "call +44 20 7946 0958", "clean", None]}
    )
    out = redact_pii(rd.from_pandas(df), "text").to_pandas()["text"].tolist()
    assert out[0] == "mail [EMAIL] now"
    assert out[1] == "ip [IP] ok"
    assert out[2] == "call [PHONE]"
    assert out[3] == "clean" and out[4] is None

    df2 = pd.DataFrame({"text": ["  Hello,   WORLD!  ", None]})
    norm = normalize_text(rd.from_pandas(df2)).to_pandas()["text_norm"].tolist()
    assert norm == ["hello world", None]


def test_bloom_filter_prune_no_false_negatives():
    """Every true key survives the prune (Bloom filters never false-
    negative); false positives are rare at 1M bits / 1k keys; the exact
    semi join after the prune restores exactness."""
    from engine.ops.join import bloom_filter_keys, bloom_prune, distributed_keyset, semi_join

    keys = rd.from_pandas(pd.DataFrame({"k": np.arange(0, 2000, 2)}))
    probe = rd.from_pandas(pd.DataFrame({"k": np.arange(2000)}))
    bloom = bloom_filter_keys(keys, "k")
    surv = bloom_prune(probe, "k", bloom).to_pandas()["k"].to_numpy()
    assert set(np.arange(0, 2000, 2)) <= set(surv)          # no false negatives
    assert len(surv) < 1100                                  # FP rate sane
    exact = semi_join(
        bloom_prune(probe, "k", bloom), distributed_keyset(keys, "k"), "k"
    ).to_pandas()["k"].to_numpy()
    assert sorted(exact) == list(range(0, 2000, 2))


def test_pair_aggregates_match_duckdb():
    # corr/covar/regr through the bucketed combiner vs DuckDB's native
    # aggregates (int inputs -> both computations exact to ~1e-9).
    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 400),
            "x": rng.randint(0, 50, 400),
        }
    )
    df["y"] = 3 * df["x"] + rng.randint(0, 10, 400)
    ds = rd.from_pandas(df)
    out = (
        _pdf(
            grouped_agg(
                ds,
                ["k"],
                {
                    "cv": ("covar", ("x", "y")),
                    "cr": ("corr", ("x", "y")),
                    "sl": ("regr_slope", ("x", "y")),
                    "ic": ("regr_intercept", ("x", "y")),
                },
            )
        )
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = duckdb.query_df(
        df, "t",
        """SELECT k, COVAR_SAMP(y, x) AS cv, CORR(y, x) AS cr,
                  REGR_SLOPE(y, x) AS sl, REGR_INTERCEPT(y, x) AS ic
           FROM t GROUP BY k ORDER BY k""",
    ).df()
    for c in ("cv", "cr", "sl", "ic"):
        np.testing.assert_allclose(out[c], exp[c], rtol=1e-9)


def test_pair_aggregates_degenerate_groups():
    # n==1 group -> covar NULL; zero-variance x -> corr/slope NULL
    # (mirrors SQL x/0 -> NULL).
    df = pd.DataFrame({"k": ["a", "b", "b"], "x": [1, 2, 2], "y": [5, 7, 9]})
    out = (
        _pdf(
            grouped_agg(
                rd.from_pandas(df),
                ["k"],
                {"cv": ("covar", ("x", "y")), "sl": ("regr_slope", ("x", "y"))},
            )
        )
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert np.isnan(out.loc[0, "cv"]) and np.isnan(out.loc[0, "sl"])
    assert np.isnan(out.loc[1, "sl"])  # x constant within group b


def test_shuffle_join_composite_key_matches_pandas():
    # Direct coverage of the composite-key bucketed exchange (the
    # registered composite query routes through auto_join's broadcast
    # gate, so the shuffle path needs its own test).
    rng = np.random.RandomState(3)
    l = pd.DataFrame(
        {
            "a": rng.randint(0, 6, 300),
            "b": rng.choice(["x", "y", "z"], 300),
            "v": np.arange(300),
        }
    )
    r = l.groupby(["a", "b"], as_index=False).agg(n=("v", "size"))
    out = _pdf(
        shuffle_join(rd.from_pandas(l), rd.from_pandas(r), key=["a", "b"])
    ).sort_values(["a", "b", "v"]).reset_index(drop=True)
    ref = l.merge(r, on=["a", "b"]).sort_values(["a", "b", "v"]).reset_index(drop=True)
    assert len(out) == len(ref)
    pd.testing.assert_frame_equal(out[["a", "b", "v", "n"]], ref[["a", "b", "v", "n"]])


def test_scd2_history_matches_duckdb():
    """SCD2 compaction vs a DuckDB window-function oracle, including
    null states, single-version keys, and same-timestamp tiebreaks."""
    from engine.ops.window import scd2_history

    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame(
        {
            "eid": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, 25, n).astype(np.int64),
            "t": rng.integers(0, 40, n).astype(np.int64),
            "state": pd.array(
                [None if x == 0 else f"s{x}" for x in rng.integers(0, 4, n)],
                dtype="string",
            ),
        }
    )
    got = (
        scd2_history(
            rd.from_pandas(df), key=["k"], order_by=["t", "eid"],
            state_cols=["state"], valid_from_col="t", num_buckets=8,
        )
        .to_pandas()[["k", "eid", "valid_from", "valid_to", "state", "is_current"]]
        .sort_values(["k", "eid"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        """WITH o AS (
             SELECT k, eid, t, state,
                    lag(state) OVER (PARTITION BY k ORDER BY t, eid) AS prev,
                    row_number() OVER (PARTITION BY k ORDER BY t, eid) AS rn
             FROM df),
           ch AS (SELECT k, eid, t AS valid_from, state
                  FROM o WHERE rn = 1 OR prev IS DISTINCT FROM state)
           SELECT k, eid, valid_from,
                  lead(valid_from) OVER (PARTITION BY k ORDER BY valid_from, eid) AS valid_to,
                  state,
                  CAST(CASE WHEN lead(valid_from) OVER (PARTITION BY k ORDER BY valid_from, eid) IS NULL
                       THEN 1 ELSE 0 END AS BIGINT) AS is_current
           FROM ch ORDER BY k, eid"""
    ).df().reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got.astype({"valid_to": "float64", "state": "object"}).where(got.notna(), np.nan),
        want.astype({"valid_to": "float64", "state": "object"}).where(want.notna(), np.nan),
        check_dtype=False,
    )
    # exactly one current version per key
    assert got.groupby("k")["is_current"].sum().eq(1).all()


def test_auto_join_left_broadcast_matches_shuffle():
    """Regression: the broadcast gate with join_type='left' must map to
    Acero's 'left outer' (a bare 'left' raised Unsupported join type)."""
    from engine.ops.join import auto_join

    l = pd.DataFrame({"k": [1, 1, 2, 4], "v": [10, 11, 20, 40]})
    r = pd.DataFrame({"k": [1, 2, 3], "v": [100, 200, 300]})

    def _norm(ds):
        return (
            ds.to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)
            .astype("float64")
        )

    small = _norm(auto_join(rd.from_pandas(l), rd.from_pandas(r), "k", "left"))
    big = _norm(
        auto_join(
            rd.from_pandas(l), rd.from_pandas(r), "k", "left",
            broadcast_threshold_rows=0,
        )
    )
    ref = l.merge(r, on="k", how="left", suffixes=("", "_r")).sort_values(["k", "v"]).reset_index(drop=True).astype("float64")
    assert len(small) == len(big) == len(ref) == 4
    pd.testing.assert_frame_equal(small[["k", "v", "v_r"]], ref[["k", "v", "v_r"]])
    pd.testing.assert_frame_equal(big[["k", "v", "v_r"]], ref[["k", "v", "v_r"]])


def test_prefix_scan_max_matches_duckdb():
    """Distributed exclusive running max vs the SQL window, over unordered
    input with composite-order ties on the range column."""
    from engine.ops.order import prefix_scan_max

    rng = np.random.default_rng(11)
    n = 5000
    df = pd.DataFrame(
        {
            "a": rng.integers(0, 300, n).astype(np.int64),  # range col, many ties
            "b": rng.permutation(n).astype(np.int64),       # tiebreak -> total order
            "v": rng.integers(-1000, 1000, n).astype(np.int64),
        }
    )
    got = (
        prefix_scan_max(rd.from_pandas(df.sample(frac=1.0, random_state=3)),
                        ["a", "b"], "v", out="rm", num_ranges=16)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        """SELECT a, b, v, max(v) OVER (ORDER BY a, b
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rm
           FROM df ORDER BY a, b"""
    ).df().reset_index(drop=True)
    assert np.isnan(got["rm"].iloc[0]) and pd.isna(want["rm"].iloc[0])
    pd.testing.assert_series_equal(
        got["rm"].astype("float64"), want["rm"].astype("float64"), check_names=False
    )


def test_auto_semi_join_paths_agree():
    """auto_semi_join must return the same rows whether the key-count
    gate picks the driver-broadcast is_in path or the distributed
    bucketed membership shuffle — including SQL 3VL NULL semantics
    (NULL left key is never IN / NOT IN; NULL in the key set empties
    the anti side)."""
    from engine.ops.join import auto_semi_join

    l = pd.DataFrame({"k": pd.array([1, 2, 3, 4, None], dtype="Int64"),
                      "v": [10, 20, 30, 40, 50]})
    r = pd.DataFrame({"j": pd.array([2, 4, 4, 9], dtype="Int64")})
    r_null = pd.DataFrame({"j": pd.array([2, None], dtype="Int64")})

    def _norm(ds):
        df = ds.to_pandas()
        return (
            df.astype({"k": "Int64", "v": "Int64"})
            .sort_values(["k", "v"])
            .reset_index(drop=True)
        )

    for anti in (False, True):
        bcast = _norm(auto_semi_join(
            rd.from_pandas(l), rd.from_pandas(r), "k", right_key="j", anti=anti))
        shuf = _norm(auto_semi_join(
            rd.from_pandas(l), rd.from_pandas(r), "k", right_key="j", anti=anti,
            broadcast_threshold_keys=0))
        assert auto_semi_join.last_strategy == "shuffle"
        pd.testing.assert_frame_equal(bcast, shuf)
    # semi keeps exactly the matching keys, once each (distinct set)
    sem = _norm(auto_semi_join(
        rd.from_pandas(l), rd.from_pandas(r), "k", right_key="j",
        broadcast_threshold_keys=0))
    assert sem["k"].tolist() == [2, 4]
    # anti drops matching AND null left keys
    ant = _norm(auto_semi_join(
        rd.from_pandas(l), rd.from_pandas(r), "k", right_key="j", anti=True,
        broadcast_threshold_keys=0))
    assert ant["k"].tolist() == [1, 3]
    # NULL in the key set -> NOT IN unsatisfiable on BOTH paths
    for thresh in (0, 10):
        empty = auto_semi_join(
            rd.from_pandas(l), rd.from_pandas(r_null), "k", right_key="j",
            anti=True, broadcast_threshold_keys=thresh)
        assert empty.count() == 0


def test_auto_join_skew_detection_routes_salted():
    """One key holding 50% of the left rows must trip the skew probe:
    auto_join picks the salted route, and the result is identical to the
    plain bucketed shuffle join."""
    from engine.ops.join import auto_join, shuffle_join

    rng = np.random.default_rng(7)
    n = 2000
    k = np.where(rng.random(n) < 0.5, 77, rng.integers(0, 500, n)).astype(np.int64)
    l = pd.DataFrame({"k": k, "v": np.arange(n, dtype=np.int64)})
    r = pd.DataFrame({"k": np.arange(500, dtype=np.int64),
                      "w": np.arange(500, dtype=np.int64) * 10})

    def _norm(ds):
        return (
            ds.to_pandas()
            .astype("int64")
            .sort_values(["k", "v", "w"])
            .reset_index(drop=True)
        )

    salted = _norm(auto_join(
        rd.from_pandas(l), rd.from_pandas(r), "k", "inner",
        broadcast_threshold_rows=0))
    assert auto_join.last_strategy == "salted"
    plain = _norm(shuffle_join(rd.from_pandas(l), rd.from_pandas(r), "k", "inner"))
    pd.testing.assert_frame_equal(salted, plain)
    # uniform keys stay on the plain shuffle route
    lu = pd.DataFrame({"k": rng.integers(0, 500, n).astype(np.int64),
                       "v": np.arange(n, dtype=np.int64)})
    auto_join(rd.from_pandas(lu), rd.from_pandas(r), "k", "inner",
              broadcast_threshold_rows=0).count()
    assert auto_join.last_strategy == "shuffle"


def test_range_join_global_matches_bruteforce():
    """Keyless time-bin range join == brute-force band filter, including
    a two-sided band and negative timestamps (floor-div bin edges)."""
    from engine.ops.join import range_join_global

    rng = np.random.default_rng(11)
    lt = rng.integers(-5000, 5000, 300).astype(np.int64)
    rt = rng.integers(-5000, 5000, 400).astype(np.int64)
    l = pd.DataFrame({"lid": np.arange(300, dtype=np.int64), "t": lt})
    r = pd.DataFrame({"rid": np.arange(400, dtype=np.int64), "s": rt})
    lower, upper = 150, 70  # s in [t - 150, t + 70]
    got = (
        range_join_global(rd.from_pandas(l), rd.from_pandas(r),
                          on="t", right_on="s", lower_us=lower, upper_us=upper)
        .to_pandas()[["lid", "rid"]]
        .astype("int64")
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )
    want = (
        l.merge(r, how="cross")
        .query("s >= t - @lower and s <= t + @upper")[["lid", "rid"]]
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_spec_parser_validation_and_lowering():
    """The declarative-spec compiler: actionable errors for malformed
    specs, and a lowered pipeline that computes the same result as the
    hand-written equivalent."""
    import pytest

    from engine.spec import compile_expr, lower, run_spec

    with pytest.raises(ValueError, match="'steps' list"):
        lower({"not_steps": []})
    with pytest.raises(ValueError, match="unknown op 'explode9'"):
        lower({"steps": [{"op": "explode9"}]})
    with pytest.raises(ValueError, match="missing field"):
        lower({"steps": [{"op": "select"}]})
    with pytest.raises(ValueError, match="unknown cmp"):
        lower({"steps": [{"op": "filter", "column": "a", "cmp": "~", "value": 1}]})
    with pytest.raises(ValueError, match="single-key dict"):
        compile_expr({"add": [1, 2], "mul": [3, 4]})
    with pytest.raises(ValueError, match="takes \\[left, right\\]"):
        compile_expr({"add": [{"lit": 1}]})
    with pytest.raises(ValueError, match="unknown expr op"):
        compile_expr({"exp": {"lit": 1}})
    with pytest.raises(ValueError, match="'table' or 'lake' field"):
        run_spec({"source": {}, "steps": []}, "/nowhere")

    df = pd.DataFrame({"g": ["a", "a", "b"], "x": [1.0, 2.0, 3.0], "q": [5, 20, 20]})
    spec = {
        "steps": [
            {"op": "filter", "column": "q", "cmp": ">", "value": 10},
            {"op": "with_column", "name": "cents", "expr": {"cents": {"col": "x"}}},
            {"op": "select", "columns": ["g", "cents"]},
            {"op": "grouped_sum", "keys": ["g"], "cols": ["cents"]},
            {"op": "sort", "by": ["g"]},
        ]
    }
    out = lower(spec).run(rd.from_pandas(df)).to_pandas()
    assert out["g"].tolist() == ["a", "b"] and out["cents"].tolist() == [200, 300]


def test_spec_join_step_requires_context():
    from engine.spec import lower

    import pytest

    with pytest.raises(ValueError, match="needs a source context"):
        lower({"steps": [{"op": "join", "table": "orders", "key": "k"}]})


def test_shuffle_join_property_random_frames():
    """Property test: shuffle_join == SQL-semantics reference join over
    randomized frames with duplicate and NULL keys, for inner and left.
    (NULL keys never match — unlike pandas merge, which matches NaN to
    NaN, so the reference drops null keys from the match set.)"""
    from hypothesis import given, settings, strategies as st

    from engine.ops.join import shuffle_join

    keys = st.lists(
        st.one_of(st.integers(min_value=0, max_value=6), st.none()),
        min_size=0, max_size=25,
    )

    @settings(max_examples=5, deadline=None)
    @given(lk=keys, rk=keys,
           how=st.sampled_from(["inner", "left", "right", "outer"]))
    def _check(lk, rk, how):
        l = pd.DataFrame({"k": pd.array(lk, dtype="Int64"),
                          "v": np.arange(len(lk), dtype=np.int64)})
        r = pd.DataFrame({"k": pd.array(rk, dtype="Int64"),
                          "w": np.arange(len(rk), dtype=np.int64) * 10})
        got_ds = shuffle_join(rd.from_pandas(l), rd.from_pandas(r), "k", how)
        got = got_ds.to_pandas()
        # SQL reference: null keys never match; outer sides keep them
        # as unmatched rows.
        r_valid, l_valid = r[r["k"].notna()], l[l["k"].notna()]
        inner = l_valid.merge(r_valid, on="k", how="inner")
        parts = [inner]
        if how in ("left", "outer"):
            mk = set(r_valid["k"].tolist())
            un = l[~l["k"].isin(mk) | l["k"].isna()].copy()
            un["w"] = pd.array([None] * len(un), dtype="Int64")
            parts.append(un)
        if how in ("right", "outer"):
            mk = set(l_valid["k"].tolist())
            un = r[~r["k"].isin(mk) | r["k"].isna()].copy()
            un["v"] = pd.array([None] * len(un), dtype="Int64")
            parts.append(un)
        want = pd.concat(parts, ignore_index=True)[["k", "v", "w"]]
        if len(want) == 0:
            # empty-Dataset to_pandas() loses columns (known Ray quirk) —
            # row-count equality is the whole check here.
            assert len(got) == 0
            return
        for df in (got, want):
            for c in ("k", "v", "w"):
                df[c] = pd.array(df[c], dtype="Int64")
        got = got[["k", "v", "w"]].sort_values(["k", "v", "w"]).reset_index(drop=True)
        want = want.sort_values(["k", "v", "w"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)

    _check()


def test_grouped_agg_property_random_frames():
    """Property test: the bucketed-combiner grouped_agg == DuckDB over
    random frames with NULL group keys and negative values, for
    sum/count/min/max/mean."""
    from hypothesis import given, settings, strategies as st

    rows = st.lists(
        st.tuples(
            st.one_of(st.integers(min_value=0, max_value=4), st.none()),
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=1, max_size=40,
    )

    @settings(max_examples=5, deadline=None)
    @given(data=rows)
    def _check(data):
        df = pd.DataFrame(
            {"g": pd.array([k for k, _ in data], dtype="Int64"),
             "x": np.array([v for _, v in data], dtype=np.int64)}
        )
        got = (
            grouped_agg(
                rd.from_pandas(df), ["g"],
                {"s": ("sum", "x"), "n": ("count", None),
                 "lo": ("min", "x"), "hi": ("max", "x"), "m": ("mean", "x")},
            )
            .to_pandas()
            .sort_values("g", na_position="last")
            .reset_index(drop=True)
        )
        want = duckdb.sql(
            """SELECT g, CAST(SUM(x) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(MIN(x) AS BIGINT) AS lo, CAST(MAX(x) AS BIGINT) AS hi,
                      AVG(x) AS m
               FROM df GROUP BY g ORDER BY g NULLS LAST"""
        ).df().reset_index(drop=True)
        for c in ("s", "n", "lo", "hi"):
            assert [int(v) for v in got[c]] == [int(v) for v in want[c]], c
        assert np.allclose(got["m"].astype(float), want["m"].astype(float))
        assert got["g"].isna().sum() == want["g"].isna().sum()

    _check()


def test_asof_join_property_random_frames():
    """Property test: asof_join (backward) == pandas merge_asof over
    random per-key event times with duplicate keys and empty overlap."""
    from hypothesis import given, settings, strategies as st

    rows = st.lists(
        st.tuples(st.integers(min_value=0, max_value=3),
                  st.integers(min_value=0, max_value=1000)),
        min_size=1, max_size=30,
    )

    @settings(max_examples=5, deadline=None)
    @given(lrows=rows, rrows=rows)
    def _check(lrows, rrows):
        base = pd.Timestamp("2024-01-01")
        l = pd.DataFrame({
            "u": np.array([k for k, _ in lrows], np.int64),
            "t": (base + pd.to_timedelta([s for _, s in lrows], unit="s")).astype("datetime64[us]"),
        })
        l["x"] = np.arange(len(l), dtype=np.int64)
        r = pd.DataFrame({
            "u": np.array([k for k, _ in rrows], np.int64),
            "t2": (base + pd.to_timedelta([s for _, s in rrows], unit="s")).astype("datetime64[us]"),
        })
        # merge_asof requires unique right (by, time) winners to be
        # deterministic — collapse duplicates keeping max y.
        r["y"] = np.arange(len(r), dtype=np.int64) * 10
        r = r.sort_values("y").groupby(["u", "t2"], as_index=False).last()
        got = (
            asof_join(rd.from_pandas(l), rd.from_pandas(r),
                      on="t", by="u", right_on="t2", right_by="u")
            .to_pandas()
            .sort_values(["u", "t", "x"])
            .reset_index(drop=True)
        )
        want = pd.merge_asof(
            l.sort_values("t", kind="mergesort"),
            r.sort_values("t2", kind="mergesort"),
            left_on="t", right_on="t2", by="u", direction="backward",
        ).sort_values(["u", "t", "x"]).reset_index(drop=True)
        assert got["y"].astype("Int64").tolist() == want["y"].astype("Int64").tolist()

    _check()


def test_interval_join_matches_bruteforce():
    """Keyless interval-overlap join == brute-force, incl. negative
    timestamps (floor-div bin edges), zero-length intervals, and pairs
    spanning multiple shared bins (exactly-once emission)."""
    from engine.ops.join import interval_join

    rng = np.random.default_rng(23)
    def mk(n, prefix):
        s = rng.integers(-5000, 5000, n).astype(np.int64)
        ln = rng.integers(0, 300, n).astype(np.int64)
        return pd.DataFrame({f"{prefix}id": np.arange(n, dtype=np.int64),
                             f"{prefix}s": s, f"{prefix}e": s + ln})
    l, r = mk(250, "l"), mk(300, "r")
    got = (
        interval_join(rd.from_pandas(l), rd.from_pandas(r),
                      "ls", "le", "rs", "re", max_len_us=300)
        .to_pandas()[["lid", "rid"]]
        .astype("int64")
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )
    want = (
        l.merge(r, how="cross")
        .query("ls <= re and rs <= le")[["lid", "rid"]]
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # duplicates would break exactly-once: assert no pair twice
    assert not got.duplicated().any()
    import pytest

    with pytest.raises(Exception, match="longer than max_len_us"):
        interval_join(rd.from_pandas(l.assign(le=l["ls"] + 10_000)),
                      rd.from_pandas(r), "ls", "le", "rs", "re",
                      max_len_us=300).materialize()


def test_validate_and_bad_row_split():
    """validate() counts violations per rule (zero rows included);
    split_bad_rows partitions rows and tags each bad row with every rule
    it failed."""
    from engine.ops.validate import split_bad_rows, validate

    df = pd.DataFrame(
        {
            "id": pd.array([1, 2, None, 4, 4], dtype="Int64"),
            "x": [0.5, 2.0, 0.1, -1.0, 0.2],
            "flag": ["A", "Z", "A", "Z", "A"],
        }
    )
    rules = [
        {"rule": "not_null", "column": "id"},
        {"rule": "in_range", "column": "x", "min": 0.0, "max": 1.0},
        {"rule": "accepted_values", "column": "flag", "values": ["A"]},
        {"rule": "unique", "column": "id"},
    ]
    rep = validate(rd.from_pandas(df), rules).to_pandas().set_index("rule")["violations"]
    assert rep["not_null:id"] == 1
    assert rep["in_range:x"] == 2        # 2.0 and -1.0
    assert rep["accepted_values:flag"] == 2
    assert rep["unique:id"] == 1         # 4 appears twice (null is one distinct)
    good, bad = split_bad_rows(rd.from_pandas(df), rules)
    g, b = good.to_pandas(), bad.to_pandas()
    assert len(g) + len(b) == len(df) and len(g) == 2
    multi = b[b["x"] == 2.0]["failed_rules"].iloc[0]
    assert set(multi.split(",")) == {"in_range:x", "accepted_values:flag"}
    import pytest

    with pytest.raises(ValueError, match="unknown validation rule"):
        validate(rd.from_pandas(df), [{"rule": "positive", "column": "x"}]).to_pandas()


def test_heavy_hitters_soundness_gate_and_distributed_fold():
    # Regression for the sf0.1 miss: values whose per-batch count never
    # clears batch_n/(k+1) used to vanish from the candidate fold even
    # though their TRUE count >= min_count. With k too small the
    # soundness gate must recount everything exactly.
    import numpy as np

    from engine.ops.sketch import heavy_hitters

    rng = np.arange(4800)
    df = pd.DataFrame({"x": rng % 300})  # every value appears 16x, spread out
    ds = rd.from_pandas(df).repartition(20)  # ~240 rows/batch -> 1-2 per value
    out = _pdf(heavy_hitters(ds, "x", min_count=16, k=8)).sort_values("x")
    assert len(out) == 300 and (out["n"] == 16).all()

    # Sound k (slack < min_count) through the DISTRIBUTED candidate fold:
    # same exact answer as the driver-fold path.
    out2 = _pdf(
        heavy_hitters(ds, "x", min_count=16, k=4800, fold_pull_threshold=0)
    ).sort_values("x")
    assert out2["x"].tolist() == out["x"].tolist()
    assert out2["n"].tolist() == out["n"].tolist()


def test_auto_semi_join_property_random_frames():
    """Property test over the round-4 combiner-first key-set build:
    auto_semi_join (semi AND anti, broadcast AND shuffled routes) ==
    SQL IN / NOT IN three-valued-logic reference, on randomized frames
    with duplicate and NULL keys on both sides."""
    from hypothesis import given, settings, strategies as st

    from engine.ops.join import auto_semi_join

    keys = st.lists(
        st.one_of(st.integers(min_value=0, max_value=6), st.none()),
        min_size=0, max_size=25,
    )

    @settings(max_examples=5, deadline=None)
    @given(lk=keys, rk=keys, anti=st.booleans(), force_shuffle=st.booleans())
    def _check(lk, rk, anti, force_shuffle):
        l = pd.DataFrame({"k": pd.array(lk, dtype="Int64"),
                          "v": np.arange(len(lk), dtype=np.int64)})
        r = pd.DataFrame({"k": pd.array(rk, dtype="Int64")})
        got = auto_semi_join(
            rd.from_pandas(l), rd.from_pandas(r), "k",
            anti=anti,
            broadcast_threshold_keys=0 if force_shuffle else 200_000,
        ).to_pandas()
        rv = set(r["k"].dropna().tolist())
        if anti:
            # NOT IN: unsatisfiable if the key set holds a NULL; a NULL
            # left key is never NOT IN.
            if r["k"].isna().any():
                want = l.iloc[0:0]
            else:
                want = l[l["k"].notna() & ~l["k"].isin(rv)]
        else:
            want = l[l["k"].notna() & l["k"].isin(rv)]
        assert len(got) == len(want)
        if len(want):
            a = sorted(zip(got["k"].tolist(), got["v"].tolist()))
            b = sorted(zip(want["k"].tolist(), want["v"].tolist()))
            assert a == b

    _check()


def test_auto_semi_join_empty_left_shuffled_route():
    """Pinned hypothesis falsifier: an EMPTY Int64-keyed left side
    through the forced-shuffle semi route. The left loses every scrap
    of schema metadata by the time shuffle_join re-keys it; _ensure_arrow
    must re-root it as a concrete empty Arrow dataset instead of
    raising."""
    from engine.ops.join import auto_semi_join

    l = pd.DataFrame({"k": pd.array([], dtype="Int64"),
                      "v": np.arange(0, dtype=np.int64)})
    for rk, anti in (([None], False), ([None], True), ([1, None, 2], False)):
        r = pd.DataFrame({"k": pd.array(rk, dtype="Int64")})
        got = auto_semi_join(
            rd.from_pandas(l), rd.from_pandas(r), "k",
            anti=anti, broadcast_threshold_keys=0,
        ).to_pandas()
        assert len(got) == 0


def test_setops_all_multiplicity_and_nulls():
    """ANSI bag semantics: INTERSECT ALL = min(counts), EXCEPT ALL =
    max(l-r, 0); NULLs compare EQUAL in set operations (unlike joins)."""
    from engine.ops.setops import except_all, intersect_all

    a = rd.from_pandas(pd.DataFrame({"k": pd.array([1, 1, 1, 2, None, None], dtype="Int64")}))
    b = rd.from_pandas(pd.DataFrame({"k": pd.array([1, 2, 2, None], dtype="Int64")}))
    # min(3,1)=1 one, min(1,2)=1 two, min(2,1)=1 null
    got = intersect_all(a, b, ["k"]).to_pandas()["k"]
    assert got.notna().sum() == 2 and sorted(got.dropna().astype(int).tolist()) == [1, 2]
    assert got.isna().sum() == 1
    exc = except_all(a, b, ["k"]).to_pandas()["k"]
    # 1: 3-1=2, 2: 1-2=0, null: 2-1=1
    assert sorted(exc.dropna().astype(int).tolist()) == [1, 1]
    assert exc.isna().sum() == 1


def test_analytic_window_property_random_frames():
    """Property test over the bucketed window exchange: the distributed
    analytic() result must equal a single-frame pandas computation of
    the same spec — i.e. the exchange never splits a partition, and
    batch boundaries / group routing never leak into window semantics.
    Unique order keys make the row-dependent functions well-defined;
    the rank family is additionally exercised on a heavily-tied value
    column."""
    from hypothesis import given, settings, strategies as st

    from engine.ops.window import analytic

    @settings(max_examples=5, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=60),
        n_parts=st.integers(min_value=1, max_value=4),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
        descending=st.booleans(),
    )
    def _check(n, n_parts, seed, descending):
        rng = np.random.RandomState(seed)
        df = pd.DataFrame({
            "p": rng.randint(0, n_parts, n),
            "o": rng.permutation(n),          # unique order key
            "v": rng.randint(0, 3, n),        # heavy ties for the rank family
        })
        specs = {
            "rn": ("row_number",),
            "rk": ("rank", "v"),
            "drk": ("dense_rank", "v"),
            "prk": ("percent_rank", "v"),
            "cd": ("cume_dist", "v"),
            "tile": ("ntile", 3),
            "prev": ("lag", "v", 1),
            "nxt": ("lead", "v", 2),
            "cs": ("cumsum", "v"),
            "fv": ("first_value", "v"),
            "lv": ("last_value", "v"),
        }
        got = (
            analytic(rd.from_pandas(df), ["p"], ["o"], specs, descending=descending)
            .to_pandas()
            .sort_values(["p", "o"])
            .reset_index(drop=True)
        )
        # single-frame reference: same pandas semantics, no exchange
        ref = df.sort_values(["o", "p"], ascending=[not descending, True],
                             kind="mergesort")
        g = ref.groupby("p", sort=False)
        ref = ref.assign(
            rn=g.cumcount() + 1,
            rk=g["v"].rank(method="min", ascending=not descending).astype("int64"),
            drk=g["v"].rank(method="dense", ascending=not descending).astype("int64"),
            prev=g["v"].shift(1),
            nxt=g["v"].shift(-2),
            cs=g["v"].cumsum(),
            fv=g["v"].transform("first"),
            lv=g["v"].transform("last"),
        )
        rk_max = g["v"].rank(method="max", ascending=not descending)
        cnt = g["v"].transform("size")
        ref["prk"] = ((ref["rk"] - 1) / (cnt - 1).clip(lower=1)).where(cnt > 1, 0.0)
        ref["cd"] = rk_max / cnt
        i = g.cumcount().to_numpy()
        c = cnt.to_numpy()
        q_, r_ = c // 3, c % 3
        big = r_ * (q_ + 1)
        ref["tile"] = np.where(i < big, i // np.maximum(q_ + 1, 1),
                               r_ + (i - big) // np.maximum(q_, 1)).astype("int64") + 1
        ref = ref.sort_values(["p", "o"]).reset_index(drop=True)
        for c_ in specs:
            gv, rv = got[c_].to_numpy(), ref[c_].to_numpy()
            if gv.dtype.kind == "f" or rv.dtype.kind == "f":
                assert np.allclose(gv, rv, equal_nan=True), c_
            else:
                assert (gv == rv).all(), c_

    _check()


def test_grouped_agg_property_null_keys():
    """Property test over the bucketed combiner: grouped_agg on frames
    with NULL-bearing composite keys == pandas groupby(dropna=False),
    at any batch split."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=5, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=80),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def _check(n, seed):
        rng = np.random.RandomState(seed)
        k1 = pd.array(
            [None if rng.rand() < 0.2 else int(x) for x in rng.randint(0, 4, n)],
            dtype="Int64",
        )
        df = pd.DataFrame({
            "k1": k1,
            "k2": rng.choice(["x", "y"], n),
            "v": rng.randint(-50, 50, n).astype("int64"),
        })
        got = (
            grouped_agg(rd.from_pandas(df), ["k1", "k2"],
                        {"s": ("sum", "v"), "mn": ("min", "v"),
                         "mx": ("max", "v"), "n": ("count", None)})
            .to_pandas()
        )
        ref = (
            df.groupby(["k1", "k2"], dropna=False)
            .agg(s=("v", "sum"), mn=("v", "min"), mx=("v", "max"), n=("v", "size"))
            .reset_index()
        )
        key = lambda d: d.assign(__k=d["k1"].astype("Float64").astype(object).astype(str) + "|" + d["k2"]).sort_values("__k").reset_index(drop=True)
        got, ref = key(got), key(ref)
        assert len(got) == len(ref)
        for c_ in ("s", "mn", "mx", "n"):
            assert got[c_].astype("int64").tolist() == ref[c_].astype("int64").tolist(), c_

    _check()


def test_setops_all_property_vs_duckdb():
    """Property test: intersect_all / except_all on random multisets
    (duplicates + NULLs) == DuckDB's INTERSECT ALL / EXCEPT ALL."""
    from hypothesis import given, settings, strategies as st

    from engine.ops.setops import except_all, intersect_all

    keys = st.lists(
        st.one_of(st.integers(min_value=0, max_value=5), st.none()),
        min_size=0, max_size=30,
    )

    @settings(max_examples=5, deadline=None)
    @given(lk=keys, rk=keys, mode=st.booleans())
    def _check(lk, rk, mode):
        l = pd.DataFrame({"k": pd.array(lk, dtype="Int64")})
        r = pd.DataFrame({"k": pd.array(rk, dtype="Int64")})
        fn = intersect_all if mode else except_all
        out = fn(rd.from_pandas(l), rd.from_pandas(r), ["k"]).to_pandas()
        # Ray's to_pandas drops columns for zero-row results (documented
        # quirk) — an empty multiset result is legitimate here.
        got = out["k"] if "k" in out.columns else pd.Series([], dtype="Int64")
        con = duckdb.connect()
        con.register("l", l)
        con.register("r", r)
        op = "INTERSECT ALL" if mode else "EXCEPT ALL"
        ref = [x[0] for x in con.sql(f"SELECT k FROM l {op} SELECT k FROM r").fetchall()]
        gv = sorted((-1 if pd.isna(v) else int(v)) for v in got)
        rv = sorted((-1 if v is None else int(v)) for v in ref)
        assert gv == rv

    _check()


def test_range_sum_frame_peers_and_bands():
    """RANGE frames include ALL peers of the current order value (both
    sides), and the int64 group banding never leaks a window across
    partition keys — checked against DuckDB on a frame with tied
    timestamps and adjacent groups."""
    from engine.ops.window import analytic

    df = pd.DataFrame({
        "u": [1, 1, 1, 1, 2, 2, 2],
        "t": pd.to_datetime([
            "2024-01-01 00:00", "2024-01-01 00:30", "2024-01-01 00:30",
            "2024-01-01 02:00", "2024-01-01 00:10", "2024-01-01 00:50",
            "2024-01-01 01:05",
        ]).astype("datetime64[us]"),
        "v": np.array([100, 20, 3, 7, 11, 13, 17], dtype=np.int64),
        "eid": np.arange(7, dtype=np.int64),
    })
    out = (
        analytic(rd.from_pandas(df), ["u"], ["t"],
                 {"w": ("range_sum", "v", 3_600_000_000)})
        .to_pandas().sort_values("eid")
    )
    con = duckdb.connect()
    con.register("d", df)
    ref = con.sql("""
        SELECT eid, SUM(v) OVER (PARTITION BY u ORDER BY t
            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS w
        FROM d ORDER BY eid
    """).df()
    assert out["w"].to_numpy().tolist() == ref["w"].astype("int64").tolist()


def test_pivot_property_vs_duckdb():
    """pivot_count / pivot_sum on random frames == DuckDB conditional
    aggregation, including keys that never see some categories."""
    from hypothesis import given, settings, strategies as st

    from engine.ops.reshape import pivot_count, pivot_sum

    @settings(max_examples=5, deadline=None)
    @given(n=st.integers(min_value=1, max_value=60),
           seed=st.integers(min_value=0, max_value=2**31 - 1))
    def _check(n, seed):
        rng = np.random.RandomState(seed)
        df = pd.DataFrame({
            "k": rng.randint(0, 6, n).astype("int64"),
            "cat": rng.choice(["a", "b", "c"], n),
            "v": rng.randint(-9, 9, n).astype("int64"),
        })
        cats = ["a", "b"]  # 'c' rows must not leak into the output columns
        got_c = pivot_count(rd.from_pandas(df), "k", "cat", cats, prefix="n_")\
            .to_pandas().sort_values("k").reset_index(drop=True)
        got_s = pivot_sum(rd.from_pandas(df), "k", "cat", "v", cats, prefix="s_")\
            .to_pandas().sort_values("k").reset_index(drop=True)
        con = duckdb.connect()
        con.register("d", df)
        ref = con.sql("""
            SELECT k,
                   SUM(CASE WHEN cat = 'a' THEN 1 ELSE 0 END) AS n_a,
                   SUM(CASE WHEN cat = 'b' THEN 1 ELSE 0 END) AS n_b,
                   SUM(CASE WHEN cat = 'a' THEN v ELSE 0 END) AS s_a,
                   SUM(CASE WHEN cat = 'b' THEN v ELSE 0 END) AS s_b
            FROM d GROUP BY k ORDER BY k
        """).df()
        assert got_c["k"].tolist() == ref["k"].tolist() == got_s["k"].tolist()
        for c_ in ("n_a", "n_b"):
            assert got_c[c_].astype("int64").tolist() == ref[c_].astype("int64").tolist()
        for c_ in ("s_a", "s_b"):
            assert got_s[c_].astype("int64").tolist() == ref[c_].astype("int64").tolist()

    _check()


def test_asof_join_property_vs_merge_asof():
    """Property test over the bucketed as-of exchange: random frames
    (duplicate by-keys, tied timestamps, keys on one side only) ==
    pandas merge_asof on both directions — the exchange must never split
    a by-group or reorder within it."""
    from hypothesis import given, settings, strategies as st

    from engine.ops.join import asof_join

    @settings(max_examples=5, deadline=None)
    @given(
        nl=st.integers(min_value=1, max_value=30),
        nr=st.integers(min_value=0, max_value=30),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
        forward=st.booleans(),
    )
    def _check(nl, nr, seed, forward):
        rng = np.random.RandomState(seed)
        left = pd.DataFrame({
            "u": rng.randint(0, 4, nl),
            "t": pd.to_datetime(rng.randint(0, 20, nl), unit="s").astype("datetime64[us]"),
            "x": np.arange(nl, dtype=np.int64),
        })
        right = pd.DataFrame({
            "u": rng.randint(0, 4, nr),
            "t2": pd.to_datetime(rng.randint(0, 20, nr), unit="s").astype("datetime64[us]"),
            "y": np.arange(nr, dtype=np.int64) * 10,
        })
        # merge_asof allows only ONE right row per (u, t2) to be
        # deterministic under ties — dedup right to the max-y per (u, t2)
        right = (right.sort_values("y").drop_duplicates(["u", "t2"], keep="last")
                 .reset_index(drop=True))
        direction = "forward" if forward else "backward"
        got = (
            asof_join(rd.from_pandas(left), rd.from_pandas(right),
                      on="t", by="u", right_on="t2", right_by="u",
                      direction=direction)
            .to_pandas().sort_values(["u", "t", "x"]).reset_index(drop=True)
        )
        ref = pd.merge_asof(
            left.sort_values("t", kind="mergesort"),
            right.sort_values("t2", kind="mergesort"),
            left_on="t", right_on="t2", by="u", direction=direction,
        ).sort_values(["u", "t", "x"]).reset_index(drop=True)
        assert len(got) == len(ref)
        gy = got["y"].fillna(-1).astype("int64").tolist()
        ry = ref["y"].fillna(-1).astype("int64").tolist()
        assert gy == ry

    _check()


def test_spec_explode_step(ray_session, sf_dir):
    """Declarative explode (unnest) equals the engine op directly."""
    from engine.io.sources import read_table
    from engine.ops.map import explode
    from engine.spec import run_spec
    from engine.util.collect import pull_arrow

    spec = {
        "source": {"table": "embeddings", "columns": ["vec_id", "embedding"]},
        "steps": [
            {"op": "explode", "column": "embedding",
             "value_name": "component", "pos_name": "dim"},
            {"op": "filter", "column": "dim", "cmp": "<", "value": 3},
        ],
    }
    got = pull_arrow(run_spec(spec, sf_dir).materialize()).sort_by(
        [("vec_id", "ascending"), ("dim", "ascending")]
    )
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    want = pull_arrow(
        explode(ds, "embedding", value_name="component", pos_name="dim")
        .map_batches(
            lambda t: t.filter(pc.less(t.column("dim"), 3)),
            batch_format="pyarrow",
        )
        .materialize()
    ).sort_by([("vec_id", "ascending"), ("dim", "ascending")])
    assert got.equals(want.select(got.column_names))
    assert got.num_rows > 0 and set(got.column("dim").to_pylist()) == {0, 1, 2}
