"""Aggregations (SURVEY.md §2.5 G1–G4, G6).

`grouped_agg` lowers onto Ray Data's native hash aggregation. For
high-cardinality inputs where the shuffle dominates, `partial_grouped_sum`
pre-aggregates inside ``map_batches`` (one row per key per batch) before
the small final groupby — the combiner pattern (ray_guide "Aggregation at
scale")."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Std, Sum

_AGGS = {"sum": Sum, "min": Min, "max": Max, "mean": Mean, "std": Std}


def global_agg(ds: rd.Dataset, specs: dict[str, tuple[str, str]]) -> pa.Table:
    """Global aggregates: ``{out_name: (fn, col)}`` with fn in
    sum/min/max/mean/std/count. Returns a one-row Arrow table.

    All aggregates run in ONE ``ds.aggregate(...)`` pass (tree reduce) —
    per-aggregate ``ds.sum()``/``ds.min()`` calls would each re-execute
    the whole upstream pipeline."""
    aggs = []
    for out, (fn, col) in specs.items():
        if fn == "count":
            aggs.append(Count(alias_name=out))
        else:
            aggs.append(_AGGS[fn](col, alias_name=out))
    row = ds.aggregate(*aggs)
    return pa.table({out: [row[out]] for out in specs})


_DECOMPOSABLE = {"sum", "min", "max", "count", "mean", "std"}
# Two-column decomposable aggregates: col is a (x_col, y_col) tuple.
# Partials carry (Σx, Σy, Σx², Σy², Σxy, n) — exact when both columns are
# integer-quantized upstream — so the shuffle still moves one row per key
# per batch. Finals use the textbook sum formulas; mirror the SAME
# parenthesization in the oracle SQL for bit-identical doubles.
_PAIR_FNS = {"corr", "covar", "regr_slope", "regr_intercept"}


def grouped_agg(
    ds: rd.Dataset, keys: list[str], specs: dict[str, tuple[str, str]], num_buckets: int = 64
) -> rd.Dataset:
    """Grouped aggregates: ``{out_name: (fn, col)}``; fn additionally
    supports "count" (col ignored). Output columns carry ``out_name``
    (oracle naming rule).

    Every fn lowers onto the bucketed combiner: per-batch pandas partials
    (one row per key per batch) → hash-bucket shuffle → per-bucket
    vectorized final. Ray's native multi-aggregate over many keys
    measured 23x slower (28s vs 1.2s on 139k partial rows / 15k keys at
    sf0.1). mean/std are decomposed into (sum, sumsq, count) partials —
    exact when the column is integer (quantize money per-row upstream);
    float inputs inherit the usual summation-order caveat."""
    from engine.util.hashing import composite_key_str, fast_hash_column

    unknown = {fn for fn, _ in specs.values()} - _DECOMPOSABLE - _PAIR_FNS
    if unknown:
        raise ValueError(f"unsupported aggregate fns {sorted(unknown)!r}")

    flat_cols: set[str] = set()
    for fn, col in specs.values():
        if fn == "count":
            continue
        if fn in _PAIR_FNS:
            flat_cols.update(col)
        else:
            flat_cols.add(col)
    need_cols = list(keys) + sorted(flat_cols)

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        for name, (fn, col) in specs.items():
            if fn == "std":
                df = df.assign(**{f"{name}__q": df[col].to_numpy() ** 2})
            elif fn in _PAIR_FNS:
                x, y = df[col[0]].to_numpy(), df[col[1]].to_numpy()
                df = df.assign(
                    **{f"{name}__xx": x * x, f"{name}__yy": y * y, f"{name}__xy": x * y}
                )
        g = df.groupby(keys, sort=False, dropna=False)
        out = pd.DataFrame(index=g.size().index)
        for name, (fn, col) in specs.items():
            if fn == "count":
                out[name] = g.size()
            elif fn in ("sum", "min", "max"):
                out[name] = getattr(g[col], fn)()
            elif fn == "mean":
                out[f"{name}__s"] = g[col].sum()
                out[f"{name}__n"] = g[col].count()
            elif fn == "std":
                out[f"{name}__s"] = g[col].sum()
                out[f"{name}__q"] = g[f"{name}__q"].sum()
                out[f"{name}__n"] = g[col].count()
            elif fn in _PAIR_FNS:
                out[f"{name}__sx"] = g[col[0]].sum()
                out[f"{name}__sy"] = g[col[1]].sum()
                out[f"{name}__xx"] = g[f"{name}__xx"].sum()
                out[f"{name}__yy"] = g[f"{name}__yy"].sum()
                out[f"{name}__xy"] = g[f"{name}__xy"].sum()
                out[f"{name}__n"] = g.size()
        out = out.reset_index()
        key = composite_key_str(out, keys)
        out["__bucket"] = fast_hash_column(key, num_buckets, seed="gagg")
        return out

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop(columns="__bucket").groupby(keys, sort=False, dropna=False)
        out = pd.DataFrame(index=g.size().index)
        for name, (fn, _) in specs.items():
            if fn in ("count", "sum"):
                out[name] = g[name].sum()
            elif fn in ("min", "max"):
                out[name] = getattr(g[name], fn)()
            elif fn == "mean":
                out[name] = g[f"{name}__s"].sum() / g[f"{name}__n"].sum()
            elif fn == "std":
                s = g[f"{name}__s"].sum().astype("float64")
                q = g[f"{name}__q"].sum().astype("float64")
                n = g[f"{name}__n"].sum().astype("float64")
                # Sample std (SQL STDDEV): sqrt((Σx² - (Σx)²/n) / (n-1)).
                # n==1 groups are masked to NaN/null explicitly (0/0 in
                # numpy would warn; DuckDB's x/0 gives NULL — same result).
                with np.errstate(invalid="ignore", divide="ignore"):
                    out[name] = np.where(
                        n.to_numpy() > 1.0,
                        np.sqrt((q - s * s / n) / (n - 1.0)),
                        np.nan,
                    )
            elif fn in _PAIR_FNS:
                sx = g[f"{name}__sx"].sum().astype("float64").to_numpy()
                sy = g[f"{name}__sy"].sum().astype("float64").to_numpy()
                xx = g[f"{name}__xx"].sum().astype("float64").to_numpy()
                yy = g[f"{name}__yy"].sum().astype("float64").to_numpy()
                xy = g[f"{name}__xy"].sum().astype("float64").to_numpy()
                n = g[f"{name}__n"].sum().astype("float64").to_numpy()
                # Mirror THIS parenthesization in the oracle SQL so both
                # sides round identical doubles. n==1 / zero-variance
                # groups mask to NaN (SQL x/0 -> NULL — same result).
                with np.errstate(invalid="ignore", divide="ignore"):
                    sxy = xy - sx * sy / n
                    vx = xx - sx * sx / n
                    vy = yy - sy * sy / n
                    if fn == "covar":
                        out[name] = np.where(n > 1.0, sxy / (n - 1.0), np.nan)
                    elif fn == "corr":
                        d = np.sqrt(vx * vy)
                        out[name] = np.where(d > 0.0, sxy / d, np.nan)
                    elif fn == "regr_slope":
                        out[name] = np.where(vx > 0.0, sxy / vx, np.nan)
                    else:  # regr_intercept
                        slope = np.where(vx > 0.0, sxy / vx, np.nan)
                        out[name] = sy / n - slope * (sx / n)
        return out.reset_index()

    return (
        ds.select_columns(need_cols)
        .map_batches(_partial, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(_final, batch_format="pandas")
    )


def partial_grouped_sum(
    ds: rd.Dataset, keys: list[str], sum_cols: list[str], count_alias: str | None = None
) -> rd.Dataset:
    """Combiner form of sum/count-by-key — delegates to
    :func:`grouped_agg` (per-batch partials, O(num_buckets) hash-bucket
    exchange, vectorized per-bucket final). The earlier implementation
    finished with Ray's native ``groupby().aggregate(Sum)``, which is
    the documented many-keys trap: measured 17.4 s on q_tpch_q11's
    121k-row / 20k-key per-part sum vs ~1 s through the bucketed
    combiner."""
    specs: dict[str, tuple] = {c: ("sum", c) for c in sum_cols}
    if count_alias:
        specs[count_alias] = ("count", None)
    return grouped_agg(ds, keys, specs)


def distinct(ds: rd.Dataset, cols: list[str], num_buckets: int = 32) -> rd.Dataset:
    """SELECT DISTINCT cols — per-batch dedup combiner, hash-bucket
    shuffle of the unique rows, vectorized dedup per bucket (one group
    per bucket, not per value)."""
    from engine.util.hashing import composite_key_str, fast_hash_column

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        df = df[cols].drop_duplicates()
        key = composite_key_str(df, cols)
        out = df.copy()
        out["__bucket"] = fast_hash_column(key, num_buckets, seed="distinct")
        return out

    pre = ds.select_columns(cols).map_batches(_pre, batch_format="pandas")
    return pre.groupby("__bucket").map_groups(
        lambda df: df[cols].drop_duplicates(), batch_format="pandas"
    )


def count_distinct(ds: rd.Dataset, col: str, out: str = "n") -> pa.Table:
    return pa.table({out: [distinct(ds, [col]).count()]})


def topk_per_group(
    ds: rd.Dataset,
    keys: list[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak: list[str] | None = None,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Top-k rows per group; deterministic via explicit tiebreak columns.

    Per-batch head-k combiner (at most k rows per key per batch survive)
    → hash-bucket exchange (O(num_buckets) Ray groups, not one per key)
    → vectorized per-bucket groupby.head(k)."""
    from engine.ops.bucket import bucketed_map_groups

    by = [order_col] + (tiebreak or [])
    asc = [not descending] + [True] * len(tiebreak or [])

    def _top(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(by, ascending=asc, kind="mergesort")
            .groupby(keys, sort=False, dropna=False)
            .head(k)
        )

    pre = ds.map_batches(_top, batch_format="pandas")
    return bucketed_map_groups(pre, keys, _top, num_buckets=num_buckets, seed="topk")


_REAGG = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def rollup(
    ds: rd.Dataset, keys: list[str], specs: dict[str, tuple[str, str]]
) -> rd.Dataset:
    """GROUP BY ROLLUP(keys) for re-aggregatable fns (sum/count/min/max):
    ONE full pass builds the finest-level aggregate; every coarser level
    re-aggregates that small result (sum-of-sums, min-of-mins), with the
    rolled-up key columns set to NULL (SQL ROLLUP semantics). The raw
    data is scanned once regardless of the number of levels."""
    import pyarrow as pa

    unknown = {fn for fn, _ in specs.values()} - set(_REAGG)
    if unknown:
        raise ValueError(f"rollup cannot re-aggregate {sorted(unknown)!r}")

    base = grouped_agg(ds, keys, specs).materialize()  # one row per key combo
    # Key types for the rolled-up NULL columns come from the actual data
    # (hardcoding string would give coarser levels a mismatched schema
    # for integer/date group keys).
    key_types: dict[str, pa.DataType] = {k: pa.string() for k in keys}
    for b in base.iter_batches(batch_size=1024, batch_format="pyarrow"):
        if b.num_rows:
            key_types = {k: b.schema.field(k).type for k in keys}
            break
    levels = [base]
    for i in range(len(keys) - 1, -1, -1):
        sub_specs = {name: (_REAGG[fn], name) for name, (fn, _) in specs.items()}
        if i:
            lvl = grouped_agg(base, keys[:i], sub_specs)
        else:
            lvl = rd.from_arrow(global_agg(base, sub_specs))

        def _addnull(t: pa.Table, dropped=keys[i:]) -> pa.Table:
            for kcol in dropped:
                t = t.append_column(kcol, pa.nulls(t.num_rows, type=key_types[kcol]))
            return t.select(keys + [n for n in specs])

        levels.append(lvl.map_batches(_addnull, batch_format="pyarrow"))
    out = levels[0].map_batches(
        lambda t: t.select(keys + [n for n in specs]), batch_format="pyarrow"
    )
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def grouping_sets(
    ds: rd.Dataset,
    keys: list[str],
    sets: list[list[str]],
    specs: dict[str, tuple[str, str]],
) -> rd.Dataset:
    """GROUP BY GROUPING SETS(sets) for re-aggregatable fns: like
    :func:`rollup`, ONE full pass builds the finest aggregate over all of
    ``keys``; every requested set re-aggregates that small result with
    the absent key columns typed-null (SQL semantics). Each set must be a
    subset of ``keys``."""
    import pyarrow as pa

    unknown = {fn for fn, _ in specs.values()} - set(_REAGG)
    if unknown:
        raise ValueError(f"grouping_sets cannot re-aggregate {sorted(unknown)!r}")
    for s in sets:
        if not set(s) <= set(keys):
            raise ValueError(f"grouping set {s!r} not a subset of {keys!r}")

    base = grouped_agg(ds, keys, specs).materialize()
    key_types: dict[str, pa.DataType] = {k: pa.string() for k in keys}
    for b in base.iter_batches(batch_size=1024, batch_format="pyarrow"):
        if b.num_rows:
            key_types = {k: b.schema.field(k).type for k in keys}
            break
    sub_specs = {name: (_REAGG[fn], name) for name, (fn, _) in specs.items()}
    levels = []
    for s in sets:
        if set(s) == set(keys):
            lvl = base
        elif s:
            lvl = grouped_agg(base, list(s), sub_specs)
        else:
            lvl = rd.from_arrow(global_agg(base, sub_specs))

        def _shape(t: pa.Table, present=tuple(s)) -> pa.Table:
            for kcol in keys:
                if kcol not in present:
                    t = t.append_column(kcol, pa.nulls(t.num_rows, type=key_types[kcol]))
            return t.select(keys + [n for n in specs])

        levels.append(lvl.map_batches(_shape, batch_format="pyarrow"))
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def cube(
    ds: rd.Dataset, keys: list[str], specs: dict[str, tuple[str, str]]
) -> rd.Dataset:
    """GROUP BY CUBE(keys): grouping sets over every subset of the keys
    (2^k levels re-aggregated from one finest-level pass)."""
    from itertools import combinations

    sets = [
        list(c) for r in range(len(keys), -1, -1) for c in combinations(keys, r)
    ]
    return grouping_sets(ds, keys, sets, specs)


def grouped_quantile(
    ds: rd.Dataset,
    keys: list[str],
    col: str,
    q: float = 0.5,
    out: str = "q",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Exact per-group quantile (linear interpolation — DuckDB's
    median/quantile_cont) via the bucketed exchange. Exact quantiles are
    not decomposable, so the group's VALUES must co-locate: the shuffle
    moves (keys, col) rows — prune to those two columns — into O(64)
    buckets, one vectorized pandas quantile per bucket."""
    from engine.ops.bucket import bucketed_map_groups

    def _q(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(keys, sort=False, dropna=False)[col]
            .quantile(q, interpolation="linear")
            .round(6)
            .reset_index(name=out)
        )

    return bucketed_map_groups(
        ds.select_columns(keys + [col]), keys, _q, num_buckets=num_buckets, seed="gq"
    )


def string_agg_by_group(
    ds: rd.Dataset,
    keys: list[str],
    col: str,
    sep: str = ",",
    order_by: list[str] | None = None,
    out: str = "agg",
) -> rd.Dataset:
    """SQL STRING_AGG(col, sep ORDER BY order_by) per group, via the
    bucketed exchange (O(64) Ray groups; per-key join inside is a
    vectorized pandas groupby-apply over sorted rows)."""
    from engine.ops.bucket import bucketed_map_groups

    ob = order_by or [col]

    def _agg(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(ob, kind="mergesort")
        return (
            df.groupby(keys, sort=False, dropna=False)[col]
            .agg(lambda s: sep.join(s.astype(str)))
            .rename(out)
            .reset_index()
        )

    need = list(dict.fromkeys(keys + [col] + ob))
    return bucketed_map_groups(ds.select_columns(need), keys, _agg, seed="sagg")


def profile_table(ds: rd.Dataset, cols: list[str], name_col: str = "col_name") -> pa.Table:
    """Data-quality profile: one row per column with total rows, null
    count, and exact distinct count (the standard ETL ingest-validation
    report). Row/null totals come from ONE streaming pass of per-batch
    partials (len(cols) tiny rows per batch, folded by a bucketed sum);
    each distinct count is its own column-pruned pass through the
    bucketed distinct — the exchange moves only that column's already
    deduped values. Returns a len(cols)-row Arrow table (driver-small by
    construction)."""

    def _partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                name_col: pa.array(cols, pa.string()),
                "n": pa.array([t.num_rows] * len(cols), pa.int64()),
                "n_null": pa.array(
                    [t.column(c).null_count for c in cols], pa.int64()
                ),
            }
        )

    part = ds.select_columns(cols).map_batches(_partial, batch_format="pyarrow")
    folded = {
        r[name_col]: r
        for r in grouped_agg(
            part, [name_col], {"n": ("sum", "n"), "n_null": ("sum", "n_null")}
        ).take_all()
    }
    nd = {c: distinct(ds, [c]).count() for c in cols}
    order = sorted(cols)
    return pa.table(
        {
            name_col: pa.array(order, pa.string()),
            "n": pa.array([folded[c]["n"] for c in order], pa.int64()),
            "n_null": pa.array([folded[c]["n_null"] for c in order], pa.int64()),
            "n_distinct": pa.array([nd[c] for c in order], pa.int64()),
        }
    )
