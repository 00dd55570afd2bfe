"""Reshape operators (ETL capability parity, SURVEY.md §2 [CT]):
unpivot (wide→long melt), pivot (long→wide conditional aggregation),
per-group exact percentiles.

All follow the engine's shuffle discipline: unpivot is a pure per-batch
Arrow transform (no shuffle); pivot pre-aggregates per batch so the
groupby moves one row per (group, category) per batch; percentiles
shuffle one group per KEY only when key cardinality is low (documented —
use the bucketed pattern upstream for high-cardinality keys).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def unpivot(
    ds: rd.Dataset,
    id_cols: list[str],
    value_cols: list[str],
    name_col: str = "name",
    value_col: str = "value",
) -> rd.Dataset:
    """Wide→long melt: one output row per (input row, value column).
    Pure Arrow per batch — concat of column slices, no Python rows."""

    def _melt(t: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            cols = {k: t.column(k) for k in id_cols}
            cols[name_col] = pa.array([c] * t.num_rows, pa.string())
            cols[value_col] = t.column(c)
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(_melt, batch_format="pyarrow")


def pivot_count(
    ds: rd.Dataset,
    key: str,
    category_col: str,
    categories: list[str],
    prefix: str = "",
) -> rd.Dataset:
    """Long→wide: one row per key, one int64 count column per category.
    Per-batch crosstab combiner → bucketed grouped sum of the partials
    (the shuffle moves one wide row per key per batch, not events)."""
    from engine.ops.agg import grouped_agg

    out_cols = [f"{prefix}{c}" for c in categories]

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(df[key], df[category_col])  # vectorized counts
        ct = ct.reindex(columns=categories, fill_value=0).astype("int64")
        ct.columns = out_cols
        return ct.reset_index()

    partial = ds.map_batches(_partial, batch_format="pandas")
    return grouped_agg(partial, [key], {c: ("sum", c) for c in out_cols})


def pivot_sum(
    ds: rd.Dataset,
    key: str,
    category_col: str,
    value_col: str,
    categories: list[str],
    prefix: str = "",
) -> rd.Dataset:
    """Long→wide conditional SUM: one row per key, one int64 sum column
    per category (pass integer-quantized values for oracle exactness).
    Same discipline as pivot_count: a per-batch pivot_table combiner so
    the shuffle moves one wide row per key per batch, never events."""
    from engine.ops.agg import grouped_agg

    out_cols = [f"{prefix}{c}" for c in categories]

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        pt = df.pivot_table(
            index=key, columns=category_col, values=value_col,
            aggfunc="sum", fill_value=0,
        )
        pt = pt.reindex(columns=categories, fill_value=0).astype("int64")
        pt.columns = out_cols
        return pt.reset_index()

    partial = ds.map_batches(_partial, batch_format="pandas")
    return grouped_agg(partial, [key], {c: ("sum", c) for c in out_cols})


def percentile_disc_by_group(
    ds: rd.Dataset,
    keys: list[str],
    col: str,
    q: float,
    out: str = "percentile",
) -> rd.Dataset:
    """Exact PERCENTILE_DISC(q) per group: the smallest value whose
    cumulative distribution >= q (DuckDB/ANSI semantics). Hash-bucket
    exchange (O(64) Ray groups regardless of key cardinality); the rows
    shuffled are (keys, col) only. Exact percentiles need every value of
    a key on one worker — for keys whose value sets exceed worker memory
    use an approximate sketch instead."""
    from engine.ops.bucket import bucketed_map_groups

    def _pct(df: pd.DataFrame) -> pd.DataFrame:
        def one(d: pd.DataFrame) -> pd.Series:
            v = np.sort(d[col].to_numpy())
            idx = max(0, math.ceil(q * len(v)) - 1)
            return pd.Series({out: v[idx]})

        return (
            df.groupby(keys, sort=False, dropna=False)
            .apply(one, include_groups=False)
            .reset_index()
        )

    return bucketed_map_groups(
        ds.select_columns(keys + [col]), keys, _pct, seed="pct"
    )


def global_percentiles_disc(ds: rd.Dataset, col: str, qs: list[float]) -> list:
    """Exact global PERCENTILE_DISC for SEVERAL fractions from ONE
    value-histogram exchange (see :func:`global_percentile_disc` for the
    semantics and the bounded-distinct-values scale contract)."""
    from engine.ops.agg import grouped_agg
    from engine.util.collect import pull_arrow

    counts = grouped_agg(ds.select_columns([col]), [col], {"n": ("count", None)})
    tbl = pull_arrow(counts)
    if tbl is None or tbl.num_rows == 0:
        raise ValueError(f"global_percentiles_disc: no rows in column {col!r}")
    df = tbl.to_pandas().dropna(subset=[col]).sort_values(col)
    n = int(df["n"].sum())
    if n == 0:
        raise ValueError(f"global_percentiles_disc: column {col!r} is all-null")
    cum = df["n"].cumsum().to_numpy()
    vals = df[col].to_numpy()
    out = []
    for q in qs:
        rank = max(1, math.ceil(q * n))  # same convention as the grouped form
        out.append(vals[int(np.searchsorted(cum, rank))])
    return out


def global_percentile_disc(ds: rd.Dataset, col: str, q: float) -> float:
    """Exact global PERCENTILE_DISC(q) returned as a driver-side scalar:
    the smallest value whose cumulative distribution >= q (ANSI
    semantics, NULLs ignored). One bucketed count exchange over the
    DISTINCT values (per-batch value-count combiner — one row per
    distinct value per batch crosses the exchange, never the data), then
    a cumulative-count selection over the pulled histogram.

    Scale contract: the distinct-value set must be pull-bounded —
    quantized scores, token counts, ratings, ages. For raw continuous
    columns with ~n distinct values use ``engine.ops.sketch.
    approx_percentile`` instead; this helper is for exact thresholds
    (percentile pruning) over quantized signals."""
    return global_percentiles_disc(ds, col, [q])[0]


def histogram_fixed_width(
    ds: rd.Dataset, col: str, width: float, bin_col: str = "bin", out: str = "n"
) -> rd.Dataset:
    """Fixed-width histogram: bin = floor(col / width), count per bin —
    a per-batch binning projection feeding the bucketed count combiner
    (the shuffle moves one row per bin per batch)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from engine.ops.agg import grouped_agg

    def _bin(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.divide(pc.cast(t.column(col), pa.float64()), width)), pa.int64())
        return pa.table({bin_col: b})

    binned = ds.select_columns([col]).map_batches(_bin, batch_format="pyarrow")
    return grouped_agg(binned, [bin_col], {out: ("count", None)})
