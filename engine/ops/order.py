"""Sorts, limits, deterministic sampling (SURVEY.md §2.6 O1–O3)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

SAMPLE_MULT = 2654435761  # Knuth multiplicative constant
SAMPLE_MOD = 4294967296


def sort(ds: rd.Dataset, cols, descending=False) -> rd.Dataset:
    return ds.sort(cols, descending=descending)


def top_k(
    ds: rd.Dataset, cols: str | list[str], k: int, descending: bool | list[bool] = True
) -> rd.Dataset:
    """Global top-k without a full sort: per-block partial top-k inside
    map_batches (the all-to-all moves at most k rows per block instead of
    the whole dataset), then one small final sort+limit. Multi-column
    keys with per-column direction act as ORDER BY ... LIMIT k with
    tiebreaks (sort keys must be non-null — select_k_unstable's
    contract; the callers sort aggregate outputs)."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    desc = [descending] * len(cols) if isinstance(descending, bool) else list(descending)
    keys = [(c, "descending" if d else "ascending") for c, d in zip(cols, desc)]

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        return t.take(pc.select_k_unstable(t, k, keys))

    return ds.map_batches(_partial, batch_format="pyarrow").sort(
        cols, descending=desc
    ).limit(k)


def seeded_sample(ds: rd.Dataset, key_col: str, percent: int) -> rd.Dataset:
    """Deterministic ~percent% sample by integer key: keeps rows where
    ``(key * 2654435761) % 2^32 < percent * 2^32 / 100``. Seed-stable and
    SQL-expressible (the driver's value-hash comparison requires
    determinism — SURVEY.md O3 forbids random_sample here). Assumes
    ``key * MULT`` fits int64 (key < ~3.5e9)."""
    threshold = percent * SAMPLE_MOD // 100

    def _mask(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array((k * SAMPLE_MULT) % SAMPLE_MOD < threshold))

    return ds.map_batches(_mask, batch_format="pyarrow")


def sample_sql(key_col: str, percent: int) -> str:
    """The DuckDB twin of :func:`seeded_sample`'s predicate."""
    threshold = percent * SAMPLE_MOD // 100
    return f"({key_col} * {SAMPLE_MULT}) % {SAMPLE_MOD} < {threshold}"


def prefix_scan_max(
    ds: rd.Dataset,
    order_cols: list[str],
    value_col: str,
    out: str = "running_max",
    num_ranges: int = 64,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Distributed EXCLUSIVE prefix maximum: for each row, the max of
    ``value_col`` over all rows strictly earlier in ``order_cols`` order
    (SQL ``max(v) OVER (ORDER BY ... ROWS BETWEEN UNBOUNDED PRECEDING
    AND 1 PRECEDING)``; the global first row gets null). The classic
    two-phase scan, Ray-shaped:

    1. range-partition on the FIRST order column (contiguous value
       ranges → ordered partitions; rows with equal first-key values
       land together, so composite-order ties stay local);
    2. per-range max via the bucketed combiner → ≤ ``num_ranges`` rows
       to the driver → exclusive prefix fold over the ordered ranges
       (the carry-in per range — O(num_ranges) work, broadcast back);
    3. one bucketed pass per range: sort by ``order_cols``, vectorized
       shift+accumulate running max, combined with the carry.

    ``order_cols`` must be a total order (unique composite). Values may
    be numeric or timestamp (scanned as int64).
    """
    import pandas as pd
    import ray

    from engine.ops.agg import global_agg, grouped_agg

    first = order_cols[0]
    mm = global_agg(
        ds.select_columns([first]), {"lo": ("min", first), "hi": ("max", first)}
    )
    lo, hi = mm.column("lo")[0].as_py(), mm.column("hi")[0].as_py()
    width = max(1, (int(hi) - int(lo)) // num_ranges + 1)

    def _rid(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__rid"] = ((df[first].astype("int64") - int(lo)) // width).astype("int64")
        return df

    routed = ds.map_batches(_rid, batch_format="pandas").materialize()
    maxes = (
        grouped_agg(
            routed.select_columns(["__rid", value_col]),
            ["__rid"],
            {"__mx": ("max", value_col)},
        )
        .to_pandas()
        .sort_values("__rid")
    )
    # Exclusive prefix fold over the ordered ranges (driver, ≤num_ranges).
    vals = maxes["__mx"].to_numpy()
    if vals.dtype.kind == "M":
        scalars = vals.astype("int64")
        tonum = int
    elif vals.dtype.kind in "iu":
        scalars = vals.astype("int64")
        tonum = int
    else:
        scalars = vals.astype("float64")
        tonum = float
    run = np.maximum.accumulate(scalars)
    carry_keys = maxes["__rid"].to_numpy()
    carry = {int(r): tonum(run[i - 1]) if i > 0 else None for i, r in enumerate(carry_keys)}
    ref = ray.put(carry)

    def _scan(df: pd.DataFrame) -> pd.DataFrame:
        from engine.ops.join import _cached_get

        carries = _cached_get(ref)
        df = df.sort_values(order_cols, kind="mergesort")
        v = df[value_col].to_numpy()
        is_time = v.dtype.kind == "M"
        vi = v.astype("int64") if (is_time or v.dtype.kind in "iu") else v.astype("float64")
        acc = np.maximum.accumulate(vi)
        excl = np.empty_like(acc)
        excl[1:] = acc[:-1]
        c = carries.get(int(df["__rid"].iloc[0])) if len(df) else None
        valid = np.ones(len(df), dtype=bool)
        if c is None:
            excl[:1] = vi[:1]  # placeholder; masked below
            valid[0] = False
        else:
            excl[0] = c
            excl = np.maximum(excl, c)
        if is_time:
            s = pd.Series(excl.astype("datetime64[us]"), index=df.index)
            s[~valid] = pd.NaT
        else:
            s = pd.Series(excl, index=df.index).where(valid)
        df = df.copy()
        df[out] = s
        return df.drop(columns="__rid")

    # One Ray group per range id: ranges are few (≤num_ranges) by
    # construction, so grouping on the raw rid is the bucketed pattern.
    return routed.groupby("__rid").map_groups(_scan, batch_format="pandas")


def prefix_scan_sum(
    ds: rd.Dataset,
    order_cols: list[str],
    value_col: str,
    out: str = "running_sum",
    num_ranges: int = 64,
) -> rd.Dataset:
    """Distributed INCLUSIVE running sum (SQL ``SUM(v) OVER (ORDER BY …
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)`` under a total
    order). Same two-phase shape as :func:`prefix_scan_max`: range
    partials → ≤ ``num_ranges``-value driver fold → per-range cumsum +
    carry. Use INTEGER value columns for oracle-exact results (float
    addition order differs between engines). The leading order column
    must be integer-valued (convert timestamps upstream)."""
    import pandas as pd
    import ray

    from engine.ops.agg import global_agg, grouped_agg

    first = order_cols[0]
    mm = global_agg(
        ds.select_columns([first]), {"lo": ("min", first), "hi": ("max", first)}
    )
    lo, hi = int(mm.column("lo")[0].as_py()), int(mm.column("hi")[0].as_py())
    width = max(1, (hi - lo) // num_ranges + 1)

    def _rid(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__rid"] = ((df[first].astype("int64") - lo) // width).astype("int64")
        return df

    routed = ds.map_batches(_rid, batch_format="pandas").materialize()
    sums = (
        grouped_agg(
            routed.select_columns(["__rid", value_col]),
            ["__rid"],
            {"__s": ("sum", value_col)},
        )
        .to_pandas()
        .sort_values("__rid")
    )
    run = np.cumsum(sums["__s"].to_numpy().astype("int64"))
    carry = {
        int(r): int(run[i - 1]) if i > 0 else 0
        for i, r in enumerate(sums["__rid"].to_numpy())
    }
    ref = ray.put(carry)

    def _scan(df: pd.DataFrame) -> pd.DataFrame:
        from engine.ops.join import _cached_get

        carries = _cached_get(ref)
        df = df.sort_values(order_cols, kind="mergesort").copy()
        c = carries.get(int(df["__rid"].iloc[0]), 0) if len(df) else 0
        df[out] = np.cumsum(df[value_col].to_numpy().astype("int64")) + c
        return df.drop(columns="__rid")

    return routed.groupby("__rid").map_groups(_scan, batch_format="pandas")
