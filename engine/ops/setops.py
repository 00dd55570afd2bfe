"""Set operations (SURVEY.md §2.6 O4–O5): union all, intersect/except
with DISTINCT semantics via a tagged groupby over whole rows."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd


def union_all(a: rd.Dataset, b: rd.Dataset) -> rd.Dataset:
    return a.union(b)


def _tagged(a: rd.Dataset, b: rd.Dataset, cols: list[str]) -> rd.Dataset:
    ta = a.select_columns(cols).map_batches(
        lambda t: t.append_column("__side", pa.array([0] * t.num_rows, pa.int64())),
        batch_format="pyarrow",
    )
    tb = b.select_columns(cols).map_batches(
        lambda t: t.append_column("__side", pa.array([1] * t.num_rows, pa.int64())),
        batch_format="pyarrow",
    )
    # Per-batch dedup combiner before the all-to-all shuffle.
    return ta.union(tb).map_batches(
        lambda df: df.drop_duplicates(), batch_format="pandas"
    )


def intersect_distinct(a: rd.Dataset, b: rd.Dataset, cols: list[str]) -> rd.Dataset:
    def _keep(df: pd.DataFrame) -> pd.DataFrame:
        if df["__side"].nunique() == 2:
            return df.head(1).drop(columns="__side")
        return df.head(0).drop(columns="__side")

    return _tagged(a, b, cols).groupby(cols).map_groups(_keep, batch_format="pandas")


def except_distinct(a: rd.Dataset, b: rd.Dataset, cols: list[str]) -> rd.Dataset:
    def _keep(df: pd.DataFrame) -> pd.DataFrame:
        if set(df["__side"]) == {0}:
            return df.head(1).drop(columns="__side")
        return df.head(0).drop(columns="__side")

    return _tagged(a, b, cols).groupby(cols).map_groups(_keep, batch_format="pandas")
