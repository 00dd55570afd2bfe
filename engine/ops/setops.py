"""Set operations (SURVEY.md §2.6 O4–O5): union all, intersect/except
with DISTINCT semantics, and the ALL (bag) variants.

Intersect/except hash-bucket whole rows (per-batch dedup combiner → one
shuffle of unique rows → vectorized pandas set logic per bucket). One
group per BUCKET, not per row-value: Python overhead stays O(buckets).
The ALL variants swap the dedup combiner for a COUNT combiner (one
(row-value, count) row per distinct value per batch crosses the
exchange) and materialize output multiplicities with a vectorized index
repeat — multiplicity math per ANSI: EXCEPT ALL = max(l−r, 0),
INTERSECT ALL = min(l, r). NULLs compare equal, as in SQL set ops."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from engine.util.hashing import composite_key_str, fast_hash_column


def union_all(a: rd.Dataset, b: rd.Dataset) -> rd.Dataset:
    return a.union(b)


def _tagged(a: rd.Dataset, b: rd.Dataset, cols: list[str], num_buckets: int) -> rd.Dataset:
    def _prep(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df[cols].drop_duplicates()  # combiner: dedup before the shuffle
            key = composite_key_str(df, cols)
            out = df.copy()
            out["__side"] = side
            out["__bucket"] = fast_hash_column(key, num_buckets, seed="setop")
            return out

        return fn

    return a.map_batches(_prep(0), batch_format="pandas").union(
        b.map_batches(_prep(1), batch_format="pandas")
    )


def _bucket_setop(cols: list[str], mode: str):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["__side"] == 0][cols].drop_duplicates()
        r = df[df["__side"] == 1][cols].drop_duplicates()
        if mode == "intersect":
            return l.merge(r, on=cols, how="inner")
        m = l.merge(r, on=cols, how="left", indicator=True)
        return m[m["_merge"] == "left_only"][cols]

    return fn


def intersect_distinct(a: rd.Dataset, b: rd.Dataset, cols: list[str], num_buckets: int = 32) -> rd.Dataset:
    return (
        _tagged(a, b, cols, num_buckets)
        .groupby("__bucket")
        .map_groups(_bucket_setop(cols, "intersect"), batch_format="pandas")
    )


def except_distinct(a: rd.Dataset, b: rd.Dataset, cols: list[str], num_buckets: int = 32) -> rd.Dataset:
    return (
        _tagged(a, b, cols, num_buckets)
        .groupby("__bucket")
        .map_groups(_bucket_setop(cols, "except"), batch_format="pandas")
    )


def _tagged_counts(a: rd.Dataset, b: rd.Dataset, cols: list[str], num_buckets: int) -> rd.Dataset:
    def _prep(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            g = (
                df.groupby(cols, sort=False, dropna=False)
                .size()
                .rename("__n")
                .reset_index()
            )
            g["__n"] = g["__n"].astype("int64")
            key = composite_key_str(g, cols)
            g["__side"] = side
            g["__bucket"] = fast_hash_column(key, num_buckets, seed="setop")
            return g

        return fn

    return a.map_batches(_prep(0), batch_format="pandas").union(
        b.map_batches(_prep(1), batch_format="pandas")
    )


def _bucket_setop_all(cols: list[str], mode: str):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        agg = (
            df.groupby(cols + ["__side"], sort=False, dropna=False)["__n"]
            .sum()
            .unstack("__side", fill_value=0)
        )
        ln = agg[0] if 0 in agg.columns else pd.Series(0, index=agg.index)
        rn = agg[1] if 1 in agg.columns else pd.Series(0, index=agg.index)
        mult = np.minimum(ln, rn) if mode == "intersect" else (ln - rn).clip(lower=0)
        mult = mult[mult > 0]
        out = mult.index.to_frame(index=False)
        out.columns = cols
        return out.loc[out.index.repeat(mult.to_numpy())].reset_index(drop=True)

    return fn


def intersect_all(a: rd.Dataset, b: rd.Dataset, cols: list[str], num_buckets: int = 32) -> rd.Dataset:
    """INTERSECT ALL: each row value min(count_a, count_b) times."""
    return (
        _tagged_counts(a, b, cols, num_buckets)
        .groupby("__bucket")
        .map_groups(_bucket_setop_all(cols, "intersect"), batch_format="pandas")
    )


def except_all(a: rd.Dataset, b: rd.Dataset, cols: list[str], num_buckets: int = 32) -> rd.Dataset:
    """EXCEPT ALL: each row value max(count_a - count_b, 0) times."""
    return (
        _tagged_counts(a, b, cols, num_buckets)
        .groupby("__bucket")
        .map_groups(_bucket_setop_all(cols, "except"), batch_format="pandas")
    )
