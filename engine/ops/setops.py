"""Set operations (SURVEY.md §2.6 O4–O5): union all, intersect/except
with DISTINCT semantics.

Intersect/except hash-bucket whole rows (per-batch dedup combiner → one
shuffle of unique rows → vectorized pandas set logic per bucket). One
group per BUCKET, not per row-value: Python overhead stays O(buckets)."""

from __future__ import annotations

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
