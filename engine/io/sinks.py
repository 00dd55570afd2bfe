"""Sinks (SURVEY.md §2.1 S5–S6). The exactly-once lake sink lives in
engine/cdc/sink.py; these are the plain streaming sinks."""

from __future__ import annotations

import ray.data as rd


def write_parquet(ds: rd.Dataset, path: str, **kw) -> None:
    """Directory-of-part-files parquet sink (streaming, resumable layout:
    callers partition output paths by shard/key-range)."""
    ds.write_parquet(path, **kw)


def write_csv(ds: rd.Dataset, path: str, **kw) -> None:
    ds.write_csv(path, **kw)


def write_json(ds: rd.Dataset, path: str, **kw) -> None:
    ds.write_json(path, **kw)
