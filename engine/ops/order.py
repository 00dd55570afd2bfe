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


def top_k(ds: rd.Dataset, col: str, k: int, descending: bool = True) -> rd.Dataset:
    """Global top-k without a full sort: per-block partial top-k inside
    map_batches (bounds the shuffle to k rows per block), then one small
    final sort+limit."""

    def _partial(t: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            t, k, [(col, "descending" if descending else "ascending")]
        )
        return t.take(idx)

    return ds.map_batches(_partial, batch_format="pyarrow").sort(
        col, descending=descending
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
