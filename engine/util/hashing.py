"""Stable, vectorizable hashing utilities.

Everything here must be deterministic across processes, runs, and
parallelism levels — partition assignment, salting, sampling and the
final-state hash all depend on it (SURVEY.md §4: parallelism-invariant
determinism is required for the N-vs-4N equality claim).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np
import pandas as pd
import pyarrow as pa

_SPLITMIX_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based 64-bit mix (public splitmix64 finalizer).

    Pure function of the input — chunking-independent, so data generated
    from ``splitmix64(seed ^ index)`` is identical no matter how the index
    range is split across tasks.
    """
    z = (x.astype(np.uint64) + _SPLITMIX_GAMMA) * np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(30)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0xFD70A2F0E0BF7D5B)
    z ^= z >> np.uint64(31)
    return z


@lru_cache(maxsize=65536)
def stable_hash_str(s: str) -> int:
    """64-bit stable hash of a string via sha256 (cached per process)."""
    return int.from_bytes(hashlib.sha256(s.encode("utf-8")).digest()[:8], "big")


def stable_hash_column(values, num_buckets: int) -> np.ndarray:
    """Bucket a string column stably: hash only the *unique* values in
    Python (sha256-based, version-independent), map back vectorized."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pandas()
    values = pd.Series(values)
    codes, uniques = pd.factorize(values, sort=False)
    bucket_of_unique = np.array(
        [stable_hash_str(u) % num_buckets for u in uniques], dtype=np.int64
    )
    out = np.full(len(values), -1, dtype=np.int64)
    mask = codes >= 0
    out[mask] = bucket_of_unique[codes[mask]]
    return out


def composite_key_str(df, cols: list[str]):
    """Vectorized \\x1f-joined composite key string (same per-column
    ``astype(str)`` rendering as ``df[cols].astype(str).agg(join, axis=1)``
    but ~50x faster — the axis=1 agg is a per-row Python loop that
    measured 60ms per 1.5k-row batch in the q_join_composite profile)."""
    key = df[cols[0]].astype(str)
    for c in cols[1:]:
        key = key + "\x1f" + df[c].astype(str)
    return key


def fast_hash_column(values, num_buckets: int, seed: str = "salt") -> np.ndarray:
    """Vectorized stable string bucket hash (pandas hash_array — stable
    for a fixed pandas version and hash_key, which is all we need inside
    one environment; cross-environment stability is provided by
    :func:`stable_hash_column` which we use for partition ids)."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pandas()
    key = (seed * 16)[:16]
    h = pd.util.hash_array(np.asarray(values, dtype=object), hash_key=key)
    return (h % np.uint64(num_buckets)).astype(np.int64)


def sha256_hex_column(values) -> list[str]:
    """Per-row sha256 hex of a string column (content identity,
    BASELINE.json:15 'per-row invariant: content sha256 equality')."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pylist()
    out = []
    for v in values:
        if v is None:
            out.append(None)
        else:
            out.append(hashlib.sha256(v.encode("utf-8")).hexdigest())
    return out


def actor_pool_size(want: int = 4, reserve: int = 2) -> int:
    """Actor-pool concurrency that never starves downstream stages: cap
    at cluster CPUs minus ``reserve`` (a fixed pool equal to the CPU
    count deadlocks the shuffle tasks scheduled behind it)."""
    import ray

    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 4))
        return max(1, min(want, cpus - reserve))
    return max(1, min(want, 2))
