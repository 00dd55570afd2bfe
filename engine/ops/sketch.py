"""Mergeable sketch aggregates (SURVEY.md §2.5 G5): HyperLogLog.

Partial-final pattern: each batch emits ONE row carrying its register
array; the tiny final stage merges registers by elementwise max
(sketches are designed to be mergeable — ray_guide 'Aggregation at
scale'). The shuffle moves 2^p bytes per batch, never values.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _rho(w: np.ndarray, bits: int) -> np.ndarray:
    """Position of the leftmost 1-bit in the low ``bits`` bits (1-based);
    bits+1 if none."""
    out = np.full(len(w), bits + 1, dtype=np.uint8)
    found = np.zeros(len(w), dtype=bool)
    for i in range(bits - 1, -1, -1):
        hit = (~found) & (((w >> np.uint64(i)) & np.uint64(1)) == 1)
        out[hit] = bits - i
        found |= hit
    return out


def hll_partial(df: pd.DataFrame, col: str, p: int) -> pd.DataFrame:
    m = 1 << p
    h = pd.util.hash_array(df[col].to_numpy(dtype=object), hash_key="0123456789abcdef")
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rho = _rho(h, 64 - p)
    reg = np.zeros(m, dtype=np.uint8)
    np.maximum.at(reg, idx, rho)
    return pd.DataFrame({"registers": [reg.tobytes()]})


def hll_estimate(registers: np.ndarray) -> float:
    m = len(registers)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -registers.astype(np.float64)))
    zeros = int((registers == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # small-range correction
    return float(est)


def approx_count_distinct(ds: rd.Dataset, col: str, p: int = 12) -> pa.Table:
    """Approximate COUNT(DISTINCT col); typical error ~1.04/sqrt(2^p)."""
    partials = ds.select_columns([col]).map_batches(
        lambda df: hll_partial(df, col, p), batch_format="pandas"
    )
    merged = np.zeros(1 << p, dtype=np.uint8)
    for row in partials.iter_rows():  # one tiny row per input batch
        merged = np.maximum(merged, np.frombuffer(row["registers"], dtype=np.uint8))
    return pa.table({"approx_n": pa.array([int(round(hll_estimate(merged)))], pa.int64())})


def hll_partial_grouped(df: pd.DataFrame, keys: list[str], col: str, p: int) -> pd.DataFrame:
    """One register-row per group per batch — the shuffle moves
    (groups-per-batch × 2^p) bytes, never the values."""
    out_keys: dict[str, list] = {k: [] for k in keys}
    regs: list[bytes] = []
    for gk, d in df.groupby(keys, sort=False, dropna=False):
        gk = gk if isinstance(gk, tuple) else (gk,)
        for k, v in zip(keys, gk):
            out_keys[k].append(v)
        regs.append(hll_partial(d, col, p)["registers"].iloc[0])
    out_keys["registers"] = regs
    return pd.DataFrame(out_keys)


def approx_count_distinct_grouped(
    ds: rd.Dataset, keys: list[str], col: str, p: int = 12, out: str = "approx_n"
) -> rd.Dataset:
    """Per-group approximate COUNT(DISTINCT col): per-batch grouped
    registers → hash-bucket exchange of the register rows (O(64) Ray
    groups, not one per key) → per-key elementwise-max merge → estimate.
    Mergeability makes the combine exact regardless of how batches split
    the groups. The shuffle moves (groups-per-batch × 2^p) bytes."""
    from engine.ops.bucket import bucketed_map_groups

    partials = ds.select_columns(keys + [col]).map_batches(
        lambda df: hll_partial_grouped(df, keys, col, p), batch_format="pandas"
    )

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        def one(d: pd.DataFrame) -> pd.Series:
            merged = np.zeros(1 << p, dtype=np.uint8)
            for b in d["registers"]:
                merged = np.maximum(merged, np.frombuffer(b, dtype=np.uint8))
            return pd.Series({out: int(round(hll_estimate(merged)))})

        return (
            df.groupby(keys, sort=False, dropna=False)
            .apply(one, include_groups=False)
            .reset_index()
        )

    return bucketed_map_groups(partials, keys, _merge, seed="hll")
