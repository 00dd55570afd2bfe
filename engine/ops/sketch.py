"""Mergeable sketch aggregates (SURVEY.md §2.5 G5): HyperLogLog.

Partial-final pattern: each batch emits ONE row carrying its register
array; the tiny final stage merges registers by elementwise max
(sketches are designed to be mergeable — ray_guide 'Aggregation at
scale'). The shuffle moves 2^p bytes per batch, never values.
"""

from __future__ import annotations

import math

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
    v = df[col].to_numpy()
    if np.issubdtype(v.dtype, np.integer):
        # splitmix64 — the same public mixer the CDC SQL oracle mirrors
        # bit-exactly in DuckDB (engine/cdc/sqloracle.py::_sm64_cols), so
        # integer-keyed HLL queries are driver value-hash-checkable.
        from engine.util.hashing import splitmix64

        h = splitmix64(v.astype(np.int64).view(np.uint64))
    else:
        h = pd.util.hash_array(v.astype(object), hash_key="0123456789abcdef")
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rho = _rho(h, 64 - p)
    reg = np.zeros(m, dtype=np.uint8)
    np.maximum.at(reg, idx, rho)
    return pd.DataFrame({"registers": [reg.tobytes()]})


def hll_estimate(registers: np.ndarray) -> int:
    """HLL estimate in an exactly-SQL-mirrorable form: the register sum
    is folded as the EXACT integer S = Σ 2^(B-reg) (B = bits+1; absent
    buckets contribute 2^B), and the two float expressions below consume
    only exact integers (S, V, m) plus literals — a DuckDB twin
    evaluating the literally-same expressions is bit-identical, so the
    rounded estimate survives the driver's value hash."""
    m = len(registers)
    p = int(m).bit_length() - 1
    B = 64 - p + 1
    counts = np.bincount(registers, minlength=B + 1)
    S = sum(int(c) << (B - r) for r, c in enumerate(counts.tolist()))
    V = int(counts[0])
    raw = 0.7213 / (1.0 + 1.079 / m) * m * m * float(1 << B) / float(S)
    if raw <= 2.5 * m and V > 0:
        est = m * math.log(m / V)  # small-range correction
    else:
        est = raw
    return int(np.floor(est + 0.5))


def approx_count_distinct(ds: rd.Dataset, col: str, p: int = 12) -> pa.Table:
    """Approximate COUNT(DISTINCT col); typical error ~1.04/sqrt(2^p)."""
    partials = ds.select_columns([col]).map_batches(
        lambda df: hll_partial(df, col, p), batch_format="pandas"
    )
    merged = np.zeros(1 << p, dtype=np.uint8)
    for row in partials.iter_rows():  # one tiny row per input batch
        merged = np.maximum(merged, np.frombuffer(row["registers"], dtype=np.uint8))
    return pa.table({"approx_n": pa.array([hll_estimate(merged)], pa.int64())})


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
            return pd.Series({out: hll_estimate(merged)})

        return (
            df.groupby(keys, sort=False, dropna=False)
            .apply(one, include_groups=False)
            .reset_index()
        )

    return bucketed_map_groups(partials, keys, _merge, seed="hll")


def heavy_hitters(
    ds: rd.Dataset,
    col: str,
    min_count: int,
    k: int = 1024,
    out: str = "n",
    fold_pull_threshold: int = 2_000_000,
) -> rd.Dataset:
    """Exact heavy hitters at scale via sketch-then-verify:

    1. candidate pass — each batch emits its Misra-Gries summary: the
       (value, batch_count) pairs with batch_count > batch_n/(k+1)
       (at most k pairs) plus the batch size. The driver folds them:
       for any item, true_count ≤ fold_count + Σ_absent batch_n/(k+1)
       ≤ fold_count + n_total/(k+1), so
       ``fold_count + n_total/(k+1) >= min_count`` selects a PROVEN
       superset of every item with true count >= min_count. The
       shuffle-free pass moves at most k (value, count) pairs per batch.
    2. verify pass — the candidate set is broadcast (selective whenever
       k >> n_total/min_count), and ONLY candidate rows are exactly
       counted by the bucketed combiner, then filtered to
       count >= min_count.

    Output is EXACT (the sketch only prunes the recount), so the result
    is oracle-checkable — unlike a raw sketch's approximate counts.
    """
    import pyarrow.compute as pc
    import ray

    from engine.ops.agg import grouped_agg

    def _cand(df: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: a NULL key is a first-class candidate (SQL GROUP BY
        # forms a null group). The zero-count marker row below also uses a
        # null key, but its __cnt of 0 never inflates the null fold.
        vc = df[col].value_counts(dropna=False)
        keep = vc[vc > len(df) / (k + 1)]
        if len(keep) == 0:  # still record the batch size for the slack bound
            return pd.DataFrame({col: [None], "__cnt": [0], "__batch_n": [len(df)]})
        return pd.DataFrame(
            {
                col: keep.index,
                "__cnt": keep.to_numpy(dtype="int64"),
                "__batch_n": [len(df)] + [0] * (len(keep) - 1),
            }
        )

    summary_ds = (
        ds.select_columns([col]).map_batches(_cand, batch_format="pandas").materialize()
    )
    n_total = int(summary_ds.sum("__batch_n") or 0)
    slack = n_total / (k + 1)
    if slack >= min_count:
        # SOUNDNESS GATE: a value absent from every batch summary can
        # still have true count up to ``slack`` — when that reaches
        # min_count the sketch cannot prove its candidate set is a
        # superset (k is too small for this n_total/min_count; found as
        # a real 178-row miss at sf0.1 with k=1024). Fall back to the
        # exact bucketed recount of EVERYTHING — same cost class as the
        # verify pass, exactness guaranteed.
        counted_all = grouped_agg(
            ds.select_columns([col]), [col], {out: ("count", None)}
        )
        return counted_all.map_batches(
            lambda df: df[df[out] >= min_count], batch_format="pandas"
        )
    if summary_ds.count() <= fold_pull_threshold:
        summary = summary_ds.to_pandas()
    else:
        # Per-batch summaries too numerous for a driver fold (many blocks
        # x k survivors) — fold them distributed and pull only the
        # candidate rows (bounded: fold >= min_count - slack, and
        # slack < min_count here, so only true heavy hitters and their
        # slack near-misses survive the filter).
        from engine.util.collect import pull_arrow

        folded = grouped_agg(summary_ds, [col], {"__cnt": ("sum", "__cnt")})
        thresh = min_count - slack
        cand_tbl = pull_arrow(
            folded.map_batches(
                lambda df: df[df["__cnt"] >= thresh], batch_format="pandas"
            )
        )
        summary = (
            cand_tbl.to_pandas()
            if cand_tbl is not None
            else pd.DataFrame({col: [], "__cnt": []})
        )
    fold = summary.groupby(col, dropna=False)["__cnt"].sum()
    cand_mask = fold + slack >= min_count
    null_is_candidate = bool(cand_mask[fold.index.isna()].any())
    candidates = pa.array(sorted(fold.index[cand_mask & fold.index.notna()]))
    ref = ray.put((candidates, null_is_candidate))

    def _only_candidates(t: pa.Table) -> pa.Table:
        from engine.ops.join import _cached_get

        cs, keep_null = _cached_get(ref)
        m = pc.is_in(t.column(col), value_set=cs)
        if keep_null:
            m = pc.or_kleene(m, pc.is_null(t.column(col)))
        return t.filter(m)

    pruned = ds.select_columns([col]).map_batches(_only_candidates, batch_format="pyarrow")
    counted = grouped_agg(pruned, [col], {out: ("count", None)})

    def _thresh(df: pd.DataFrame) -> pd.DataFrame:
        return df[df[out] >= min_count]

    return counted.map_batches(_thresh, batch_format="pandas")


def approx_percentile(
    ds: rd.Dataset, col: str, qs: list[float], bins: int = 4096, out_prefix: str = "p"
) -> pa.Table:
    """Mergeable approximate percentiles via a fixed-grid histogram
    sketch: one min/max pass sets the grid, then each batch emits ONE
    row carrying its bin-count vector; the driver folds counts and reads
    the quantiles off the cumulative histogram. Error ≤ one bin width
    ((max-min)/bins); both passes stream, the shuffle moves `bins` int64
    per batch. Deterministic (no sampling)."""
    import numpy as np

    from engine.ops.agg import global_agg

    mm = global_agg(ds.select_columns([col]), {"lo": ("min", col), "hi": ("max", col)})
    lo, hi = mm.column("lo")[0].as_py(), mm.column("hi")[0].as_py()
    if lo is None or hi is None or hi <= lo:
        return pa.table({f"{out_prefix}{round(q*100)}": [lo] for q in qs})
    width = (hi - lo) / bins

    def _hist(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype=np.float64)
        idx = np.clip(((v - lo) / width).astype(np.int64), 0, bins - 1)
        return pd.DataFrame({"counts": [np.bincount(idx, minlength=bins).tobytes()]})

    merged = np.zeros(bins, dtype=np.int64)
    for row in ds.select_columns([col]).map_batches(_hist, batch_format="pandas").iter_rows():
        merged += np.frombuffer(row["counts"], dtype=np.int64)
    cum = np.cumsum(merged)
    n = cum[-1]
    cols = {}
    for q in qs:
        target = max(1, int(np.ceil(q * n)))
        b = int(np.searchsorted(cum, target))
        cols[f"{out_prefix}{round(q*100)}"] = [lo + (b + 1) * width]  # bin upper edge
    return pa.table(cols)
