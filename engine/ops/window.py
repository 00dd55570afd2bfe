"""Windowed aggregates over event-time streams (SURVEY.md §2.9 W1–W3).

Ray Data has no event-time watermark machinery; the model here is
bounded replay of an ordered log (ordering authority = the event's own
timestamp / seq, not arrival order — BASELINE.json:6 "commit-ordered").
Windows are therefore pure batch transforms:

- tumbling: floor the timestamp, groupby.
- sliding: each row explodes to its size/slide windows, then tumbling.
- session: per-key sort + gap split inside map_groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from engine.ops.agg import grouped_agg


def tumbling(
    ds: rd.Dataset,
    ts_col: str,
    every: str,
    keys: list[str],
    specs: dict[str, tuple[str, str]],
    window_name: str = "win",
) -> rd.Dataset:
    """Tumbling window aggregate; ``every`` is an Arrow floor_temporal
    unit ('day', 'hour', ...)."""

    def _win(t: pa.Table) -> pa.Table:
        return t.append_column(window_name, pc.floor_temporal(t.column(ts_col), unit=every))

    return grouped_agg(
        ds.map_batches(_win, batch_format="pyarrow"), [window_name] + keys, specs
    )


def sliding(
    ds: rd.Dataset,
    ts_col: str,
    size_us: int,
    slide_us: int,
    keys: list[str],
    specs: dict[str, tuple[str, str]],
    window_name: str = "win_start",
) -> rd.Dataset:
    """Sliding window: each row belongs to size/slide windows; explode to
    (row, window_start) pairs vectorized, then a tumbling-style groupby."""
    n_windows = size_us // slide_us

    def _explode(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column(ts_col), pa.int64()).to_numpy(zero_copy_only=False)
        n = len(ts)
        base = (ts // slide_us) * slide_us  # last window start containing ts
        reps = np.repeat(np.arange(n), n_windows)
        offs = np.tile(np.arange(n_windows, dtype=np.int64) * slide_us, n)
        starts = base[reps] - offs
        valid = starts > ts[reps] - size_us
        out = t.take(pa.array(reps[valid]))
        return out.append_column(
            window_name,
            pc.cast(pa.array(starts[valid]), pa.timestamp("us")),
        )

    return grouped_agg(
        ds.map_batches(_explode, batch_format="pyarrow"), [window_name] + keys, specs
    )


def session(
    ds: rd.Dataset,
    ts_col: str,
    key: str,
    gap_us: int,
    agg_col: str,
) -> rd.Dataset:
    """Session windows per key split at inactivity gaps > gap_us.
    Emits (key, session_start, n_events, sum_<agg_col>). Hash-bucket
    exchange on the key (O(64) Ray groups, not one per user); the
    gap-split inside a bucket is a single vectorized sort + diff over
    (key, ts) — identical semantics because a bucket holds ALL events of
    each key it contains. Partitioning assumption: one key's events fit
    one worker group."""
    from engine.ops.bucket import bucketed_map_groups

    def _sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col], kind="mergesort")
        ts = df[ts_col].astype("int64")
        new_key = df[key] != df[key].shift()
        new = (new_key | (ts.diff().fillna(gap_us + 1) > gap_us)).cumsum()
        g = df.groupby(new)
        out = pd.DataFrame(
            {
                key: g[key].first(),
                "session_start": g[ts_col].min(),
                "n_events": g.size(),
                "sum_value": g[agg_col].sum(),
            }
        )
        return out.reset_index(drop=True)

    return bucketed_map_groups(ds, [key], _sessions, seed="session")


def analytic(
    ds: rd.Dataset,
    partition_by: list[str],
    order_by: list[str],
    specs: dict[str, tuple],
    num_buckets: int = 64,
    descending: bool = False,
) -> rd.Dataset:
    """SQL analytic window functions over partitions: one output row per
    input row with added columns. ``specs`` maps output name →
    ("row_number",) | ("rank", col) | ("dense_rank", col) | ("ntile", n)
    | ("lag", col, n) | ("lead", col, n)
    | ("cumsum", col).

    Shuffle key is hash(partition_by) % num_buckets (one Ray group per
    BUCKET); inside a bucket every computation is a vectorized pandas
    groupby transform. Partitioning assumption: one partition key's rows
    fit one worker group (same as any SQL engine's hash window exchange).
    """
    from engine.util.hashing import composite_key_str, fast_hash_column

    def _route(df: pd.DataFrame) -> pd.DataFrame:
        key = composite_key_str(df, partition_by)
        df = df.copy()
        df["__bucket"] = fast_hash_column(key, num_buckets, seed="analytic")
        return df

    asc = [not descending] * len(order_by)

    def _windows(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order_by + partition_by, ascending=asc + [True] * len(partition_by), kind="mergesort")
        g = df.groupby(partition_by, sort=False)
        out = df.copy()
        for name, spec in specs.items():
            fn = spec[0]
            if fn == "row_number":
                out[name] = g.cumcount() + 1
            elif fn == "rank":
                out[name] = (
                    g[spec[1]].rank(method="min", ascending=not descending).astype("int64")
                )
            elif fn == "dense_rank":
                out[name] = (
                    g[spec[1]].rank(method="dense", ascending=not descending).astype("int64")
                )
            elif fn == "percent_rank":
                rk = g[spec[1]].rank(method="min", ascending=not descending)
                cnt = g[spec[1]].transform("size")
                out[name] = ((rk - 1) / (cnt - 1).clip(lower=1)).where(cnt > 1, 0.0)
            elif fn == "cume_dist":
                rk = g[spec[1]].rank(method="max", ascending=not descending)
                out[name] = rk / g[spec[1]].transform("size")
            elif fn == "ntile":
                n_tiles = spec[1]
                i = g.cumcount().to_numpy()
                cnt = g[order_by[0]].transform("size").to_numpy()
                q_, r_ = cnt // n_tiles, cnt % n_tiles
                big = r_ * (q_ + 1)
                out[name] = np.where(
                    i < big,
                    i // np.maximum(q_ + 1, 1),
                    r_ + (i - big) // np.maximum(q_, 1),
                ).astype("int64") + 1
            elif fn == "lag":
                out[name] = g[spec[1]].shift(spec[2] if len(spec) > 2 else 1)
            elif fn == "lead":
                out[name] = g[spec[1]].shift(-(spec[2] if len(spec) > 2 else 1))
            elif fn == "cumsum":
                out[name] = g[spec[1]].cumsum()
            elif fn == "first_value":
                out[name] = g[spec[1]].transform("first")
            elif fn == "last_value":
                # Whole-partition last (SQL LAST_VALUE with ROWS BETWEEN
                # UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING — the default
                # current-row frame would just echo the column).
                out[name] = g[spec[1]].transform("last")
            elif fn == "rolling_sum":
                r = g[spec[1]].rolling(spec[2], min_periods=1).sum()
                out[name] = r.reset_index(
                    level=list(range(len(partition_by))), drop=True
                )
            elif fn == "range_sum":
                # SQL RANGE frame: SUM over rows whose ORDER-BY value lies
                # in [current - width, current] — peers (equal order value)
                # on BOTH sides are included, per ANSI RANGE ... CURRENT
                # ROW. ("range_sum", val_col, width) — width in the order
                # column's units (microseconds for timestamps). Vectorized
                # across ALL partition keys at once: each group's order
                # values are offset into a disjoint int64 band, then two
                # global searchsorted calls against a prefix-sum array do
                # every window; no per-group Python. Ascending frames only.
                if descending:
                    raise ValueError("range_sum requires ascending order")
                width = np.int64(spec[2])
                ts = df[order_by[0]].to_numpy()
                if np.issubdtype(ts.dtype, np.datetime64):
                    ts = ts.astype("datetime64[us]").view("int64")
                else:
                    ts = ts.astype(np.int64)
                gid = g.ngroup().to_numpy()
                ts0 = ts - ts.min()
                span = np.int64(ts0.max()) + width + np.int64(2)
                if (int(gid.max()) + 1) * int(span) > 2**62:
                    raise OverflowError(
                        "range_sum: order span x group count exceeds int64 "
                        "banding — narrow the window column or bucket finer"
                    )
                banded = ts0 + gid.astype(np.int64) * span
                order2 = np.argsort(banded, kind="mergesort")
                b = banded[order2]
                v = df[spec[1]].to_numpy()[order2].astype(np.int64)
                cs = np.concatenate([[0], np.cumsum(v)])
                hi = np.searchsorted(b, b, side="right")
                lo = np.searchsorted(b, b - width, side="left")
                res = np.empty(len(b), dtype=np.int64)
                res[order2] = cs[hi] - cs[lo]
                out[name] = pd.Series(res, index=df.index)
            else:
                raise ValueError(f"unknown analytic fn {fn!r}")
        return out.drop(columns="__bucket")

    return (
        ds.map_batches(_route, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(_windows, batch_format="pandas")
    )


def scd2_history(
    ds: rd.Dataset,
    key: list[str],
    order_by: list[str],
    state_cols: list[str],
    valid_from_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Slowly-changing-dimension type-2 history from a change stream.

    Per entity ``key``: order the changes by ``order_by``, drop rows
    where every ``state_cols`` value equals the previous row's (no
    attribute change → no new version), then assign validity intervals
    [``valid_from``, ``valid_to``) where valid_to is the NEXT version's
    valid_from (open-ended / NULL for the current version, flagged 1 in
    ``current_flag``).

    Shuffle moves each change row once (hash(key) % num_buckets — the
    same O(buckets)-groups pattern as every exchange in this repo);
    inside a bucket the change-detection and interval assignment are
    vectorized pandas over key-contiguous sorted rows. Partitioning
    assumption: one entity's history fits one worker (standard for any
    SQL window engine).
    """
    from engine.ops.bucket import bucketed_map_groups

    def _scd(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(key + order_by, kind="mergesort")
        g = df.groupby(key, sort=False)
        # First row per key always opens a version; later rows only when
        # some state column differs from its predecessor (null-safe:
        # null -> null is NOT a change).
        changed = ~df.duplicated(subset=key).to_numpy()
        for c in state_cols:
            prev = g[c].shift()
            # Null-safe inequality that stays plain-bool for nullable
            # dtypes: equal iff both null or values compare equal.
            eq = (df[c].isna() & prev.isna()) | (df[c] == prev).fillna(False)
            changed |= ~eq.astype(bool).to_numpy()
        out = df.loc[changed].copy()
        out[valid_from] = out[valid_from_col]
        gv = out.groupby(key, sort=False)
        out[valid_to] = gv[valid_from].shift(-1)
        out[current_flag] = out[valid_to].isna().astype("int64")
        return out

    return bucketed_map_groups(ds, key, _scd, num_buckets=num_buckets, seed="scd2")
