"""Per-batch maps, projections, filters (SURVEY.md §2.2 M1–M6).

All row-wise work is vectorized inside ``map_batches`` with
``batch_format="pyarrow"`` (zero-copy from the object store); nothing
here iterates Python rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def select(ds: rd.Dataset, cols: list[str]) -> rd.Dataset:
    return ds.select_columns(cols)


def rename(ds: rd.Dataset, mapping: dict[str, str]) -> rd.Dataset:
    # Arrow-explicit (Dataset.rename_columns assumes Arrow blocks and
    # breaks on pandas-backed datasets).
    def _ren(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(_ren, batch_format="pyarrow")


def with_column(ds: rd.Dataset, name: str, expr, **mb_kwargs) -> rd.Dataset:
    """Append a computed column. ``expr(table) -> Array`` built from the
    scalar library (engine/ops/scalar.py)."""

    def _add(t: pa.Table) -> pa.Table:
        col = expr(t)
        if name in t.column_names:
            t = t.drop_columns([name])
        return t.append_column(name, col)

    return ds.map_batches(_add, batch_format="pyarrow", **mb_kwargs)


def with_columns(ds: rd.Dataset, exprs: dict, **mb_kwargs) -> rd.Dataset:
    """Append several computed columns in ONE batch pass (cheaper than
    chaining with_column — one task graph stage, one batch traversal)."""

    def _add(t: pa.Table) -> pa.Table:
        for name, expr in exprs.items():
            col = expr(t)
            if name in t.column_names:
                t = t.drop_columns([name])
            t = t.append_column(name, col)
        return t

    return ds.map_batches(_add, batch_format="pyarrow", **mb_kwargs)


def filter_expr(ds: rd.Dataset, pred, **mb_kwargs) -> rd.Dataset:
    """Vectorized row filter: ``pred(table) -> BooleanArray``. Faster than
    row-wise ``ds.filter`` (ray_guide: per-row Python in a hot stage is
    wrong)."""
    return ds.map_batches(
        lambda t: t.filter(pc.fill_null(pred(t), False)),
        batch_format="pyarrow",
        **mb_kwargs,
    )


def cast_column(ds: rd.Dataset, col: str, new_type: pa.DataType) -> rd.Dataset:
    def _cast(t: pa.Table) -> pa.Table:
        i = t.column_names.index(col)
        return t.set_column(i, col, pc.cast(t.column(col), new_type))

    return ds.map_batches(_cast, batch_format="pyarrow")


def explode(ds: rd.Dataset, list_col: str, value_name: str = "value", pos_name: str | None = None) -> rd.Dataset:
    """Unnest a list column: one output row per element, other columns
    repeated (SURVEY.md M5). Pure Arrow: list_flatten +
    list_parent_indices + take — no Python rows."""

    def _explode(t: pa.Table) -> pa.Table:
        col = t.column(list_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parents = pc.list_parent_indices(col)
        flat = pc.list_flatten(col)
        out = t.drop_columns([list_col]).take(parents)
        out = out.append_column(value_name, flat)
        if pos_name is not None:
            import numpy as np

            offsets = col.offsets.to_numpy(zero_copy_only=False)
            pos = np.arange(len(flat)) - np.repeat(offsets[:-1], np.diff(offsets))
            out = out.append_column(pos_name, pa.array(pos, type=pa.int64()))
        return out

    return ds.map_batches(_explode, batch_format="pyarrow")
