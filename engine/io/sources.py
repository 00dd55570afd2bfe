"""Sources (SURVEY.md §2.1 S1–S3): thin, prune-at-the-read wrappers."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def read_parquet(path: str, columns: list[str] | None = None, filter_expr=None, **kw) -> rd.Dataset:
    """Columnar scan with column pruning + row-group predicate pushdown
    (pass only what the pipeline needs — a read that loads all columns
    for a 2-column transform is wrong)."""
    if filter_expr is not None:
        kw["filter"] = filter_expr
    return rd.read_parquet(path, columns=columns, **kw)


def read_table(sf_dir: str, name: str, columns: list[str] | None = None, **kw) -> rd.Dataset:
    return read_parquet(f"{sf_dir}/{name}.parquet", columns=columns, **kw)


def read_csv(path: str, **kw) -> rd.Dataset:
    return rd.read_csv(path, **kw)


def read_json(path: str, **kw) -> rd.Dataset:
    return rd.read_json(path, **kw)


def from_arrow(table: pa.Table) -> rd.Dataset:
    return rd.from_arrow(table)


def from_items(items: list[dict]) -> rd.Dataset:
    return rd.from_items(items)


def table(sf_dir: str, name: str, columns: list[str] | None = None) -> pa.Table:
    """Driver-side Arrow read of a SMALL table (dimension/broadcast side
    only — never the fact tables)."""
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/{name}.parquet", columns=columns)


def table_num_rows(sf_dir: str, name: str) -> int:
    """Exact row count from parquet FOOTER metadata — no data pages are
    read (the right way to get COUNT(*) of an unfiltered table; a
    Dataset pass just to count is a wasted scan)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/{name}.parquet").metadata.num_rows
