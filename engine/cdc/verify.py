"""Final-state verifier (SURVEY.md §2.7 C6).

Defines the canonical, order-insensitive **state hash** of a lake /
replayed table: per-row sha256 digests over all columns except the raw
``content`` (identity of content is its ``content_sha256`` —
BASELINE.json:15), combined by modular addition so the hash is
independent of row order, file layout, parallelism and epoch history.
Both the engine lake and the single-process oracle replay
(engine/cdc/oracle.py) are hashed with this same function; equality is
the correctness gate run by pytest.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from engine.cdc import sink
from engine.cdc.schema import conform_table
from engine.schemas import lake_schema_for

_MOD = 1 << 256


def canonical_digest(table: pa.Table, exclude: tuple = ("content",)) -> str:
    """Order-insensitive digest of a table's logical content."""
    cols = sorted(c for c in table.column_names if c not in exclude)
    arrs = [table.column(c).to_pylist() for c in cols]
    total = 0
    for row in zip(*arrs):
        s = "\x1e".join(f"{c}\x02{v!r}" for c, v in zip(cols, row))
        total = (total + int.from_bytes(hashlib.sha256(s.encode()).digest(), "big")) % _MOD
    return f"{total:064x}"


def lake_files(lake_dir: str, epoch: int | None = None) -> tuple[list[str], pa.Schema]:
    manifest = sink.read_manifest(lake_dir, epoch)
    if manifest is None:
        raise FileNotFoundError(f"no committed manifest under {lake_dir}")
    schema = lake_schema_for(sink.schema_from_b64(manifest["schema_b64"]))
    files = [
        os.path.join(lake_dir, rel) for _, rel in sorted(sink.active_files(manifest).items())
    ]
    return files, schema


def lake_table(lake_dir: str, epoch: int | None = None) -> pa.Table:
    """Driver-side full read of the lake state (tests / small lakes),
    conformed to the latest schema, sorted by key."""
    files, schema = lake_files(lake_dir, epoch)
    if not files:
        return schema.empty_table()
    tables = [conform_table(pq.read_table(f), schema) for f in files]
    return pa.concat_tables(tables).sort_by(
        [("repo", "ascending"), ("path", "ascending")]
    )


def read_lake(lake_dir: str, epoch: int | None = None) -> rd.Dataset:
    """The lake as a streaming Dataset — resolved ONLY via the committed
    manifest, so uncommitted/orphan files are invisible."""
    files, schema = lake_files(lake_dir, epoch)
    if not files:
        return rd.from_arrow(schema.empty_table())
    ds = rd.read_parquet(files, partitioning=None)  # `part=<pid>` is addressing, not a hive column
    return ds.map_batches(
        lambda t: conform_table(t, schema), batch_format="pyarrow"
    )


def state_hash(lake_dir: str, epoch: int | None = None) -> str:
    return canonical_digest(lake_table(lake_dir, epoch))
