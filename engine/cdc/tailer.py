"""Binlog/WAL-style changelog tailer (SURVEY.md §2.1 S4).

The changelog is a directory of epoch-partitioned, seq-stamped parquet
files (``log_dir/epoch=<k>/part-*.parquet``). The tailer yields
epoch-bounded Datasets, resuming after the last committed epoch in the
lake manifest (BASELINE.json:6 "binlog/WAL-style change-event tailer",
"resume-from-checkpoint replay").
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from engine.cdc.schema import negotiate


def available_epochs(log_dir: str) -> list[int]:
    return sorted(
        int(n.split("=")[1]) for n in os.listdir(log_dir) if n.startswith("epoch=")
    )


def epoch_files(log_dir: str, epoch: int) -> list[str]:
    edir = os.path.join(log_dir, f"epoch={epoch:05d}")
    return sorted(
        os.path.join(edir, f) for f in os.listdir(edir) if f.endswith(".parquet")
    )


def epoch_schema(log_dir: str, epoch: int) -> pa.Schema:
    """Observed (unified) event schema of one epoch, from parquet footers
    only — cheap driver-side metadata read, no data scan. Feeds the
    schema negotiation layer before the epoch pipeline launches."""
    schema = None
    for f in epoch_files(log_dir, epoch):
        schema = negotiate(schema, pq.read_schema(f))
    if schema is None:
        raise FileNotFoundError(f"no files for epoch {epoch} under {log_dir}")
    return schema


def read_epoch(log_dir: str, epoch: int, parallelism_hint: int | None = None) -> rd.Dataset:
    """Epoch-bounded Dataset of change events (streamed, lazy)."""
    files = epoch_files(log_dir, epoch)
    kw = {}
    if parallelism_hint:
        kw["override_num_blocks"] = max(parallelism_hint, len(files))
    # partitioning=None: the `epoch=<k>` path component is addressing, not
    # a hive-partition column — epoch identity comes from the tailer.
    return rd.read_parquet(files, partitioning=None, **kw)
