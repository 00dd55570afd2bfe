"""Key partitioner + salted sub-partitioner (SURVEY.md §2.7 C1/C2).

Partitioning model (BASELINE.json:6):

- ``pid = stable_hash(repo) % P`` — the lake is partitioned by **repo**
  so "skewed hot repos" are a real phenomenon (a hot repo concentrates
  its events in one pid).
- ``salt = hash(path) % S`` — ALWAYS applied for the first (sub-LWW)
  shuffle stage. A hot repo's events therefore spread across S
  sub-partitions; the second, much smaller shuffle on ``pid`` alone is
  the "final per-key reconciliation pass" that re-merges sub-partition
  winners so each partition has exactly one writer. Because any given
  key (repo, path) maps to exactly one (pid, salt), per-key LWW inside a
  sub-partition is exact, and reconciliation only re-runs LWW over
  already-collapsed winners (a no-op per key, but it restores the
  one-task-per-partition invariant the exactly-once sink needs).

Salting unconditionally (rather than detecting hot pids per epoch) keeps
the plan deterministic and adds only a second shuffle over *winners*,
which is bounded by the number of touched keys, not events.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.util.hashing import fast_hash_column, stable_hash_column


def assign_partitions(table: pa.Table, num_partitions: int, num_salts: int) -> pa.Table:
    """Append ``pid`` and ``salt`` columns (int64) to an event batch."""
    pid = stable_hash_column(table.column("repo"), num_partitions)
    if num_salts > 1:
        salt = fast_hash_column(table.column("path"), num_salts)
    else:
        salt = np.zeros(table.num_rows, dtype=np.int64)
    table = table.append_column("pid", pa.array(pid, type=pa.int64()))
    table = table.append_column("salt", pa.array(salt, type=pa.int64()))
    return table
