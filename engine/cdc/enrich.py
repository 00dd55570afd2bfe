"""Stream-table enrichment: join any Dataset (a live change-event
stream, a probe table, a relational pipeline) against the COMMITTED
lake state.

The lake side is :func:`engine.cdc.verify.read_lake` — resolved only
through the manifest (uncommitted/orphan files invisible), one
merge-on-read task per partition, optionally time-traveled to an older
epoch. The join routes through ``auto_join``'s size gate: a small lake
(dimension-sized state) broadcasts shuffle-free; a large one
co-partitions through the bucketed exchange. Lake columns that collide
with stream columns come back with the join's ``_r`` suffix.
"""

from __future__ import annotations

import ray.data as rd


def enrich_with_lake(
    stream: rd.Dataset,
    lake_dir: str,
    keys: tuple[str, ...] = ("repo", "path"),
    columns: list[str] | None = None,
    join_type: str = "left",
    epoch: int | None = None,
) -> rd.Dataset:
    """Left-enrich ``stream`` with the lake's current (or epoch-pinned)
    value columns for each key; keys absent from the lake (never
    inserted, or deleted) enrich to null under the default left join."""
    from engine.cdc.verify import read_lake
    from engine.ops.join import auto_join

    if columns is not None:
        keep = list(dict.fromkeys(list(keys) + list(columns)))
        # Pruning pushed into the lake's parquet reads: content (or any
        # unrequested heavy column) never leaves storage.
        lake = read_lake(lake_dir, epoch, columns=keep)
        lake = lake.map_batches(lambda t: t.select(keep), batch_format="pyarrow")
    else:
        lake = read_lake(lake_dir, epoch)
    return auto_join(stream, lake, key=list(keys), join_type=join_type)
