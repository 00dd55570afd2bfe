"""Driver-side Arrow pulls for BOUNDED results.

``Dataset.take_all()`` goes through Ray's row-dict path — measured 15.5 s
for a 50k-row single-column pull where the Arrow-block pull below takes
0.03 s (500x). Every engine site that pulls a bounded result (semi-join
key sets, CC edge lists, bottom-k samples) must use ``pull_arrow``; the
row-dict path is only acceptable for O(partitions)-sized results.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def pull_arrow(ds: rd.Dataset) -> pa.Table | None:
    """Pull a (bounded!) Dataset to one driver-side Arrow table via the
    zero-copy block refs. Returns None when every block is empty (Ray's
    zero-row blocks carry an empty schema, so there is nothing sound to
    concat — callers supply their own empty-result shape)."""
    blocks = [
        b if isinstance(b, pa.Table) else pa.Table.from_pandas(b)
        for b in ray.get(ds.to_arrow_refs())
    ]
    nonempty = [b for b in blocks if b.num_rows > 0]
    if not nonempty:
        return None
    return pa.concat_tables(nonempty, promote_options="permissive").combine_chunks()


def nan_to_null(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Normalize float NaN to Arrow null (pandas-block combiners encode a
    NULL key as NaN; SQL three-valued semantics need a real null)."""
    if pa.types.is_floating(arr.type):
        return pc.if_else(pc.is_nan(arr), pa.scalar(None, arr.type), arr)
    return arr
