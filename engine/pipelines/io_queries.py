"""Connector queries (SURVEY.md §2.1 S2/S5/S6): prove the CSV and JSON
extract/load paths end-to-end by round-tripping a table through the
text format and checking the result against the DuckDB oracle over the
original parquet. Scratch output goes under /tmp (unique per call)."""

from __future__ import annotations

import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.compute as pc

from engine.io.sinks import write_csv, write_json
from engine.io.sources import read_csv, read_json, read_table
from engine.ops.map import filter_expr, select
from engine.registry import register_query

_SCRATCH = "/tmp/graft_io"


def _fresh_dir(tag: str) -> str:
    path = os.path.join(_SCRATCH, f"{tag}-{uuid.uuid4().hex[:8]}")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


@register_query(
    "q_csv_roundtrip",
    oracle="""SELECT n_nationkey, n_name, n_regionkey FROM nation
              WHERE n_regionkey >= 2""",
)
def q_csv_roundtrip(sf_dir):
    out = _fresh_dir("csv")
    ds = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"])
    write_csv(ds, out)
    back = read_csv(out)
    return filter_expr(back, lambda t: pc.greater_equal(t.column("n_regionkey"), 2))


@register_query(
    "q_json_roundtrip",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def q_json_roundtrip(sf_dir):
    out = _fresh_dir("json")
    ds = read_table(sf_dir, "region", columns=["r_regionkey", "r_name"])
    write_json(ds, out)
    return read_json(out)


@register_query(
    "q_partitioned_write_roundtrip",
    oracle="""SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
              FROM lineitem GROUP BY l_returnflag""",
)
def q_partitioned_write_roundtrip(sf_dir):
    """Resumable-output layout (SURVEY.md §4): write Hive-partitioned
    parquet (one directory per key), read it back, aggregate. A failed
    run can skip finished partitions by directory."""
    import pyarrow.compute as pc

    from engine.io.sources import read_parquet, read_table
    from engine.ops.agg import grouped_agg
    from engine.ops.map import with_columns

    out = _fresh_dir("partwrite")
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    ds.write_parquet(out, partition_cols=["l_returnflag"])
    back = read_parquet(out)
    # Hive partition values come back as dictionary/string; normalize.
    back = with_columns(
        back,
        {
            "l_returnflag": lambda t: pc.cast(t.column("l_returnflag"), pa.string()),
            "sum_qty": lambda t: pc.cast(t.column("l_quantity"), pa.int64()),
        },
    )
    return grouped_agg(
        back, ["l_returnflag"], {"n": ("count", None), "sum_qty": ("sum", "sum_qty")}
    )
