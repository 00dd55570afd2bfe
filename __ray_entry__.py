"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json). Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``; the driver converts.

Ray is initialised by the driver BEFORE this module is imported: neither
this module nor the engine library calls ``ray.init()``/``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship CDC pipeline on /root/testdata/sf0.001 (SURVEY.md §3.1):
    synth changelog → validate/conform → (pid,salt) shuffle → LWW
    merge-apply → exactly-once manifest commit → return the lake."""
    from engine.cdc.demo import flagship

    return flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2,
    populated from the decorator registry (engine/registry.py)."""
    from engine import registry

    registry.load_catalog()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; keys absent here are non-SQL-expressible ops
    (sketches, LSH, stateful CDC replay) → rows-only driver check."""
    from engine import registry

    registry.load_catalog()
    return dict(registry.ORACLES)
