"""Query registry (SURVEY.md §2.10).

``@register_query("name", oracle="SELECT ...")`` registers a callable
``(sf_dir) -> Dataset | DataFrame | pyarrow.Table`` plus its DuckDB
oracle SQL twin. ``__ray_entry__.queries()`` / ``oracle_sql()`` are
populated from this registry, so every operator lands in the driver's
correctness harness automatically (driver contract __ray_entry__.py).

Naming rule: every computed/aggregate column in the Ray result must
carry the same name as in the oracle SQL (the driver hashes values after
sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

QUERIES: dict[str, Callable] = {}
ORACLES: dict[str, str] = {}


def register_query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` → non-SQL-expressible, the driver
    records a weaker rows-only check (__ray_entry__.py:41-43)."""

    def deco(fn: Callable) -> Callable:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_catalog() -> None:
    """Import every module that registers queries (idempotent)."""
    import engine.pipelines  # noqa: F401
