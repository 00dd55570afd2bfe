"""Query catalog — importing this package registers every pipeline in
the driver's correctness harness (engine/registry.py)."""

from engine.pipelines import cdc_queries, content, io_queries, relational  # noqa: F401
