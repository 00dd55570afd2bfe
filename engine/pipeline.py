"""User-extension pipeline API (SURVEY.md §2.10).

A ``Pipeline`` is an ordered list of named steps lowered onto Ray Data.
Any callable ``pa.Table -> pa.Table`` (or DataFrame) is a batch step;
any class with ``__init__``/``__call__`` becomes an actor-pool step —
Ray Data's native contract, zero adapter code.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field

import ray.data as rd


@dataclass
class Step:
    name: str
    fn: object  # callable or callable class
    kind: str = "map_batches"  # map_batches | filter | groupby_map | dataset
    kwargs: dict = field(default_factory=dict)
    keys: list | None = None  # for groupby_map


class Pipeline:
    def __init__(self, steps: list[Step]):
        self.steps = steps

    def run(self, ds: rd.Dataset) -> rd.Dataset:
        for s in self.steps:
            kw = dict(s.kwargs)
            kw.setdefault("batch_format", "pyarrow")
            if s.kind == "map_batches":
                if inspect.isclass(s.fn):
                    kw.setdefault("concurrency", 4)
                ds = ds.map_batches(s.fn, **kw)
            elif s.kind == "filter":
                pred = s.fn
                ds = ds.map_batches(
                    lambda t, _p=pred: t.filter(_p(t)), **kw
                )
            elif s.kind == "groupby_map":
                ds = ds.groupby(s.keys).map_groups(s.fn, **kw)
            elif s.kind == "dataset":
                # Dataset -> Dataset hook: the lowering target for wide
                # operators (grouped aggregation, sort, distinct) that a
                # per-batch step cannot express — the step calls this
                # engine's scale-correct ops (bucketed combiners), never
                # a per-key groupby.
                ds = s.fn(ds)
            else:
                raise ValueError(f"unknown step kind {s.kind!r}")
        return ds
