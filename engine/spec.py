"""Declarative job specs (SURVEY.md §2.10): a JSON-serializable dict
lowered onto the ``Pipeline``/``Step`` API.

A spec is data, not code — it can live in a config file, be generated,
diffed, and validated before anything executes::

    {
      "source": {"table": "lineitem", "columns": [...]},
      "steps": [
        {"op": "filter", "column": "l_quantity", "cmp": ">", "value": 10},
        {"op": "with_column", "name": "revenue_cents",
         "expr": {"cents": {"mul": [{"col": "l_extendedprice"},
                                    {"sub": [{"lit": 1.0},
                                             {"col": "l_discount"}]}]}}},
        {"op": "select", "columns": ["l_returnflag", "revenue_cents"]},
        {"op": "grouped_sum", "keys": ["l_returnflag"],
         "cols": ["revenue_cents"]}
      ]
    }

Narrow steps compile to pure-Arrow ``map_batches``/``filter`` Steps;
wide steps (grouped_sum, distinct, sort) compile to ``dataset`` Steps
that call this engine's scale-correct operators (bucketed combiners —
never one Ray group per key). Expressions are a tiny tree language:
``{"col": name} | {"lit": v} | {add|sub|mul|div: [l, r]} |
{"len"|"upper"|"lower": e} | {"coalesce": [e, fallback]} |
{"cents": e}`` (integer cents with half-away-from-zero rounding — the
engine's deterministic money convention).

Everything is validated at lower() time with actionable errors; nothing
executes until the Pipeline runs.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from engine.pipeline import Pipeline, Step

_CMP = {
    ">": pc.greater,
    ">=": pc.greater_equal,
    "<": pc.less,
    "<=": pc.less_equal,
    "==": pc.equal,
    "!=": pc.not_equal,
}
_ARITH = {"add": pc.add, "sub": pc.subtract, "mul": pc.multiply, "div": pc.divide}
def _str_in(a):
    """Arrow `null`-typed inputs (all-null columns — e.g. D tombstones'
    payloads) have no utf8 kernels; cast to string first."""
    return a.cast(pa.string()) if pa.types.is_null(a.type) else a


_UNARY_STR = {
    "len": lambda a: pc.utf8_length(_str_in(a)).cast(pa.int64()),
    "upper": lambda a: pc.utf8_upper(_str_in(a)),
    "lower": lambda a: pc.utf8_lower(_str_in(a)),
}


def compile_expr(node) -> Callable[[pa.Table], object]:
    """Expression tree -> Arrow-kernel closure (vectorized per batch)."""
    if not isinstance(node, dict) or len(node) != 1:
        raise ValueError(f"expr node must be a single-key dict, got {node!r}")
    ((op, arg),) = node.items()
    if op == "col":
        if not isinstance(arg, str):
            raise ValueError(f"'col' takes a column name, got {arg!r}")
        return lambda t: t.column(arg)
    if op == "lit":
        if not isinstance(arg, (int, float, str, bool)):
            raise ValueError(f"'lit' takes a scalar, got {arg!r}")
        return lambda t: pa.scalar(arg)
    if op == "cents":
        inner = compile_expr(arg)
        return lambda t: pc.cast(
            pc.round(
                pc.multiply(pc.cast(inner(t), pa.float64()), 100.0),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
    if op in _ARITH:
        if not (isinstance(arg, list) and len(arg) == 2):
            raise ValueError(f"{op!r} takes [left, right], got {arg!r}")
        left, right = compile_expr(arg[0]), compile_expr(arg[1])
        fn = _ARITH[op]
        return lambda t: fn(left(t), right(t))
    if op in _UNARY_STR:
        inner = compile_expr(arg)
        sfn = _UNARY_STR[op]
        return lambda t: sfn(inner(t))
    if op == "coalesce":
        if not (isinstance(arg, list) and len(arg) == 2):
            raise ValueError(f"'coalesce' takes [value, fallback], got {arg!r}")
        left, right = compile_expr(arg[0]), compile_expr(arg[1])
        return lambda t: pc.coalesce(left(t), right(t))
    raise ValueError(
        f"unknown expr op {op!r} (expected col/lit/cents/coalesce/"
        f"{'/'.join(_ARITH)}/{'/'.join(_UNARY_STR)})"
    )


def _require(step: dict, *fields: str) -> None:
    missing = [f for f in fields if f not in step]
    if missing:
        raise ValueError(f"step {step.get('op')!r} missing field(s) {missing}")


def _lower_step(i: int, step: dict, ctx: dict | None = None) -> Step:
    if not isinstance(step, dict) or "op" not in step:
        raise ValueError(f"step {i} must be a dict with an 'op' field, got {step!r}")
    op = step["op"]
    name = step.get("name_hint", f"{i}:{op}")

    if op == "select":
        _require(step, "columns")
        cols = list(step["columns"])
        return Step(name, lambda t: t.select(cols))
    if op == "rename":
        _require(step, "mapping")
        mapping = dict(step["mapping"])
        return Step(
            name, lambda t: t.rename_columns([mapping.get(c, c) for c in t.column_names])
        )
    if op == "filter":
        _require(step, "column", "cmp", "value")
        if step["cmp"] not in _CMP:
            raise ValueError(
                f"step {i}: unknown cmp {step['cmp']!r} (expected {sorted(_CMP)})"
            )
        cmp_fn, col, val = _CMP[step["cmp"]], step["column"], step["value"]
        return Step(name, lambda t: cmp_fn(t.column(col), val), kind="filter")
    if op == "with_column":
        _require(step, "name", "expr")
        out_name, expr = step["name"], compile_expr(step["expr"])

        def _with(t: pa.Table) -> pa.Table:
            v = expr(t)
            if isinstance(v, pa.Scalar):  # bare {"lit": v} broadcasts
                v = pa.repeat(v, t.num_rows) if v.is_valid else pa.nulls(
                    t.num_rows, v.type
                )
            elif not isinstance(v, (pa.Array, pa.ChunkedArray)):
                v = pa.array([v] * t.num_rows)
            return t.append_column(out_name, v)

        return Step(name, _with)
    if op == "explode":
        _require(step, "column")
        ecol = step["column"]
        evalue = step.get("value_name", "value")
        epos = step.get("pos_name")

        def _explode(ds: rd.Dataset) -> rd.Dataset:
            from engine.ops.map import explode

            return explode(ds, ecol, value_name=evalue, pos_name=epos)

        return Step(name, _explode, kind="dataset")
    if op == "grouped_sum":
        _require(step, "keys", "cols")
        keys, cols = list(step["keys"]), list(step["cols"])

        def _gsum(ds: rd.Dataset) -> rd.Dataset:
            from engine.ops.agg import partial_grouped_sum

            return partial_grouped_sum(ds, keys, cols)

        return Step(name, _gsum, kind="dataset")
    if op == "distinct":
        _require(step, "columns")
        dcols = list(step["columns"])

        def _distinct(ds: rd.Dataset) -> rd.Dataset:
            from engine.ops.agg import distinct

            return distinct(ds, dcols)

        return Step(name, _distinct, kind="dataset")
    if op == "join":
        _require(step, "table", "key")
        if not isinstance(ctx, dict) or "sf_dir" not in ctx:
            raise ValueError(
                f"step {i}: 'join' needs a source context — run the spec "
                "through run_spec(spec, sf_dir), not bare lower()"
            )
        sf_dir, jtable = ctx["sf_dir"], step["table"]
        jcols = step.get("columns")
        key, right_key = step["key"], step.get("right_key", step["key"])
        jtype = step.get("join_type", "inner")

        def _join(ds: rd.Dataset) -> rd.Dataset:
            from engine.io.sources import read_table
            from engine.ops.join import auto_join
            from engine.ops.map import rename as rename_ds

            right = read_table(sf_dir, jtable, columns=jcols)
            if right_key != key:
                right = rename_ds(right, {right_key: key})
            return auto_join(ds, right, key=key, join_type=jtype)

        return Step(name, _join, kind="dataset")
    if op == "validate":
        _require(step, "rules")
        vrules = list(step["rules"])

        def _validate(ds: rd.Dataset) -> rd.Dataset:
            from engine.ops.validate import validate

            return validate(ds, vrules)

        return Step(name, _validate, kind="dataset")
    if op == "window":
        _require(step, "partition_by", "order_by", "functions")
        wpart, worder = list(step["partition_by"]), list(step["order_by"])
        wdesc = bool(step.get("descending", False))
        wspecs = {}
        for out_name, fspec in dict(step["functions"]).items():
            if not (isinstance(fspec, list) and fspec):
                raise ValueError(
                    f"step {i}: window function {out_name!r} must be a "
                    f"non-empty list [fn, args...], got {fspec!r}"
                )
            wspecs[out_name] = tuple(fspec)

        def _window(ds: rd.Dataset) -> rd.Dataset:
            from engine.ops.window import analytic

            return analytic(ds, wpart, worder, wspecs, descending=wdesc)

        return Step(name, _window, kind="dataset")
    if op == "sort":
        _require(step, "by")
        by = list(step["by"])
        desc = step.get("descending", [False] * len(by))
        limit = step.get("limit")

        def _sort(ds: rd.Dataset) -> rd.Dataset:
            out = ds.sort(by, descending=desc)
            return out.limit(int(limit)) if limit is not None else out

        return Step(name, _sort, kind="dataset")
    raise ValueError(
        f"step {i}: unknown op {op!r} (expected select/rename/filter/"
        "with_column/explode/join/grouped_sum/distinct/validate/window/sort)"
    )


def lower(spec: dict, ctx: dict | None = None) -> Pipeline:
    """Validate a spec and compile it into a Pipeline (no execution).
    ``ctx`` carries runtime bindings steps may need (currently
    ``sf_dir`` for 'join' steps' right-side reads)."""
    if not isinstance(spec, dict) or not isinstance(spec.get("steps"), list):
        raise ValueError("spec must be a dict with a 'steps' list")
    return Pipeline([_lower_step(i, s, ctx) for i, s in enumerate(spec["steps"])])


def run_spec(spec: dict, sf_dir: str) -> rd.Dataset:
    """Lower and run a spec against its declared source (pruned read:
    only the spec's declared columns leave storage). Two source kinds:

    - ``{"table": name, "columns": [...]}`` — a testdata parquet table.
    - ``{"lake": dir, "filters": [[col, op, value], ...], "columns":
      [...], "epoch": k}`` — a committed CDC lake, read through the
      zone-map-pruned scan (engine/cdc/scan.py): partitions whose
      manifest stats exclude the filters are never touched, base files
      are predicate-pushed, and only the declared columns are read —
      the config-driven-report-over-the-lakehouse job."""
    src = spec.get("source")
    if not isinstance(src, dict) or ("table" not in src and "lake" not in src):
        raise ValueError(
            "spec['source'] must be a dict with a 'table' or 'lake' field"
        )
    if "lake" in src:
        from engine.cdc.scan import scan_lake

        filters = [tuple(f) for f in src.get("filters", [])]
        ds = scan_lake(
            src["lake"], filters,
            epoch=src.get("epoch"), columns=src.get("columns"),
        )
    else:
        from engine.io.sources import read_table

        ds = read_table(sf_dir, src["table"], columns=src.get("columns"))
    return lower(spec, ctx={"sf_dir": sf_dir}).run(ds)


def main(argv: list[str] | None = None) -> None:
    """Run a declarative job spec from a JSON file — the config-driven
    ETL entry an operator would ``ray job submit``::

        python -m engine.spec --spec job.json --sf-dir /data/sf0.01 \
            [--out /lake/exports/job1] [--limit 10]

    The spec's source is a testdata table or a committed CDC lake (see
    :func:`run_spec`). With ``--out`` the result streams to partitioned
    parquet (never through the driver); otherwise a row count and an
    optional preview print."""
    import argparse
    import json

    import ray

    ap = argparse.ArgumentParser(description="Run a declarative job spec")
    ap.add_argument("--spec", required=True, help="path to the spec JSON")
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", default=None, help="write result as parquet dir")
    ap.add_argument("--limit", type=int, default=0, help="print first N rows")
    args = ap.parse_args(argv)
    with open(args.spec) as f:
        spec = json.load(f)
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    ds = run_spec(spec, args.sf_dir)
    if args.out:
        ds.write_parquet(args.out)
        print(json.dumps({"rows": ds.count(), "out": args.out}))
    else:
        print(json.dumps({"rows": ds.count()}))
        if args.limit:
            for row in ds.take(args.limit):
                print(json.dumps(row, default=str))


if __name__ == "__main__":
    main()
