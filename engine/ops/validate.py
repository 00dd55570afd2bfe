"""Declarative data-quality validation (the expectations gate every
production ETL framework grows): a rule list is evaluated in ONE
streaming pass — each batch emits per-rule violation partials, a tiny
grouped sum folds them — plus an optional bad-row split (the relational
analogue of the CDC dead-letter path).

Rules (JSON-serializable, so specs/configs can carry them):

    {"rule": "not_null",        "column": c}
    {"rule": "in_range",        "column": c, "min": lo, "max": hi}   # inclusive
    {"rule": "accepted_values", "column": c, "values": [...]}
    {"rule": "matches",         "column": c, "pattern": re2}
    {"rule": "unique",          "column": c}   # needs a distinct pass (exchange)

All but ``unique`` are per-batch Arrow kernels (no shuffle). NULLs only
violate ``not_null`` — SQL semantics: a null is not in-range-violating,
not a non-match (mirror with ``WHERE NOT (...) AND col IS NOT NULL``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _rule_name(r: dict) -> str:
    return f"{r['rule']}:{r['column']}"


def _violation_mask(t: pa.Table, r: dict):
    col = t.column(r["column"])
    kind = r["rule"]
    if kind == "not_null":
        return pc.is_null(col)
    valid = pc.is_valid(col)
    if kind == "in_range":
        ok = pc.and_(
            pc.greater_equal(col, r["min"]), pc.less_equal(col, r["max"])
        )
    elif kind == "accepted_values":
        ok = pc.is_in(col, value_set=pa.array(r["values"]))
    elif kind == "matches":
        ok = pc.match_substring_regex(pc.cast(col, pa.string()), r["pattern"])
    else:
        raise ValueError(f"unknown validation rule {kind!r}")
    return pc.and_(valid, pc.invert(pc.fill_null(ok, False)))


def validate(ds: rd.Dataset, rules: list[dict]) -> rd.Dataset:
    """Violation counts per rule, one streaming pass for the batch rules
    plus one distinct pass per ``unique`` rule. Returns a Dataset of
    ``(rule, violations)`` with a row for EVERY rule (zero included), so
    a gate can assert `all(violations == 0)`."""
    known = {"not_null", "in_range", "accepted_values", "matches", "unique"}
    for r in rules:
        if "rule" not in r or "column" not in r:
            raise ValueError(f"rule needs 'rule' and 'column': {r!r}")
        if r["rule"] not in known:
            # fail at the driver, before any task launches
            raise ValueError(
                f"unknown validation rule {r['rule']!r} (expected {sorted(known)})"
            )
    batch_rules = [r for r in rules if r["rule"] != "unique"]
    unique_rules = [r for r in rules if r["rule"] == "unique"]

    out_tables = []
    if batch_rules:
        def _partial(t: pa.Table) -> pa.Table:
            names, counts = [], []
            for r in batch_rules:
                names.append(_rule_name(r))
                counts.append(
                    pc.sum(pc.cast(_violation_mask(t, r), pa.int64())).as_py() or 0
                )
            return pa.table(
                {"rule": pa.array(names), "violations": pa.array(counts, pa.int64())}
            )

        from engine.ops.agg import partial_grouped_sum

        cols = sorted({r["column"] for r in batch_rules})
        partials = ds.select_columns(cols).map_batches(_partial, batch_format="pyarrow")
        folded = partial_grouped_sum(partials, ["rule"], ["violations"]).take_all()
        got = {r["rule"]: r["violations"] for r in folded}
        out_tables.append(
            pa.table(
                {
                    "rule": [_rule_name(r) for r in batch_rules],
                    "violations": pa.array(
                        [int(got.get(_rule_name(r), 0)) for r in batch_rules],
                        pa.int64(),
                    ),
                }
            )
        )
    for r in unique_rules:
        from engine.io.sources import table_num_rows  # noqa: F401  (doc xref)
        from engine.ops.agg import distinct

        col = r["column"]
        total = ds.select_columns([col]).count()
        n_distinct = distinct(ds.select_columns([col]), [col]).count()
        out_tables.append(
            pa.table(
                {
                    "rule": [_rule_name(r)],
                    "violations": pa.array([int(total - n_distinct)], pa.int64()),
                }
            )
        )
    return rd.from_arrow(pa.concat_tables(out_tables))


def split_bad_rows(ds: rd.Dataset, rules: list[dict]) -> tuple[rd.Dataset, rd.Dataset]:
    """(good, bad) row split under the BATCH rules (``unique`` is a
    set-level property, not a row property — excluded). Bad rows carry a
    ``failed_rules`` column naming every rule they violate, dead-letter
    style."""
    batch_rules = [r for r in rules if r["rule"] != "unique"]

    def _mask(t: pa.Table, keep_good: bool) -> pa.Table:
        import numpy as np

        bad = np.zeros(t.num_rows, dtype=bool)
        names = np.empty(t.num_rows, dtype=object)
        names[:] = ""
        for r in batch_rules:
            m = pc.fill_null(_violation_mask(t, r), False).to_numpy(
                zero_copy_only=False
            )
            bad |= m
            tag = _rule_name(r)
            names[m] = np.where(
                np.char.equal(names[m].astype(str), ""),
                tag,
                np.char.add(np.char.add(names[m].astype(str), ","), tag),
            )
        if keep_good:
            return t.filter(pa.array(~bad))
        return t.filter(pa.array(bad)).append_column(
            "failed_rules", pa.array(names[bad].astype(str).tolist(), pa.string())
        )

    good = ds.map_batches(lambda t: _mask(t, True), batch_format="pyarrow")
    bad = ds.map_batches(lambda t: _mask(t, False), batch_format="pyarrow")
    return good, bad
