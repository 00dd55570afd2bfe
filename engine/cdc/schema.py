"""Arrow schema negotiation layer (SURVEY.md §2.2 M11).

Additive schema evolution (BASELINE.json:6): the changelog's schema may
gain columns mid-stream; new columns are backfilled as null for earlier
rows (both for already-written lake base files and for intra-epoch
batches that predate the column). Non-additive changes (type conflicts,
dropped key/meta columns) are rejected.
"""

from __future__ import annotations

import pyarrow as pa

from engine.schemas import KEY_COLS, META_COLS


class SchemaEvolutionError(ValueError):
    pass


def negotiate(prev: pa.Schema | None, new: pa.Schema) -> pa.Schema:
    """Unify a running event schema with an epoch's observed schema.

    Additive only: the result keeps ``prev``'s columns in order and
    appends columns that are new in ``new``. A column present in both
    with differing types is a conflict (int64 widening etc. is not
    needed by the corpus and is rejected for determinism).
    """
    for required in META_COLS + KEY_COLS:
        if required not in new.names:
            raise SchemaEvolutionError(f"event schema missing required column {required!r}")
    if prev is None:
        return new
    fields = list(prev)
    names = set(prev.names)
    for f in new:
        if f.name in names:
            old = prev.field(f.name)
            if old.type != f.type:
                raise SchemaEvolutionError(
                    f"non-additive change for column {f.name!r}: {old.type} -> {f.type}"
                )
        else:
            fields.append(f)
    return pa.schema(fields)


def conform_table(table: pa.Table, target: pa.Schema) -> pa.Table:
    """Conform a batch/base table to ``target``: inject missing columns as
    typed nulls and order columns as ``target``. Extra columns in the
    table that ``target`` lacks are an error (negotiate() first).

    Pure-Arrow; applied inside every CDC ``map_batches`` so it stays
    zero-copy for the columns that already match.
    """
    n = table.num_rows
    cols = []
    for f in target:
        if f.name in table.column_names:
            col = table.column(f.name)
            if col.type != f.type:
                col = col.cast(f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, type=f.type))
    extra = [c for c in table.column_names if c not in target.names]
    if extra:
        raise SchemaEvolutionError(f"columns {extra} not in negotiated schema {target.names}")
    return pa.table(cols, schema=target)


def subset_schema(schema: pa.Schema, names: list[str]) -> pa.Schema:
    return pa.schema([schema.field(n) for n in names])
