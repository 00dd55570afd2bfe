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


_INT_ORDER = {pa.int8(): 8, pa.int16(): 16, pa.int32(): 32, pa.int64(): 64}
_UINT_ORDER = {pa.uint8(): 8, pa.uint16(): 16, pa.uint32(): 32, pa.uint64(): 64}


def unify_types(a: pa.DataType, b: pa.DataType) -> pa.DataType | None:
    """LOSSLESS unification of two column types, or None if impossible.

    Symmetric (an epoch may also arrive NARROWER than the running schema
    — the target then simply stays wide and conform_table up-casts).
    Allowed widenings: signed/unsigned int → wider int (unsigned unifies
    into the next-larger signed; uint64 has no lossless signed home),
    float32 → float64, int of ≤32 bits → float64 (53-bit mantissa;
    int64 → float64 is LOSSY and rejected), string → large_string.
    """
    if a == b:
        return a
    # Arrow `null` is the ABSENCE of type information (an epoch whose
    # column is entirely null — e.g. every event patches other fields —
    # infers as null): it unifies to the other side's type; null values
    # conform losslessly into any type.
    if pa.types.is_null(a):
        return b
    if pa.types.is_null(b):
        return a
    for x, y in ((a, b), (b, a)):
        if x == pa.string() and y == pa.large_string():
            return pa.large_string()
        if x == pa.float32() and y == pa.float64():
            return pa.float64()
    ints = all(t in _INT_ORDER or t in _UINT_ORDER for t in (a, b))
    if ints:
        def signed_home(t):
            if t in _INT_ORDER:
                return _INT_ORDER[t]
            if _UINT_ORDER[t] >= 64:
                return None  # uint64 exceeds int64
            return _UINT_ORDER[t] * 2  # uint8→int16, …, uint32→int64
        if (a in _UINT_ORDER) == (b in _UINT_ORDER):  # same signedness
            order = _UINT_ORDER if a in _UINT_ORDER else _INT_ORDER
            bits = max(order[a], order[b])
            return {v: k for k, v in order.items()}[bits]
        ha, hb = signed_home(a), signed_home(b)
        if ha is None or hb is None:
            return None
        bits = max(ha, hb)
        return {v: k for k, v in _INT_ORDER.items()}[bits]
    for x, y in ((a, b), (b, a)):
        if x in _INT_ORDER and _INT_ORDER[x] <= 32 and y == pa.float64():
            return pa.float64()
        if x in _UINT_ORDER and _UINT_ORDER[x] <= 32 and y == pa.float64():
            return pa.float64()
    return None


def negotiate(prev: pa.Schema | None, new: pa.Schema) -> pa.Schema:
    """Unify a running event schema with an epoch's observed schema.

    Additive + lossless-widening evolution: the result keeps ``prev``'s
    columns in order (types widened where the epoch's type and the
    running type losslessly unify — see :func:`unify_types`) and appends
    columns that are new in ``new``. Lossy or structural changes are
    rejected; both the distributed replay and the single-process oracle
    route through THIS function, so the negotiated chain — hence the
    final state hash — is identical by construction.
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
                unified = unify_types(old.type, f.type)
                if unified is None:
                    raise SchemaEvolutionError(
                        f"non-additive change for column {f.name!r}: {old.type} -> {f.type}"
                    )
                idx = prev.get_field_index(f.name)
                fields[idx] = pa.field(f.name, unified)
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
