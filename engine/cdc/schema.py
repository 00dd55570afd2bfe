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
    if pa.types.is_decimal(a) or pa.types.is_decimal(b):
        # Decimal unification is lossless in (integer digits, scale)
        # space: result scale = max scale, integer digits = max needed;
        # ints join at their exact digit requirement (decimal↔float is
        # LOSSY both ways and stays rejected).
        def _dec_parts(t):
            if pa.types.is_decimal(t):
                return t.precision - t.scale, t.scale
            if t in _INT_ORDER:
                return {8: 3, 16: 5, 32: 10, 64: 19}[_INT_ORDER[t]], 0
            if t in _UINT_ORDER:
                return {8: 3, 16: 5, 32: 10, 64: 20}[_UINT_ORDER[t]], 0
            return None
        pa_, pb_ = _dec_parts(a), _dec_parts(b)
        if pa_ is None or pb_ is None:
            return None
        digits, scale = max(pa_[0], pb_[0]), max(pa_[1], pb_[1])
        if digits + scale <= 38:
            return pa.decimal128(digits + scale, scale)
        if digits + scale <= 76:
            return pa.decimal256(digits + scale, scale)
        return None
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
    if pa.types.is_struct(a) and pa.types.is_struct(b):
        # Nested-additive struct evolution: union of the field sets,
        # common fields unified RECURSIVELY (a producer may add a field
        # to a struct column mid-stream exactly like a top-level column;
        # conform_table null-fills the missing field for older rows).
        # Field order: a's fields, then b-only fields in b's order.
        b_fields = {f.name: f for f in b}
        fields = []
        for f in a:
            other = b_fields.get(f.name)
            if other is None:
                fields.append(f)
                continue
            u = unify_types(f.type, other.type)
            if u is None:
                return None
            fields.append(pa.field(f.name, u))
        a_names = {f.name for f in a}
        fields += [f for f in b if f.name not in a_names]
        return pa.struct(fields)
    a_list = pa.types.is_list(a) or pa.types.is_large_list(a)
    b_list = pa.types.is_list(b) or pa.types.is_large_list(b)
    if a_list and b_list:
        elem = unify_types(a.value_type, b.value_type)
        if elem is None:
            return None
        if pa.types.is_large_list(a) or pa.types.is_large_list(b):
            return pa.large_list(elem)
        return pa.list_(elem)
    if pa.types.is_map(a) and pa.types.is_map(b):
        k = unify_types(a.key_type, b.key_type)
        v = unify_types(a.item_type, b.item_type)
        if k is None or v is None:
            return None
        return pa.map_(k, v)
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


def _conform_column(col: pa.ChunkedArray | pa.Array, target: pa.DataType):
    """Cast a column to a (recursively) unified target type. Arrow's
    ``cast`` covers every scalar widening but refuses struct→wider-struct
    (pyarrow 16 requires identical field sets), so struct columns are
    rebuilt field-by-field with typed-null fill for added fields."""
    if col.type == target:
        return col
    if pa.types.is_struct(col.type) and pa.types.is_struct(target):
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        have = {f.name for f in col.type}
        children = [
            _conform_column(arr.field(f.name), f.type)
            if f.name in have
            else pa.nulls(len(arr), type=f.type)
            for f in target
        ]
        mask = arr.is_null() if arr.null_count else None
        return pa.StructArray.from_arrays(children, fields=list(target), mask=mask)
    return col.cast(target)


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
                col = _conform_column(col, f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, type=f.type))
    extra = [c for c in table.column_names if c not in target.names]
    if extra:
        raise SchemaEvolutionError(f"columns {extra} not in negotiated schema {target.names}")
    return pa.table(cols, schema=target)


def subset_schema(schema: pa.Schema, names: list[str]) -> pa.Schema:
    return pa.schema([schema.field(n) for n in names])


def rename_schema(schema: pa.Schema, renames: dict | None) -> pa.Schema:
    """Apply the lake's pinned column-rename map (historical → current,
    maintain.rename_column) to an EVENT schema: a producer still using a
    pre-rename name maps to the current one. A name is only mapped when
    the current name isn't already present (a schema carrying both is
    ambiguous and left to conform_table to reject)."""
    if not renames:
        return schema
    names = set(schema.names)
    out = []
    for f in schema:
        new = renames.get(f.name)
        out.append(pa.field(new, f.type) if new and new not in names else f)
    return pa.schema(out)


def rename_table(table: pa.Table, renames: dict | None) -> pa.Table:
    """Table twin of :func:`rename_schema` (event batches / old lake
    versions read across a rename boundary)."""
    if not renames:
        return table
    names = set(table.column_names)
    new_names = [
        renames[n] if n in renames and renames[n] not in names else n
        for n in table.column_names
    ]
    return table.rename_columns(new_names) if new_names != table.column_names else table


def drop_schema(schema: pa.Schema, drops: list | None) -> pa.Schema:
    """Apply the lake's pinned column-drop tombstones
    (maintain.drop_column) to an EVENT schema: a producer still emitting
    a dropped column has it discarded rather than re-added additively by
    :func:`negotiate`. Applied AFTER :func:`rename_schema` (the pin
    stores current names). Key/meta columns are never droppable, so no
    guard is needed here."""
    if not drops:
        return schema
    dead = set(drops)
    return pa.schema([f for f in schema if f.name not in dead])


def drop_table(table: pa.Table, drops: list | None) -> pa.Table:
    """Table twin of :func:`drop_schema` (event batches / old lake
    versions read across a drop boundary)."""
    if not drops:
        return table
    dead = [n for n in table.column_names if n in set(drops)]
    return table.drop_columns(dead) if dead else table
