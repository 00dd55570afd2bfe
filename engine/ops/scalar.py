"""Scalar function library (SURVEY.md §2.8).

Thin, vectorized wrappers over ``pyarrow.compute`` kernels, applied to
Arrow arrays inside ``map_batches``. Each function mirrors an ANSI-SQL
scalar so the DuckDB oracles can express the same computation.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

# ---- string ----------------------------------------------------------------


def lower(a):
    return pc.utf8_lower(a)


def upper(a):
    return pc.utf8_upper(a)


def length(a):
    return pc.utf8_length(a)


def substr(a, start: int, length_: int | None = None):
    """1-based like SQL substr."""
    stop = None if length_ is None else start - 1 + length_
    return pc.utf8_slice_codeunits(a, start - 1, stop)


def concat(*arrays, sep: str = ""):
    return pc.binary_join_element_wise(*arrays, sep)


def replace(a, pattern: str, replacement: str):
    return pc.replace_substring(a, pattern, replacement)


def contains(a, needle: str):
    return pc.match_substring(a, needle)


def starts_with(a, prefix: str):
    return pc.starts_with(a, prefix)


def regexp_contains(a, pattern: str):
    return pc.match_substring_regex(a, pattern)


def trim(a):
    return pc.utf8_trim_whitespace(a)


def lpad(a, width: int, padding: str = " "):
    """SQL lpad semantics: pads AND truncates to ``width`` (Arrow's
    utf8_lpad alone leaves longer strings untouched; DuckDB truncates)."""
    return pc.utf8_slice_codeunits(pc.utf8_lpad(a, width, padding=padding), 0, width)


def rpad(a, width: int, padding: str = " "):
    """SQL rpad semantics: pads AND truncates to ``width``."""
    return pc.utf8_slice_codeunits(pc.utf8_rpad(a, width, padding=padding), 0, width)


def regexp_replace(a, pattern: str, replacement: str):
    return pc.replace_substring_regex(a, pattern, replacement)


def regexp_extract(a, pattern: str):
    """First capture group of ``pattern`` (pattern must contain exactly one
    named or unnamed group rewritten as named internally)."""
    st = pc.extract_regex(a, pattern.replace("(", "(?P<g>", 1))
    return pc.struct_field(st, "g")


# ---- date / time -----------------------------------------------------------


def year(a):
    return pc.year(a)


def month(a):
    return pc.month(a)


def day(a):
    return pc.day(a)


def date_trunc(a, unit: str):
    return pc.floor_temporal(a, unit=unit)


def epoch_seconds(a):
    return pc.divide(pc.cast(a, pa.int64()), 1_000_000)  # timestamp[us] → s


def date_diff_days(a, b):
    delta = pc.cast(pc.subtract(a, b), pa.int64())  # µs
    return pc.divide(delta, 86_400_000_000)


# ---- math ------------------------------------------------------------------

abs_ = pc.abs


def round_(a, ndigits: int = 0):
    return pc.round(a, ndigits=ndigits)


ln = pc.ln
log10 = pc.log10
sqrt = pc.sqrt
power = pc.power
floor = pc.floor
ceil = pc.ceil


# ---- array (list<T>) -------------------------------------------------------


def list_length(a):
    return pc.list_value_length(a)


def list_sum(a):
    """Per-row sum of a list column (flatten + segmented sum)."""
    import numpy as np

    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    flat = pc.list_flatten(a).to_numpy(zero_copy_only=False)
    offsets = a.offsets.to_numpy(zero_copy_only=False)
    sums = np.add.reduceat(
        np.concatenate([flat, [0.0]]), offsets[:-1]
    ) * (np.diff(offsets) > 0)
    return pa.array(sums, type=pa.float64())


def list_slice(a, start: int, stop: int):
    return pc.list_slice(a, start, stop)


# ---- json ------------------------------------------------------------------


def _json_coerce(v, as_type: pa.DataType):
    """TRY_CAST semantics for parsed JSON values: a value whose JSON type
    does not match the declared extraction type is NULL, never an error
    (e.g. asking for int64 where the field holds a string)."""
    if v is None:
        return None
    if pa.types.is_integer(as_type):
        return v if isinstance(v, int) and not isinstance(v, bool) else None
    if pa.types.is_floating(as_type):
        return float(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else None
    if pa.types.is_string(as_type) or pa.types.is_large_string(as_type):
        return v if isinstance(v, str) else None
    if pa.types.is_boolean(as_type):
        return v if isinstance(v, bool) else None
    try:
        pa.scalar(v, type=as_type)
        return v
    except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
        return None


def _json_get_loop(values: list, key: str, as_type: pa.DataType) -> list:
    out = []
    for s in values:
        if s is None:
            out.append(None)
            continue
        try:
            out.append(_json_coerce(json.loads(s).get(key), as_type))
        except (ValueError, AttributeError):
            out.append(None)
    return out


def json_get(a, key: str, as_type: pa.DataType = pa.int64()):
    """Extract a field from a JSON-in-string column (events.props —
    SURVEY.md §2.2 M7); returns a typed Arrow array.

    Hot path: a vectorized ``pc.extract_regex`` for flat single-object
    JSON with scalar int/float/string values (the 100-TB events shape).
    Rows the regex cannot answer soundly fall back to real JSON parsing:
    (a) nested documents (more than one '{' — a regex hit could be a
    nested object's key) and (b) rows where the key is present but the
    regex missed (escaped strings, null/bool/array values)."""
    import re

    import numpy as np

    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    k = re.escape(key)
    if pa.types.is_integer(as_type):
        pat = f'"{k}"\\s*:\\s*(?P<v>-?\\d+)\\s*[,}}\\]]'
    elif pa.types.is_floating(as_type):
        pat = f'"{k}"\\s*:\\s*(?P<v>-?\\d+(?:\\.\\d+)?(?:[eE][+-]?\\d+)?)\\s*[,}}\\]]'
    elif pa.types.is_string(as_type) or pa.types.is_large_string(as_type):
        pat = f'"{k}"\\s*:\\s*"(?P<v>[^"\\\\]*)"'
    else:
        pat = None
    if pat is None or len(a) == 0:
        return pa.array(_json_get_loop(a.to_pylist(), key, as_type), type=as_type)

    fast = pc.struct_field(pc.extract_regex(a, pat), "v")
    if not pa.types.is_string(as_type) and not pa.types.is_large_string(as_type):
        fast = pc.cast(fast, as_type)
    # Soundness fallback mask: nested docs, or key present but unmatched.
    nested = pc.greater(pc.count_substring(a, "{"), 1)
    missed = pc.and_kleene(pc.is_null(fast), pc.match_substring(a, f'"{key}"'))
    slow = pc.fill_null(pc.or_kleene(nested, missed), False)
    slow = pc.and_(slow, pc.is_valid(a))
    if not pc.any(slow).as_py():
        return fast
    idx = np.nonzero(slow.to_numpy(zero_copy_only=False))[0]
    out = fast.to_pylist()
    parsed = _json_get_loop([a[int(i)].as_py() for i in idx], key, as_type)
    for i, v in zip(idx, parsed):
        out[int(i)] = v
    return pa.array(out, type=as_type)
