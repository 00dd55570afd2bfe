"""DuckDB SQL mirrors for the sketch operators (driver oracles).

The engine's sketches are deterministic; these helpers express the SAME
computation in ANSI-ish DuckDB SQL so the driver's value-hash check
covers them. Bit-exactness strategy (same as engine/cdc/sqloracle.py):

- all 64-bit wraparound arithmetic is done in HUGEINT limbs
  (``_sm64_cols`` — validated bit-exact vs numpy in test_sqloracle.py);
- every float expression consumes only EXACT integers plus literals and
  is written token-for-token like its Python twin, so IEEE evaluation
  order matches and the rounded outputs hash identically.

HLL registers depend only on the DISTINCT input values (the register is
a max over per-value rhos), so the SQL side dedups first — the oracle
cost is O(cardinality), not O(rows).
"""

from __future__ import annotations

from engine.cdc.sqloracle import _mul64, _sm64_cols

_M64 = 1 << 64


def _hll_core(source: str, value_expr: str, keys: list[str], p: int) -> str:
    """CTE chain computing per-group (register-sum S, zero-count V) for
    a p-bit HLL over ``value_expr`` rows of ``source``."""
    m = 1 << p
    bits = 64 - p
    B = bits + 1
    two_B = 1 << B
    klist = ", ".join(keys)
    kpfx = f"{klist}, " if keys else ""
    sm = ",\n              ".join(_sm64_cols("hv", "CAST(v AS UBIGINT)"))
    return f"""
      d AS (SELECT DISTINCT {kpfx}{value_expr} AS v FROM {source}
            WHERE {value_expr} IS NOT NULL),
      h AS (SELECT {kpfx}{sm} FROM d),
      rb AS (SELECT {kpfx}hv >> {bits} AS bucket,
                    hv % {1 << bits}::UBIGINT AS w FROM h),
      rho AS (SELECT {kpfx}bucket,
                     COALESCE(MIN(r.r), {B}) AS rho
              FROM rb LEFT JOIN range(1, {B}) r(r)
                ON ((rb.w >> ({bits} - r.r)) & 1) = 1
              GROUP BY {kpfx}bucket, rb.w),
      regs AS (SELECT {kpfx}bucket, MAX(rho) AS reg
               FROM rho GROUP BY {kpfx}bucket),
      s AS (SELECT {kpfx}SUM(CAST(1::UBIGINT << ({B} - reg) AS HUGEINT)) AS sp,
                   COUNT(*) AS np
            FROM regs{(' GROUP BY ' + klist) if keys else ''}),
      t AS (SELECT {kpfx}sp + ({m} - np) * CAST({two_B} AS HUGEINT) AS S,
                   {m} - np AS V
            FROM s),
      e AS (SELECT {kpfx}0.7213 / (1.0 + 1.079 / {m}) * {m} * {m} * {float(two_B)!r}
                     / CAST(S AS DOUBLE) AS raw,
                   V
            FROM t)"""


def _hll_estimate_expr(p: int) -> str:
    m = 1 << p
    return (
        f"CAST(FLOOR(CASE WHEN raw <= {2.5 * m!r} AND V > 0 "
        f"THEN {m} * LN(CAST({m} AS DOUBLE) / V) ELSE raw END + 0.5) AS BIGINT)"
    )


def hll_sql(source: str, col: str, p: int = 12, out: str = "approx_n") -> str:
    """Global approximate COUNT(DISTINCT col) — engine.ops.sketch twin.

    Mirrors hll_partial (splitmix64 → top-p-bit bucket, rho over the low
    64-p bits) + hll_estimate (exact integer register sum S, zero-count
    V, literal-identical float expressions)."""
    core = _hll_core(source, col, [], p)
    return f"WITH{core}\n      SELECT {_hll_estimate_expr(p)} AS {out} FROM e"


def hll_grouped_sql(
    source: str, keys: list[str], col: str, p: int = 12, out: str = "approx_n"
) -> str:
    """Per-group approximate COUNT(DISTINCT col) — grouped twin."""
    core = _hll_core(source, col, keys, p)
    klist = ", ".join(keys)
    return (
        f"WITH{core}\n      SELECT {klist}, {_hll_estimate_expr(p)} AS {out} FROM e"
    )


def approx_percentile_sql(
    source: str, col: str, qs: list[float], bins: int = 4096, out_prefix: str = "p"
) -> str:
    """engine.ops.sketch.approx_percentile twin: identical grid
    arithmetic ((v-lo)/w truncated — v≥lo so FLOOR — clipped to the last
    bin), exact integer cumulative counts, and the same bin-upper-edge
    readout ``lo + (b+1)*w`` evaluated from identical doubles."""
    sels = []
    for q in qs:
        name = f"{out_prefix}{round(q * 100)}"
        sels.append(
            f"p.lo + ((SELECT MIN(bin) FROM c WHERE cum >= "
            f"GREATEST(1, CAST(CEIL({q!r} * p.n) AS BIGINT))) + 1) * p.w AS {name}"
        )
    return f"""
      WITH p AS (SELECT MIN({col}) AS lo, MAX({col}) AS hi,
                        (MAX({col}) - MIN({col})) / {bins} AS w,
                        COUNT({col}) AS n
                 FROM {source}),
      b AS (SELECT LEAST(GREATEST(CAST(FLOOR(({col} - p.lo) / p.w) AS BIGINT), 0),
                         {bins - 1}) AS bin
            FROM {source}, p WHERE {col} IS NOT NULL),
      c AS (SELECT bin, SUM(COUNT(*)) OVER (ORDER BY bin) AS cum
            FROM b GROUP BY bin)
      SELECT {', '.join(sels)} FROM p"""


def _signed64(expr: str) -> str:
    """Reinterpret a UBIGINT expression as BIGINT (numpy view(int64))."""
    return (
        f"CAST(CAST({expr} AS HUGEINT) - CASE WHEN {expr} >= "
        f"{1 << 63}::UBIGINT THEN {_M64}::HUGEINT ELSE 0::HUGEINT END AS BIGINT)"
    )


def fingerprint_sql(
    source: str = "documents", id_col: str = "doc_id", text_col: str = "text", w: int = 5
) -> str:
    """engine.ops.text.fingerprint twin: FNV-1a/64 token hashes
    (list_reduce over codepoints — the corpus is ASCII so codepoint ==
    utf-8 byte), PAD-extension of short docs, the w-gram rolling
    polynomial Σ th[i+j]·B^(w-1-j) mod 2^64 (HUGEINT limb multiplies,
    5-term HUGEINT sum), and the per-doc MIN — all exact integers."""
    basis = 0xCBF29CE484222325
    pad = 0x9E3779B97F4A7C15
    prime = 1099511628211
    pows = [pow(prime, w - 1 - j, _M64) for j in range(w)]
    fnv_step = _mul64("CAST(xor(acc, cc) AS HUGEINT)", prime)
    terms = [_mul64(f"CAST(th[i + {j}] AS HUGEINT)", pows[j]) for j in range(w)]
    hsum = " + ".join(f"CAST({t} AS HUGEINT)" for t in terms)
    return f"""
      WITH d AS (SELECT {id_col}, COALESCE({text_col}, '') AS txt FROM {source}),
      tk0 AS (SELECT {id_col},
                list_transform(
                  list_filter(string_split_regex(txt, '\\s+'), t -> t <> ''),
                  t -> list_reduce(
                         list_prepend({basis}::UBIGINT,
                           list_transform(range(1, length(t) + 1),
                                          i -> CAST(ascii(t[i]) AS UBIGINT))),
                         (acc, cc) -> {fnv_step})) AS th0
              FROM d),
      tk AS (SELECT {id_col},
                    list_resize(th0, GREATEST(len(th0), {w}), {pad}::UBIGINT) AS th
             FROM tk0),
      g AS (SELECT {id_col},
                   list_aggregate(
                     list_transform(range(1, len(th) - {w - 2}),
                       i -> CAST(({hsum}) % {_M64}::HUGEINT AS UBIGINT)),
                     'min') AS hmin
            FROM tk)
      SELECT {id_col}, {_signed64('hmin')} AS doc_fp FROM g"""


def crc32_decode_sql(source: str = "documents", id_col: str = "doc_id",
                     text_col: str = "text") -> str:
    """engine.ops.multimodal fake-decode twin: zlib.crc32 of the payload
    bytes (the text's utf-8 bytes; ASCII corpus ⇒ codepoints) computed
    with the public reflected CRC-32 table — the table itself is built
    in SQL (8 shift/xor steps per entry via list_reduce), then one
    byte-per-step list_reduce per row. width/height/channels are the
    same integer expressions the decode stage applies to the crc."""
    return f"""
      WITH crc AS (SELECT list_transform(range(0, 256),
                     n -> list_reduce(
                            list_prepend(CAST(n AS UBIGINT),
                              list_transform(range(0, 8), k -> CAST(k AS UBIGINT))),
                            (c, k) -> CASE WHEN (c & 1) = 1
                                      THEN xor(c >> 1, 3988292384::UBIGINT)
                                      ELSE c >> 1 END)) AS tbl),
      d AS (SELECT {id_col}, COALESCE({text_col}, '') AS txt FROM {source}),
      c AS (SELECT {id_col}, txt,
                   CAST(xor(list_reduce(
                     list_prepend(4294967295::UBIGINT,
                       list_transform(range(1, length(txt) + 1),
                                      i -> CAST(ascii(txt[i]) AS UBIGINT))),
                     (acc, b) -> xor(acc >> 8, tbl[CAST(xor(acc & 255, b) AS BIGINT) + 1])),
                     4294967295::UBIGINT) AS BIGINT) AS checksum
            FROM d, crc)
      SELECT {id_col}, 'image/fake' AS media_type,
             CAST(strlen(txt) AS BIGINT) AS n_bytes, checksum,
             64 + checksum % 192 AS width,
             64 + (checksum >> 8) % 192 AS height,
             1 + checksum % 3 AS channels
      FROM c"""
