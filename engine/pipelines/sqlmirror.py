"""DuckDB SQL mirrors for the sketch / dedup / ANN / model operators —
the generators behind the registry's "zero rows-only" guarantee: every
engine pipeline, however algorithmic (HLL, MinHash/SimHash LSH, k-means,
IVF / PQ / IVF-PQ ANN, CRC-32, FNV fingerprints, bigram LM, model
scoring), has an independent DuckDB implementation the driver
value-hash-compares against.

Bit-exactness strategy (same as engine/cdc/sqloracle.py):

- all 64-bit wraparound arithmetic is done in HUGEINT limbs
  (``_sm64_cols`` / ``_mul64var``; byte×constant < 2^72 needs no limbs);
- every float expression consumes only EXACT integers plus literals and
  is written token-for-token like its Python twin (division, sqrt — IEEE
  correctly rounded), so evaluation matches bit-for-bit; rounding is
  always floor(x*1e6+0.5)/1e6 on both sides (np.round is half-even,
  DuckDB ROUND half-away);
- RNG-seeded constants (minhash permutations, model weights) are inlined
  as literals by the builder — the RNG itself never needs a mirror;
- iterative algorithms unroll as ``AS MATERIALIZED`` CTE chains (plain
  CTEs inline and go exponential when round t+1 references round t
  twice); the engine's early-convergence breaks are fixed points, so
  fully unrolled chains converge to the same result.

Cost notes: per-DISTINCT-value computation before per-row joins (HLL
dedups first; minhash permutes the tiny shingle vocabulary, not the
stream); DuckDB ``range()`` as a table function cannot be laterally
correlated — use scalar ``range()`` inside list_transform instead.
"""

from __future__ import annotations

from engine.cdc.sqloracle import _mul64, _sm64_cols

_M64 = 1 << 64
_M32 = 1 << 32
_MERSENNE = (1 << 61) - 1


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


_FNV_BASIS = 0xCBF29CE484222325
_FNV_PRIME = 1099511628211


def _fnv1a_expr(t: str = "t") -> str:
    """UBIGINT expression: FNV-1a/64 of token ``t``'s codepoints (ASCII
    corpus ⇒ codepoint == utf-8 byte) — engine.ops.text.fnv1a_tokens
    twin (list_reduce with a HUGEINT-limb wraparound multiply)."""
    step = _mul64("CAST(xor(acc, cc) AS HUGEINT)", _FNV_PRIME)
    return (
        f"list_reduce(list_prepend({_FNV_BASIS}::UBIGINT, "
        f"list_transform(range(1, length({t}) + 1), "
        f"i -> CAST(ascii({t}[i]) AS UBIGINT))), (acc, cc) -> {step})"
    )


def simhash_pairs_sql(
    source: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> str:
    """engine.ops.dedup SimHash near-dup twin: FNV-1a token hashes over
    lowercased whitespace tokens, per-bit majority votes, the 64-bit
    fingerprint, four 16-bit LSH bands (pigeonhole: Hamming ≤ 3 shares a
    band) and the exact popcount filter — all integer arithmetic."""
    return f"""
      WITH d AS (SELECT {id_col} AS did,
                        list_filter(string_split_regex(lower(COALESCE({text_col}, '')),
                                                       '\\s+'),
                                    t -> t <> '') AS toks
                 FROM {source}),
      th AS (SELECT did, len(toks) AS n,
                    list_transform(toks, t -> {_fnv1a_expr('t')}) AS hs
             FROM d),
      ex AS (SELECT did, n, unnest(hs) AS h FROM th),
      eb AS (SELECT did, n, r.b,
                    SUM(CAST((h >> CAST(r.b AS INTEGER)) & 1 AS BIGINT)) AS ones
             FROM ex, range(0, 64) r(b) GROUP BY did, n, r.b),
      sh0 AS (SELECT did,
                     CAST(SUM(CASE WHEN 2 * ones - n > 0
                              THEN CAST(1::UBIGINT << CAST(b AS INTEGER) AS HUGEINT)
                              ELSE 0::HUGEINT END) AS UBIGINT) AS sh
              FROM eb GROUP BY did),
      shx AS (SELECT d.did, COALESCE(sh0.sh, 0::UBIGINT) AS sh
              FROM d LEFT JOIN sh0 ON sh0.did = d.did),
      bd AS (SELECT did, sh, r.band,
                    (sh >> CAST(16 * r.band AS INTEGER)) & 65535 AS band_key
             FROM shx, range(0, 4) r(band)),
      p AS (SELECT DISTINCT l.did AS a, r2.did AS b,
                   CAST(bit_count(xor(l.sh, r2.sh)) AS BIGINT) AS hamming
            FROM bd l JOIN bd r2
              ON l.band = r2.band AND l.band_key = r2.band_key AND l.did < r2.did)
      SELECT a, b, hamming FROM p WHERE hamming <= {max_hamming}"""


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


def _mul64var(a: str, b: str) -> str:
    """SQL for ``(a * b) mod 2**64`` with BOTH operands runtime UBIGINT
    expressions — 32-bit limb products summed in HUGEINT (each partial
    < 2**64, the scaled middle term < 2**96, well inside HUGEINT)."""
    return (
        f"CAST(((CAST(({a}) % {_M32} AS HUGEINT) * (({b}) % {_M32})) + "
        f"(((CAST(({a}) // {_M32} AS HUGEINT) * (({b}) % {_M32}) + "
        f"CAST(({a}) % {_M32} AS HUGEINT) * (({b}) // {_M32})) % {_M32}) "
        f"* {_M32}::HUGEINT)) % {_M64}::HUGEINT AS UBIGINT)"
    )


def shingles_sql(txt: str = "txt", k: int = 5, base: int = 1_000_003) -> str:
    """List expression: distinct uint64 rolling-polynomial hashes of all
    k-char shingles of ``txt`` (space-padded to k) — the
    engine.ops.dedup.shingle_hashes twin (wrapping mod 2^64; ASCII
    corpus ⇒ ascii() == utf-8 byte)."""
    # byte < 2^8 and each constant < 2^64, so byte*C < 2^72 and the
    # 5-term sum < 2^75 — ONE direct HUGEINT multiply per term and ONE
    # final mod, no limb decomposition needed.
    terms = []
    for j in range(k):
        byte = (
            f"CAST((CASE WHEN i + {j} <= length({txt}) "
            f"THEN ascii({txt}[i + {j}]) ELSE 32 END) AS HUGEINT)"
        )
        terms.append(f"{byte} * {pow(base, k - 1 - j, _M64)}::HUGEINT")
    return (
        f"list_distinct(list_transform("
        f"range(1, GREATEST(length({txt}), {k}) - {k - 2}), "
        f"i -> CAST(({' + '.join(terms)}) % {_M64}::HUGEINT AS UBIGINT)))"
    )


def _minhash_cte(
    source: str,
    id_col: str,
    text_col: str,
    num_perm: int,
    bands: int,
    k: int,
    seed: int,
    base: int = 1_000_003,
) -> str:
    """WITH-clause body (no ``WITH`` keyword) ending in CTE ``res``
    (a, b, jaccard): the engine.ops.dedup MinHash+LSH near-dup chain —
    shingle hashes → the SAME (a·h + b) mod 2^64 mod (2^61-1)
    permutations (constants inlined from minhash_params — no RNG
    mirroring) → Horner band hashes → LSH self-join candidates →
    exact-Jaccard verify over the shingle sets. All integer arithmetic
    except the final inter/union division of exact integers; permutation
    values are computed per DISTINCT shingle (the corpus vocabulary is
    tiny relative to the shingle stream)."""
    from engine.ops.dedup import minhash_params

    a, b = minhash_params(num_perm, seed)
    r = num_perm // bands
    rows = ", ".join(
        f"({i}, {int(a[i])}::UBIGINT, {int(b[i])}::UBIGINT)" for i in range(num_perm)
    )
    # Horner multiplier for signature row j within its band: base^(r-1-j).
    pow_case = "CASE " + " ".join(
        f"WHEN perm % {r} = {j} THEN {pow(base, r - 1 - j, _M64)}::UBIGINT"
        for j in range(r)
    ) + " END"
    perm_hash = _mul64var("h", "pa")
    band_term = _mul64var("vmin", pow_case)
    return f"""
      d AS (SELECT {id_col} AS did, COALESCE({text_col}, '') AS txt FROM {source}),
      sh AS (SELECT did, {shingles_sql('txt', k, base)} AS s FROM d),
      ex AS (SELECT did, unnest(s) AS h FROM sh),
      perms AS (SELECT * FROM (VALUES {rows}) p(perm, pa, pb)),
      hd AS (SELECT DISTINCT h FROM ex),
      vh AS (SELECT h, perm,
                    CAST((CAST({perm_hash} AS HUGEINT) + pb) % {_M64}::HUGEINT
                         AS UBIGINT) % {_MERSENNE}::UBIGINT AS v
             FROM hd, perms),
      v AS (SELECT did, perm, MIN(v) AS vmin
            FROM ex JOIN vh USING (h) GROUP BY did, perm),
      bh AS (SELECT did, perm // {r} AS band,
                    CAST(SUM(CAST({band_term} AS HUGEINT)) % {_M64}::HUGEINT
                         AS UBIGINT) AS band_hash
             FROM v GROUP BY did, perm // {r}),
      cand AS (SELECT DISTINCT l.did AS a, r2.did AS b
               FROM bh l JOIN bh r2
                 ON l.band = r2.band AND l.band_hash = r2.band_hash
                    AND l.did < r2.did),
      jj AS (SELECT c.a, c.b,
                    len(list_intersect(sa.s, sb.s)) AS inter,
                    len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)) AS uni
             FROM cand c
             JOIN sh sa ON sa.did = c.a
             JOIN sh sb ON sb.did = c.b),
      res AS (SELECT a, b,
                     FLOOR((inter / uni) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
              FROM jj)"""


def minhash_pairs_sql(
    source: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    seed: int = 42,
) -> str:
    """Verified MinHash near-dup pairs (engine q_dedup_minhash twin)."""
    cte = _minhash_cte(source, id_col, text_col, num_perm, bands, k, seed)
    return f"WITH{cte}\n      SELECT a, b, jaccard FROM res WHERE jaccard >= {threshold!r}"


def lm_score_sql(
    source: str = "documents", id_col: str = "doc_id", text_col: str = "text",
    out: str = "lm_logprob",
) -> str:
    """engine.ops.text lm_score twin: corpus-wide char-bigram counts,
    the add-one-smoothed logprob table quantized to integer micro-nats
    (floor(x*1e6+0.5) — matching the engine), then per-doc exact integer
    sums and a float division of exact ints. ASCII corpus ⇒ codepoint
    pairs == utf-8 byte pairs."""
    pairs = (
        f"list_transform(range(1, length(txt)), "
        f"i -> ascii(txt[i]) * 256 + ascii(txt[i + 1]))"
    )
    return f"""
      WITH enc AS (SELECT {id_col}, COALESCE({text_col}, '') AS txt FROM {source}),
      bg AS (SELECT unnest({pairs}) AS pair FROM enc),
      cnts AS (SELECT pair, COUNT(*) AS c FROM bg GROUP BY pair),
      allp AS (SELECT r.p AS pair, COALESCE(c, 0) AS c
               FROM range(0, 65536) r(p) LEFT JOIN cnts ON cnts.pair = r.p),
      pref AS (SELECT pair // 256 AS hi, SUM(c) AS pc FROM allp GROUP BY pair // 256),
      lp AS (SELECT pair,
                    CAST(FLOOR((LN(c + 1.0) - LN(pc + 256.0)) * 1000000.0 + 0.5)
                         AS BIGINT) AS lpm
             FROM allp JOIN pref ON pref.hi = allp.pair // 256),
      db AS (SELECT {id_col}, unnest({pairs}) AS pair FROM enc),
      agg AS (SELECT {id_col}, SUM(lpm) AS s, COUNT(*) AS n
              FROM db JOIN lp USING (pair) GROUP BY {id_col})
      SELECT e.{id_col},
             CASE WHEN a.n > 0 THEN a.s / a.n ELSE 0.0 END AS {out},
             COALESCE(a.n, 0) AS {out}_n
      FROM enc e LEFT JOIN agg a USING ({id_col})"""


def cdc_dedup_index_sql(cfg) -> str:
    """engine q_cdc_dedup_index twin: the SQL changelog mirror's LWW
    state (engine/cdc/sqloracle.py) becomes the live corpus, doc ids are
    repo || chr(31) || path, and the MinHash-LSH CANDIDATE pair set is
    read off the same banding CTEs (no Jaccard verify — the index stores
    signatures, not texts). Composes the two validated mirrors."""
    from engine.cdc.sqloracle import events_cte

    mh = _minhash_cte("corpus", "did", "txt", 64, 16, 5, 42)
    return (
        "WITH "
        + events_cte(cfg)
        + """,
      w AS (SELECT e.*, row_number() OVER (PARTITION BY repo, path
                                           ORDER BY seq DESC) AS rn
            FROM events e),
      state AS (SELECT * FROM w WHERE rn = 1 AND op <> 'D'),
      corpus AS (SELECT concat(repo, chr(31), path) AS did, content AS txt
                 FROM state),"""
        + mh
        + "\n      SELECT a, b FROM cand"
    )


def minhash_clusters_sql(
    source: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    seed: int = 42,
) -> str:
    """Near-dup clusters: connected components (component = MIN doc id)
    over the verified MinHash pair graph — DuckDB's recursive-CTE
    transitive closure over the SAME pair set the engine's distributed
    min-label CC consumes (engine q_dedup_minhash_clusters twin)."""
    cte = _minhash_cte(source, id_col, text_col, num_perm, bands, k, seed)
    return f"""WITH RECURSIVE{cte},
      pe AS (SELECT a, b FROM res WHERE jaccard >= {threshold!r}),
      ed AS (SELECT a, b FROM pe UNION ALL SELECT b, a FROM pe),
      reach(node, lbl) AS (
        SELECT a, a FROM ed
        UNION
        SELECT ed.b, reach.lbl FROM reach JOIN ed ON ed.a = reach.node
      )
      SELECT node, MIN(lbl) AS component FROM reach GROUP BY node"""


def _kmeans_cte(
    k: int = 8,
    iters: int = 4,
    init_iters: int = 10,
    sample_n: int = 4096,
    seed: int = 42,
    dim: int = 64,
    source: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_prefix: str = "kmeans",
    with_assign: bool = True,
    seed_label: str | None = None,
) -> tuple[str, str]:
    """WITH-body replaying engine.ops.ann.kmeans bit-for-bit, ending in
    CTE ``asn`` (vid, cluster): quantized vectors → splitmix64 bottom-k
    sample (ORDER BY hash, id) → init = first k sample rows →
    ``init_iters`` integer-exact Lloyd rounds on the sample
    (build_centroids_int) → ``iters`` rounds on the FULL table → final
    assignment. Centroid updates are FLOOR(sum/n + 0.5) of exact int64
    sums; assignment is argmin(|c|² − 2v·c) with first-min (lowest
    cluster id) tie-break — both literal mirrors of the engine. The
    engine's early convergence break is a fixed point, so unrolling all
    rounds yields the same centroids."""
    import zlib

    mix = zlib.crc32((seed_label or f"{seed_prefix}-{seed}").encode()) | 1
    sm = ",\n               ".join(
        _sm64_cols("h", f"xor(CAST(vid AS UBIGINT), {mix}::UBIGINT)")
    )
    parts = [
        f"""
      v AS MATERIALIZED (SELECT {id_col} AS vid,
                   list_transform({vec_col},
                     x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
            FROM {source}),
      hh AS (SELECT vid, q, {sm} FROM v),
      smp AS MATERIALIZED (SELECT vid, q, row_number() OVER (ORDER BY h, vid) AS rn
              FROM hh QUALIFY rn <= {sample_n}),
      ve AS MATERIALIZED (SELECT vid, r.i - 1 AS dim, q[r.i] AS val
             FROM smp, range(1, {dim + 1}) r(i)),
      vf AS MATERIALIZED (SELECT vid, r.i - 1 AS dim, q[r.i] AS val
             FROM v, range(1, {dim + 1}) r(i)),
      c0 AS MATERIALIZED (SELECT rn - 1 AS cluster, r.i - 1 AS dim, q[r.i] AS val
             FROM smp, range(1, {dim + 1}) r(i) WHERE rn <= {k})"""
    ]
    t = 0
    for phase, rounds in (("ve", init_iters), ("vf", iters)):
        for _ in range(rounds):
            parts.append(f"""
      d{t} AS MATERIALIZED (SELECT e.vid, c.cluster,
                      SUM(c.val * c.val) - 2 * SUM(e.val * c.val) AS dd
               FROM {phase} e JOIN c{t} c USING (dim)
               GROUP BY e.vid, c.cluster),
      a{t} AS MATERIALIZED (SELECT vid, cluster FROM (
                 SELECT vid, cluster,
                        row_number() OVER (PARTITION BY vid
                                           ORDER BY dd, cluster) AS rnk
                 FROM d{t}) WHERE rnk = 1),
      g{t} AS MATERIALIZED (SELECT a.cluster, e.dim, SUM(e.val) AS s, COUNT(*) AS n
               FROM a{t} a JOIN {phase} e USING (vid)
               GROUP BY a.cluster, e.dim),
      c{t + 1} AS MATERIALIZED (SELECT c.cluster, c.dim,
                          COALESCE(CAST(FLOOR(g.s / g.n + 0.5) AS BIGINT),
                                   c.val) AS val
                   FROM c{t} c LEFT JOIN g{t} g
                     ON g.cluster = c.cluster AND g.dim = c.dim)""")
            t += 1
    if with_assign:
        parts.append(f"""
      dfin AS MATERIALIZED (SELECT e.vid, c.cluster,
                      SUM(c.val * c.val) - 2 * SUM(e.val * c.val) AS dd
               FROM vf e JOIN c{t} c USING (dim)
               GROUP BY e.vid, c.cluster),
      asn AS (SELECT vid, cluster FROM (
                SELECT vid, cluster,
                       row_number() OVER (PARTITION BY vid
                                          ORDER BY dd, cluster) AS rnk
                FROM dfin) WHERE rnk = 1)""")
    return ",".join(parts), f"c{t}"


def kmeans_counts_sql(**kw) -> str:
    """Per-cluster member counts — engine q_kmeans twin."""
    body, _ = _kmeans_cte(**kw)
    return f"WITH{body}\n      SELECT cluster, COUNT(*) AS n FROM asn GROUP BY cluster"


def cluster_balanced_sample_sql(knuth: int = 2654435761, mod: int = 4294967296, **kw) -> str:
    """engine q_cluster_balanced_sample twin: k-means assignment →
    per-cluster keep rate capped at the FLOOR(median) cluster size →
    Knuth multiplicative-hash row selection (the mix_domains rule)."""
    cte, _ = _kmeans_cte(**kw)
    return f"""WITH{cte},
      cnt AS (SELECT cluster, COUNT(*) AS n FROM asn GROUP BY cluster),
      tgt AS (SELECT CAST(FLOOR(MEDIAN(n)) AS BIGINT) AS target FROM cnt),
      thr AS (SELECT cluster,
                     CAST(FLOOR(LEAST(1.0, target / n) * {mod}) AS BIGINT) AS t
              FROM cnt, tgt)
      SELECT a.vid AS vec_id, a.cluster
      FROM asn a JOIN thr ON thr.cluster = a.cluster
      WHERE (a.vid * {knuth}) % {mod} < thr.t"""


def cosine_pairs_sql(
    threshold: float = 0.4,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    sample_n: int = 2048,
    dim: int = 64,
    source: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """engine.ops.ann.cosine_near_dup_pairs twin: integer-exact routing
    cells (the k-means init mirror, init Lloyd only), top-n_probe cell
    assignment (ties to the lower cell id), DISTINCT shared-cell pairs,
    and the exact integer dot/norm² cosine — the only floats are the
    final sqrt/divide of exact ints (IEEE correctly rounded, so both
    sides produce identical doubles)."""
    body, cfin = _kmeans_cte(
        k=n_cells, iters=0, init_iters=10, sample_n=sample_n, seed=seed,
        dim=dim, source=source, id_col=id_col, vec_col=vec_col,
        seed_prefix="cnd", with_assign=False,
    )
    return f"""WITH{body},
      dp AS MATERIALIZED (SELECT e.vid, c.cluster,
                SUM(c.val * c.val) - 2 * SUM(e.val * c.val) AS dd
             FROM vf e JOIN {cfin} c USING (dim)
             GROUP BY e.vid, c.cluster),
      cells AS (SELECT vid, cluster FROM (
                  SELECT vid, cluster,
                         row_number() OVER (PARTITION BY vid
                                            ORDER BY dd, cluster) AS rnk
                  FROM dp) WHERE rnk <= {n_probe}),
      cp AS (SELECT DISTINCT l.vid AS a, r.vid AS b
             FROM cells l JOIN cells r
               ON l.cluster = r.cluster AND l.vid < r.vid),
      nrm AS MATERIALIZED (SELECT vid, SUM(val * val) AS nn
                           FROM vf GROUP BY vid),
      dots AS (SELECT cp.a, cp.b, SUM(ea.val * eb.val) AS dot
               FROM cp JOIN vf ea ON ea.vid = cp.a
                       JOIN vf eb ON eb.vid = cp.b AND eb.dim = ea.dim
               GROUP BY cp.a, cp.b),
      cres AS (SELECT d.a, d.b,
                      FLOOR((d.dot / GREATEST(sqrt(CAST(na.nn AS DOUBLE)
                                                   * CAST(nb.nn AS DOUBLE)),
                                              1e-12))
                            * 1000000.0 + 0.5) / 1000000.0 AS cos
               FROM dots d JOIN nrm na ON na.vid = d.a
                           JOIN nrm nb ON nb.vid = d.b)
      SELECT a, b, cos FROM cres WHERE cos >= {threshold!r}"""


def pq_knn_sql(
    k: int = 5,
    n_sub: int = 8,
    n_centroids: int = 256,
    sample_n: int = 1024,
    dim: int = 64,
    max_qid: int = 5,
    iters: int = 10,
    source: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """engine q_ann_pq twin: per-subspace integer codebooks
    (build_pq_codebook_int — all subspaces trained in lockstep via a
    subspace column, 10 unrolled Lloyd rounds of MATERIALIZED CTEs),
    nearest-code assignment, per-query lookup tables
    (list_inner_product of quantized subvectors) and the ADC
    gather-sum top-k — exact int64 end to end."""
    import zlib

    mix = zlib.crc32(b"pq-codebook") | 1
    sub = dim // n_sub
    sm = ",\n               ".join(
        _sm64_cols("h", f"xor(CAST(vid AS UBIGINT), {mix}::UBIGINT)")
    )
    subvec = f"list_transform(range(s.s * {sub} + 1, s.s * {sub} + {sub + 1}), j -> q[j])"
    parts = [f"""
      v AS MATERIALIZED (SELECT {id_col} AS vid,
            list_transform({vec_col},
              x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
          FROM {source}),
      hh AS (SELECT vid, q, {sm} FROM v),
      smp AS MATERIALIZED (SELECT vid, q,
               row_number() OVER (ORDER BY h, vid) AS rn
             FROM hh QUALIFY rn <= {sample_n}),
      sva AS MATERIALIZED (SELECT vid, rn, s.s, {subvec} AS sv
             FROM smp, range(0, {n_sub}) s(s)),
      vea AS MATERIALIZED (SELECT vid, s, j.i - 1 AS dim, sv[j.i] AS val
             FROM sva, range(1, {sub + 1}) j(i)),
      c0 AS MATERIALIZED (SELECT s, rn - 1 AS cluster, sv
            FROM sva WHERE rn <= {n_centroids})"""]
    t = 0
    for _ in range(iters):
        parts.append(f"""
      d{t} AS MATERIALIZED (SELECT v.vid, v.s, c.cluster,
               list_inner_product(c.sv, c.sv)
                 - 2 * list_inner_product(v.sv, c.sv) AS dd
             FROM sva v JOIN c{t} c USING (s)),
      a{t} AS MATERIALIZED (SELECT vid, s, cluster FROM (
               SELECT vid, s, cluster,
                      row_number() OVER (PARTITION BY vid, s
                                         ORDER BY dd, cluster) AS rnk
               FROM d{t}) WHERE rnk = 1),
      g{t} AS (SELECT a.s, a.cluster, e.dim, SUM(e.val) AS sm_, COUNT(*) AS n
             FROM a{t} a JOIN vea e ON e.vid = a.vid AND e.s = a.s
             GROUP BY a.s, a.cluster, e.dim),
      c{t + 1} AS MATERIALIZED (SELECT s, cluster, list(val ORDER BY dim) AS sv
             FROM (SELECT c.s, c.cluster, d.i - 1 AS dim,
                          COALESCE(CAST(FLOOR(g.sm_ / g.n + 0.5) AS BIGINT),
                                   c.sv[d.i]) AS val
                   FROM c{t} c CROSS JOIN range(1, {sub + 1}) d(i)
                   LEFT JOIN g{t} g ON g.s = c.s AND g.cluster = c.cluster
                                    AND g.dim = d.i - 1)
             GROUP BY s, cluster)""")
        t += 1
    parts.append(f"""
      fsa AS MATERIALIZED (SELECT vid, s.s, {subvec} AS sv
             FROM v, range(0, {n_sub}) s(s)),
      fd AS MATERIALIZED (SELECT v.vid, v.s, c.cluster,
               list_inner_product(c.sv, c.sv)
                 - 2 * list_inner_product(v.sv, c.sv) AS dd
             FROM fsa v JOIN c{t} c USING (s)),
      codes AS MATERIALIZED (SELECT vid, s, cluster AS code FROM (
               SELECT vid, s, cluster,
                      row_number() OVER (PARTITION BY vid, s
                                         ORDER BY dd, cluster) AS rnk
               FROM fd) WHERE rnk = 1),
      lut AS MATERIALIZED (SELECT qv.vid AS qid, qv.s, c.cluster,
               list_inner_product(qv.sv, c.sv) AS w
             FROM fsa qv JOIN c{t} c USING (s) WHERE qv.vid < {max_qid}),
      sc AS (SELECT l.qid, cd.vid, SUM(l.w) AS score
             FROM codes cd JOIN lut l ON l.s = cd.s AND l.cluster = cd.code
             GROUP BY l.qid, cd.vid)
      SELECT query_id, id, score FROM (
        SELECT qid AS query_id, vid AS id, CAST(score AS BIGINT) AS score,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY score DESC, vid) AS rn
        FROM sc) WHERE rn <= {k}""")
    return "WITH" + ",".join(parts)


def ivfpq_knn_sql(
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    n_sub: int = 8,
    n_centroids: int = 64,
    sample_n: int = 1024,
    dim: int = 64,
    max_qid: int = 5,
    iters: int = 10,
    source: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """engine q_ann_ivfpq twin — the composed index replayed end to end:
    integer coarse cells (k-means init mirror, seed label
    'ivf-centroids'), residual PQ codebooks trained in lockstep on the
    sample residuals, corpus cell assignment + residual codes, per-
    (query, probed-cell) lookup tables, and the ADC gather-sum top-k.
    Exact int64 everywhere."""
    body, cfin = _kmeans_cte(
        k=n_cells, iters=0, init_iters=10, sample_n=sample_n, dim=dim,
        source=source, id_col=id_col, vec_col=vec_col,
        with_assign=False, seed_label="ivf-centroids",
    )
    sub = dim // n_sub
    subvec = f"list_transform(range(s.s * {sub} + 1, s.s * {sub} + {sub + 1}), j -> rq[j])"
    parts = [body + f""",
      cl AS MATERIALIZED (SELECT cluster, list(val ORDER BY dim) AS cv
            FROM {cfin} GROUP BY cluster),
      sd AS MATERIALIZED (SELECT e.vid, c.cluster,
               SUM(c.val * c.val) - 2 * SUM(e.val * c.val) AS dd
             FROM ve e JOIN {cfin} c USING (dim) GROUP BY e.vid, c.cluster),
      sasn AS (SELECT vid, cluster FROM (
               SELECT vid, cluster, row_number() OVER (PARTITION BY vid
                                                       ORDER BY dd, cluster) AS rnk
               FROM sd) WHERE rnk = 1),
      smpr AS MATERIALIZED (SELECT s2.vid, s2.rn,
               list_transform(range(1, {dim + 1}), j -> s2.q[j] - cl.cv[j]) AS rq
             FROM smp s2 JOIN sasn a ON a.vid = s2.vid
                         JOIN cl ON cl.cluster = a.cluster),
      rsva AS MATERIALIZED (SELECT vid, rn, s.s, {subvec} AS sv
             FROM smpr, range(0, {n_sub}) s(s)),
      rvea AS MATERIALIZED (SELECT vid, s, j.i - 1 AS dim, sv[j.i] AS val
             FROM rsva, range(1, {sub + 1}) j(i)),
      rc0 AS MATERIALIZED (SELECT s, rn - 1 AS cluster, sv
            FROM rsva WHERE rn <= {n_centroids})"""]
    t = 0
    for _ in range(iters):
        parts.append(f"""
      rd{t} AS MATERIALIZED (SELECT v2.vid, v2.s, c.cluster,
               list_inner_product(c.sv, c.sv)
                 - 2 * list_inner_product(v2.sv, c.sv) AS dd
             FROM rsva v2 JOIN rc{t} c USING (s)),
      ra{t} AS MATERIALIZED (SELECT vid, s, cluster FROM (
               SELECT vid, s, cluster,
                      row_number() OVER (PARTITION BY vid, s
                                         ORDER BY dd, cluster) AS rnk
               FROM rd{t}) WHERE rnk = 1),
      rg{t} AS (SELECT a.s, a.cluster, e.dim, SUM(e.val) AS sm_, COUNT(*) AS n
             FROM ra{t} a JOIN rvea e ON e.vid = a.vid AND e.s = a.s
             GROUP BY a.s, a.cluster, e.dim),
      rc{t + 1} AS MATERIALIZED (SELECT s, cluster, list(val ORDER BY dim) AS sv
             FROM (SELECT c.s, c.cluster, d.i - 1 AS dim,
                          COALESCE(CAST(FLOOR(g.sm_ / g.n + 0.5) AS BIGINT),
                                   c.sv[d.i]) AS val
                   FROM rc{t} c CROSS JOIN range(1, {sub + 1}) d(i)
                   LEFT JOIN rg{t} g ON g.s = c.s AND g.cluster = c.cluster
                                     AND g.dim = d.i - 1)
             GROUP BY s, cluster)""")
        t += 1
    parts.append(f"""
      dv AS MATERIALIZED (SELECT e.vid, c.cluster,
               SUM(c.val * c.val) - 2 * SUM(e.val * c.val) AS dd
             FROM vf e JOIN {cfin} c USING (dim) GROUP BY e.vid, c.cluster),
      asnv AS MATERIALIZED (SELECT vid, cluster FROM (
               SELECT vid, cluster, row_number() OVER (PARTITION BY vid
                                                       ORDER BY dd, cluster) AS rnk
               FROM dv) WHERE rnk = 1),
      fr AS MATERIALIZED (SELECT v2.vid, a.cluster AS cell,
               list_transform(range(1, {dim + 1}), j -> v2.q[j] - cl.cv[j]) AS rq
             FROM v v2 JOIN asnv a ON a.vid = v2.vid
                       JOIN cl ON cl.cluster = a.cluster),
      ffa AS MATERIALIZED (SELECT vid, cell, s.s, {subvec} AS sv
             FROM fr, range(0, {n_sub}) s(s)),
      fcd AS MATERIALIZED (SELECT v2.vid, v2.cell, v2.s, c.cluster,
               list_inner_product(c.sv, c.sv)
                 - 2 * list_inner_product(v2.sv, c.sv) AS dd
             FROM ffa v2 JOIN rc{t} c USING (s)),
      codes AS MATERIALIZED (SELECT vid, cell, s, cluster AS code FROM (
               SELECT vid, cell, s, cluster,
                      row_number() OVER (PARTITION BY vid, s
                                         ORDER BY dd, cluster) AS rnk
               FROM fcd) WHERE rnk = 1),
      qcell AS (SELECT qid, cluster FROM (
               SELECT vid AS qid, cluster,
                      row_number() OVER (PARTITION BY vid
                                         ORDER BY dd, cluster) AS rnk
               FROM dv WHERE vid < {max_qid}) WHERE rnk <= {n_probe}),
      qoff AS MATERIALIZED (SELECT p.qid, p.cluster AS cell,
               list_inner_product(q2.q, cl.cv) AS off
             FROM qcell p JOIN v q2 ON q2.vid = p.qid
                          JOIN cl ON cl.cluster = p.cluster),
      qrq AS (SELECT vid AS qid, q AS rq FROM v WHERE vid < {max_qid}),
      qsv AS (SELECT qid, s.s, {subvec} AS sv
             FROM qrq, range(0, {n_sub}) s(s)),
      lut AS MATERIALIZED (SELECT q2.qid, q2.s, c.cluster,
               list_inner_product(q2.sv, c.sv) AS w
             FROM qsv q2 JOIN rc{t} c USING (s)),
      scw AS (SELECT l.qid, cd.vid, cd.cell, SUM(l.w) AS sw
             FROM codes cd
             JOIN lut l ON l.s = cd.s AND l.cluster = cd.code
             GROUP BY l.qid, cd.vid, cd.cell),
      sc AS (SELECT s2.qid, s2.vid, o.off + s2.sw AS score
             FROM scw s2 JOIN qoff o ON o.qid = s2.qid AND o.cell = s2.cell)
      SELECT query_id, id, score FROM (
        SELECT qid AS query_id, vid AS id, CAST(score AS BIGINT) AS score,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY score DESC, vid) AS rn
        FROM sc) WHERE rn <= {k}""")
    return "WITH" + ",".join(parts)


def model_score_sql(
    source: str = "documents", id_col: str = "doc_id", text_col: str = "text",
    seed: int = 42, vocab: int = 1024,
) -> str:
    """engine.ops.model twin: char-trigram counts × the micro-quantized
    first-dimension projection weights (inlined as 1024 literals from
    model_weights_micro — the RNG never needs a SQL mirror), exact int64
    sum, float division by (n_trigrams · 1e6). ASCII corpus ⇒ codepoint
    == utf-8 byte; short docs zero-pad to 3 bytes like the engine."""
    from engine.ops.model import model_weights_micro

    w = model_weights_micro(seed=seed, vocab=vocab)
    rows = ", ".join(f"({i}, {int(w[i])})" for i in range(vocab))
    byte = (
        "CASE WHEN i + {o} <= length(t) THEN ascii(t[i + {o}]) ELSE 0 END"
    )
    tri = (
        f"(({byte.format(o=0)}) * 961 + ({byte.format(o=1)}) * 31 + "
        f"({byte.format(o=2)})) % {vocab}"
    )
    return f"""
      WITH wt AS (SELECT * FROM (VALUES {rows}) w(tri, w)),
      d AS (SELECT {id_col},
                   CASE WHEN {text_col} IS NULL OR {text_col} = ''
                        THEN '  ' ELSE {text_col} END AS t
            FROM {source}),
      tg AS (SELECT {id_col}, GREATEST(length(t), 3) - 2 AS n,
                    unnest(list_transform(range(1, GREATEST(length(t), 3) - 1),
                                          i -> {tri})) AS tri
             FROM d),
      agg AS (SELECT {id_col}, n, SUM(w) AS s
              FROM tg JOIN wt USING (tri) GROUP BY {id_col}, n)
      SELECT {id_col},
             FLOOR((s / (n * 1000000.0)) * 1000000.0 + 0.5) / 1000000.0
               AS model_score
      FROM agg"""


def ivf_knn_sql(
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    sample_n: int = 1024,
    dim: int = 64,
    max_qid: int = 5,
    source: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """engine q_ann_ivf twin: integer k-means routing cells (init Lloyd
    mirror, seed label 'ivf-centroids'), per-query top-n_probe cell set,
    integer cell assignment over the corpus, then the brute quantized
    inner-product top-k restricted to kept vectors (same scoring as the
    proven q_ann_bruteforce oracle)."""
    body, cfin = _kmeans_cte(
        k=n_cells, iters=0, init_iters=10, sample_n=sample_n, dim=dim,
        source=source, id_col=id_col, vec_col=vec_col,
        with_assign=False, seed_label="ivf-centroids",
    )
    return f"""WITH{body},
      qd AS (SELECT e.vid AS qid, c.cluster,
                    SUM(c.val * c.val) - 2 * SUM(e.val * c.val) AS dd
             FROM vf e JOIN {cfin} c USING (dim)
             WHERE e.vid < {max_qid} GROUP BY e.vid, c.cluster),
      probe AS (SELECT DISTINCT cluster FROM (
                  SELECT qid, cluster,
                         row_number() OVER (PARTITION BY qid
                                            ORDER BY dd, cluster) AS rnk
                  FROM qd) WHERE rnk <= {n_probe}),
      dv AS MATERIALIZED (SELECT e.vid, c.cluster,
                SUM(c.val * c.val) - 2 * SUM(e.val * c.val) AS dd
             FROM vf e JOIN {cfin} c USING (dim) GROUP BY e.vid, c.cluster),
      asnv AS (SELECT vid, cluster FROM (
                 SELECT vid, cluster,
                        row_number() OVER (PARTITION BY vid
                                           ORDER BY dd, cluster) AS rnk
                 FROM dv) WHERE rnk = 1),
      kept AS (SELECT a.vid FROM asnv a JOIN probe p USING (cluster))
      SELECT query_id, id, score FROM (
        SELECT a.vid AS query_id, b.vid AS id,
               CAST(list_inner_product(a.q, b.q) AS BIGINT) AS score,
               row_number() OVER (PARTITION BY a.vid
                                  ORDER BY list_inner_product(a.q, b.q) DESC,
                                           b.vid) AS rn
        FROM v a, v b
        WHERE a.vid < {max_qid} AND b.vid IN (SELECT vid FROM kept)
      ) WHERE rn <= {k}"""


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
