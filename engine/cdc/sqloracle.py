"""DuckDB SQL mirror of the synthetic changelog + LWW replay (VERDICT r4 #1).

The changelog is a pure function of ``(seed, global index i)`` via the
public splitmix64 finalizer (engine/cdc/synth.py), so the whole event
stream — and therefore the replayed final lake state — is expressible in
ANSI SQL over ``generate_series`` + the ``documents`` view the driver
pre-registers. This module GENERATES that SQL from a
:class:`~engine.cdc.synth.SynthConfig`, giving the CDC flagship queries
real value-hash oracles in the driver's correctness harness (previously
the whole Layer C was rows-only / pytest-verified).

Mechanics mirrored exactly:

- splitmix64 — 64-bit wraparound multiplies emulated in HUGEINT by
  32-bit limb decomposition (DuckDB integer ``*`` raises on overflow);
  xors/shifts on UBIGINT. Validated bit-exact against the numpy
  implementation over the full index range (test_sqloracle.py).
- key/op/repo/path/content derivation — including the hot-repo split,
  op-mix cuts, doc-base join (row_number over doc_id), and the exact
  f-string renderings (printf mirrors %03d/%05d/%06x).
- Row-mode LWW — window argmax over seq with D-exclusion; additive
  schema evolution as seq-gated NULL backfill.
- Column-mode LWW (patch updates) — per-key D-barrier, then per-column
  latest-non-null fold (arg_max over determining events). Exact for
  synth streams (I events carry non-null payloads; only U events are
  patch-nulled), matching engine/cdc/oracle.py's sequential semantics.
- content_sha256 — DuckDB ``sha256()`` over the SQL-derived content
  (both hash the UTF-8 bytes).

Every generated query is schema-compatible with the matching
``queries()`` entry (same column names — the driver hashes values after
sorting columns by name, __ray_entry__.py docstring).
"""

from __future__ import annotations

from engine.cdc.synth import SynthConfig

_M64 = 1 << 64
_M32 = 1 << 32

_GAMMA = 0x9E3779B97F4A7C15
_C1 = 0xBF58476D1CE4E5B9
_C2 = 0x94D049BB133111EB
_C3 = 0xFD70A2F0E0BF7D5B

# Stream constants (synth._events_for_range): x = i ^ (seed * K).
K_KEY, K_OP, K_REV = 0x10001, 0x20003, 0x30005
K_BAD = 0x90021
K_PATCH0 = 0x7001B  # + 2*j for payload column j ∈ (commit, lang, content)


def _mul64(a: str, b: int) -> str:
    """SQL for ``(a * b) mod 2**64`` with ``a`` a HUGEINT-safe expression
    and ``b`` an int constant — 32-bit limb products summed in HUGEINT
    (each partial < 2**65, far inside HUGEINT range)."""
    b_lo, b_hi = b % _M32, b // _M32
    return (
        f"CAST(((({a}) % {_M32}) * {b_lo} + "
        f"((((({a}) // {_M32}) * {b_lo} + (({a}) % {_M32}) * {b_hi}) % {_M32})"
        f" * {_M32}::HUGEINT)) % {_M64}::HUGEINT AS UBIGINT)"
    )


def _sm64_cols(p: str, x_expr: str) -> list[str]:
    """Lateral-alias column chain computing ``splitmix64(x_expr)`` into
    column ``p`` (DuckDB allows referencing an alias defined earlier in
    the same SELECT)."""
    return [
        f"CAST((CAST({x_expr} AS HUGEINT) + {_GAMMA}) % {_M64}::HUGEINT "
        f"AS UBIGINT) AS {p}_a",
        f"{_mul64(f'CAST({p}_a AS HUGEINT)', _C1)} AS {p}_b",
        f"xor({p}_b, {p}_b >> 30) AS {p}_c",
        f"{_mul64(f'CAST({p}_c AS HUGEINT)', _C2)} AS {p}_d",
        f"xor({p}_d, {p}_d >> 27) AS {p}_e",
        f"{_mul64(f'CAST({p}_e AS HUGEINT)', _C3)} AS {p}_f",
        f"xor({p}_f, {p}_f >> 31) AS {p}",
    ]


def _stream(p: str, seed: int, k: int) -> list[str]:
    return _sm64_cols(p, f"xor(CAST(t.i AS UBIGINT), {seed * k}::UBIGINT)")


def epoch_size(cfg: SynthConfig) -> int:
    return (cfg.n_events + cfg.n_epochs - 1) // cfg.n_epochs


def events_cte(cfg: SynthConfig, upto_epoch: int | None = None) -> str:
    """WITH-clause body defining ``events`` — the VALID changelog events
    (the engine's validator / the sequential oracle skip the same rows)
    with columns (seq, op, repo, path, lang, content[, size_bytes]).
    Patch nulls (update_mode='column' streams) are applied to
    commit/lang/content when cfg.patch_null_frac > 0 (the commit column
    itself is not emitted — no registered query reads it)."""
    n = cfg.n_events if upto_epoch is None else min(
        cfg.n_events, (upto_epoch + 1) * epoch_size(cfg)
    )
    hot_keys = max(1, cfg.n_keys // cfg.n_repos)
    cold_keys = max(1, cfg.n_keys - hot_keys)
    n_cold_repos = max(1, cfg.n_repos - 1)
    i_cut, u_cut = cfg.op_mix[0], cfg.op_mix[0] + cfg.op_mix[1]

    cols = ["t.i AS seq"]
    cols += _stream("u_key", cfg.seed, K_KEY)
    cols += _stream("u_op", cfg.seed, K_OP)
    cols += _stream("u_rev", cfg.seed, K_REV)
    hot = f"(u_key % 1000000) < {cfg.hot_event_frac * 1e6!r}"
    cols.append(
        f"CAST(CASE WHEN {hot} THEN (u_key >> 20) % {hot_keys} "
        f"ELSE {hot_keys} + (u_key >> 20) % {cold_keys} END AS BIGINT) AS key"
    )
    cols.append(
        f"CASE WHEN (u_op % 100) < {i_cut} THEN 'I' "
        f"WHEN (u_op % 100) < {u_cut} THEN 'U' ELSE 'D' END AS op0"
    )
    cols.append(f"CAST(u_rev % 100000 AS BIGINT) AS rev")
    if cfg.bad_event_frac > 0:
        cols += _stream("u_bad", cfg.seed, K_BAD)
        cols.append(
            f"((u_bad % 1000000) < {cfg.bad_event_frac * 1e6!r}) AS is_bad"
        )
    else:
        cols.append("FALSE AS is_bad")
    if cfg.patch_null_frac > 0:
        for j, name in enumerate(("commit", "lang", "content")):
            cols += _stream(f"u_m{j}", cfg.seed, K_PATCH0 + 2 * j)
            cols.append(
                f"(op0 = 'U' AND (u_m{j} % 1000000) < "
                f"{cfg.patch_null_frac * 1e6!r}) AS null_{name}"
            )
    else:
        for name in ("commit", "lang", "content"):
            cols.append(f"FALSE AS null_{name}")

    raw = (
        f"SELECT {', '.join(cols)} FROM generate_series(0, {n - 1}) t(i)"
    )
    # Doc bases: sorted by doc_id, text truncated to max_content_chars
    # chars (null → ''), lang null/empty → 'txt' (synth._load_doc_bases).
    docs = (
        "SELECT row_number() OVER (ORDER BY doc_id) - 1 AS d, "
        f"substr(coalesce(text, ''), 1, {cfg.max_content_chars}) AS base, "
        "CASE WHEN lang IS NULL OR lang = '' THEN 'txt' ELSE lang END AS dlang "
        "FROM documents"
    )
    content = (
        "base || chr(10) || '// key=' || key || ' seq=' || seq "
        "|| ' rev=' || rev"
    )
    derived = [
        "r.seq AS seq",
        "r.op0 AS op",
        (
            f"CASE WHEN r.key < {hot_keys} THEN 'repo-000' ELSE "
            f"printf('repo-%03d', 1 + r.key % {n_cold_repos}) END AS repo"
        ),
        "printf('src/d%05d/f%06x.%s', d.d, r.key, d.dlang) AS path",
        "CASE WHEN r.null_lang THEN NULL ELSE d.dlang END AS lang",
        f"CASE WHEN r.null_content THEN NULL ELSE {content} END AS content",
    ]
    if cfg.evolve_at_epoch is not None:
        lo = cfg.evolve_at_epoch * epoch_size(cfg)
        derived.append(
            f"CASE WHEN r.seq >= {lo} AND NOT r.null_content "
            f"THEN length({content}) END AS size_bytes"
        )
    # Bad events: half unknown-op, half null key — the validator (and
    # the sequential oracle) skip BOTH, so the SQL just drops them.
    return (
        f"docs AS ({docs}), "
        f"nd AS (SELECT count(*) AS n FROM documents), "
        f"raw AS ({raw}), "
        f"events AS (SELECT {', '.join(derived)} "
        f"FROM raw r CROSS JOIN nd JOIN docs d ON d.d = r.key % nd.n "
        f"WHERE NOT r.is_bad)"
    )


def state_query(
    cfg: SynthConfig,
    select: str,
    upto_epoch: int | None = None,
    events_where: str | None = None,
) -> str:
    """Prepend the changelog + row-mode LWW CTE chain to an arbitrary
    final SELECT over ``state`` (columns: seq, op, repo, path, lang,
    content[, size_bytes]) — for aggregate-shaped oracles (summaries,
    per-lang counts) that don't fit the fixed projection of
    :func:`lww_state_sql`. ``events_where`` filters the EVENT stream
    before the LWW window (the ingestion-expectations mirror: a
    quarantined event never contends, so an older surviving event wins
    instead)."""
    ew = f" WHERE {events_where}" if events_where else ""
    return (
        f"WITH {events_cte(cfg, upto_epoch)}, "
        "w AS (SELECT e.*, row_number() OVER "
        f"(PARTITION BY repo, path ORDER BY seq DESC) AS rn FROM events e{ew}), "
        "state AS (SELECT * FROM w WHERE rn = 1 AND op <> 'D') "
        f"{select}"
    )


def lww_state_sql(
    cfg: SynthConfig,
    columns: list[str],
    upto_epoch: int | None = None,
    where: str | None = None,
    extra: dict[str, str] | None = None,
    events_where: str | None = None,
) -> str:
    """Final row-mode lake state: per-key max-seq winner, D excluded.
    ``columns`` picks the output projection; content_sha256 / size_bytes
    are derived (sha256 of winner content; seq-gated evolution NULLs).
    ``extra`` maps additional output names to SQL expressions over the
    ``state`` CTE's columns."""
    sel = {
        "repo": "repo",
        "path": "path",
        "seq": "seq",
        "lang": "lang",
        "content": "content",
        "content_sha256": "sha256(content) AS content_sha256",
        "n_chars": "length(content) AS n_chars",
        "lang_u": "upper(coalesce(lang, '??')) AS lang_u",
        "size_bytes": "size_bytes",
    }
    for name, expr in (extra or {}).items():
        sel[name] = f"{expr} AS {name}"
    proj = ", ".join(sel[c] for c in columns)
    q = f"SELECT {proj} FROM state"
    if where:
        q += f" WHERE {where}"
    return state_query(cfg, q, upto_epoch, events_where=events_where)


def patch_state_sql(cfg: SynthConfig, columns: list[str]) -> str:
    """Final column-mode (patch) lake state. Semantics mirror the
    sequential oracle (engine/cdc/oracle.py): D is a full barrier; a key
    is live iff any I/U follows its last D; each payload column takes
    its value from the latest post-barrier determining event (I, or U
    with the column non-null); the row's seq is the latest post-barrier
    I/U seq. Exact for synth streams, where I events are never
    patch-nulled."""
    sel = {
        "repo": "f.repo",
        "path": "f.path",
        "seq": "f.seq",
        "content_sha256": "sha256(c.content) AS content_sha256",
    }
    proj = ", ".join(sel[c] for c in columns)
    return (
        f"WITH {events_cte(cfg)}, "
        "bar AS (SELECT repo, path, "
        "coalesce(max(CASE WHEN op = 'D' THEN seq END), -1) AS dseq "
        "FROM events GROUP BY repo, path), "
        "post AS (SELECT e.* FROM events e JOIN bar b USING (repo, path) "
        "WHERE e.seq > b.dseq), "
        "fin AS (SELECT repo, path, max(seq) AS seq FROM post "
        "WHERE op IN ('I', 'U') GROUP BY repo, path), "
        "cval AS (SELECT repo, path, arg_max(content, seq) AS content "
        "FROM post WHERE op = 'I' OR (op = 'U' AND content IS NOT NULL) "
        "GROUP BY repo, path) "
        f"SELECT {proj} FROM fin f "
        "LEFT JOIN cval c USING (repo, path)"
    )


def pid_sql(col: str, num_partitions: int) -> str:
    """SQL mirror of engine.util.hashing.stable_hash_str % P (the lake's
    pid assignment): first 8 bytes of sha256(utf8) big-endian — DuckDB
    parses the hex prefix exactly via CAST('0x…' AS UBIGINT)."""
    return (
        f"CAST(CAST('0x' || substr(sha256({col}), 1, 16) AS UBIGINT) "
        f"% {num_partitions} AS BIGINT)"
    )


def lineage_sql(cfg: SynthConfig, num_partitions: int) -> str:
    """Per-(epoch, pid) lineage mirror for a ROW-mode replay: events_in /
    seq bounds are plain group aggregates; upserts/deletes count each
    key's EPOCH-level LWW winner by op (exactly what MergeApply reports);
    rows_out is the partition's cumulative live-key count after the
    epoch (rewrite semantics — delta mode reports the same rows_out via
    its merge-on-read)."""
    es = epoch_size(cfg)
    ks = ", ".join(f"({k})" for k in range(cfg.n_epochs))
    return (
        f"WITH {events_cte(cfg)}, "
        f"e2 AS (SELECT e.*, CAST(e.seq // {es} AS BIGINT) AS epoch, "
        f"{pid_sql('e.repo', num_partitions)} AS pid FROM events e), "
        "w AS (SELECT e2.*, row_number() OVER (PARTITION BY epoch, repo, path "
        "ORDER BY seq DESC) AS rn FROM e2), "
        "agg AS (SELECT epoch, pid, count(*) AS events_in, min(seq) AS seq_lo, "
        "max(seq) AS seq_hi FROM e2 GROUP BY epoch, pid), "
        "winners AS (SELECT epoch, pid, "
        "CAST(count(*) FILTER (WHERE op <> 'D') AS BIGINT) AS upserts, "
        "CAST(count(*) FILTER (WHERE op = 'D') AS BIGINT) AS deletes "
        "FROM w WHERE rn = 1 GROUP BY epoch, pid), "
        f"cum AS (SELECT k, pid, CAST(count(*) AS BIGINT) AS rows_out FROM ("
        f"SELECT ep.k AS k, e2.pid AS pid, e2.op AS op, "
        f"row_number() OVER (PARTITION BY ep.k, e2.repo, e2.path "
        f"ORDER BY e2.seq DESC) AS rn FROM e2 JOIN (VALUES {ks}) ep(k) "
        f"ON e2.seq < (ep.k + 1) * {es}) "
        "WHERE rn = 1 AND op <> 'D' GROUP BY k, pid) "
        "SELECT a.epoch, a.pid, a.seq_lo, a.seq_hi, "
        "CAST(a.events_in AS BIGINT) AS events_in, w.upserts, w.deletes, "
        "coalesce(c.rows_out, 0) AS rows_out "
        "FROM agg a JOIN winners w USING (epoch, pid) "
        "LEFT JOIN cum c ON c.k = a.epoch AND c.pid = a.pid"
    )


def enrich_sql(cfg: SynthConfig, epoch: int) -> str:
    """Epoch-``epoch``'s change events (repo, path, seq) left-joined
    against the FINAL lake state's content_sha256 — the stream-table
    enrichment mirror (engine/cdc/enrich.py over a replay-only lake)."""
    lo, hi = epoch * epoch_size(cfg), (epoch + 1) * epoch_size(cfg)
    return state_query(
        cfg,
        f"SELECT e.repo, e.path, e.seq, s.content_sha256 "
        f"FROM (SELECT repo, path, seq FROM events "
        f"WHERE seq >= {lo} AND seq < {hi}) e "
        f"LEFT JOIN (SELECT repo, path, sha256(content) AS content_sha256 "
        f"FROM state) s USING (repo, path)",
    )


def changefeed_sql(cfg: SynthConfig, from_epoch: int) -> str:
    """Changefeed(from_epoch → latest) as (repo, path, op, seq): I for
    keys live only in the new state, U for keys whose winning seq
    changed, D (old seq + 1) for keys that disappeared — exactly
    bootstrap._diff_tables' event stream for a replay-only history."""
    cut = (from_epoch + 1) * epoch_size(cfg)
    return (
        f"WITH {events_cte(cfg)}, "
        "w AS (SELECT e.*, row_number() OVER "
        "(PARTITION BY repo, path ORDER BY seq DESC) AS rn FROM events e), "
        "new_s AS (SELECT repo, path, seq FROM w WHERE rn = 1 AND op <> 'D'), "
        f"w0 AS (SELECT e.*, row_number() OVER "
        f"(PARTITION BY repo, path ORDER BY seq DESC) AS rn "
        f"FROM events e WHERE e.seq < {cut}), "
        "old_s AS (SELECT repo, path, seq FROM w0 WHERE rn = 1 AND op <> 'D') "
        "SELECT n.repo, n.path, "
        "CASE WHEN o.seq IS NULL THEN 'I' ELSE 'U' END AS op, n.seq AS seq "
        "FROM new_s n LEFT JOIN old_s o USING (repo, path) "
        "WHERE o.seq IS NULL OR o.seq <> n.seq "
        "UNION ALL "
        "SELECT o.repo, o.path, 'D' AS op, o.seq + 1 AS seq "
        "FROM old_s o LEFT JOIN new_s n USING (repo, path) "
        "WHERE n.seq IS NULL"
    )
