"""Joins and lookups (SURVEY.md §2.4 J1–J4).

Strategy selection is explicit (there is no optimizer — the caller knows
the sides' sizes):

- **broadcast_join** (J1): small right side `ray.put` once; every task
  reads the same object-store copy and joins per batch with Arrow's
  hash-join kernel. No shuffle.
- **shuffle_join** (J2): both sides large → tag, union, hash-partition by
  key (`groupby(key)`), join within each key-group. An explicit
  partitioned hash join (ray_guide "Joins and lookups").
- **semi/anti** (J3): broadcast the key set, vectorized `is_in` mask.
- **asof_join** (J4): co-shuffle on the `by` key, `pandas.merge_asof`
  within each group (sorted by time). Partitioning assumption: one
  group = one `by` value, which must fit a worker.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

_BCAST_CACHE: dict[bytes, object] = {}
_BCAST_CACHE_MAX = 4  # bounded LRU-ish: interleaved broadcast refs on one
# worker (e.g. IVF centroids + query matrix) must not evict each other.


def _ensure_arrow(ds: rd.Dataset) -> tuple[rd.Dataset, pa.Schema]:
    """Return the dataset with Arrow blocks plus its Arrow schema
    (pandas-backed datasets — e.g. from_pandas — are converted).

    Schema inference on a LAZY pipeline containing a shuffle would
    execute the whole upstream plan just to read the schema and then
    re-execute it for the real run (measured 6x on the minhash-verify
    chain); such inputs are materialized once — distributed, in the
    object store, at a boundary where Ray would materialize for the
    shuffle anyway — and the blocks reused."""
    s = ds.schema(fetch_if_missing=False)
    base = getattr(s, "base_schema", None) if s is not None else None
    if isinstance(base, pa.Schema):
        return ds, base
    if s is None:
        # No cheap schema → materialize ONCE and read it from block
        # metadata. Sampling instead (ds.schema() on the lazy chain)
        # executes the upstream plan for the sample and AGAIN for the
        # real run (testdata parquets are single-row-group, so the
        # sample reads the whole file; measured 6x on the minhash-verify
        # chain). Every caller feeds an exchange next, which would
        # materialize anyway — same peak footprint, one execution.
        ds = ds.materialize()
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return ds, base
    first = s
    ds = ds.map_batches(lambda t: t, batch_format="pyarrow")
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return ds, base
    # Dataset produced no rows (a filter can legitimately match nothing).
    # If a pandas block schema survived, convert its dtypes — an empty
    # side must still join (contributing zero rows), not crash. Columns
    # whose dtype carries no Arrow type (object) degrade to null and are
    # re-resolved against the other side by _union_fields.
    for cand in (s, first):
        names = getattr(cand, "names", None)
        types = getattr(cand, "types", None)
        if names and types is not None:
            fields = []
            for n, t in zip(names, types):
                if isinstance(t, pa.DataType):
                    fields.append(pa.field(n, t))
                    continue
                if t is None:
                    # Ray's Schema.types yields None when a pandas
                    # extension dtype (e.g. Int64) has no direct Arrow
                    # mapping; np.dtype(None) would silently mean
                    # float64 — degrade to null and let _union_fields
                    # resolve the concrete type from the other side.
                    fields.append(pa.field(n, pa.null()))
                    continue
                try:
                    npdt = getattr(t, "numpy_dtype", None) or np.dtype(t)
                    fields.append(pa.field(n, pa.from_numpy_dtype(npdt)))
                except (TypeError, pa.ArrowNotImplementedError):
                    fields.append(pa.field(n, pa.null()))
            schema = pa.schema(fields)
            # This fallback only fires when the pipeline yielded no
            # Arrow rows. If the side is verifiably empty, re-root it as
            # a concrete empty Arrow dataset: the bare map_batches chain
            # loses ALL schema metadata on a second materialization, so
            # a downstream _ensure_arrow (e.g. shuffle_join re-keying
            # this side inside _shuffled_semi) would have nothing left
            # to infer from and raise (hypothesis-found: empty Int64
            # left through the shuffled semi route).
            mat = ds.materialize()
            if mat.count() == 0:
                return rd.from_arrow(schema.empty_table()), schema
            return mat, schema
    raise ValueError(
        "cannot infer an Arrow schema: dataset produced no rows "
        "(empty filtered read?) and no schema metadata survived"
    )


def _schema_from_blocks(ds: rd.Dataset) -> tuple[rd.Dataset, pa.Schema | None]:
    """Schema from the first NON-EMPTY materialized block. Ray 2.49's
    sampled ``schema()`` can report a stale pre-Project schema when the
    first sampled block is empty (the sampling plan inserts limit=1
    before the Projects); real blocks are always right."""
    ds = ds.materialize()
    for b in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        if b.num_rows:
            return ds, b.schema
    return ds, None


def _keyed_arrow(ds: rd.Dataset, keys: list[str]) -> tuple[rd.Dataset, pa.Schema]:
    """_ensure_arrow + stale-schema guard: if any join key is missing
    from the inferred schema, re-derive it from actual blocks.

    Known limitation: a stale schema that still CONTAINS the keys (the
    projection only dropped non-key columns) passes the guard, and the
    tagged union then carries extra all-null columns for the dropped
    names — detectable downstream as surplus columns, not silent value
    corruption. Unconditional block-derived schemas would fix it but
    force materializing large map-only inputs."""
    ds, schema = _ensure_arrow(ds)
    if any(k not in schema.names for k in keys) or any(
        pa.types.is_null(f.type) for f in schema
    ):
        # Keys missing, or a field degraded to the null type (an EMPTY
        # pandas block — e.g. an empty hash bucket — sampled as the
        # schema): re-derive from the first non-empty real block.
        ds, real = _schema_from_blocks(ds)
        if real is not None:
            schema = real
    return ds, schema


def _union_fields(
    lschema: pa.Schema, rschema: pa.Schema, lcols: list[str], rcols: list[str]
) -> list[pa.Field]:
    """Unified tagged-union schema for the co-partitioned joins. A field
    present on both sides takes the first CONCRETE (non-null) type — an
    all-null column (e.g. an Int64 pandas column with no valid values)
    degrades to Arrow's ``null`` type, which Acero rejects in key fields
    and casts can't target. If both sides are all-null the field falls
    back to int64: every value is null, so any concrete type joins
    equivalently (null keys never match)."""

    def resolve(name: str) -> pa.Field:
        lt = lschema.field(name).type if name in lcols else None
        rt = rschema.field(name).type if name in rcols else None
        t = lt
        if t is None or pa.types.is_null(t):
            t = rt if (rt is not None and not pa.types.is_null(rt)) else t
        if t is None or pa.types.is_null(t):
            t = pa.int64()
        return pa.field(name, t)

    return [resolve(n) for n in lcols] + [resolve(n) for n in rcols if n not in lcols]


def _cached_get(ref: ray.ObjectRef):
    """Worker-process cache so each worker deserializes a broadcast table
    once, not once per batch."""
    key = ref.binary()
    if key not in _BCAST_CACHE:
        while len(_BCAST_CACHE) >= _BCAST_CACHE_MAX:
            _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))  # evict oldest
        _BCAST_CACHE[key] = ray.get(ref)
    return _BCAST_CACHE[key]


def broadcast_join(
    ds: rd.Dataset,
    small: pa.Table,
    keys: list[str],
    join_type: str = "inner",
    right_keys: list[str] | None = None,
    suffix_overlapping: bool = False,
) -> rd.Dataset:
    """Join a Dataset against an in-memory dimension table, shuffle-free.
    ``small`` is put in the object store ONCE; tasks read it zero-copy.

    ``suffix_overlapping``: rename non-key ``small`` columns that collide
    with the batch's columns to ``<name>_r`` (the shuffle path's naming),
    decided per batch from the batch's own schema. This keeps the left
    side fully lazy — reading the left schema upfront costs an extra
    sample execution of the whole upstream chain (the testdata parquets
    are single-row-group, so a schema sample reads the entire file)."""
    # Normalize this engine's join-type names to Acero's (a bare "left"
    # through the auto_join broadcast gate raised "Unsupported join type").
    join_type = {
        "left": "left outer",
        "right": "right outer",
        "outer": "full outer",
        "full": "full outer",
    }.get(join_type, join_type)
    ref = ray.put(small)
    keyset = set(right_keys or keys)

    def _join(t: pa.Table) -> pa.Table:
        dim = _cached_get(ref)
        if suffix_overlapping:
            ren = [
                c + "_r" if (c in t.column_names and c not in keyset) else c
                for c in dim.column_names
            ]
            if ren != dim.column_names:
                dim = dim.rename_columns(ren)  # metadata-only
        out = t.join(
            dim,
            keys=keys,
            right_keys=right_keys or keys,
            join_type=join_type,
        )
        return out.combine_chunks()

    return ds.map_batches(_join, batch_format="pyarrow")


def _top_key_share(ds: rd.Dataset, key: str, sample_rows: int = 65_536) -> float:
    """Estimated share of the hottest key in a BOUNDED prefix sample
    (limit() early-stops the scan; the pull is capped at sample_rows of
    one column). A heuristic only: it picks the join ROUTE, never the
    result — both routes are result-identical, so a miss costs time,
    not correctness."""
    s = ds.select_columns([key]).limit(sample_rows).to_pandas()[key]
    if len(s) == 0:
        return 0.0
    vc = s.value_counts(dropna=True)
    return float(vc.iloc[0]) / float(len(s)) if len(vc) else 0.0


def auto_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str | list[str],
    join_type: str = "inner",
    broadcast_threshold_rows: int = 200_000,
    num_buckets: int = 64,
    detect_skew: bool = True,
    skew_share_threshold: float = 0.2,
    skew_salts: int = 8,
) -> rd.Dataset:
    """Size-based strategy pick between :func:`broadcast_join` and
    :func:`shuffle_join` (the engine has no optimizer — this helper stops
    a caller from broadcasting a fact table by mistake). The right side
    is materialized once (Ray would materialize it for either strategy's
    shuffle/broadcast anyway); if its row count is at or under the
    threshold AND the join type allows it (broadcast handles inner/left —
    right/outer need unmatched-right tracking, which the shuffle path
    owns), the blocks are pulled into one Arrow table and broadcast;
    otherwise the bucketed shuffle join runs. The driver pull is gated by
    the count, never attempted blind.

    Skew routing: on the shuffle path with a single-column key, a
    bounded prefix sample of the left key estimates the hottest key's
    share; at or above ``skew_share_threshold`` the join routes through
    :func:`salted_join` (the hot key spreads over ``skew_salts``
    sub-buckets instead of melting one worker). The chosen route is
    recorded in ``auto_join.last_strategy`` for tests/diagnostics."""
    import ray as _ray

    keys = [key] if isinstance(key, str) else list(key)
    right = right.materialize()
    if right.count() <= broadcast_threshold_rows and join_type in ("inner", "left"):
        blocks = [
            t if isinstance(t, pa.Table) else pa.Table.from_pandas(t)
            for t in _ray.get(right.to_arrow_refs())
        ]
        # Zero-row blocks carry an empty schema (Ray quirk) — drop them
        # before concat or the schemas "differ".
        nonempty = [t for t in blocks if t.num_rows > 0]
        if not nonempty:
            auto_join.last_strategy = "shuffle"
            return shuffle_join(left, right, key, join_type, num_buckets=num_buckets)
        small = pa.concat_tables(nonempty)
        auto_join.last_strategy = "broadcast"
        # suffix_overlapping renames colliding right columns to "_r" (the
        # shuffle path's naming) per batch — the left side stays LAZY; an
        # upfront left-schema read here cost an extra sample execution of
        # the whole left chain (measured ~2-3 s of q_tpch_q10's wall).
        return broadcast_join(
            left, small, keys=keys, join_type=join_type, suffix_overlapping=True
        )
    if detect_skew and isinstance(key, str):
        # Materialize the left ONCE up front (the shuffle/salted join's
        # _keyed_arrow would anyway) so the skew probe reads blocks
        # instead of executing a prefix of the lazy chain that the real
        # join then re-executes.
        left, _ = _keyed_arrow(left, keys)
        share = _top_key_share(left, key)
        if share >= skew_share_threshold:
            auto_join.last_strategy = "salted"
            return salted_join(
                left, right, key, join_type,
                num_salts=skew_salts, num_buckets=num_buckets,
            )
    auto_join.last_strategy = "shuffle"
    return shuffle_join(left, right, key, join_type, num_buckets=num_buckets)


def distributed_keyset(ds: rd.Dataset, key: str) -> pa.Table:
    """Build a semi/anti-join key set from a LARGE Dataset: distributed
    distinct first, then a driver pull bounded by the distinct key
    cardinality — never the table's row count (the broadcast-semi-join
    contract: the key set, not the table, must fit the driver)."""
    from engine.ops.agg import distinct
    from engine.util.collect import nan_to_null, pull_arrow

    partials = _unique_partials(ds, key)
    if partials.count() <= _PARTIAL_PULL_THRESHOLD:
        tbl = pull_arrow(partials)
        if tbl is None:
            return pa.table({key: []})
        return pa.table({key: pc.unique(nan_to_null(tbl.column(key)))})
    tbl = pull_arrow(distinct(ds.select_columns([key]), [key]))
    if tbl is None:
        return pa.table({key: []})
    return pa.table({key: nan_to_null(tbl.column(key))})


# Max combiner-output rows pulled to the driver before falling back to a
# distributed exchange distinct: one key column, so ~16 MB at 2M int64
# rows — well under driver heap, well over every dimension-side build.
_PARTIAL_PULL_THRESHOLD = 2_000_000


def _unique_partials(ds: rd.Dataset, key: str) -> rd.Dataset:
    """Per-batch Arrow unique of one column — the distinct COMBINER
    without the exchange. Output size is bounded by
    blocks x min(block_rows, key cardinality); the caller gates the pull
    on the actual count. Arrow-native, so integer keys keep their type
    (the pandas combiner degrades null-bearing ints to float/NaN)."""
    return ds.select_columns([key]).map_batches(
        lambda t: pa.table({key: pc.unique(t.column(key))}),
        batch_format="pyarrow",
    ).materialize()


def auto_semi_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_key: str,
    right_key: str | None = None,
    anti: bool = False,
    broadcast_threshold_keys: int = 200_000,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Size-gated semi/anti join of ``left`` against ``right``'s key
    column. A distributed distinct runs first; its COUNT picks the
    strategy: at or under the threshold the key set is pulled to the
    driver and broadcast (shuffle-free ``is_in`` mask via
    :func:`semi_join`); above it the membership test runs as a bucketed
    co-partitioned shuffle (the q_tpch_q4 form) and the key set never
    touches the driver. Results are identical on both paths (SQL
    IN / NOT IN three-valued NULL semantics), which the path-agreement
    test asserts."""
    right_key = right_key or left_key
    from engine.ops.agg import distinct
    from engine.util.collect import nan_to_null, pull_arrow

    auto_semi_join.last_strategy = None
    # Combiner-first: per-batch Arrow unique collapses the key column
    # before any exchange. When the combiner output is pull-bounded, the
    # exact key set is finished on the driver — no distributed distinct
    # (its sort exchange costs ~4 s of fixed overhead even on a 20k-row
    # dimension side; measured on q_tpch_q9's part build at sf0.1).
    partials = _unique_partials(right, right_key)
    if partials.count() <= _PARTIAL_PULL_THRESHOLD:
        tbl = pull_arrow(partials)
        vals = (
            pc.unique(nan_to_null(tbl.column(right_key)))
            if tbl is not None
            else pa.array([])
        )
        if len(vals) <= broadcast_threshold_keys:
            auto_semi_join.last_strategy = "broadcast"
            return semi_join(left, pa.table({left_key: vals}), left_key, anti=anti)
        auto_semi_join.last_strategy = "shuffle"
        dk = rd.from_arrow(pa.table({right_key: vals}))
        return _shuffled_semi(left, dk, left_key, right_key, anti, num_buckets)
    # Combiner output itself is huge — exchange distinct, old gates.
    dk = distinct(right.select_columns([right_key]), [right_key]).materialize()
    if dk.count() <= broadcast_threshold_keys:
        auto_semi_join.last_strategy = "broadcast"
        tbl = pull_arrow(dk)
        vals = nan_to_null(tbl.column(right_key)) if tbl is not None else pa.array([])
        return semi_join(left, pa.table({left_key: vals}), left_key, anti=anti)
    auto_semi_join.last_strategy = "shuffle"
    return _shuffled_semi(left, dk, left_key, right_key, anti, num_buckets)


def _shuffled_semi(
    left: rd.Dataset,
    dk: rd.Dataset,
    left_key: str,
    right_key: str,
    anti: bool,
    num_buckets: int,
) -> rd.Dataset:
    """Distributed membership filter: the DISTINCT key set co-partitions
    with the left side through the bucketed exchange. Semi = inner join
    against the distinct keys (no duplication — keys are unique; a NULL
    left key never matches, per SQL IN). Anti = left join against the
    marked key set, keep unmatched valid-key rows; a NULL anywhere in
    the key set makes NOT IN unsatisfiable, checked with one distributed
    fold over the (already small-per-bucket) distinct set."""
    left, lschema = _keyed_arrow(left, [left_key])
    key_type = lschema.field(left_key).type

    def _conform(t: pa.Table) -> pa.Table:
        # distinct() runs through pandas, which degrades null-bearing int
        # keys to float64/NaN — repair NaN back to typed null and restore
        # the left key's type so the exchange hashes both sides equally.
        col = t.column(right_key)
        if pa.types.is_floating(col.type) and not pa.types.is_floating(key_type):
            col = pc.if_else(pc.is_nan(col), pa.scalar(None, col.type), col)
        if pa.types.is_null(key_type):
            # An EMPTY left side degrades its key to the null type; keep
            # the key set's own concrete type (nothing can match anyway,
            # and casting int64 → null is not a thing).
            return pa.table({left_key: col})
        return pa.table({left_key: pc.cast(col, key_type)})

    keys_ds = dk.map_batches(_conform, batch_format="pyarrow")
    if not anti:
        # Drop null keys from the set up front: a NULL is never IN, and
        # the pandas merge fallback would otherwise match NaN==NaN.
        nonnull = keys_ds.map_batches(
            lambda t: t.filter(pc.is_valid(t.column(left_key))),
            batch_format="pyarrow",
        )
        return shuffle_join(left, nonnull, key=left_key, join_type="inner",
                            num_buckets=num_buckets)

    nulls = keys_ds.map_batches(
        lambda t: pa.table(
            {"__n": pa.array([t.column(left_key).null_count], pa.int64())}
        ),
        batch_format="pyarrow",
    ).sum("__n")
    if nulls:
        return left.limit(0)

    marked = keys_ds.map_batches(
        lambda t: t.append_column("__m", pa.array(np.ones(t.num_rows, np.int64))),
        batch_format="pyarrow",
    )
    j = shuffle_join(left, marked, key=left_key, join_type="left", num_buckets=num_buckets)

    def _unmatched(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_null(t.column("__m")), pc.is_valid(t.column(left_key)))
        return t.filter(m).drop_columns(["__m"])

    return j.map_batches(_unmatched, batch_format="pyarrow")


def semi_join(ds: rd.Dataset, keys_table: pa.Table, key: str, anti: bool = False) -> rd.Dataset:
    """IN / NOT IN filter against a broadcast key set, with SQL
    three-valued NULL semantics: a NULL left key is never IN and never
    NOT IN (dropped both ways); a NULL inside the key set makes NOT IN
    unsatisfiable for every row (x <> NULL is unknown), so the anti side
    returns empty."""
    key_set = pc.unique(keys_table.column(key))
    set_has_null = bool(pc.any(pc.is_null(key_set)).as_py()) if len(key_set) else False
    key_set = key_set.drop_null()
    ref = ray.put(key_set)

    def _mask(t: pa.Table) -> pa.Table:
        if anti and set_has_null:
            return t.slice(0, 0)
        ks = _cached_get(ref)
        m = pc.is_in(t.column(key), value_set=ks)
        if anti:
            m = pc.and_(pc.invert(m), pc.is_valid(t.column(key)))
        return t.filter(m)

    return ds.map_batches(_mask, batch_format="pyarrow")


def shuffle_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str | list[str],
    join_type: str = "inner",
    suffixes: tuple[str, str] = ("", "_r"),
    num_buckets: int = 64,
) -> rd.Dataset:
    """Partitioned hash join of two large Datasets on ``key`` (a single
    column or a composite-key list): tag sides, union (schemas unioned
    with typed nulls), co-partition into ``num_buckets`` hash buckets of
    the key tuple, vectorized pandas merge within each bucket. Bucketing
    (instead of one group per key) keeps the per-group Python overhead
    at O(buckets), not O(distinct keys); a pathologically hot key still
    lands in one bucket — salt upstream."""
    keys = [key] if isinstance(key, str) else list(key)
    left, lschema = _keyed_arrow(left, keys)
    right, rschema = _keyed_arrow(right, keys)
    lcols, rcols = list(lschema.names), list(rschema.names)
    union_fields = _union_fields(lschema, rschema, lcols, rcols)
    target = pa.schema(union_fields + [pa.field("__side", pa.int64())])

    def _tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = []
            for f in target:
                if f.name == "__side":
                    cols.append(pa.array([side] * n, pa.int64()))
                elif f.name in t.column_names:
                    cols.append(t.column(f.name).cast(f.type))
                else:
                    cols.append(pa.nulls(n, type=f.type))
            out = pa.table(cols, schema=target)
            from engine.util.hashing import fast_hash_column

            # Bucket on ARROW string casts of the (already type-unified)
            # key columns. A pandas round-trip here is wrong: a null-bearing
            # int64 key becomes float64 in to_pandas, so one side hashes
            # "1.0"/"nan" while the other hashes "1" — equal keys land in
            # different buckets and silently never meet.
            parts = [
                pc.fill_null(pc.cast(out.column(k), pa.string()), "\x00") for k in keys
            ]
            kcat = (
                parts[0]
                if len(parts) == 1
                else pc.binary_join_element_wise(*parts, "\x1f")
            )
            bucket = fast_hash_column(kcat, num_buckets, seed="join")
            return out.append_column("__bucket", pa.array(bucket, pa.int64()))

        return fn

    u = left.map_batches(_tag(0), batch_format="pyarrow").union(
        right.map_batches(_tag(1), batch_format="pyarrow")
    )

    type_of = {f.name: f.type for f in union_fields}

    def _restore_types(out: pd.DataFrame) -> pd.DataFrame:
        # The tagged union nulls the absent side's columns (pandas →
        # float); restore Arrow-faithful dtypes so a left/outer join's
        # int columns stay integers (nullable Int64), not 10.0/NaN.
        for c in out.columns:
            t = type_of.get(c.removesuffix(suffixes[1]) if c.endswith(suffixes[1]) and suffixes[1] else c, type_of.get(c))
            if t is None:
                continue
            if pa.types.is_integer(t):
                out[c] = out[c].astype("Int64")
            elif pa.types.is_timestamp(t):
                out[c] = out[c].astype("datetime64[us]")
        return out

    # Arrow-native per-bucket join (Acero hash join): type-exact output —
    # no pandas NaN upcasts to repair. Acero cannot carry list-typed
    # payload columns (CLAUDE.md measured fact), so those fall back to
    # the pandas merge + dtype-restore path.
    has_list = any(
        pa.types.is_list(f.type) or pa.types.is_large_list(f.type) for f in union_fields
    )
    acero_type = {"inner": "inner", "left": "left outer", "right": "right outer",
                  "outer": "full outer"}[join_type]
    out_cols = lcols + [
        (c + suffixes[1] if c in lcols else c) for c in rcols if c not in keys
    ]

    def _fix_types_arrow(j: pa.Table) -> pa.Table:
        # Ray's sort shuffle may normalize mixed-format inputs to pandas
        # blocks, upcasting null-bearing int columns to float64 before
        # they reach this bucket; cast back to the declared field types
        # (NaN → typed null for integer targets).
        for i, c in enumerate(j.column_names):
            base = c.removesuffix(suffixes[1]) if suffixes[1] and c.endswith(suffixes[1]) else c
            want = type_of.get(base, type_of.get(c))
            col = j.column(i)
            if want is None or col.type == want:
                continue
            if pa.types.is_floating(col.type):
                col = pc.if_else(pc.is_nan(col), pa.scalar(None, col.type), col)
            j = j.set_column(i, c, pc.cast(col, want))
        return j

    def _join_bucket_arrow(t: pa.Table) -> pa.Table:
        # Repair types BEFORE Acero, not just after: the sort exchange can
        # normalize a block to pandas, which turns an all-null column
        # (e.g. the absent side's typed nulls in a single-side block) into
        # Arrow's `null` type and null-bearing ints into float64 — Acero
        # rejects null-typed non-key fields outright.
        l = _fix_types_arrow(t.filter(pc.equal(t.column("__side"), 0)).select(lcols))
        r = _fix_types_arrow(t.filter(pc.equal(t.column("__side"), 1)).select(rcols))
        j = l.join(
            r, keys=keys, join_type=acero_type, right_suffix=suffixes[1]
        )
        return _fix_types_arrow(j.select(out_cols)).combine_chunks()

    def _join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["__side"] == 0][lcols]
        r = df[df["__side"] == 1][rcols]
        how = {"inner": "inner", "left": "left", "right": "right", "outer": "outer"}[join_type]
        return _restore_types(l.merge(r, on=keys, how=how, suffixes=suffixes))

    if not has_list:
        return u.groupby("__bucket").map_groups(
            lambda t: _join_bucket_arrow(t.drop_columns("__bucket")),
            batch_format="pyarrow",
        )

    return u.groupby("__bucket").map_groups(_join_bucket, batch_format="pandas")


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    by: str,
    right_on: str | None = None,
    right_by: str | None = None,
    direction: str = "backward",
) -> rd.Dataset:
    """As-of join: for each left row, the latest right row with
    ``right_on <= on`` within the same ``by`` group (direction=backward).
    Co-shuffles both sides into O(num_buckets) hash buckets of the
    by-key (not one Ray group per key value); within a bucket a single
    ``pd.merge_asof(..., by=)`` call handles every key vectorized."""
    right_on = right_on or on
    right_by = right_by or by
    left, lschema = _keyed_arrow(left, [on, by])
    right, rschema = _keyed_arrow(right, [right_on, right_by])
    lcols, rcols = list(lschema.names), list(rschema.names)
    # Unified schema for the tagged union: left fields + right-only fields
    # + side tag + join key (typed nulls for the absent side's columns).
    union_fields = _union_fields(lschema, rschema, lcols, rcols)
    target = pa.schema(union_fields + [pa.field("__side", pa.int64())])

    def _tag(side: int, key_from: str):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = []
            for f in target:
                if f.name == "__side":
                    cols.append(pa.array([side] * n, pa.int64()))
                elif f.name in t.column_names:
                    cols.append(t.column(f.name).cast(f.type))
                else:
                    cols.append(pa.nulls(n, type=f.type))
            out = pa.table(cols, schema=target)
            return out.append_column("__k", t.column(key_from))

        return fn

    u = left.map_batches(_tag(0, by), batch_format="pyarrow").union(
        right.map_batches(_tag(1, right_by), batch_format="pyarrow")
    )

    type_of = {f.name: f.type for f in union_fields}

    def _restore_types(out: pd.DataFrame) -> pd.DataFrame:
        # The tagged union makes every column nullable (pandas → float);
        # restore Arrow-faithful dtypes (nullable Int64 for int columns).
        for c in out.columns:
            t = type_of.get(c)
            if t is None:
                continue
            if pa.types.is_integer(t):
                out[c] = out[c].astype("Int64")
            elif pa.types.is_timestamp(t):
                out[c] = out[c].astype("datetime64[us]")
        return out

    # Right-side output columns: drop overlaps with the left (e.g. the
    # by-key itself) so the merge never suffixes; keep the right_on key.
    rkeep = [c for c in rcols if c not in lcols or c == right_on]

    def _asof(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["__side"] == 0][["__k"] + lcols].sort_values(on, kind="mergesort")
        r = df[df["__side"] == 1][["__k"] + rkeep].sort_values(right_on, kind="mergesort")
        # Align datetime precisions (upstream groupbys can downcast to [s]).
        for frame, col in ((l, on), (r, right_on)):
            if str(frame[col].dtype).startswith("datetime64"):
                frame[col] = frame[col].astype("datetime64[us]")
        if l.empty:
            return _restore_types(l.drop(columns="__k"))
        out = pd.merge_asof(
            l, r, left_on=on, right_on=right_on, by="__k", direction=direction
        )
        return _restore_types(out.drop(columns="__k"))

    from engine.ops.bucket import bucketed_map_groups

    return bucketed_map_groups(u, ["__k"], _asof, seed="asof")


def range_join(
    left: rd.Dataset,
    right: rd.Dataset,
    by: str,
    on: str,
    right_on: str,
    lower_us: int,
    upper_us: int = 0,
    right_by: str | None = None,
) -> rd.Dataset:
    """Banded range join: rows match when the by-keys are equal AND
    ``on - lower_us <= right_on <= on + upper_us`` (time window around
    the left timestamp, microseconds).

    Executed as the bucketed equi-join on the by-key with the band
    filter applied per streamed block — co-partitioning comes from the
    key; the band bounds the retained pairs. Partitioning assumption:
    one by-key's rows fit a worker (same as asof_join); for a keyless or
    hot-key range join use :func:`range_join_global` (time-bin
    co-partitioning — replicates right rows to overlapping bins)."""
    rb = right_by or by
    r = right if rb == by else right.rename_columns({rb: by})
    j = shuffle_join(left, r, key=by, join_type="inner")

    def _band(t: pa.Table) -> pa.Table:
        d = pc.subtract(
            pc.cast(t.column(on), pa.int64()), pc.cast(t.column(right_on), pa.int64())
        )
        m = pc.and_(pc.less_equal(d, lower_us), pc.greater_equal(d, -upper_us))
        return t.filter(m)

    return j.map_batches(_band, batch_format="pyarrow")


def range_join_global(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    right_on: str,
    lower_us: int,
    upper_us: int = 0,
    num_buckets: int = 64,
) -> rd.Dataset:
    """KEYLESS banded range join (the time-bin co-partitioned variant
    :func:`range_join` documents as its gap): rows match when
    ``on - lower_us <= right_on <= on + upper_us`` with NO equi-key.

    Co-partitioning comes from TIME BINS of width ``lower_us +
    upper_us``: each left row lands in exactly one bin of its own
    timestamp; each right row replicates to every bin whose left rows
    could match it (at most 2 bins at this width — bounded replication,
    not a broadcast). The equi-join on the bin id then meets each
    candidate pair exactly once (the left row is in one bin only), so no
    dedup pass is needed; the band filter prunes per streamed block.
    Partitioning assumption: one bin's rows fit a worker — bins are
    time-bounded, so this holds whenever event rate x band width fits,
    independent of key skew. ``on`` and ``right_on`` must be distinct
    column names (rename upstream otherwise)."""
    if on == right_on:
        raise ValueError("range_join_global: rename one side — on == right_on")
    width = max(int(lower_us) + int(upper_us), 1)

    def _bin_left(t: pa.Table) -> pa.Table:
        ts = t.column(on).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return t.append_column("__bin", pa.array(ts // width, pa.int64()))

    def _replicate_right(t: pa.Table) -> pa.Table:
        s = t.column(right_on).cast(pa.int64()).to_numpy(zero_copy_only=False)
        b0 = (s - upper_us) // width
        b1 = (s + lower_us) // width
        counts = (b1 - b0 + 1).astype(np.int64)
        total = int(counts.sum())
        idx = np.repeat(np.arange(len(s), dtype=np.int64), counts)
        starts = np.cumsum(counts) - counts
        offs = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        out = t.take(pa.array(idx))
        return out.append_column("__bin", pa.array(b0[idx] + offs, pa.int64()))

    l = left.map_batches(_bin_left, batch_format="pyarrow")
    r = right.map_batches(_replicate_right, batch_format="pyarrow")
    j = shuffle_join(l, r, key="__bin", join_type="inner", num_buckets=num_buckets)

    def _band(t: pa.Table) -> pa.Table:
        d = pc.subtract(
            pc.cast(t.column(on), pa.int64()), pc.cast(t.column(right_on), pa.int64())
        )
        m = pc.and_(pc.less_equal(d, lower_us), pc.greater_equal(d, -upper_us))
        return t.filter(m).drop_columns(["__bin"])

    return j.map_batches(_band, batch_format="pyarrow")


def interval_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    max_len_us: int,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Interval OVERLAP join (the general form of the range-join family):
    rows match when ``[left_start, left_end]`` and ``[right_start,
    right_end]`` intersect, with NO equi-key.

    Co-partitioning: both sides replicate to every ``max_len_us``-wide
    time bin their interval touches (≤ 2 bins per row when interval
    length ≤ max_len_us — enforced, it bounds the replication). Two
    overlapping intervals always share the bin containing the overlap's
    START (= max of the two starts), and each pair is emitted ONLY in
    that bin — exactly-once without a dedup exchange. Column names must
    be disjoint across sides (rename upstream)."""
    width = max(int(max_len_us), 1)

    def _replicate(start_col: str, end_col: str):
        def fn(t: pa.Table) -> pa.Table:
            s = t.column(start_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
            e = t.column(end_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
            if len(s) and int((e - s).max()) > width:
                raise ValueError(
                    f"interval_join: interval longer than max_len_us={width}"
                )
            b0, b1 = s // width, e // width
            counts = (b1 - b0 + 1).astype(np.int64)
            total = int(counts.sum())
            idx = np.repeat(np.arange(len(s), dtype=np.int64), counts)
            starts = np.cumsum(counts) - counts
            offs = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
            out = t.take(pa.array(idx))
            return out.append_column("__bin", pa.array(b0[idx] + offs, pa.int64()))

        return fn

    l = left.map_batches(_replicate(left_start, left_end), batch_format="pyarrow")
    r = right.map_batches(_replicate(right_start, right_end), batch_format="pyarrow")
    j = shuffle_join(l, r, key="__bin", join_type="inner", num_buckets=num_buckets)

    def _overlap_once(t: pa.Table) -> pa.Table:
        ls = t.column(left_start).cast(pa.int64()).to_numpy(zero_copy_only=False)
        le = t.column(left_end).cast(pa.int64()).to_numpy(zero_copy_only=False)
        rs = t.column(right_start).cast(pa.int64()).to_numpy(zero_copy_only=False)
        re_ = t.column(right_end).cast(pa.int64()).to_numpy(zero_copy_only=False)
        bins = t.column("__bin").cast(pa.int64()).to_numpy(zero_copy_only=False)
        overlap = (ls <= re_) & (rs <= le)
        # numpy floor-div, matching the replication binning (Arrow's
        # integer divide truncates toward zero — wrong for negatives).
        once = (np.maximum(ls, rs) // width) == bins
        return t.filter(pa.array(overlap & once)).drop_columns(["__bin"])

    return j.map_batches(_overlap_once, batch_format="pyarrow")


def salted_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    join_type: str = "inner",
    num_salts: int = 8,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Skew-resistant join for hot keys (the Layer-R counterpart of the
    CDC salted sub-partitioner, SURVEY.md C2): each left row scatters to
    one of ``num_salts`` sub-keys, the right side replicates to ALL
    salts of its key, and the bucketed join runs on the composite
    (key, salt) — a pathological hot key now spreads over num_salts
    buckets instead of one. Result set is identical to the unsalted join
    (each left row still meets each of its right matches exactly once).

    Right/outer: the replicate-right trick would emit each unmatched right
    row once per salt, so those modes decompose instead —
    ``right = salted inner ∪ unmatched-right`` and
    ``outer = salted left ∪ unmatched-right`` — where unmatched-right is
    a broadcast anti filter against the distinct left key set (join
    membership, not SQL NOT IN: a NULL right key is always unmatched)
    with the left columns null-filled to the join's output schema."""
    import numpy as np

    if join_type in ("right", "outer"):
        return _salted_with_unmatched_right(
            left, right, key, join_type, num_salts, num_buckets
        )
    if join_type not in ("inner", "left"):
        raise ValueError(f"salted_join: unknown join_type {join_type!r}")

    def _salt_left(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__salt", pa.array(np.arange(t.num_rows, dtype=np.int64) % num_salts)
        )

    def _replicate_right(t: pa.Table) -> pa.Table:
        reps = np.repeat(np.arange(t.num_rows, dtype=np.int64), num_salts)
        out = t.take(pa.array(reps))
        return out.append_column(
            "__salt", pa.array(np.tile(np.arange(num_salts, dtype=np.int64), t.num_rows))
        )

    l = left.map_batches(_salt_left, batch_format="pyarrow")
    r = right.map_batches(_replicate_right, batch_format="pyarrow")
    j = shuffle_join(l, r, key=[key, "__salt"], join_type=join_type, num_buckets=num_buckets)
    return j.map_batches(lambda t: t.drop_columns(["__salt"]), batch_format="pyarrow")


def _salted_with_unmatched_right(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    join_type: str,
    num_salts: int,
    num_buckets: int,
    suffixes: tuple[str, str] = ("", "_r"),
) -> rd.Dataset:
    """right/outer leg of :func:`salted_join`: the salted core join
    (inner for right, left for outer) unioned with the right rows that
    match no left key, shaped to the core's output schema (left columns
    null, key carried from the right — SQL COALESCE semantics)."""
    core_type = "inner" if join_type == "right" else "left"
    left, lschema = _keyed_arrow(left, [key])
    right, rschema = _keyed_arrow(right, [key])
    core = salted_join(left, right, key, core_type, num_salts, num_buckets)

    # Distinct left keys, broadcast. JOIN-unmatched means "no equal left
    # key", so nulls in the key set are irrelevant (unlike NOT IN) and a
    # null right key is always unmatched.
    lkeys = distributed_keyset(left, key)
    key_set = pc.unique(lkeys.column(key)).drop_null()
    ref = ray.put(key_set)

    lcols, rcols = list(lschema.names), list(rschema.names)
    out_fields = [lschema.field(n) for n in lcols] + [
        pa.field(c + suffixes[1] if c in lcols else c, rschema.field(c).type)
        for c in rcols
        if c != key
    ]

    def _unmatched_shaped(t: pa.Table) -> pa.Table:
        ks = _cached_get(ref)
        m = pc.fill_null(pc.is_in(t.column(key), value_set=ks), False)
        t = t.filter(pc.invert(m))
        n = t.num_rows
        cols = []
        for f in out_fields:
            base = f.name.removesuffix(suffixes[1]) if suffixes[1] else f.name
            if f.name == key:
                cols.append(t.column(key).cast(f.type))
            elif f.name in lcols:
                cols.append(pa.nulls(n, f.type))
            else:
                src = f.name if f.name in t.column_names else base
                cols.append(t.column(src).cast(f.type))
        return pa.table(cols, schema=pa.schema(out_fields))

    unmatched = right.map_batches(_unmatched_shaped, batch_format="pyarrow")
    conform = pa.schema(out_fields)

    def _conform(t: pa.Table) -> pa.Table:
        cols = [t.column(f.name).cast(f.type) for f in conform]
        return pa.table(cols, schema=conform)

    return core.map_batches(_conform, batch_format="pyarrow").union(unmatched)


def bloom_filter_keys(
    ds: rd.Dataset, col: str, num_bits: int = 1 << 20, num_hashes: int = 4
) -> ray.ObjectRef:
    """Build a Bloom filter over an integer key column, distributed:
    each batch sets its keys' bits in a local bitmap (one num_bits/8-byte
    row per batch), the driver ORs the tiny partials, and the final
    bitmap is put in the object store ONCE for zero-copy reads by every
    prune task. The fold ships bitmaps, never keys — at 1M bits that is
    128 KB per batch regardless of key count."""

    nbytes = num_bits // 8

    def _idx(keys: np.ndarray, i: int) -> np.ndarray:
        h1 = keys * np.uint64(0x9E3779B97F4A7C15)
        h2 = keys * np.uint64(0xC2B2AE3D27D4EB4F) | np.uint64(1)
        return ((h1 + np.uint64(i) * h2) % np.uint64(num_bits)).astype(np.int64)

    def _partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(nbytes, np.uint8)
        keys = t.column(col).to_numpy(zero_copy_only=False).astype(np.uint64)
        for i in range(num_hashes):
            idx = _idx(keys, i)
            np.bitwise_or.at(bits, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    folded = np.zeros(nbytes, np.uint8)
    for b in (
        ds.select_columns([col])
        .map_batches(_partial, batch_format="pyarrow")
        .iter_batches(batch_size=64, batch_format="pyarrow")
    ):
        for buf in b.column("bits").to_pylist():
            folded |= np.frombuffer(buf, np.uint8)
    bloom = (folded, num_bits, num_hashes)
    return ray.put(bloom)

def bloom_prune(ds: rd.Dataset, col: str, bloom_ref: ray.ObjectRef) -> rd.Dataset:
    """Drop rows whose key is definitely NOT in the Bloom filter (no
    false negatives; survivors may contain false positives — follow with
    an exact join/semi-join). This is the classic pre-shuffle reduction:
    the only broadcast is the bitmap."""

    def _keep(t: pa.Table) -> pa.Table:
        bits, num_bits, num_hashes = _cached_get(bloom_ref)
        keys = t.column(col).to_numpy(zero_copy_only=False).astype(np.uint64)
        ok = np.ones(len(keys), bool)
        h1 = keys * np.uint64(0x9E3779B97F4A7C15)
        h2 = keys * np.uint64(0xC2B2AE3D27D4EB4F) | np.uint64(1)
        for i in range(num_hashes):
            idx = ((h1 + np.uint64(i) * h2) % np.uint64(num_bits)).astype(np.int64)
            ok &= ((bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1).astype(bool)
        return t.filter(pa.array(ok))

    return ds.map_batches(_keep, batch_format="pyarrow")


def cross_join(ds: rd.Dataset, small: pa.Table, suffix: str = "_r") -> rd.Dataset:
    """Cartesian product against a SMALL broadcast side (dimension
    enumeration, parameter grids). The small table ships through the
    object store once; each batch repeats itself len(small) times with
    Arrow take/tile index math — no shuffle. Output size is
    |ds| x |small| by definition: the caller owns keeping ``small``
    small (this is not a fact-x-fact operator)."""
    ref = ray.put(small)

    def _cross(t: pa.Table) -> pa.Table:
        dim = _cached_get(ref)
        n, m = t.num_rows, dim.num_rows
        if n == 0 or m == 0:
            cols = {c: t.column(c).slice(0, 0) for c in t.column_names}
            for c in dim.column_names:
                name = c + suffix if c in t.column_names else c
                cols[name] = dim.column(c).slice(0, 0)
            return pa.table(cols)
        left = t.take(pa.array(np.repeat(np.arange(n, dtype=np.int64), m)))
        right = dim.take(pa.array(np.tile(np.arange(m, dtype=np.int64), n)))
        cols = {c: left.column(c) for c in left.column_names}
        for c in right.column_names:
            name = c + suffix if c in cols else c
            cols[name] = right.column(c)
        return pa.table(cols)

    return ds.map_batches(_cross, batch_format="pyarrow")
