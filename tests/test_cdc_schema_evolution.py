"""Additive schema evolution through the full replay (SURVEY.md §5)."""

from engine.cdc import sink
from engine.cdc.oracle import oracle_state_hash
from engine.cdc.replay import ReplayConfig, replay
from engine.cdc.synth import SynthConfig, synth_changelog
from engine.cdc.verify import lake_table, state_hash


def test_mid_stream_column_backfills_as_null(tmp_path, sf_dir):
    log = synth_changelog(
        sf_dir,
        f"{tmp_path}/log",
        SynthConfig(seed=42, n_events=1800, n_epochs=3, n_keys=500, evolve_at_epoch=1),
    )
    lake = f"{tmp_path}/lake"
    replay(log, lake, ReplayConfig(num_partitions=8, num_salts=2))
    assert state_hash(lake) == oracle_state_hash(log)

    t = lake_table(lake)
    assert "size_bytes" in t.column_names
    rows = t.to_pylist()
    # Keys last written before the evolution epoch carry null; later ones
    # carry the populated value.
    pre = [r for r in rows if r["seq"] < 600]
    post = [r for r in rows if r["seq"] >= 600]
    assert pre and all(r["size_bytes"] is None for r in pre)
    assert post and all(r["size_bytes"] == len(r["content"]) for r in post)

    # The negotiated schema is recorded in the manifest and carried forward.
    m = sink.read_manifest(lake)
    assert "size_bytes" in m["schema_names"]


def test_schema_stable_when_no_evolution(tmp_path, sf_dir):
    log = synth_changelog(
        sf_dir,
        f"{tmp_path}/log2",
        SynthConfig(seed=42, n_events=900, n_epochs=2, n_keys=300),
    )
    lake = f"{tmp_path}/lake2"
    replay(log, lake, ReplayConfig(num_partitions=4, num_salts=1))
    t = lake_table(lake)
    assert t.column_names == [
        "repo",
        "path",
        "commit",
        "lang",
        "content",
        "content_sha256",
        "seq",
    ]


def test_unify_types_rules():
    import pyarrow as pa
    import pytest

    from engine.cdc.schema import unify_types

    cases = [
        (pa.int32(), pa.int64(), pa.int64()),
        (pa.int64(), pa.int32(), pa.int64()),  # narrower arrival: stay wide
        (pa.int8(), pa.int16(), pa.int16()),
        (pa.uint8(), pa.uint32(), pa.uint32()),
        (pa.uint32(), pa.int32(), pa.int64()),  # mixed signedness widens
        (pa.uint8(), pa.int8(), pa.int16()),
        (pa.float32(), pa.float64(), pa.float64()),
        (pa.int32(), pa.float64(), pa.float64()),
        (pa.uint16(), pa.float64(), pa.float64()),
        (pa.string(), pa.large_string(), pa.large_string()),
        (pa.int64(), pa.int64(), pa.int64()),
    ]
    for a, b, want in cases:
        assert unify_types(a, b) == want, (a, b)
    # Lossy or structural: rejected.
    for a, b in [
        (pa.int64(), pa.float64()),   # 53-bit mantissa loses int64
        (pa.uint64(), pa.int64()),
        (pa.string(), pa.int64()),
        (pa.timestamp("us"), pa.timestamp("ms")),
    ]:
        assert unify_types(a, b) is None, (a, b)


def test_widening_mid_stream_matches_oracle(tmp_path, sf_dir):
    """size_bytes arrives int32 in epoch 1, widens to int64 in epoch 2:
    the distributed replay and the single-process oracle negotiate the
    SAME chain, the final column is int64, and rows written before the
    widening carry their (up-cast) values."""
    import pyarrow as pa

    log = synth_changelog(
        sf_dir,
        f"{tmp_path}/log_widen",
        SynthConfig(
            seed=43, n_events=1800, n_epochs=3, n_keys=500,
            evolve_at_epoch=1, widen_at_epoch=2,
        ),
    )
    lake = f"{tmp_path}/lake_widen"
    replay(log, lake, ReplayConfig(num_partitions=8, num_salts=2))
    assert state_hash(lake) == oracle_state_hash(log)
    t = lake_table(lake)
    assert t.schema.field("size_bytes").type == pa.int64()
    rows = t.to_pylist()
    mid = [r for r in rows if 600 <= r["seq"] < 1200 and r["size_bytes"] is not None]
    assert mid and all(r["size_bytes"] == len(r["content"]) for r in mid)


def test_all_null_column_epoch_negotiates_and_replays(tmp_path, ray_session):
    """An epoch whose payload column is entirely null infers Arrow type
    `null` — negotiation must treat that as absent type information
    (null unifies into the running type, and a null-typed FIRST epoch
    widens to the later concrete type), not a lossy change. Found by the
    scan fuzz (hypothesis seed 2431)."""
    import pyarrow as pa

    from engine.cdc.replay import ReplayConfig, replay
    from engine.cdc.schema import negotiate, unify_types
    from engine.cdc.tailer import MemorySource
    from engine.cdc.verify import lake_table

    assert unify_types(pa.string(), pa.null()) == pa.string()
    assert unify_types(pa.null(), pa.int64()) == pa.int64()

    src = MemorySource()
    src.append(0, pa.Table.from_pylist([
        {"repo": "r", "path": "a.py", "commit": "c0", "lang": None,
         "content": "x", "seq": 0, "op": "I"},
    ]))  # lang infers as null type
    src.seal(0)
    src.append(1, pa.Table.from_pylist([
        {"repo": "r", "path": "b.py", "commit": "c1", "lang": "py",
         "content": "y", "seq": 1, "op": "I"},
    ]))
    src.seal(1)
    s0 = src.epoch_schema(0)
    assert pa.types.is_null(s0.field("lang").type)
    target = negotiate(s0, src.epoch_schema(1))
    assert target.field("lang").type == pa.string()

    lake = f"{tmp_path}/lake_nulls"
    replay(src, lake, ReplayConfig(num_partitions=4, num_salts=1))
    t = lake_table(lake)
    assert t.column("lang").to_pylist() == [None, "py"]
    assert t.schema.field("lang").type == pa.string()


def test_unify_types_decimal_lattice():
    """Decimal negotiation (VERDICT r4 #7): lossless widening in
    (integer digits, scale) space; decimal↔float stays rejected."""
    import pyarrow as pa

    from engine.cdc.schema import unify_types

    cases = [
        (pa.decimal128(12, 2), pa.decimal128(10, 4), pa.decimal128(14, 4)),
        (pa.decimal128(12, 2), pa.int32(), pa.decimal128(12, 2)),
        (pa.decimal128(6, 2), pa.int64(), pa.decimal128(21, 2)),
        # Combined digits past 38 promote to decimal256 (still lossless).
        (pa.decimal128(38, 2), pa.decimal128(4, 30), pa.decimal256(66, 30)),
        (pa.decimal128(12, 2), pa.null(), pa.decimal128(12, 2)),
        (pa.decimal128(12, 2), pa.float64(), None),
        (pa.decimal128(12, 2), pa.string(), None),
    ]
    for a, b, want in cases:
        assert unify_types(a, b) == want == unify_types(b, a), (a, b)


def test_decimal_payload_column_negotiates_and_replays(tmp_path, sf_dir):
    """A decimal128(12,2) payload column appearing mid-stream must
    negotiate additively, backfill as null, and replay to the sequential
    oracle's state — in both LSM write modes."""
    import pyarrow as pa
    import pyarrow.compute as pc

    log = synth_changelog(
        sf_dir, f"{tmp_path}/log_dec",
        SynthConfig(seed=5, n_events=2000, n_epochs=3, n_keys=400,
                    decimal_at_epoch=1),
    )
    lake = f"{tmp_path}/lake_dec"
    replay(log, lake, ReplayConfig(num_partitions=8, num_salts=2))
    assert state_hash(lake) == oracle_state_hash(log)
    t = lake_table(lake)
    assert t.schema.field("price").type == pa.decimal128(12, 2)
    epoch_size = (2000 + 2) // 3
    early = t.filter(pc.less(t.column("seq"), epoch_size))
    late = t.filter(pc.greater_equal(t.column("seq"), epoch_size))
    assert early.column("price").null_count == early.num_rows  # backfill-as-null
    assert late.column("price").null_count == 0
    # Values are the documented pure function of seq.
    import decimal

    for seq, price in zip(late.column("seq").to_pylist()[:50],
                          late.column("price").to_pylist()[:50]):
        assert price == decimal.Decimal((seq * 7919) % 1_000_000) / 100

    lake_d = f"{tmp_path}/lake_dec_delta"
    replay(log, lake_d, ReplayConfig(num_partitions=8, num_salts=2,
                                     write_mode="delta"))
    assert state_hash(lake_d) == state_hash(lake)


def test_unify_types_nested_lattice():
    """Struct/list/map unification is recursive and additive: structs
    take the union of fields (common fields unified losslessly), lists
    unify element types (large_list wins), maps unify key+item;
    struct↔scalar and lossy nested changes stay rejected."""
    import pyarrow as pa

    from engine.cdc.schema import unify_types

    s2 = pa.struct([("stars", pa.int64()), ("license", pa.string())])
    s3 = pa.struct(
        [("stars", pa.int64()), ("license", pa.string()), ("forks", pa.int64())]
    )
    s_narrow = pa.struct([("stars", pa.int32()), ("license", pa.string())])
    s_lossy = pa.struct([("stars", pa.string())])
    cases = [
        (s2, s3, s3),                     # additive field
        (s_narrow, s3, s3),               # added field + widened field
        (s2, s2, s2),
        (s2, pa.null(), s2),
        (s2, s_lossy, None),              # int64 vs string inside: lossy
        (s2, pa.int64(), None),           # struct vs scalar
        (pa.list_(pa.int32()), pa.list_(pa.int64()), pa.list_(pa.int64())),
        (pa.list_(pa.int32()), pa.large_list(pa.int64()),
         pa.large_list(pa.int64())),
        (pa.list_(pa.string()), pa.list_(pa.int64()), None),
        (pa.map_(pa.string(), pa.int32()), pa.map_(pa.string(), pa.int64()),
         pa.map_(pa.string(), pa.int64())),
        # Nested struct-in-list unifies recursively too.
        (pa.list_(s2), pa.list_(s3), pa.list_(s3)),
    ]
    for a, b, want in cases:
        assert unify_types(a, b) == want == unify_types(b, a), (a, b)


def test_struct_payload_column_negotiates_and_replays(tmp_path, sf_dir):
    """A struct payload column appearing mid-stream — and then GAINING A
    FIELD one epoch later (nested-additive evolution) — must negotiate,
    backfill as null at both levels, and replay to the sequential
    oracle's state in both LSM write modes."""
    import pyarrow as pa
    import pyarrow.compute as pc

    log = synth_changelog(
        sf_dir, f"{tmp_path}/log_struct",
        SynthConfig(seed=9, n_events=2400, n_epochs=3, n_keys=400,
                    struct_at_epoch=1),
    )
    lake = f"{tmp_path}/lake_struct"
    replay(log, lake, ReplayConfig(num_partitions=8, num_salts=2))
    assert state_hash(lake) == oracle_state_hash(log)
    t = lake_table(lake)
    assert t.schema.field("meta").type == pa.struct(
        [("stars", pa.int64()), ("license", pa.string()), ("forks", pa.int64())]
    )
    epoch_size = 800
    seq = t.column("seq")
    early = t.filter(pc.less(seq, epoch_size))
    mid = t.filter(
        pc.and_(pc.greater_equal(seq, epoch_size), pc.less(seq, 2 * epoch_size))
    )
    late = t.filter(pc.greater_equal(seq, 2 * epoch_size))
    assert early.num_rows and mid.num_rows and late.num_rows
    # Pre-struct winners: whole struct null; epoch-1 winners: struct set
    # but the later-added forks field null; epoch-2 winners: fully set.
    assert early.column("meta").null_count == early.num_rows
    m_mid = mid.column("meta").combine_chunks()
    assert m_mid.null_count == 0
    assert m_mid.field("forks").null_count == mid.num_rows
    m_late = late.column("meta").combine_chunks()
    assert m_late.null_count == 0 and m_late.field("forks").null_count == 0
    licenses = ("mit", "apache-2.0", "gpl-3.0")
    for row in late.select(["seq", "meta"]).to_pylist()[:50]:
        s = row["seq"]
        assert row["meta"] == {
            "stars": (s * 31) % 97,
            "license": licenses[s % 3],
            "forks": (s * 17) % 53,
        }

    lake_d = f"{tmp_path}/lake_struct_delta"
    replay(log, lake_d, ReplayConfig(num_partitions=8, num_salts=2,
                                     write_mode="delta"))
    assert state_hash(lake_d) == state_hash(lake)
