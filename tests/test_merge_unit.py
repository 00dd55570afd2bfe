"""Unit tests for the LWW collapse kernel and schema negotiation."""

import pyarrow as pa
import pytest

from engine.cdc.merge import lww_collapse
from engine.cdc.schema import SchemaEvolutionError, conform_table, negotiate


def _events(rows):
    cols = {k: [r.get(k) for r in rows] for k in ("seq", "op", "repo", "path", "content")}
    return pa.table(
        {
            "seq": pa.array(cols["seq"], pa.int64()),
            "op": pa.array(cols["op"], pa.string()),
            "repo": pa.array(cols["repo"], pa.string()),
            "path": pa.array(cols["path"], pa.string()),
            "content": pa.array(cols["content"], pa.string()),
        }
    )


def test_lww_keeps_max_seq_per_key():
    t = _events(
        [
            dict(seq=1, op="I", repo="r", path="a", content="v1"),
            dict(seq=5, op="U", repo="r", path="a", content="v5"),
            dict(seq=3, op="U", repo="r", path="a", content="v3"),
            dict(seq=2, op="I", repo="r", path="b", content="w2"),
        ]
    )
    out = lww_collapse(t)
    d = {(r["repo"], r["path"]): r for r in out.to_pylist()}
    assert len(d) == 2
    assert d[("r", "a")]["content"] == "v5" and d[("r", "a")]["seq"] == 5
    assert d[("r", "a")]["n_events"] == 3 and d[("r", "a")]["seq_lo"] == 1
    assert d[("r", "b")]["n_events"] == 1


def test_lww_is_associative_over_chunks():
    rows = [
        dict(seq=s, op="U", repo="r", path=f"p{s % 3}", content=f"c{s}") for s in range(20)
    ]
    t = _events(rows)
    whole = lww_collapse(t)
    parts = lww_collapse(
        pa.concat_tables([lww_collapse(t.slice(0, 7)), lww_collapse(t.slice(7))])
    )
    key = lambda tb: sorted(
        (r["repo"], r["path"], r["seq"], r["n_events"], r["seq_lo"]) for r in tb.to_pylist()
    )
    assert key(whole) == key(parts)


def test_lww_delete_is_just_an_event():
    t = _events(
        [
            dict(seq=1, op="I", repo="r", path="a", content="v1"),
            dict(seq=9, op="D", repo="r", path="a", content=None),
        ]
    )
    out = lww_collapse(t).to_pylist()
    assert len(out) == 1 and out[0]["op"] == "D" and out[0]["seq"] == 9


def test_negotiate_additive_and_conflict():
    s1 = pa.schema(
        [("seq", pa.int64()), ("op", pa.string()), ("repo", pa.string()), ("path", pa.string())]
    )
    s2 = s1.append(pa.field("size_bytes", pa.int64()))
    merged = negotiate(s1, s2)
    assert merged.names[-1] == "size_bytes"
    bad = pa.schema(
        [("seq", pa.int64()), ("op", pa.string()), ("repo", pa.string()), ("path", pa.int64())]
    )
    with pytest.raises(SchemaEvolutionError):
        negotiate(s1, bad)
    with pytest.raises(SchemaEvolutionError):
        negotiate(None, pa.schema([("repo", pa.string())]))


def test_conform_null_backfill():
    target = pa.schema([("a", pa.int64()), ("b", pa.string())])
    t = pa.table({"a": pa.array([1, 2], pa.int64())})
    out = conform_table(t, target)
    assert out.schema == target
    assert out.column("b").null_count == 2
    with pytest.raises(SchemaEvolutionError):
        conform_table(pa.table({"a": [1], "z": [2]}), target)
