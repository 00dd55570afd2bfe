"""Property checks for the SQL-mirror layer (engine/pipelines/
sqlmirror.py): the dataset sweeps prove engine ≡ DuckDB on the driver
corpus; these tests prove it on RANDOMIZED inputs — the hashes, the
HLL estimate expression, and the MinHash chain can't be accidentally
right only for the fixture data."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


def test_fnv1a_tokens_matches_scalar_reference():
    """Vectorized NUL-join FNV-1a == byte-at-a-time reference, over
    random ASCII tokens of every length 1..16 (and the SQL lambda, via
    DuckDB, over the same tokens)."""
    from engine.ops.text import fnv1a_tokens
    from engine.pipelines.sqlmirror import _fnv1a_expr

    rng = np.random.RandomState(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789!@#$%^&*()[]{}"
    toks = [
        "".join(alphabet[i] for i in rng.randint(0, len(alphabet), ln))
        for ln in list(range(1, 17)) * 8
    ]

    def ref(t: str) -> int:
        h = 0xCBF29CE484222325
        for b in t.encode():
            h = ((h ^ b) * 1099511628211) % (1 << 64)
        return h

    got = fnv1a_tokens(np.asarray(toks, dtype=object))
    assert [int(x) for x in got] == [ref(t) for t in toks]

    con = duckdb.connect()
    con.register("toks", pa.table({"t": toks}))
    sql = con.sql(f"SELECT {_fnv1a_expr('t')} AS h FROM toks").fetchall()
    assert [int(r[0]) for r in sql] == [ref(t) for t in toks]


def test_hll_sql_parity_on_random_ints():
    """hll_partial + hll_estimate == the hll_sql DuckDB twin on random
    integer multisets (several cardinalities crossing the small-range
    correction boundary)."""
    from engine.ops.sketch import hll_estimate, hll_partial
    from engine.pipelines.sqlmirror import hll_sql

    for seed, card in ((1, 50), (2, 2000), (3, 20000)):
        rng = np.random.RandomState(seed)
        vals = rng.randint(0, 10 * card, size=card * 3).astype(np.int64)
        df = pd.DataFrame({"v": vals})
        regs = np.frombuffer(
            hll_partial(df, "v", 12)["registers"].iloc[0], dtype=np.uint8
        )
        eng = hll_estimate(regs)
        con = duckdb.connect()
        con.register("tbl", pa.table({"v": vals}))
        sql = con.sql(hll_sql("tbl", "v")).fetchone()[0]
        assert eng == sql, (seed, card, eng, sql)
        exact = len(np.unique(vals))
        assert abs(eng - exact) / exact < 0.1  # the estimate is sane too


def test_minhash_sql_parity_on_random_corpus():
    """The full MinHash chain (shingles → permutations → bands → LSH
    candidates → exact-Jaccard verify) == the SQL twin on a small RANDOM
    corpus with planted near-duplicates. Engine side runs through Ray."""
    import ray.data as rd

    from engine.ops.dedup import minhash_candidate_pairs, verify_pairs_jaccard
    from engine.pipelines.sqlmirror import minhash_pairs_sql

    rng = np.random.RandomState(11)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "omega", "nu"]
    base = [
        " ".join(words[i] for i in rng.randint(0, len(words), 30))
        for _ in range(20)
    ]
    texts = list(base)
    for t in base[:6]:  # planted near-dups: one word changed
        toks = t.split()
        toks[rng.randint(0, len(toks))] = words[rng.randint(0, len(words))]
        texts.append(" ".join(toks))
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    ds = rd.from_pandas(df)
    docs = rd.from_pandas(df)
    cand = minhash_candidate_pairs(ds, "text", "doc_id", dedup_pairs=False)
    eng = (
        verify_pairs_jaccard(cand, docs, "text", "doc_id", threshold=0.5)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    assert len(eng) >= 6  # the planted pairs are found

    con = duckdb.connect()
    con.register("documents", pa.table({"doc_id": df["doc_id"], "text": texts}))
    sql = (
        con.sql(minhash_pairs_sql(threshold=0.5))
        .df().sort_values(["a", "b"]).reset_index(drop=True)
    )
    assert len(eng) == len(sql)
    for c in ("a", "b", "jaccard"):
        assert (eng[c].to_numpy() == sql[c].to_numpy()).all(), c
