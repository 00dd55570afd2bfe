"""Deduplication family (SURVEY.md §2.6 O6 + training-data ops).

- exact_dedup — hash-partition + per-group first (deterministic winner).
- MinHash+LSH — shingle → minhash → band → bucket-groupby candidates →
  exact-Jaccard verify. The shuffle moves (band, band_hash, doc_id)
  triples, never documents.
- SimHash — 64-bit signature, banded for candidate generation, Hamming
  verify.
- n-gram Jaccard — exact Jaccard on shingle sets for candidate pairs
  (LSH-blocked: recall bounded by the band parameters, documented).
- embedding cosine near-dup — see engine/ops/ann.py.

All hashes are counter/polynomial based (engine.util.hashing + local
rolling hash) or keyed pandas hash_array (SimHash tokens) —
deterministic across runs and parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from engine.util.hashing import actor_pool_size, composite_key_str

_B = np.uint64(1_000_003)  # polynomial base
_MERSENNE = np.uint64((1 << 61) - 1)


def exact_dedup(
    ds: rd.Dataset, keys: list[str], tiebreak: str, keep: str = "min", num_buckets: int = 32
) -> rd.Dataset:
    """One row per key; deterministic winner = min/max of ``tiebreak``.
    Per-batch combiner → hash-bucket shuffle (one group per bucket, not
    per key) → vectorized per-bucket pick."""
    from engine.util.hashing import fast_hash_column

    asc = keep == "min"

    def _pick(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(tiebreak, ascending=asc, kind="mergesort")
            .groupby(keys, sort=False, dropna=False)
            .head(1)
        )

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        df = _pick(df)
        key = composite_key_str(df, keys)
        out = df.copy()
        out["__bucket"] = fast_hash_column(key, num_buckets, seed="dedup")
        return out

    return (
        ds.map_batches(_pre, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(lambda df: _pick(df).drop(columns="__bucket"), batch_format="pandas")
    )


# ---- shingling / MinHash ---------------------------------------------------


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """uint64 rolling polynomial hashes of all k-char shingles (unique)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(b)
    if n < k:
        b = np.pad(b, (0, k - n), constant_values=32)
        n = k
    out = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):
        out = out * _B + b[j : j + n - k + 1]
    return np.unique(out)


def minhash_params(num_perm: int = 64, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """The (a, b) permutation constants — shared by MinHasher and the
    DuckDB oracle builder (sqlmirror.py inlines them as literals, so the
    SQL twin uses the identical permutations without mirroring the RNG)."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


class MinHasher:
    """Actor-pool stage: permutation parameters are derived once per actor
    from the seed (SURVEY.md §2.3 pattern). Emits (doc_id, band,
    band_hash) rows — the only thing the LSH shuffle moves."""

    def __init__(self, text_col: str, id_col: str, num_perm: int = 64, bands: int = 16, k: int = 5, seed: int = 42):
        assert num_perm % bands == 0
        self.a, self.b = minhash_params(num_perm, seed)
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.bands, self.k = num_perm, bands, k
        self.rows_per_band = num_perm // bands

    def signature(self, text: str) -> np.ndarray:
        h = shingle_hashes(text, self.k)
        # (num_perm, n_shingles) min — vectorized; n_shingles bounded by text len.
        v = (self.a[:, None] * h[None, :] + self.b[:, None]) % _MERSENNE
        return v.min(axis=1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        r, nb = self.rows_per_band, self.bands
        n = len(df)
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        for i, text in enumerate(df[self.text_col]):
            sigs[i] = self.signature(text or "")
        # Horner band-hash across the r signature rows of every band of
        # every doc at once: (n, bands, r) → (n, bands), no Python loops.
        chunks = sigs.reshape(n, nb, r)
        bh = np.zeros((n, nb), dtype=np.uint64)
        for j in range(r):  # r is tiny (4); the vectorized axis is n×bands
            bh = bh * _B + chunks[:, :, j]
        return pd.DataFrame(
            {
                "doc_id": np.repeat(df[self.id_col].to_numpy(), nb),
                "band": np.tile(np.arange(nb, dtype=np.int64), n),
                "band_hash": bh.ravel().astype(np.int64),
            }
        )


def _bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
    """All (a<b) pairs within each LSH bucket, vectorized: self-merge on
    the (band, band_hash) key. Called once per HASH bucket (a shuffle
    group holding many LSH buckets), not once per LSH bucket."""
    df = df[["band", "band_hash", "doc_id"]].drop_duplicates()
    m = df.merge(df, on=["band", "band_hash"], suffixes=("_a", "_b"))
    m = m[m["doc_id_a"] < m["doc_id_b"]]
    return pd.DataFrame(
        {"a": m["doc_id_a"].to_numpy(), "b": m["doc_id_b"].to_numpy()}
    ).drop_duplicates()


def minhash_candidate_pairs(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    seed: int = 42,
    num_buckets: int = 64,
    dedup_pairs: bool = True,
) -> rd.Dataset:
    """Candidate near-duplicate pairs via MinHash-LSH banding
    (shingle→minhash→band→bucket groupby — ray_guide 'Near-dup').
    The shuffle key is hash(band, band_hash) % num_buckets, so the Ray
    group count is O(num_buckets) regardless of LSH-bucket cardinality;
    pair generation inside a group is a vectorized pandas self-merge.

    ``dedup_pairs=False`` skips the cross-band dedup shuffle — pass it
    when a downstream verify stage (which groups by (a, b) anyway)
    collapses duplicates for free."""
    from engine.util.hashing import fast_hash_column

    sig = ds.map_batches(
        MinHasher,
        fn_constructor_args=(text_col, id_col, num_perm, bands, k, seed),
        batch_format="pandas",
        concurrency=actor_pool_size(4),
        batch_size=512,
    )

    def _route(df: pd.DataFrame) -> pd.DataFrame:
        key = df["band"].astype(str) + "\x1f" + df["band_hash"].astype(str)
        df = df.copy()
        df["__bucket"] = fast_hash_column(key, num_buckets, seed="lsh")
        return df

    pairs = (
        sig.map_batches(_route, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(_bucket_pairs, batch_format="pandas")
    )
    return exact_dedup(pairs, ["a", "b"], tiebreak="a") if dedup_pairs else pairs


def jaccard(t1: str, t2: str, k: int = 5) -> float:
    s1, s2 = shingle_hashes(t1 or "", k), shingle_hashes(t2 or "", k)
    inter = len(np.intersect1d(s1, s2))
    union = len(s1) + len(s2) - inter
    return inter / union if union else 1.0


def verify_pairs_jaccard(
    pairs: rd.Dataset, docs: rd.Dataset, text_col: str, id_col: str, threshold: float, k: int = 5
) -> rd.Dataset:
    """Exact-Jaccard verification of candidate pairs with the corpus
    CO-PARTITIONED by doc id — no broadcast of the corpus anywhere (the
    round-1 broadcast dict held the whole corpus in every worker's heap).

    Two bucketed exchanges:
    1. key = doc id: each pair contributes two half-rows (keyed by a and
       by b), each document one text row; texts attach to halves inside
       the bucket. The corpus crosses this exchange exactly ONCE.
    2. key = (a, b): the two halves of each pair regroup — only
       candidate rows move here (texts for candidates, not the corpus) —
       then exact Jaccard + threshold filter per bucket.
    """
    from engine.util.hashing import fast_hash_column

    COLS = ["key", "a", "b", "half", "txt", "__bucket"]

    def _halves(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.concat(
            [
                pd.DataFrame({"key": df["a"], "a": df["a"], "b": df["b"], "half": 0}),
                pd.DataFrame({"key": df["b"], "a": df["a"], "b": df["b"], "half": 1}),
            ],
            ignore_index=True,
        )
        out["txt"] = None
        out["__bucket"] = fast_hash_column(out["key"].astype(str), 64, seed="jvtx")
        return out[COLS]

    def _docrows(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"key": df[id_col], "a": -1, "b": -1, "half": 2, "txt": df[text_col]}
        )
        out["__bucket"] = fast_hash_column(out["key"].astype(str), 64, seed="jvtx")
        return out[COLS]

    u = pairs.map_batches(_halves, batch_format="pandas").union(
        docs.select_columns([id_col, text_col]).map_batches(
            _docrows, batch_format="pandas"
        )
    )

    def _attach(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["half"] == 2]
        lookup = pd.Series(d["txt"].to_numpy(), index=d["key"].to_numpy())
        p = df[df["half"] != 2].copy()
        p["txt"] = p["key"].map(lookup)
        return p.drop(columns="key")

    half = u.groupby("__bucket").map_groups(
        lambda df: _attach(df.drop(columns="__bucket")), batch_format="pandas"
    )

    def _route2(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        key = df["a"].astype(str) + "\x1f" + df["b"].astype(str)
        df["__bucket"] = fast_hash_column(key, 64, seed="jvpair")
        return df

    def _verify(df: pd.DataFrame) -> pd.DataFrame:
        # Cross-band duplicate candidates collapse here for free (this
        # exchange groups by (a, b) anyway), letting callers skip a
        # dedicated dedup shuffle on the candidate stream.
        t0 = df[df["half"] == 0][["a", "b", "txt"]].drop_duplicates(["a", "b"])
        t1 = df[df["half"] == 1][["a", "b", "txt"]].drop_duplicates(["a", "b"])
        m = t0.merge(t1, on=["a", "b"], suffixes=("_a", "_b"))
        # Shingle each doc ONCE per bucket (hub docs appear in many
        # pairs; re-shingling per pair dominated the verify stage).
        cache: dict = {}

        def _sh(doc_id, txt):
            s = cache.get(doc_id)
            if s is None:
                s = cache[doc_id] = shingle_hashes(txt or "", k)
            return s

        jac = np.empty(len(m), dtype=np.float64)
        for i, (ia, ib, ta, tb) in enumerate(
            zip(m["a"], m["b"], m["txt_a"], m["txt_b"])
        ):
            s1, s2 = _sh(ia, ta), _sh(ib, tb)
            inter = len(np.intersect1d(s1, s2, assume_unique=True))
            union = len(s1) + len(s2) - inter
            jac[i] = inter / union if union else 1.0
        m = m.drop(columns=["txt_a", "txt_b"])
        m["a"] = m["a"].astype("int64")
        m["b"] = m["b"].astype("int64")
        # floor(x*1e6+0.5)/1e6, not np.round: half-away rounding that a
        # SQL oracle mirrors exactly (np.round is half-to-even).
        m["jaccard"] = np.floor(jac * 1e6 + 0.5) / 1e6
        return m[m["jaccard"] >= threshold]

    return (
        half.map_batches(_route2, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(lambda df: _verify(df.drop(columns="__bucket")), batch_format="pandas")
    )


# ---- SimHash ---------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens. Token hashing and the bit-vote
    tally are fully vectorized (the per-character polynomial loop was
    the round-1 hot spot: 2.75 s for 5000 docs single-threaded). The
    token hash is FNV-1a/64 (engine.ops.text.fnv1a_tokens) so the whole
    SimHash — votes, fingerprint, banding, Hamming filter — is mirrored
    in the DuckDB oracle (sqlmirror.py::simhash_pairs_sql)."""
    from engine.ops.text import fnv1a_tokens

    toks = (text or "").lower().split()
    if not toks:
        return 0
    hs = fnv1a_tokens(np.asarray(toks, dtype=object))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    votes = bits.sum(axis=0) * 2 - len(toks)
    sel = (votes > 0).astype(np.uint64)
    return int(np.bitwise_or.reduce(sel << np.arange(64, dtype=np.uint64)))


class SimHasher:
    """Actor stage: emits (doc_id, simhash, band, band_key) rows; bands =
    four 16-bit chunks, so any pair within Hamming distance 3 shares at
    least one band (pigeonhole)."""

    def __init__(self, text_col: str, id_col: str):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        # Per-doc loop on purpose: each doc's (tokens × 64) bit matrix
        # fits cache; a whole-batch (270k × 64) expansion measured 3-10 s
        # on this box (pathological large-array memory throughput) vs
        # 1.1 s for the loop.
        sh = np.fromiter(
            (simhash64(t) for t in df[self.text_col]), dtype=np.uint64, count=n
        )
        shifts = (np.arange(4, dtype=np.uint64) * np.uint64(16))[None, :]
        keys = (sh[:, None] >> shifts) & np.uint64(0xFFFF)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(df[self.id_col].to_numpy(), 4),
                "simhash": np.repeat(sh.astype(np.int64), 4),
                "band": np.tile(np.arange(4, dtype=np.int64), n),
                "band_key": keys.ravel().astype(np.int64),
            }
        )


def simhash_near_dup_pairs(
    ds: rd.Dataset, text_col: str, id_col: str, max_hamming: int = 3
) -> rd.Dataset:
    sig = ds.map_batches(
        SimHasher, fn_constructor_args=(text_col, id_col),
        batch_format="pandas", concurrency=actor_pool_size(4), batch_size=512,
    )

    from engine.util.hashing import fast_hash_column

    def _route(df: pd.DataFrame) -> pd.DataFrame:
        key = df["band"].astype(str) + "\x1f" + df["band_key"].astype(str)
        df = df.copy()
        df["__bucket"] = fast_hash_column(key, 64, seed="simhash")
        return df

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        # One call per hash bucket; pair within each (band, band_key)
        # collision group it contains. Only groups with ≥2 docs matter.
        df = df[df.duplicated(["band", "band_key"], keep=False)]
        a, b, ham = [], [], []
        for _, d in df.groupby(["band", "band_key"], sort=False):
            d = d.drop_duplicates("doc_id").sort_values("doc_id")
            ids = d["doc_id"].to_numpy()
            hs = d["simhash"].to_numpy(dtype=np.uint64)
            for i in range(len(ids)):
                x = hs[i] ^ hs[i + 1 :]
                if not len(x):
                    continue
                # vectorized popcount: bytes → unpackbits → row sums
                dist = np.unpackbits(
                    x.view(np.uint8).reshape(len(x), 8), axis=1
                ).sum(axis=1)
                for j in np.nonzero(dist <= max_hamming)[0]:
                    a.append(ids[i])
                    b.append(ids[i + 1 + j])
                    ham.append(int(dist[j]))
        return pd.DataFrame({"a": a, "b": b, "hamming": ham})

    pairs = (
        sig.map_batches(_route, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(_pairs, batch_format="pandas")
    )
    return exact_dedup(pairs, ["a", "b"], tiebreak="hamming")


def ngram_jaccard_pairs(
    ds: rd.Dataset,
    docs: rd.Dataset,
    text_col: str,
    id_col: str,
    threshold: float,
    k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
) -> rd.Dataset:
    """Exact n-gram Jaccard over LSH-blocked candidates (recall bounded
    by the banding parameters; with bands=16, r=4 the capture probability
    at jaccard=threshold is 1-(1-t^4)^16)."""
    cand = minhash_candidate_pairs(ds, text_col, id_col, num_perm, bands, k, dedup_pairs=False)
    return verify_pairs_jaccard(cand, docs, text_col, id_col, threshold, k)


def connected_components(
    pairs: rd.Dataset,
    a_col: str = "a",
    b_col: str = "b",
    node_col: str = "node",
    comp_col: str = "component",
    max_iters: int = 50,
    num_buckets: int = 64,
    local_threshold: int = 500_000,
) -> rd.Dataset:
    """Connected components over a near-dup pair graph (the clustering
    step of corpus dedup: every doc in a component is a near-duplicate
    of the others via some chain).

    Size-gated like auto_join: a pair graph at or under
    ``local_threshold`` edges (gated by a count on the materialized
    pairs, never pulled blind — near-dup pair sets are typically orders
    of magnitude smaller than the corpus) is solved with a single
    bounded pull + union-find, skipping the per-round exchange overhead.
    Larger graphs take the distributed min-label message-passing loop
    with pointer jumping, TWO bucketed exchanges per round and no joins:

    - state rows share one (k, x, role) schema: adjacency (k=node,
      x=neighbor), labels (k=node, x=label), jump requests (k=label,
      x=requesting node);
    - exchange 1 co-locates adjacency + requests with the labels of
      their key and emits min-label messages: each edge proposes
      label(node) to its neighbor, each request learns label(label(v))
      (the pointer-jumping/doubling trick);
    - exchange 2 folds messages ∪ labels by min per node and emits the
      next round's label + request rows;
    - labels only ever decrease, so an unchanged global label sum (one
      tiny aggregate per round) ⇔ convergence; with doubling, rounds =
      O(log diameter) — chain-shaped clusters converge fast too.

    Returns (node, component) with component = MIN node id in the
    component — deterministic, order- and parallelism-independent.
    Isolated nodes (no edges) are not in the input and so not in the
    output; callers union them as their own component if needed.
    """
    from engine.ops.bucket import bucketed_map_groups

    ADJ, LBL, REQ, MSG = 0, 1, 2, 3

    def _arr(col) -> pa.Array:
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

    def _adj(t: pa.Table) -> pa.Table:
        a, b = _arr(t.column(a_col)), _arr(t.column(b_col))
        k = pa.concat_arrays([a, b])
        x = pa.concat_arrays([b, a])
        return pa.table(
            {"k": k, "x": x, "role": pa.array(np.full(len(k), ADJ, np.int64))}
        )

    pairs = pairs.materialize()
    if pairs.count() <= local_threshold:
        from engine.util.collect import pull_arrow

        tbl = pull_arrow(pairs.select_columns([a_col, b_col]))
        edges = (
            zip(tbl.column(a_col).to_pylist(), tbl.column(b_col).to_pylist())
            if tbl is not None
            else []
        )
        parent: dict = {}

        def _find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for ea, eb in edges:
            ra, rb = _find(ea), _find(eb)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        out = {n: _find(n) for n in parent}
        return rd.from_arrow(
            pa.table(
                {
                    node_col: pa.array(list(out.keys()), pa.int64()),
                    comp_col: pa.array(list(out.values()), pa.int64()),
                }
            )
        )

    adj = pairs.map_batches(_adj, batch_format="pyarrow").materialize()

    def _seed(df: pd.DataFrame) -> pd.DataFrame:
        nodes = df["k"].drop_duplicates()
        return pd.DataFrame({"k": nodes, "x": nodes, "role": LBL})

    state = bucketed_map_groups(adj, ["k"], _seed, num_buckets=num_buckets, seed="cc").materialize()

    def _msgs(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["role"] == LBL].set_index("k")["x"]
        out = [df[df["role"] == LBL]]
        e = df[df["role"] == ADJ]
        if len(e):
            out.append(pd.DataFrame({"k": e["x"].to_numpy(),
                                     "x": e["k"].map(lab).to_numpy(),
                                     "role": MSG}))
        rq = df[df["role"] == REQ]
        if len(rq):
            out.append(pd.DataFrame({"k": rq["x"].to_numpy(),
                                     "x": rq["k"].map(lab).to_numpy(),
                                     "role": MSG}))
        return pd.concat(out, ignore_index=True)

    def _fold(df: pd.DataFrame) -> pd.DataFrame:
        m = (
            df[df["role"].isin([LBL, MSG])]
            .groupby("k", sort=False, as_index=False)["x"]
            .min()
        )
        lbl = m.assign(role=LBL)
        req = pd.DataFrame({"k": m["x"].to_numpy(), "x": m["k"].to_numpy(), "role": REQ})
        return pd.concat([lbl, req], ignore_index=True)

    def _label_sum(ds: rd.Dataset) -> int:
        import pyarrow.compute as pc

        total = 0
        for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            live = b.filter(pc.equal(b.column("role"), LBL))
            if live.num_rows:
                total += pc.sum(live.column("x")).as_py()
        return total

    prev_sum = _label_sum(state)
    for _ in range(max_iters):
        msgs = bucketed_map_groups(
            adj.union(state), ["k"], _msgs, num_buckets=num_buckets, seed="cc"
        )
        state = bucketed_map_groups(
            msgs, ["k"], _fold, num_buckets=num_buckets, seed="cc"
        ).materialize()
        new_sum = _label_sum(state)
        if new_sum == prev_sum:
            break
        prev_sum = new_sum

    def _out(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        live = t.filter(pc.equal(t.column("role"), LBL))
        return pa.table({node_col: live.column("k"), comp_col: live.column("x")})

    return state.map_batches(_out, batch_format="pyarrow")
