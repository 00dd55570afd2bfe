"""Similarity search over an embedding column (training-data ops).

- knn_brute: baseline — numpy matmul per batch against a broadcast query
  matrix, per-batch partial top-k, then a tiny per-query merge. The
  shuffle moves k rows per query per batch, never vectors.
- knn_ivf: scale path — seeded k-means centroids (built driver-side on a
  sample, broadcast once), each batch keeps only vectors whose cell is
  probed by some query, then the same brute kernel. Recall depends on
  n_probe (documented, not exact).

Scores are integer-quantized dot products (round(x*1e6) per component,
exact int64 arithmetic) so the DuckDB oracle can reproduce them
bit-for-bit (float matmul order differences would break value-hash
equality).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from engine.ops.join import _cached_get

QUANT = 1_000_000

# kmeans per-iteration reduce gate: pull the long-form partials when their
# row count is bounded (k x d x n_batches); distributed grouped sum above.
_KMEANS_PULL_MAX = 2_000_000

# bottom-k sample finish gate: driver sort when the per-batch bottom-n
# partials (n x n_batches rows) are pull-bounded; distributed sort above.
_SAMPLE_PULL_MAX = 2_000_000


def _stack(df: pd.DataFrame, vec_col: str) -> np.ndarray:
    return np.stack(df[vec_col].to_numpy())


def quantize(m: np.ndarray) -> np.ndarray:
    return np.round(m.astype(np.float64) * QUANT).astype(np.int64)


def knn_brute(
    ds: rd.Dataset,
    vec_col: str,
    id_col: str,
    queries: np.ndarray,
    query_ids: list[int],
    k: int,
) -> rd.Dataset:
    """Top-k by quantized inner product, ties broken by id (ascending) —
    fully deterministic."""
    qm = quantize(queries)
    ref = ray.put((qm, np.asarray(query_ids)))

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:  # IVF cell pruning can emit empty frames
            return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                 "id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="int64")})
        q, qids = _cached_get(ref)
        vecs = quantize(_stack(df, vec_col))
        ids = df[id_col].to_numpy()
        scores = vecs @ q.T  # (n, nq) exact int64
        rows = {"query_id": [], "id": [], "score": []}
        kk = min(k, len(ids))
        for j in range(q.shape[0]):
            s = scores[:, j]
            order = np.lexsort((ids, -s))[:kk]  # score desc, id asc
            rows["query_id"] += [int(qids[j])] * len(order)
            rows["id"] += [int(i) for i in ids[order]]
            rows["score"] += [int(v) for v in s[order]]
        return pd.DataFrame(rows)

    partial = ds.map_batches(_partial, batch_format="pandas")

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["score", "id"], ascending=[False, True], kind="mergesort").head(k)

    return partial.groupby("query_id").map_groups(_merge, batch_format="pandas")


def bottomk_sample_rows(
    ds: rd.Dataset, id_col: str, n: int, seed: str = "ann-sample"
) -> list[dict]:
    """Deterministic order-independent sample of ``n`` rows: keep the rows
    whose seeded id hash is globally smallest (bottom-k sketch). Each batch
    keeps only its own bottom-``n`` (any global bottom-k row is in its
    batch's bottom-k), so the final sort+limit moves ≤ n rows per block —
    never the dataset. Unlike ``limit(n)`` this is uniform for sorted or
    clustered inputs (a clustered corpus would otherwise yield
    unrepresentative k-means centroids)."""

    import zlib

    # hash_key only keys object dtypes in pandas; mix a seed constant in
    # explicitly so integer id columns still get seed-dependent hashes.
    mix = np.uint64(zlib.crc32(seed.encode()) | 1)

    def _bottom(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.assign(__h=pd.Series(dtype="uint64"))
        ids = df[id_col].to_numpy()
        if np.issubdtype(ids.dtype, np.integer):
            # splitmix64 of (id ^ seed-mix): SQL-mirrorable bit-exactly
            # (engine/cdc/sqloracle.py::_sm64_cols) so sample-dependent
            # pipelines (k-means init) can be driver value-hash-checked.
            from engine.util.hashing import splitmix64

            h = splitmix64(ids.astype(np.int64).view(np.uint64) ^ mix)
        else:
            h = pd.util.hash_array(ids, hash_key=seed.ljust(16)[:16])
            h = (h ^ mix) * np.uint64(0x9E3779B97F4A7C15)
        df = df.assign(__h=h)
        if len(df) > n:
            df = df.iloc[np.argpartition(h, n)[:n]]
        return df

    from engine.util.collect import pull_arrow

    # Size-gated finish: each batch already collapsed to its bottom-n, so
    # when the partial total is pull-bounded a driver-side sort replaces
    # the distributed sort+limit (whose fixed exchange cost is ~3 s even
    # on a 2k-row table). Above the bound (n x n_batches partial rows at
    # corpus scale) the distributed sort runs. Both paths pick the same
    # rows; the id tiebreak pins order exactly.
    part = ds.map_batches(_bottom, batch_format="pandas").materialize()
    if part.count() <= _SAMPLE_PULL_MAX:
        tbl = pull_arrow(part)
        if tbl is None or tbl.num_rows == 0:
            return []
        df = tbl.to_pandas().sort_values(["__h", id_col], kind="mergesort").head(n)
        return df.drop(columns="__h").to_dict("records")
    tbl = pull_arrow(part.sort("__h").limit(n))
    if tbl is None:
        return []
    return tbl.drop_columns(["__h"]).to_pylist()


def build_centroids_int(sq: np.ndarray, k: int, iters: int = 10) -> np.ndarray:
    """Integer-exact Lloyd init on an (already quantized, already
    (hash, id)-sorted) sample: init = the first k sample rows, then each
    iteration runs the same exact-int64 assignment/fold as the main loop;
    centroid update = floor(sum/n + 0.5). Every step is deterministic
    integer (or literal-identical float-of-exact-ints) arithmetic, so
    the DuckDB oracle replays it bit-for-bit (sqlmirror.py::kmeans_cte)."""
    cq = sq[: min(k, len(sq))].copy()
    for _ in range(iters):
        _, part = _kmeans_partials(sq, cq)
        new = cq.copy()
        for c, n, s in zip(part["cluster"], part["n"], part["s"]):
            if n:
                new[int(c)] = np.floor(
                    np.asarray(s, dtype=np.int64) / int(n) + 0.5
                ).astype(np.int64)
        if np.array_equal(new, cq):
            break
        cq = new
    return cq


def build_centroids(sample: np.ndarray, n_cells: int, seed: int = 42, iters: int = 10) -> np.ndarray:
    """Seeded Lloyd k-means on a driver-side sample (small, one-time)."""
    rng = np.random.RandomState(seed)
    cent = sample[rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)].astype(
        np.float64
    )
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(cent)):
            pts = sample[assign == c]
            if len(pts):
                cent[c] = pts.mean(0)
    return cent


def _kmeans_partials(vq: np.ndarray, cq: np.ndarray) -> pd.DataFrame:
    """Per-batch Lloyd partial: exact-int64 assignment + per-cluster
    component sums. Assignment by the matmul identity argmin(|c|^2 -
    2 v.c) — |v|^2 is constant per row; everything stays int64 so the
    result is independent of batch boundaries and summation order."""
    cross = vq @ cq.T  # (n, k) exact int64
    cnorm = np.einsum("ij,ij->i", cq, cq)  # (k,) exact int64
    assign = (cnorm[None, :] - 2 * cross).argmin(1)  # first-min tie-break
    order = np.argsort(assign, kind="stable")
    sa = assign[order]
    uniq, starts = np.unique(sa, return_index=True)
    sums = np.add.reduceat(vq[order], starts, axis=0)  # int64 exact
    counts = np.diff(np.append(starts, len(sa))).astype(np.int64)
    return assign, pd.DataFrame(
        {"cluster": uniq.astype(np.int64), "n": counts, "s": list(sums)}
    )


def kmeans(
    ds: rd.Dataset,
    vec_col: str,
    id_col: str,
    k: int,
    iters: int = 5,
    sample_n: int = 4096,
    seed: int = 42,
) -> tuple[np.ndarray, rd.Dataset]:
    """Distributed Lloyd k-means over the FULL dataset, parallelism- and
    batch-order-invariant.

    Init: deterministic bottom-k-by-hash sample → driver-side
    integer-exact Lloyd (:func:`build_centroids_int`) on the module's
    exact-int64 grid. Each refinement round is ONE map_batches pass over the
    materialized (id, vec) projection emitting per-cluster partial
    (count, int64 component-sum) rows — at most k rows per batch cross
    to the driver, never vectors — reduced by exact integer addition
    (order-invariant), and the next centroids are round(sum/n) back on
    the quantized grid. Identical centroids at ANY parallelism or batch
    split, so the single-process reference in the tests matches
    bit-for-bit. Empty clusters keep their previous centroid; converged
    centroids stop the loop early.

    Returns (centroids float64 (k, d), assignment Dataset with
    [id_col, "cluster"]). The projection is materialized once and reused
    by every round and the final assignment pass (a lazy chain would
    re-read the source per round)."""
    data = ds.select_columns([id_col, vec_col]).materialize()
    sample_rows = bottomk_sample_rows(data, id_col, sample_n, seed=f"kmeans-{seed}")
    sample = _stack_any(sample_rows, vec_col)
    cq = build_centroids_int(quantize(sample), k)

    from engine.ops.agg import grouped_agg
    from engine.util.collect import pull_arrow

    d = cq.shape[1]
    for _ in range(iters):
        ref = ray.put(cq)

        def _partial(df: pd.DataFrame) -> pd.DataFrame:
            # Long form (cluster, dim, s, n): k x d rows per batch feed the
            # bucketed grouped-sum exchange, so the driver pull is O(k x d)
            # — independent of batch count, hence of corpus size (a direct
            # partial pull would be O(k x n_batches): 6e8 rows at a 1e10-
            # vector corpus). Integer sums keep both shapes bit-identical.
            if len(df) == 0:
                return pd.DataFrame({"cluster": pd.Series(dtype="int64"),
                                     "dim": pd.Series(dtype="int64"),
                                     "s": pd.Series(dtype="int64"),
                                     "n": pd.Series(dtype="int64")})
            vq = quantize(_stack(df, vec_col))
            _, part = _kmeans_partials(vq, _cached_get(ref))
            kk = len(part)
            return pd.DataFrame({
                "cluster": np.repeat(part["cluster"].to_numpy(), d),
                "dim": np.tile(np.arange(d, dtype=np.int64), kk),
                "s": np.concatenate(part["s"].to_numpy()) if kk else
                     np.array([], dtype=np.int64),
                # n repeats per dim row; summed per (cluster, dim) it is the
                # cluster's row count (each batch contributes once per pair).
                "n": np.repeat(part["n"].to_numpy(), d),
            })

        # Size-gated reduce, same pattern as the semi-join key-set build:
        # when the long-form partials are pull-bounded, one driver-side
        # pandas groupby sum replaces the grouped exchange (whose fixed
        # per-iteration cost is pure overhead single-node); above the
        # bound the bucketed grouped_agg runs distributed. Integer sums
        # make both paths bit-identical.
        part_ds = data.map_batches(_partial, batch_format="pandas").materialize()
        if part_ds.count() <= _KMEANS_PULL_MAX:
            tbl = pull_arrow(part_ds)
            pdf = (
                tbl.to_pandas().groupby(["cluster", "dim"], as_index=False)[["s", "n"]].sum()
                if tbl is not None and tbl.num_rows
                else None
            )
        else:
            tbl = pull_arrow(
                grouped_agg(part_ds, ["cluster", "dim"], {"s": ("sum", "s"), "n": ("sum", "n")})
            )
            pdf = tbl.to_pandas() if tbl is not None and tbl.num_rows else None
        new = cq.copy()
        if pdf is not None:
            pdf = pdf.sort_values(["cluster", "dim"])
            for c, grp in pdf.groupby("cluster", sort=True):
                n = int(grp["n"].iloc[0])
                if n:
                    total = grp["s"].to_numpy().astype(np.int64)
                    # floor(x+0.5), not np.round: half-up rounding the
                    # SQL oracle mirrors exactly (np.round is half-even).
                    new[int(c)] = np.floor(total / n + 0.5).astype(np.int64)
        if np.array_equal(new, cq):
            break
        cq = new

    ref = ray.put(cq)

    def _assign(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "cluster": pd.Series(dtype="int64")})
        vq = quantize(_stack(df, vec_col))
        assign, _ = _kmeans_partials(vq, _cached_get(ref))
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "cluster": assign.astype(np.int64)})

    return cq.astype(np.float64) / QUANT, data.map_batches(_assign, batch_format="pandas")


def knn_ivf(
    ds: rd.Dataset,
    vec_col: str,
    id_col: str,
    queries: np.ndarray,
    query_ids: list[int],
    k: int,
    centroids: np.ndarray,
    n_probe: int = 4,
) -> rd.Dataset:
    """IVF-pruned ANN: only vectors in cells probed by some query are
    scored. Approximate (recall < 1 when the true neighbor's cell is not
    probed). INTEGER centroids (build_centroids_int output) switch the
    probe/assignment to exact int64 arithmetic — deterministic AND
    SQL-mirrorable (sqlmirror.py::ivf_knn_sql); float centroids keep the
    original float path."""
    centroids = np.asarray(centroids)
    if np.issubdtype(centroids.dtype, np.integer):
        cq = centroids.astype(np.int64)
        qq = quantize(queries)
        cnorm = np.einsum("ij,ij->i", cq, cq)
        dd = cnorm[None, :] - 2 * (qq @ cq.T)  # exact int64
        # ties to the lower cell id (stable argsort) — mirrors the SQL
        # row_number ORDER BY dd, cluster
        probe = set(np.argsort(dd, axis=1, kind="stable")[:, :n_probe].ravel().tolist())
        ref = ray.put((cq, sorted(probe)))

        def _filter(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return df
            cent, cells = _cached_get(ref)
            vq = quantize(_stack(df, vec_col))
            ddv = np.einsum("ij,ij->i", cent, cent)[None, :] - 2 * (vq @ cent.T)
            assign = ddv.argmin(1)  # first-min = lowest cell id on ties
            return df[np.isin(assign, cells)]
    else:
        d = ((queries[:, None, :].astype(np.float64) - centroids[None, :, :]) ** 2).sum(-1)
        probe = set(np.argsort(d, axis=1)[:, :n_probe].ravel().tolist())
        ref = ray.put((centroids, sorted(probe)))

        def _filter(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return df
            cent, cells = _cached_get(ref)
            vecs = _stack(df, vec_col).astype(np.float64)
            # argmin|x-c|^2 = argmin(|c|^2 - 2 x.c): matmul, no (n, cells, dim) temp
            dd = (cent * cent).sum(1)[None, :] - 2.0 * (vecs @ cent.T)
            assign = dd.argmin(1)
            return df[np.isin(assign, cells)]

    pruned = ds.map_batches(_filter, batch_format="pandas")
    return knn_brute(pruned, vec_col, id_col, queries, query_ids, k)


def cosine_near_dup_pairs(
    ds: rd.Dataset,
    vec_col: str,
    id_col: str,
    threshold: float,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    sample_size: int = 2048,
) -> rd.Dataset:
    """Embedding near-duplicate pairs (cos ≥ threshold, a<b) via IVF-cell
    co-partitioned pairing — the scale path:

    1. seeded k-means centroids from a bounded driver-side sample; only
       the tiny centroid matrix is broadcast (``ray.put`` once);
    2. each vector is routed to its ``n_probe`` nearest cells (multi-probe
       catches cross-boundary pairs), so the exchange moves each vector a
       constant number of times — never the full matrix;
    3. exact all-pairs cosine INSIDE each cell (one vectorized matmul per
       cell, O(Σ cell² ) flops ≈ n²/n_cells when balanced, vs the
       round-1 broadcast version's O(n²) with the whole matrix in every
       worker's heap);
    4. pairs found in more than one probed cell are deduped.

    Approximate: a pair is missed iff its two vectors share no probed
    cell (recall measured vs brute force in tests/test_ops_content.py).
    """
    from engine.ops.dedup import exact_dedup

    rows = bottomk_sample_rows(ds, id_col, sample_size, seed=f"cnd-{seed}")
    if not rows:  # empty corpus → no pairs
        return rd.from_arrow(
            pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                      "cos": pa.array([], pa.float64())})
        )
    sample = _stack_any(rows, vec_col)
    # Integer-exact routing cells (build_centroids_int): blocking by
    # quantized Euclidean cells instead of normalized-cosine cells makes
    # the WHOLE operator — routing, pairing, the cosine itself —
    # deterministic integer arithmetic (plus float divisions of exact
    # ints), so the DuckDB oracle replays it bit-for-bit
    # (sqlmirror.py::cosine_pairs_sql). Multi-probe keeps cross-cell
    # recall; the per-cell pairing is exact as before.
    cq = build_centroids_int(quantize(sample), n_cells)
    ref = ray.put(cq)
    probe = min(n_probe, len(cq))

    def _route(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"cell": [], id_col: [], vec_col: []})
        c = _cached_get(ref)
        vq = quantize(_stack(df, vec_col))
        cnorm = np.einsum("ij,ij->i", c, c)  # exact int64
        dd = cnorm[None, :] - 2 * (vq @ c.T)
        # top-probe cells by smallest distance, ties to the lower cell id
        cells = np.argsort(dd, axis=1, kind="stable")[:, :probe]
        n = len(df)
        reps = np.repeat(np.arange(n), probe)
        return pd.DataFrame(
            {
                "cell": cells.ravel(),
                id_col: df[id_col].to_numpy()[reps],
                vec_col: [vq[i] for i in reps],
            }
        )

    def _cell_pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
                              "cos": pd.Series(dtype="float64")})
        out = [empty]
        for _, d in df.groupby("cell", sort=False):
            d = d.drop_duplicates(id_col)
            if len(d) < 2:
                continue
            ids = d[id_col].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            mat = np.stack(d[vec_col].to_numpy())[order]  # int64 quantized
            dot = mat @ mat.T  # exact int64 (|v|~4e6, 64 dims → ≤ ~1e15)
            nn = np.einsum("ij,ij->i", mat, mat)  # exact int64 norms²
            # cos = dot / sqrt(na*nb): na*nb overflows int64, so the
            # product is formed in float64 from exact ints — the same
            # double the SQL twin computes — and IEEE sqrt/divide are
            # correctly rounded, so both sides get identical doubles.
            denom = np.sqrt(nn.astype(np.float64)[:, None] * nn.astype(np.float64)[None, :])
            cos = dot / np.maximum(denom, 1e-12)
            cos = np.floor(cos * 1e6 + 0.5) / 1e6  # SQL-mirrorable rounding
            ii, jj = np.nonzero(np.triu(cos >= threshold, k=1))
            if len(ii) == 0:
                continue
            out.append(pd.DataFrame({
                "a": ids[ii].astype("int64"),
                "b": ids[jj].astype("int64"),
                "cos": cos[ii, jj],
            }))
        return pd.concat(out, ignore_index=True)

    routed = ds.map_batches(_route, batch_format="pandas")
    pairs = routed.groupby("cell").map_groups(_cell_pairs, batch_format="pandas")
    return exact_dedup(pairs, ["a", "b"], tiebreak="a")


def _stack_any(rows: list[dict], vec_col: str) -> np.ndarray:
    return np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])


# ---- Product quantization (PQ) ----------------------------------------------
#
# The memory scale path for 100-TB embedding corpora: a 64-dim float32
# vector (256 B) compresses to n_sub uint8 codes (8 B at n_sub=8, 32x).
# Asymmetric distance computation (ADC) scores a query against codes via
# per-subspace lookup tables — no decompression, one gather + sum per
# subspace. Everything is seeded/deterministic; scores are approximate
# by construction (quantization error), so PQ queries are rows-only with
# a recall-vs-brute-force test, like IVF.


def build_pq_codebook(
    sample: np.ndarray, n_sub: int = 8, n_centroids: int = 256, seed: int = 42,
    iters: int = 10,
) -> np.ndarray:
    """Per-subspace k-means codebook, shape (n_sub, n_centroids, sub_dim).
    Built once driver-side on a bounded sample (bottomk_sample_rows),
    broadcast to every scoring task."""
    dim = sample.shape[1]
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    sub = dim // n_sub
    return np.stack(
        [
            build_centroids(
                sample[:, s * sub : (s + 1) * sub], n_centroids, seed=seed + s,
                iters=iters,
            )
            for s in range(n_sub)
        ]
    )


def build_pq_codebook_int(
    sq: np.ndarray, n_sub: int = 8, n_centroids: int = 256, iters: int = 10
) -> np.ndarray:
    """Integer-exact per-subspace codebook (build_centroids_int on each
    quantized subvector slice of the (hash, id)-sorted sample) — every
    step deterministic int64, so the DuckDB oracle replays codebook,
    codes, lookup tables and ADC scores bit-for-bit
    (sqlmirror.py::pq_knn_sql). Shape (n_sub, n_centroids, sub_dim)."""
    dim = sq.shape[1]
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    sub = dim // n_sub
    return np.stack(
        [
            build_centroids_int(sq[:, s * sub : (s + 1) * sub], n_centroids, iters)
            for s in range(n_sub)
        ]
    )


def _pq_codes(vecs: np.ndarray, codebook: np.ndarray) -> np.ndarray:
    """(n, n_sub) uint8 nearest-centroid codes, vectorized per subspace.
    argmin|x-c|^2 = argmin(|c|^2 - 2 x.c): one (n, n_centroids) matmul
    per subspace instead of the (n, n_centroids, sub_dim) broadcast temp
    (1.6 GB per 100k-vector batch on this box's weak memory path)."""
    n_sub, _, sub = codebook.shape
    if np.issubdtype(codebook.dtype, np.integer):
        vq = quantize(vecs)
        out = np.empty((len(vecs), n_sub), dtype=np.uint8)
        for s in range(n_sub):
            seg = vq[:, s * sub : (s + 1) * sub]
            c = codebook[s]
            d = np.einsum("ij,ij->i", c, c)[None, :] - 2 * (seg @ c.T)  # int64
            out[:, s] = d.argmin(1).astype(np.uint8)  # ties → lower code
        return out
    out = np.empty((len(vecs), n_sub), dtype=np.uint8)
    for s in range(n_sub):
        seg = vecs[:, s * sub : (s + 1) * sub]
        c = codebook[s]
        d = (c * c).sum(1)[None, :] - 2.0 * (seg @ c.T)
        out[:, s] = d.argmin(1).astype(np.uint8)
    return out


def pq_encode(
    ds: rd.Dataset, vec_col: str, id_col: str, codebook: np.ndarray
) -> rd.Dataset:
    """Compress the corpus: (id, code_0..code_{n_sub-1}) uint8 columns —
    the persistent ANN index a real pipeline writes back to Parquet."""
    ref = ray.put(codebook)

    def _enc(df: pd.DataFrame) -> pd.DataFrame:
        cb = _cached_get(ref)
        if len(df) == 0:
            return pd.DataFrame(
                {id_col: pd.Series(dtype="int64")}
                | {f"code_{s}": pd.Series(dtype="uint8") for s in range(cb.shape[0])}
            )
        codes = _pq_codes(_stack(df, vec_col).astype(np.float64), cb)
        out = {id_col: df[id_col].to_numpy()}
        for s in range(cb.shape[0]):
            out[f"code_{s}"] = codes[:, s]
        return pd.DataFrame(out)

    return ds.map_batches(_enc, batch_format="pandas")


def knn_pq(
    codes_ds: rd.Dataset,
    id_col: str,
    queries: np.ndarray,
    query_ids: list[int],
    k: int,
    codebook: np.ndarray,
) -> rd.Dataset:
    """ADC top-k over PQ codes: per query and subspace, the lookup table
    holds the quantized dot product of the query subvector with each
    centroid; a vector's approximate score is the sum of its n_sub table
    entries (int64-exact given the quantized tables, so ties and order
    are deterministic). The shuffle moves ≤ k rows per query per block."""
    n_sub = codebook.shape[0]
    sub = codebook.shape[2]
    cb_q = (
        codebook.astype(np.int64)
        if np.issubdtype(codebook.dtype, np.integer)
        else np.stack([quantize(codebook[s]) for s in range(n_sub)])
    )
    # LUT[q, s, c] = quantized <query_q[s], centroid_{s,c}>
    lut = np.stack(
        [
            quantize(queries[:, s * sub : (s + 1) * sub].astype(np.float64))
            @ cb_q[s].T
            for s in range(n_sub)
        ],
        axis=1,
    )  # (nq, n_sub, n_centroids) int64 — quantized twice: QUANT^2 scale
    ref = ray.put((lut, np.asarray(query_ids)))

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                 "id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="int64")})
        tables, qids = _cached_get(ref)
        codes = np.stack([df[f"code_{s}"].to_numpy() for s in range(n_sub)], axis=1)
        ids = df[id_col].to_numpy()
        rows = {"query_id": [], "id": [], "score": []}
        for qi, qid in enumerate(qids):
            # gather-sum: scores[n] = sum_s LUT[qi, s, codes[n, s]]
            scores = tables[qi][np.arange(n_sub)[None, :], codes].sum(1)
            kk = min(k, len(ids))
            top = np.argpartition(-scores, kk - 1)[:kk]
            rows["query_id"] += [int(qid)] * kk
            rows["id"] += ids[top].tolist()
            rows["score"] += scores[top].tolist()
        return pd.DataFrame(rows).astype({"query_id": "int64", "id": "int64", "score": "int64"})

    partial = codes_ds.map_batches(_partial, batch_format="pandas")

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_id", "score", "id"], ascending=[True, False, True])
        return df.groupby("query_id", sort=False).head(k).reset_index(drop=True)

    from engine.ops.bucket import bucketed_map_groups

    return bucketed_map_groups(partial, ["query_id"], _final, seed="pq")


# ---- IVF-PQ (coarse cells + residual product quantization) ------------------


def residual_pq_codebook(
    sq: np.ndarray, coarse: np.ndarray, n_sub: int = 8, n_centroids: int = 64,
    iters: int = 10,
) -> np.ndarray:
    """Residual PQ codebook (the classic IVFPQ construction): each
    sample vector's residual against its own coarse cell is what the
    per-subspace codebooks quantize. All int64 (quantized grid), so the
    DuckDB oracle replays training bit-for-bit."""
    cnorm = np.einsum("ij,ij->i", coarse, coarse)
    assign = (cnorm[None, :] - 2 * (sq @ coarse.T)).argmin(1)
    res = sq - coarse[assign]
    return build_pq_codebook_int(res, n_sub=n_sub, n_centroids=n_centroids, iters=iters)


def knn_ivfpq(
    ds: rd.Dataset,
    vec_col: str,
    id_col: str,
    queries: np.ndarray,
    query_ids: list[int],
    k: int,
    coarse: np.ndarray,
    codebook: np.ndarray,
    n_probe: int = 4,
) -> rd.Dataset:
    """IVF-PQ ANN — the production-shape composed index: coarse integer
    cells route (only vectors in cells probed by some query are scored),
    residual PQ codes compress, and ADC scores via per-(query, cell)
    lookup tables lut[q, cell, s, code] = <(q − c)_s, codeword> — the
    residual identity means one LUT per probed cell, no decompression.
    Everything int64-exact: routing, residuals, codes, LUTs, scores —
    deterministic ties (score desc, id asc) and SQL-replayable
    (sqlmirror.py::ivfpq_knn_sql). Approximate by construction
    (quantization error + unprobed cells), like IVF and PQ.

    Scale shape: the codebook/coarse matrices broadcast once via
    ray.put; each batch computes its own codes and partial top-k, the
    shuffle moves ≤ k rows per query per batch."""
    cq = coarse.astype(np.int64)
    n_sub, ncent, sub = codebook.shape
    qq = quantize(queries)
    cnorm = np.einsum("ij,ij->i", cq, cq)
    dq = cnorm[None, :] - 2 * (qq @ cq.T)
    probes = np.argsort(dq, axis=1, kind="stable")[:, :n_probe]  # (nq, n_probe)
    # Inner-product ADC over residual codes: <q, v> = <q, c + r>
    # ~ <q, c_cell> + sum_s <q_s, codeword> — a CELL-INDEPENDENT lookup
    # table lut[q, s, code] plus a per-(query, cell) offset. (The
    # residual subtraction lives in the CODES, which quantize v - c;
    # the L2-style (q - c) table is the wrong identity for dot products.)
    lut = np.stack(
        [qq[:, s * sub : (s + 1) * sub] @ codebook[s].T for s in range(n_sub)],
        axis=1,
    )  # (nq, n_sub, ncent) int64
    offset = qq @ cq.T  # (nq, n_cells) int64
    ref = ray.put((cq, codebook, probes, lut, offset, np.asarray(query_ids)))

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                 "id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="int64")})
        cent, cb, prb, tables, offs, qids = _cached_get(ref)
        vq = quantize(_stack(df, vec_col))
        ids = df[id_col].to_numpy()
        cn = np.einsum("ij,ij->i", cent, cent)
        assign = (cn[None, :] - 2 * (vq @ cent.T)).argmin(1)
        res = vq - cent[assign]
        nsub, nct, sb = cb.shape
        codes = np.empty((len(vq), nsub), dtype=np.int64)
        for s in range(nsub):
            seg = res[:, s * sb : (s + 1) * sb]
            c = cb[s]
            d = np.einsum("ij,ij->i", c, c)[None, :] - 2 * (seg @ c.T)
            codes[:, s] = d.argmin(1)
        rows = {"query_id": [], "id": [], "score": []}
        for qi, qid in enumerate(qids):
            keep = np.isin(assign, prb[qi])
            if not keep.any():
                continue
            kidx = np.flatnonzero(keep)
            # cell offset + gather-sum over the cell-independent LUT
            scores = offs[qi][assign[kidx]] + tables[qi][
                np.arange(nsub)[None, :], codes[kidx]
            ].sum(1)
            kk = min(k, len(kidx))
            top = np.lexsort((ids[kidx], -scores))[:kk]
            rows["query_id"] += [int(qid)] * kk
            rows["id"] += ids[kidx][top].tolist()
            rows["score"] += scores[top].tolist()
        return pd.DataFrame(rows).astype(
            {"query_id": "int64", "id": "int64", "score": "int64"}
        )

    partial = ds.map_batches(_partial, batch_format="pandas")

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_id", "score", "id"],
                            ascending=[True, False, True])
        return df.groupby("query_id", sort=False).head(k).reset_index(drop=True)

    from engine.ops.bucket import bucketed_map_groups

    return bucketed_map_groups(partial, ["query_id"], _final, seed="ivfpq")
