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
    probed)."""
    d = ((queries[:, None, :].astype(np.float64) - centroids[None, :, :]) ** 2).sum(-1)
    probe = set(np.argsort(d, axis=1)[:, :n_probe].ravel().tolist())
    ref = ray.put((centroids, sorted(probe)))

    def _filter(df: pd.DataFrame) -> pd.DataFrame:
        cent, cells = _cached_get(ref)
        vecs = _stack(df, vec_col).astype(np.float64)
        dd = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = dd.argmin(1)
        return df[np.isin(assign, cells)]

    pruned = ds.map_batches(_filter, batch_format="pandas")
    return knn_brute(pruned, vec_col, id_col, queries, query_ids, k)


def cosine_near_dup_pairs(
    ds: rd.Dataset, vec_col: str, id_col: str, all_vecs: pa.Table, threshold: float
) -> rd.Dataset:
    """Embedding near-duplicate pairs: per-batch rows × broadcast full
    matrix, cosine ≥ threshold, i<j. O(n²/batch) flops, vectorized."""
    ids_all = np.asarray(all_vecs.column(id_col).to_pylist())
    m = np.stack([np.asarray(v, dtype=np.float64) for v in all_vecs.column(vec_col).to_pylist()])
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids_all, m))

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        aids, mat = _cached_get(ref)
        v = _stack(df, vec_col).astype(np.float64)
        v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        ids = df[id_col].to_numpy()
        cos = v @ mat.T
        rows = {"a": [], "b": [], "cos": []}
        for i in range(len(ids)):
            hit = np.nonzero((cos[i] >= threshold) & (aids > ids[i]))[0]
            rows["a"] += [int(ids[i])] * len(hit)
            rows["b"] += [int(x) for x in aids[hit]]
            rows["cos"] += [round(float(c), 6) for c in cos[i][hit]]
        return pd.DataFrame(rows)

    return ds.map_batches(_pairs, batch_format="pandas")
