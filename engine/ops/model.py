"""Deterministic model-scoring stage (SURVEY.md §2.3 A2).

Stands in for any batched model-inference step of a training-data
pipeline: the "model" is a seeded random projection over hashed char
3-gram counts — loaded ONCE per actor in ``__init__`` (the pattern that
matters at scale), applied vectorized per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def model_weights_micro(seed: int = 42, vocab: int = 1024, dim: int = 32) -> np.ndarray:
    """First-dimension projection weights quantized to micro units —
    shared by the scorer and the DuckDB oracle builder (which inlines
    the 1024 integers as literals, so the RNG itself never needs a SQL
    mirror)."""
    rng = np.random.RandomState(seed)
    proj = rng.standard_normal((vocab, dim)).astype(np.float32)
    return np.floor(proj[:, 0].astype(np.float64) * 1e6 + 0.5).astype(np.int64)


class DeterministicEmbedder:
    def __init__(self, seed: int = 42, dim: int = 32, vocab: int = 1024, text_col: str = "text"):
        rng = np.random.RandomState(seed)
        self.proj = rng.standard_normal((vocab, dim)).astype(np.float32)  # "weights"
        self.w0 = np.floor(self.proj[:, 0].astype(np.float64) * 1e6 + 0.5).astype(np.int64)
        self.vocab, self.dim, self.text_col = vocab, dim, text_col

    def _counts(self, text: str) -> np.ndarray:
        b = np.frombuffer((text or "  ").encode("utf-8"), dtype=np.uint8).astype(np.int64)
        if len(b) < 3:
            b = np.pad(b, (0, 3 - len(b)))
        tri = (b[:-2] * 31 * 31 + b[1:-1] * 31 + b[2:]) % self.vocab
        return np.bincount(tri, minlength=self.vocab).astype(np.int64)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        counts = np.stack([self._counts(t) for t in df[self.text_col]])
        total = counts.sum(axis=1)
        feats = counts.astype(np.float32) / np.maximum(1.0, total)[:, None].astype(np.float32)
        emb = feats @ self.proj
        norm = np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        emb = emb / norm
        out = df.copy()
        out["model_embedding"] = list(emb.astype(np.float32))
        # Integer-exact score: Σ count·w0_micro is exact int64 (order-
        # free), the division by (n_trigrams · 1e6) is a float op on
        # exact ints — the DuckDB oracle reproduces it bit-for-bit
        # (the float-BLAS normalized embedding stays engine-only).
        s = counts @ self.w0
        score = s / (np.maximum(total, 1) * 1000000.0)
        out["model_score"] = np.floor(score * 1e6 + 0.5) / 1e6
        return out


def score_documents(ds: rd.Dataset, seed: int = 42, concurrency: int = 4, batch_size: int = 1024) -> rd.Dataset:
    """Actor-pool inference: weights live per actor, work is batched."""
    return ds.map_batches(
        DeterministicEmbedder,
        fn_constructor_kwargs=dict(seed=seed),
        batch_format="pandas",
        concurrency=concurrency,
        batch_size=batch_size,
    )
