"""Training-sequence preparation operators (LLM-data-pipeline layer).

Three ops a large-scale training-data pipeline runs after cleaning and
dedup, all deterministic and parallelism-invariant:

- **chunk_documents** — split every document into fixed-token-budget
  chunks (context-window chunking). Pure per-batch transform: tokens
  are the single-space split (mirrors DuckDB ``string_split(text, ' ')``
  exactly), chunk text is re-joined per window, so the whole output —
  text included — is SQL-value-hash checkable.
- **pack_sequences** — greedy first-fit-in-order bin packing of docs
  into token-budget bins (sequence packing). Greedy reset-on-overflow
  is inherently sequential, so it runs per GROUP (the packing unit a
  real pipeline uses: one stream per domain/shard) inside the bucketed
  exchange, ordered by doc id: deterministic at any parallelism. A doc
  larger than the budget gets a bin of its own (never dropped, never
  split — chunk first if that matters).
- **mix_domains** — weighted domain mixing: per-group keep rates
  applied via the Knuth multiplicative hash of the doc id (the
  q_sample_stratified trick) — integer arithmetic both sides, so SQL
  mirrors the exact row set; no RNG, no order dependence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

# Knuth multiplicative hash constants shared with the SQL oracles.
_KNUTH = 2654435761
_MOD = 4294967296


def chunk_documents(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 32,
) -> rd.Dataset:
    """Explode each document into consecutive ``max_tokens``-token
    chunks: (id, chunk_idx, n_tokens, chunk_text). Tokens = single-space
    split (no run collapsing — the SQL twin is string_split(text, ' '))."""

    def _chunk(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].fillna("").str.split(" ")
        n = toks.str.len().to_numpy(np.int64)
        n_chunks = np.maximum((n + max_tokens - 1) // max_tokens, 1)
        ids = np.repeat(df[id_col].to_numpy(), n_chunks)
        idx = np.concatenate([np.arange(c, dtype=np.int64) for c in n_chunks])
        starts = idx * max_tokens
        texts = [
            " ".join(t[s : s + max_tokens])
            for t, c in zip(toks, n_chunks)
            for s in range(0, int(c) * max_tokens, max_tokens)
        ]
        ntok = np.minimum(np.repeat(n, n_chunks) - starts, max_tokens)
        ntok = np.maximum(ntok, 0)  # empty doc -> one 0-token chunk
        return pd.DataFrame(
            {
                id_col: ids,
                "chunk_idx": idx,
                "n_tokens": ntok.astype(np.int64),
                "chunk_text": texts,
            }
        )

    return ds.map_batches(_chunk, batch_format="pandas")


def _greedy_bins(tokens: np.ndarray, budget: int) -> np.ndarray:
    """Greedy reset-on-overflow bin ids for an ordered token-count
    sequence. Sequential by definition; callers bound the input to one
    group's docs (the packing unit)."""
    bins = np.empty(len(tokens), dtype=np.int64)
    b, running = 0, 0
    for i, t in enumerate(tokens):
        t = int(t)
        if running > 0 and running + t > budget:
            b += 1
            running = 0
        running += t
        bins[i] = b
    return bins


def pack_sequences(
    ds: rd.Dataset,
    group_col: str = "lang",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 256,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Greedy in-order sequence packing per group: emits one row per
    input doc with its (group, bin_idx) assignment plus the bin's
    filled token count on each row (bin_tokens), ordered semantics
    fixed by ``id_col`` — deterministic at any parallelism.

    Scale shape: one bucketed exchange keyed by ``group_col``; the
    sequential greedy loop touches only token COUNTS (int64 array per
    group), never text. Self-check: raises if any multi-doc bin
    exceeds the budget or any doc is lost."""
    from engine.ops.bucket import bucketed_map_groups

    def _pack(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for g, gdf in df.groupby(group_col, sort=False):
            gdf = gdf.sort_values(id_col, kind="mergesort")
            toks = gdf[token_col].to_numpy(np.int64)
            bins = _greedy_bins(toks, budget)
            fill = pd.Series(toks).groupby(bins).transform("sum").to_numpy(np.int64)
            sizes = pd.Series(toks).groupby(bins).transform("size").to_numpy(np.int64)
            if ((fill > budget) & (sizes > 1)).any():
                raise AssertionError("pack_sequences: multi-doc bin over budget")
            outs.append(
                pd.DataFrame(
                    {
                        group_col: gdf[group_col].to_numpy(),
                        id_col: gdf[id_col].to_numpy(),
                        "bin_idx": bins,
                        "bin_tokens": fill,
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    return bucketed_map_groups(
        ds.select_columns([group_col, id_col, token_col]),
        [group_col],
        _pack,
        num_buckets=num_buckets,
        seed="pack",
    )


def mix_domains(
    ds: rd.Dataset,
    rates: dict[str, float],
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Weighted domain mixing: keep a deterministic ``rates[group]``
    fraction of each group, selected by the Knuth multiplicative hash of
    the id (integer threshold per group — the SQL twin computes the
    identical row set). Groups absent from ``rates`` are dropped
    (rate 0). Pure per-batch filter — no exchange, no RNG."""
    thresholds = {g: int(r * _MOD) for g, r in rates.items()}

    def _mix(df: pd.DataFrame) -> pd.DataFrame:
        h = (df[id_col].to_numpy(np.int64) * _KNUTH) % _MOD
        thr = df[group_col].map(thresholds).fillna(0).to_numpy(np.int64)
        return df[h < thr]

    return ds.map_batches(_mix, batch_format="pandas")
