"""Text analysis for training-data pipelines: quality scoring, token
counting, language ID, document fingerprinting.

Definitions are deliberately SQL-mirrorable where an oracle exists:
- n_tokens = length(string_split(text, ' ')) ≡ count(' ')+1
- punct_ratio = punct_chars / n_chars (as double)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from engine.util.hashing import actor_pool_size

PUNCT_RE = r"[.,;:!?]"

STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "mit"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "des", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "que", "por"},
}


def text_stats(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Vectorized quality features per document (pandas str kernels)."""

    def _stats(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].fillna("")
        n_chars = s.str.len().astype("int64")
        n_tokens = (s.str.count(" ") + 1).astype("int64")
        n_punct = s.str.count(PUNCT_RE).astype("int64")
        out = df.copy()
        out["n_chars"] = n_chars
        out["n_tokens"] = n_tokens
        out["punct_ratio"] = (n_punct / n_chars.clip(lower=1)).round(6)
        out["avg_token_len"] = (n_chars / n_tokens.clip(lower=1)).round(6)
        return out

    return ds.map_batches(_stats, batch_format="pandas")


def quality_score(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Scalar quality score in [0,1]: length band + punctuation sanity +
    stopword presence (heuristic, mirrors public data-quality filters)."""
    stop_all = set().union(*STOPWORDS.values())

    class Scorer:
        def __init__(self):
            self.stop = stop_all

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            s = df[text_col].fillna("")
            n = s.str.len().clip(lower=1)
            len_score = np.minimum(n / 200.0, 1.0)
            punct = s.str.count(PUNCT_RE) / n
            punct_score = 1.0 - np.minimum(punct * 5.0, 1.0)
            toks = s.str.lower().str.split()
            stop_ratio = toks.map(
                lambda ws: sum(w in self.stop for w in ws) / max(1, len(ws))
            )
            out = df.copy()
            out["quality"] = (
                0.4 * len_score + 0.3 * punct_score + 0.3 * np.minimum(stop_ratio * 4, 1.0)
            ).round(6)
            return out

    return ds.map_batches(Scorer, batch_format="pandas", concurrency=actor_pool_size(4), batch_size=1024)


class LangId:
    """n-gram/stopword language heuristic (actor pool: profiles built
    once per actor). Emits lang_pred + a confidence ratio."""

    def __init__(self):
        self.profiles = {lang: ws for lang, ws in STOPWORDS.items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        preds, confs = [], []
        for text in df["text"].fillna(""):
            toks = text.lower().split()[:200]
            best, best_n = "unknown", 0
            total = max(1, len(toks))
            for lang, ws in self.profiles.items():
                n = sum(t in ws for t in toks)
                if n > best_n:
                    best, best_n = lang, n
            preds.append(best if best_n else "unknown")
            # integer micro-confidence (round-half-up in exact integer
            # arithmetic) — bit-identical in SQL, no float rounding hazard
            confs.append((best_n * 2_000_000 + total) // (2 * total))
        out = df.copy()
        out["lang_pred"] = preds
        out["lang_conf_micro"] = pd.array(confs, dtype="int64")
        return out


def lang_id(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(LangId, batch_format="pandas", concurrency=actor_pool_size(4), batch_size=1024)


def fingerprint(ds: rd.Dataset, text_col: str = "text", w: int = 5) -> rd.Dataset:
    """Document fingerprint: minimum rolling hash over word w-grams
    (winnowing-style representative hash). Deterministic."""

    def _fp(df: pd.DataFrame) -> pd.DataFrame:
        fps = []
        for text in df[text_col].fillna(""):
            toks = text.split()
            if len(toks) < w:
                grams = [" ".join(toks)]
            else:
                grams = [" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)]
            hs = pd.util.hash_array(np.asarray(grams, dtype=object), hash_key="docfingerprint16")
            fps.append(int(hs.min()))
        out = df.copy()
        out["doc_fp"] = pd.array(np.array(fps, dtype=np.uint64).astype(np.int64).tolist(), dtype="int64")
        return out

    return ds.map_batches(_fp, batch_format="pandas")


def word_counts(ds: rd.Dataset, text_col: str = "text", num_buckets: int = 64) -> rd.Dataset:
    """Corpus vocabulary counts: per-batch vectorized tokenize+count
    combiner (one row per word per batch) → hash-bucket shuffle →
    per-bucket sum. The shuffle moves (word, partial_count), never text."""
    from engine.util.hashing import fast_hash_column

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        # Split on spaces only (empty tokens from runs are filtered) so
        # semantics match the SQL twin string_split_regex(text, ' +')
        # for any corpus, not just whitespace-normalized ones.
        words = df[text_col].fillna("").str.split(" ").explode()
        words = words[words.str.len() > 0]
        out = words.value_counts().rename_axis("word").reset_index(name="n")
        out["__bucket"] = fast_hash_column(out["word"], num_buckets, seed="wc")
        return out

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("word", sort=False, as_index=False)["n"].sum()

    return (
        ds.select_columns([text_col])
        .map_batches(_partial, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(_final, batch_format="pandas")
    )


TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_count_regex(ds: rd.Dataset, text_col: str = "text", pattern: str = TOKEN_RE) -> rd.Dataset:
    """BPE-ish regex token count (word / number / punctuation tokens,
    leftmost-longest like a tokenizer's pre-split). Vectorized pandas
    str.count — the same non-overlapping match semantics as the SQL
    twin's regexp_extract_all."""

    def _count(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["n_tokens_re"] = df[text_col].fillna("").str.count(pattern).astype("int64")
        return out

    return ds.map_batches(_count, batch_format="pandas")
