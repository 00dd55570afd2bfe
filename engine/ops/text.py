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
    once per actor). Emits lang_pred + a confidence ratio.

    Vectorized: tokenize once, factorize the flat token array (ONE hash
    pass), then per language a tiny ``np.isin`` over the batch's UNIQUE
    tokens broadcast back through the codes + one ``bincount`` — the
    per-token work is O(uniques), not O(tokens). Measured on this box
    (10k sf0.01 docs): factorize path 0.007 s for the counting vs 0.24 s
    for explode+isin+groupby and ~0.6 s for the old per-doc loop's
    membership scans; tokenization (~0.14 s, shared by every variant)
    now dominates. Semantics are bit-identical to the row-at-a-time form
    the SQL oracle mirrors: first-200-token window, strict-greater
    replacement = first-max tie-break in profile insertion order
    (``argmax`` returns the first maximum), exact-integer
    micro-confidence."""

    def __init__(self):
        self.profiles = {lang: ws for lang, ws in STOPWORDS.items()}
        self.langs = np.array(list(self.profiles))
        self.ws_arrays = [
            np.array(sorted(ws), dtype=object) for ws in self.profiles.values()
        ]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from itertools import chain

        toks = df["text"].fillna("").str.lower().str.split().str[:200]
        lens = toks.str.len().to_numpy(dtype=np.int64)
        total = np.maximum(lens, 1)
        n = len(df)
        counts = np.zeros((n, len(self.langs)), dtype=np.int64)
        if lens.sum():
            flat = np.fromiter(
                chain.from_iterable(toks), dtype=object, count=int(lens.sum())
            )
            codes, uniques = pd.factorize(flat)
            row = np.repeat(np.arange(n), lens)
            for j, ws in enumerate(self.ws_arrays):
                hits = np.isin(uniques, ws)[codes]
                if hits.any():
                    counts[:, j] = np.bincount(row[hits], minlength=n)
        best_j = counts.argmax(1)
        best_n = counts[np.arange(n), best_j]
        out = df.copy()
        out["lang_pred"] = np.where(best_n > 0, self.langs[best_j], "unknown")
        # integer micro-confidence (round-half-up in exact integer
        # arithmetic) — bit-identical in SQL, no float rounding hazard
        out["lang_conf_micro"] = pd.array(
            (best_n * 2_000_000 + total) // (2 * total), dtype="int64"
        )
        return out


def lang_id(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(LangId, batch_format="pandas", concurrency=actor_pool_size(4), batch_size=1024)


_FP_PAD = np.uint64(0x9E3779B97F4A7C15)  # pad-token hash for docs shorter than w
_FP_B = np.uint64(1099511628211)  # FNV-64 prime (odd → full-period mod 2^64)
_FNV_BASIS = np.uint64(0xCBF29CE484222325)


def fnv1a_tokens(tokens: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a/64 over each token's utf-8 bytes. Tokens come
    from ``str.split()`` so they contain no NUL or whitespace: ONE
    NUL-joined encode gives a flat byte array whose zero positions are
    the token boundaries, then max_token_len masked multiply-xor passes
    hash every token with no per-token Python loop. FNV-1a is public and
    byte-sequential, so the SQL oracle mirrors it with a ``list_reduce``
    over codepoints (ASCII corpus: codepoint == utf-8 byte) —
    engine/pipelines/sqlmirror.py::fingerprint_sql."""
    n = len(tokens)
    if n == 0:
        return np.empty(0, np.uint64)
    blob = np.frombuffer(("\x00".join(tokens) + "\x00").encode("utf-8"), dtype=np.uint8)
    zpos = np.flatnonzero(blob == 0)
    starts = np.empty(n, np.int64)
    starts[0] = 0
    starts[1:] = zpos[:-1] + 1
    lens = zpos - starts
    h = np.full(n, _FNV_BASIS, np.uint64)
    for j in range(int(lens.max())):
        m = lens > j
        h[m] = (h[m] ^ blob[starts[m] + j].astype(np.uint64)) * _FP_B
    return h


def fingerprint(ds: rd.Dataset, text_col: str = "text", w: int = 5) -> rd.Dataset:
    """Document fingerprint: minimum rolling polynomial hash over word
    w-grams (winnowing-style representative hash). Deterministic.

    Fully vectorized: ONE keyed C-level hash pass over the exploded token
    array, then the w-gram hash is Σ_j h(tok_{i+j})·B^(w-1-j) mod 2^64 —
    w shifted multiply-adds over the whole batch — and the per-doc min
    falls out of one ``np.minimum.reduceat``. Docs shorter than w tokens
    are padded with a constant pad hash so every doc has exactly
    max(1, L-w+1) windows; no per-document Python loop anywhere."""

    def _fp(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].fillna("").str.split().reset_index(drop=True)
        lens = s.str.len().to_numpy(dtype=np.int64)
        ndoc = len(lens)
        out = df.copy()
        if ndoc == 0:
            out["doc_fp"] = pd.array([], dtype="int64")
            return out
        ex = s.explode()
        toks = ex[ex.notna()].to_numpy(dtype=object)
        th = fnv1a_tokens(toks)  # uint64, SQL-mirrorable
        # Pad short docs to w slots so window arithmetic is uniform.
        new_lens = np.maximum(lens, w)
        off_new = np.zeros(ndoc + 1, dtype=np.int64)
        np.cumsum(new_lens, out=off_new[1:])
        flat = np.full(off_new[-1], _FP_PAD, dtype=np.uint64)
        off_old = np.zeros(ndoc + 1, dtype=np.int64)
        np.cumsum(lens, out=off_old[1:])
        idx = np.repeat(off_new[:-1], lens) + (
            np.arange(off_old[-1]) - np.repeat(off_old[:-1], lens)
        )
        flat[idx] = th
        # Rolling polynomial over every window of w consecutive slots.
        n_win_total = len(flat) - w + 1
        h = np.zeros(n_win_total, dtype=np.uint64)
        for j in range(w):
            # power computed in Python ints mod 2^64 (numpy uint64 SCALAR
            # multiply warns on wraparound; array ops below wrap silently)
            p = np.uint64(pow(int(_FP_B), w - 1 - j, 1 << 64))
            h += flat[j : j + n_win_total] * p
        # Valid (non-boundary-crossing) windows per doc, then per-doc min.
        n_win = new_lens - w + 1
        win_off = np.zeros(ndoc + 1, dtype=np.int64)
        np.cumsum(n_win, out=win_off[1:])
        vidx = np.repeat(off_new[:-1], n_win) + (
            np.arange(win_off[-1]) - np.repeat(win_off[:-1], n_win)
        )
        fps = np.minimum.reduceat(h[vidx], win_off[:-1])
        out["doc_fp"] = pd.array(fps.astype(np.int64), dtype="int64")
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


# PII patterns (RE2 syntax — identical engine in Arrow and DuckDB, so the
# SQL oracle's regexp_replace(g) chain is bit-mirrorable). Order matters:
# emails before phone-ish digit runs (an email's digits must not be
# half-redacted first).
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    (r"\+?\d[\d -]{7,}\d", "[PHONE]"),
)


def redact_pii(ds: rd.Dataset, text_col: str = "text", out_col: str | None = None) -> rd.Dataset:
    """Scrub email / IPv4 / phone-shaped substrings from a text column
    (training-data hygiene pass). Pure Arrow ``replace_substring_regex``
    chain — vectorized, zero-copy in, and exactly mirrored by a DuckDB
    regexp_replace chain (both are RE2)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    out_col = out_col or text_col

    def _redact(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        for pat, repl in PII_PATTERNS:
            col = pc.replace_substring_regex(col, pat, repl)
        if out_col in t.column_names:
            t = t.drop_columns([out_col])
        return t.append_column(out_col, col)

    return ds.map_batches(_redact, batch_format="pyarrow")


def normalize_text(ds: rd.Dataset, text_col: str = "text", out_col: str = "text_norm") -> rd.Dataset:
    """Canonical text normalization for dedup/token pipelines: lowercase,
    strip sentence punctuation, collapse whitespace runs, trim. Arrow
    kernels end-to-end; SQL-mirrorable (lower + regexp_replace chain)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def _norm(t: pa.Table) -> pa.Table:
        col = pc.utf8_lower(t.column(text_col))
        col = pc.replace_substring_regex(col, PUNCT_RE, "")
        col = pc.replace_substring_regex(col, r"\s+", " ")
        col = pc.utf8_trim_whitespace(col)
        if out_col in t.column_names:
            t = t.drop_columns([out_col])
        return t.append_column(out_col, col)

    return ds.map_batches(_norm, batch_format="pyarrow")


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


def gopher_rules(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Gopher-style repetition/shape quality rules (the public
    rule-filter family: word-count band, mean-word-length band, minimum
    alphabetic ratio), integer-quantized so a SQL oracle can mirror the
    arithmetic bit-exactly. Vectorized pandas str kernels; emits the
    per-rule features AND the final keep flag so downstream filters can
    re-threshold without recomputing."""

    def _rules(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].fillna("")
        n_words = (s.str.count(" ") + 1).astype("int64")
        word_chars = (s.str.len() - s.str.count(" ")).astype("int64")
        # floor(x + 0.5), not .round(): DuckDB ROUND is half-away-from-zero,
        # pandas is half-to-even — values here are non-negative.
        mean_word_len_x100 = np.floor(
            100.0 * word_chars / n_words + 0.5
        ).astype("int64")
        n_chars = s.str.len().clip(lower=1)
        alpha = s.str.count(r"[A-Za-z]")
        alpha_ratio_x1000 = np.floor(1000.0 * alpha / n_chars + 0.5).astype("int64")
        keep = (
            n_words.between(5, 1000)
            & mean_word_len_x100.between(200, 1200)
            & (alpha_ratio_x1000 >= 600)
        ).astype("int64")
        out = df.copy()
        out["n_words"] = n_words
        out["mean_word_len_x100"] = mean_word_len_x100
        out["alpha_ratio_x1000"] = alpha_ratio_x1000
        out["keep"] = keep
        return out

    return ds.map_batches(_rules, batch_format="pandas", batch_size=2048)


def word_repetition(
    ds: rd.Dataset, text_col: str = "text", pct_threshold: int = 40
) -> rd.Dataset:
    """Repetition-ratio quality signal: per-doc word count, distinct-word
    count, and a ``repetitive`` flag (unique-word ratio below
    ``pct_threshold`` percent — integer-exact, mirrors
    ``n_unique*100 < n_words*threshold`` in SQL).

    Fully vectorized: one Arrow split over the batch, one dictionary
    encode of the flattened token array, then per-doc distinct counts
    via np.unique over (row_id, token_code) composite keys — no Python
    loop over rows or tokens."""
    import pyarrow.compute as pc

    def _rep(t: pa.Table) -> pa.Table:
        la = pc.split_pattern(t.column(text_col), " ").combine_chunks()
        if isinstance(la, pa.ChunkedArray):
            la = la.combine_chunks()
        n = len(t)
        offsets = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n_words = np.diff(offsets)
        codes_arr = pc.dictionary_encode(la.values)
        if isinstance(codes_arr, pa.ChunkedArray):
            codes_arr = codes_arr.combine_chunks()
        codes = codes_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        row_ids = np.repeat(np.arange(n, dtype=np.int64), n_words)
        vocab = int(codes.max()) + 1 if len(codes) else 1
        uniq_pairs = np.unique(row_ids * vocab + codes)
        n_unique = np.bincount(uniq_pairs // vocab, minlength=n).astype(np.int64)
        repetitive = n_unique * 100 < n_words * pct_threshold
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_words": pa.array(n_words, pa.int64()),
                "n_unique": pa.array(n_unique, pa.int64()),
                "repetitive": pa.array(repetitive),
            }
        )

    return ds.map_batches(_rep, batch_format="pyarrow", batch_size=2048)


def _bigram_ids(texts: list, sep: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized char-bigram ids for a batch: docs joined with a NUL
    separator, one byte view, pair ids = hi*256+lo; pairs that straddle
    a separator are masked out. Returns (pair_ids, doc_id per pair)."""
    enc = [(t or "").encode("utf-8", "replace") for t in texts]
    lens = np.array([len(b) for b in enc], dtype=np.int64)
    joined = b"\x00".join(enc)
    if len(joined) < 2:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    arr = np.frombuffer(joined, dtype=np.uint8).astype(np.int64)
    pairs = arr[:-1] * 256 + arr[1:]
    # doc id per BYTE position (separators belong to the doc before them)
    doc_of_byte = np.repeat(np.arange(len(enc), dtype=np.int64), lens + 1)[: len(arr)]
    valid = (arr[:-1] != sep) & (arr[1:] != sep)
    return pairs[valid], doc_of_byte[:-1][valid]


def train_bigram_counts(ds: rd.Dataset, text_col: str = "text") -> np.ndarray:
    """Pass 1 of the LM quality score: exact corpus-wide char-bigram
    counts. Per-batch ``np.bincount(65536)`` combiner → one (pair, n)
    row per OBSERVED bigram per batch crosses the bucketed grouped-sum
    exchange → a driver pull bounded by 65,536 rows at ANY corpus size.
    Returns the dense (65536,) int64 count vector."""
    from engine.ops.agg import grouped_agg
    from engine.util.collect import pull_arrow

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        pairs, _ = _bigram_ids(df[text_col].tolist())
        counts = np.bincount(pairs, minlength=65536).astype(np.int64)
        nz = np.flatnonzero(counts)
        return pd.DataFrame({"pair": nz, "n": counts[nz]})

    part = ds.select_columns([text_col]).map_batches(_partial, batch_format="pandas")
    tbl = pull_arrow(grouped_agg(part, ["pair"], {"n": ("sum", "n")}))
    dense = np.zeros(65536, dtype=np.int64)
    if tbl is not None and tbl.num_rows:
        pdf = tbl.to_pandas()
        dense[pdf["pair"].to_numpy()] = pdf["n"].to_numpy()
    return dense


def lm_score(
    ds: rd.Dataset,
    counts: np.ndarray,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    out: str = "lm_logprob",
) -> rd.Dataset:
    """Pass 2: per-document mean char-bigram log-likelihood under the
    corpus-trained add-one-smoothed model — the classic perplexity-proxy
    quality signal (low scores = out-of-distribution / junk documents).
    The 512 KiB logprob table broadcasts once via ray.put; scoring is a
    vectorized gather + segment mean per batch. Deterministic at any
    parallelism: the per-doc float sum is computed over the document's
    own bigram order, which batching never changes."""
    import ray

    from engine.ops.join import _cached_get

    counts = counts.astype(np.float64)
    prefix = counts.reshape(256, 256).sum(axis=1)  # marginal count per first byte
    logp = np.log(counts + 1.0) - np.log(np.repeat(prefix, 256) + 256.0)
    # Micro-nat integer quantization (floor(x*1e6+0.5)): per-doc sums
    # become exact order-free integers, so the score is a float division
    # of exact ints — the DuckDB oracle mirrors it bit-for-bit.
    logp = np.floor(logp * 1e6 + 0.5).astype(np.int64)
    ref = ray.put(logp)
    keep = list(id_cols or [])

    def _score(df: pd.DataFrame) -> pd.DataFrame:
        lp = _cached_get(ref)
        pairs, doc_of = _bigram_ids(df[text_col].tolist())
        sums = np.zeros(len(df), dtype=np.int64)
        cnt = np.zeros(len(df), dtype=np.int64)
        if len(pairs):
            # Per-doc ordered segment sum: one doc's bigrams are
            # contiguous and in document order, so reduceat over segment
            # starts is exact AND avoids np.add.at (measured pathological
            # scatter-add throughput on this box — CLAUDE.md).
            seg_starts = np.concatenate(
                [[0], np.flatnonzero(np.diff(doc_of)) + 1]
            )
            seg_docs = doc_of[seg_starts]
            sums[seg_docs] = np.add.reduceat(lp[pairs], seg_starts)
            cnt[seg_docs] = np.diff(np.append(seg_starts, len(pairs)))
        out_df = df[keep].copy() if keep else pd.DataFrame(index=df.index)
        out_df[out] = np.where(cnt > 0, sums / np.maximum(cnt, 1), 0.0)
        out_df[f"{out}_n"] = cnt
        return out_df

    return ds.map_batches(_score, batch_format="pandas", batch_size=1024)
