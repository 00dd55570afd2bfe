"""Derived lakes: incrementally-maintained per-row derivations over a
changelog — here, a MinHash-LSH signature index for CONTINUOUS near-dup
detection.

The batch dedup pipeline (engine/ops/dedup.py) shingles and min-hashes
the whole corpus every run — right for one-off curation, wrong for a
living lake where each epoch touches a tiny fraction of rows. A derived
lake fixes the asymptotics: replay the SAME changelog through
``TransformSource(log, sig_transform)`` into a second lake whose payload
is the 16 per-band LSH hashes. The ordinary machinery gives the index
exactly-once commits, resume, LWW by the original seq, time travel and
vacuum for free, and signatures are computed once per CHANGED row.
Near-dup candidate pairs then come straight off the index
(:func:`index_candidate_pairs` — explode bands, bucket, self-merge;
no text is read at query time) and are IDENTICAL to what the batch
pipeline emits on the same corpus with the same seed (tested).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from engine.cdc import tailer
from engine.ops.dedup import _MERSENNE, _B, _bucket_pairs, shingle_hashes

META = ["seq", "op", "repo", "path"]


def sig_schema(bands: int = 16) -> pa.Schema:
    fields = [
        pa.field("seq", pa.int64()),
        pa.field("op", pa.string()),
        pa.field("repo", pa.string()),
        pa.field("path", pa.string()),
        # The index key the batch pipeline verifies against (doc identity
        # for pair emission): repo-path joined, same as the content docs.
        pa.field("content", pa.string()),
    ]
    fields += [pa.field(f"bh{i:02d}", pa.int64()) for i in range(bands)]
    return pa.schema(fields)


class MinHashEventTransform:
    """pa.Table batch transform for TransformSource: per changed row,
    compute the ``bands`` LSH band hashes of ``text_col`` (same
    permutation/banding math as engine.ops.dedup.MinHasher, same seed →
    identical hashes). Rows with null text (deletes, patch nulls) emit
    null hashes — they never survive to the live index anyway (D) or
    mean 'unchanged' (patch semantics don't apply here: the derived lake
    runs row-LWW on full transformed rows)."""

    def __init__(self, text_col: str = "content", num_perm: int = 64,
                 bands: int = 16, k: int = 5, seed: int = 42):
        assert num_perm % bands == 0
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.text_col = text_col
        self.num_perm, self.bands, self.k = num_perm, bands, k

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        nb, r = self.bands, self.num_perm // self.bands
        texts = t.column(self.text_col).to_pylist() if self.text_col in t.column_names else [None] * n
        bh = np.zeros((n, nb), dtype=np.uint64)
        mask = np.zeros(n, dtype=bool)  # True = null (no text)
        for i, text in enumerate(texts):
            if text is None:
                mask[i] = True
                continue
            h = shingle_hashes(text, self.k)
            sig = ((self.a[:, None] * h[None, :] + self.b[:, None]) % _MERSENNE).min(axis=1)
            chunks = sig.reshape(nb, r)
            acc = np.zeros(nb, dtype=np.uint64)
            for j in range(r):
                acc = acc * _B + chunks[:, j]
            bh[i] = acc
        cols = {m: t.column(m) for m in META}
        cols["content"] = t.column(self.text_col) if self.text_col in t.column_names else pa.nulls(n, pa.string())
        out = pa.table(cols)
        signed = bh.astype(np.int64)
        for j in range(nb):
            out = out.append_column(
                f"bh{j:02d}", pa.array(signed[:, j], type=pa.int64(), mask=mask)
            )
        return out


def sig_index_source(log, text_col: str = "content", num_perm: int = 64,
                     bands: int = 16, k: int = 5, seed: int = 42):
    """The changelog viewed as signature events — replay this into a lake
    to maintain the near-dup index incrementally."""
    return tailer.TransformSource(
        log,
        MinHashEventTransform(text_col, num_perm, bands, k, seed),
        sig_schema(bands),
    )


def spec_derived_source(log, steps: list):
    """DECLARATIVE derived lake: the spec language's narrow,
    event-preserving steps (``with_column`` / ``select`` / ``rename``)
    applied per change-event batch, wrapped as a ``TransformSource`` —
    replay it into its own lake and the ordinary machinery maintains the
    derived view incrementally (exactly-once, resume, LWW by the
    original seq, time travel).

    Rules a derived-lake spec must obey (validated here):

    - only ``with_column`` / ``select`` / ``rename`` — a ``filter``
      (or any row-dropping step) would drop change EVENTS, deletes
      included, and desynchronize the derived lake from its source;
    - ``select`` must keep the ``seq/op/repo/path`` meta columns
      (the LWW inputs); ``rename`` must not touch them;
    - expressions may only reference columns present from the FIRST
      changelog epoch (the derived schema is fixed upfront, which also
      insulates the derived lake from upstream payload evolution).

    The derived schema is computed by running the compiled transform
    over an empty batch of the source's first-epoch schema."""
    from engine.spec import _lower_step

    allowed = ("with_column", "select", "rename")
    lowered = []
    for i, s in enumerate(steps):
        op = s.get("op")
        if op not in allowed:
            raise ValueError(
                f"derived-lake step {i}: {op!r} not allowed (only {allowed} — "
                "row-dropping steps would lose change events, deletes included)"
            )
        if op == "select":
            missing = [c for c in META if c not in s.get("columns", [])]
            if missing:
                raise ValueError(
                    f"derived-lake select must keep meta columns {missing}"
                )
        if op == "rename" and any(k in META for k in s.get("mapping", {})):
            raise ValueError(f"derived-lake rename must not touch {META}")
        lowered.append(_lower_step(i, s))

    def fn(t: pa.Table) -> pa.Table:
        for st in lowered:
            t = st.fn(t)
        return t

    src = tailer.as_source(log)
    epochs = src.available_epochs()
    if not epochs:
        raise ValueError("cannot derive a schema from an empty changelog")
    schema = fn(src.epoch_schema(epochs[0]).empty_table()).schema
    return tailer.TransformSource(src, fn, schema)


def index_candidate_pairs(
    index_lake: str,
    bands: int = 16,
    num_buckets: int = 64,
    epoch: int | None = None,
) -> rd.Dataset:
    """Candidate near-dup pairs straight off the committed signature
    index — no shingling, no text reads. Same exchange shape as the
    batch pipeline: explode (doc, band, band_hash) triples, bucket by
    hash(band, band_hash) % num_buckets, vectorized self-merge per
    bucket. ``doc_id`` is repo + '\\x1f' + path."""
    from engine.cdc.verify import read_lake
    from engine.ops.dedup import exact_dedup
    from engine.util.hashing import fast_hash_column

    ds = read_lake(index_lake, epoch=epoch)

    def _explode(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        n = t.num_rows
        doc = pc.binary_join_element_wise(
            t.column("repo"), t.column("path"), "\x1f"
        ).to_pandas()
        frames = []
        for j in range(bands):
            col = t.column(f"bh{j:02d}").to_pandas()
            ok = col.notna()
            if not ok.any():
                continue
            frames.append(
                pd.DataFrame(
                    {
                        "doc_id": doc[ok].to_numpy(),
                        "band": np.full(int(ok.sum()), j, dtype=np.int64),
                        "band_hash": col[ok].astype(np.int64).to_numpy(),
                    }
                )
            )
        if not frames:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=object),
                 "band": pd.Series([], dtype=np.int64),
                 "band_hash": pd.Series([], dtype=np.int64)}
            )
        df = pd.concat(frames, ignore_index=True)
        key = df["band"].astype(str) + "\x1f" + df["band_hash"].astype(str)
        df["__bucket"] = fast_hash_column(key, num_buckets, seed="lsh")
        return df

    pairs = (
        ds.map_batches(_explode, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_bucket_pairs, batch_format="pandas")
    )
    return exact_dedup(pairs, ["a", "b"], tiebreak="a")
