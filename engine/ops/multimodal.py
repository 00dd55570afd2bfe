"""Multimodal column plumbing (training-data ops).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Ray-side plumbing — schema, small batch sizes for wide payloads,
actor-pool stage signature, output layout — is real and tested; the
actual codec work is STUBBED (no image/audio libraries in this
container): ``DecodePayload(fake=False)`` raises NotImplementedError,
``fake=True`` produces a deterministic fake decode derived from the
payload bytes, which is what the tests exercise.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

PAYLOAD_META_FIELDS = [
    ("media_type", pa.string()),
    ("n_bytes", pa.int64()),
    ("checksum", pa.int64()),
]


def attach_fake_payload(ds: rd.Dataset, text_col: str = "text", media_type: str = "image/fake") -> rd.Dataset:
    """Synthesize an opaque binary payload column (deterministic: the
    utf-8 bytes of the text) plus typed metadata — the schema a real
    ingest of image bytes would produce."""

    def _attach(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        payloads = [(s or "").encode("utf-8") for s in texts]
        t = t.append_column("payload", pa.array(payloads, type=pa.binary()))
        t = t.append_column("media_type", pa.array([media_type] * len(payloads)))
        t = t.append_column("n_bytes", pa.array([len(p) for p in payloads], pa.int64()))
        t = t.append_column(
            "checksum", pa.array([zlib.crc32(p) for p in payloads], pa.int64())
        )
        return t

    return ds.map_batches(_attach, batch_format="pyarrow")


class DecodePayload:
    """Actor-pool decode stage. Real codecs are NOT available in this
    environment — with ``fake=True`` the stage emits a deterministic
    pseudo-decode (dims/frames derived from the checksum); with
    ``fake=False`` it raises NotImplementedError, marking exactly where
    a PIL/ffmpeg call would slot in (same signature, same output
    schema)."""

    def __init__(self, fake: bool = True):
        self.fake = fake

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if not self.fake:
            raise NotImplementedError(
                "binary media decode requires an image/audio codec library; "
                "not present in this container (stub per build contract)"
            )
        crc = df["checksum"].to_numpy(dtype=np.int64)
        out = df.copy()
        out["width"] = 64 + (crc % 192)
        out["height"] = 64 + ((crc >> 8) % 192)
        out["channels"] = 1 + (crc % 3)
        return out


def decode_payloads(ds: rd.Dataset, fake: bool = True, concurrency: int = 2, batch_size: int = 64) -> rd.Dataset:
    """Small batch_size on purpose: wide binary payloads × concurrency
    must fit worker heaps (SURVEY.md §4 memory notes)."""
    return ds.map_batches(
        DecodePayload,
        fn_constructor_kwargs=dict(fake=fake),
        batch_format="pandas",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def payload_features(ds: rd.Dataset, dim: int = 8) -> rd.Dataset:
    """Feature-extraction plumbing: fixed-size vector per payload
    (deterministic byte-histogram projection standing in for a vision
    model forward pass)."""

    def _feat(df: pd.DataFrame) -> pd.DataFrame:
        feats = []
        for p in df["payload"]:
            b = np.frombuffer(p or b"\x00", dtype=np.uint8)
            hist = np.bincount(b % dim, minlength=dim).astype(np.float32)
            feats.append(hist / max(1.0, hist.sum()))
        out = df.copy()
        out["payload_features"] = feats
        return out

    return ds.map_batches(_feat, batch_format="pandas", batch_size=256)
