"""Multimodal column plumbing (training-data ops).

Images/audio/video are opaque ``binary`` columns with typed metadata,
decoded in actor-pool ``map_batches`` stages (small batch sizes — wide
payloads x concurrency must fit worker heaps). All three modalities are
REAL byte-level parses through the pure-Python codecs in
``engine.ops.codec``: image = BMP/PNG decode, audio = WAV RIFF walk,
video = AVI container walk + every-Nth frame sampling.  ``fake=True``
keeps the deterministic pseudo-decode for non-media payloads (and marks
where a PIL/ffmpeg call would slot in for compressed codecs beyond the
stdlib's reach — JPEG/H.264 etc.).
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
    """Actor-pool decode stage. ``fake=True`` emits a deterministic
    pseudo-decode (dims derived from the checksum) for payloads that are
    not real images (the attach_fake_payload path). ``fake=False`` runs
    a REAL byte-level decode through the pure-Python BMP/PNG codecs
    (engine.ops.codec): header parse, scanline unfilter, pixel
    recovery — width/height/channels/pixel_sum come from the decoded
    array, not metadata. Codec dispatch is built once per actor."""

    def __init__(self, fake: bool = True):
        self.fake = fake
        if not fake:
            from engine.ops.codec import decode_image

            self._decode = decode_image

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        if self.fake:
            crc = df["checksum"].to_numpy(dtype=np.int64)
            out["width"] = 64 + (crc % 192)
            out["height"] = 64 + ((crc >> 8) % 192)
            out["channels"] = 1 + (crc % 3)
            return out
        dims = [self._decode(p) for p in df["payload"]]
        out["width"] = np.array([d.shape[1] for d in dims], np.int64)
        out["height"] = np.array([d.shape[0] for d in dims], np.int64)
        out["channels"] = np.array([d.shape[2] for d in dims], np.int64)
        out["pixel_sum"] = np.array(
            [int(d.sum(dtype=np.int64)) for d in dims], np.int64
        )
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


def attach_image_payload(ds: rd.Dataset, id_col: str = "doc_id") -> rd.Dataset:
    """Synthesize a REAL image payload per row, deterministically from the
    id: pixel(y, x, c) = (id + 3y + 5x + 11c) % 256 at
    width = 16 + (id % 2) * 8, height = 8 + (id % 3) * 2, encoded as a
    true container — BMP for even ids, PNG (filter type id % 5) for odd.
    The formula is SQL-mirrorable, so a real byte-level decode is
    oracle-checkable end to end."""
    from engine.ops.codec import encode_bmp, encode_png

    def _attach(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = []
        for i in ids:
            w, h = 16 + (int(i) % 2) * 8, 8 + (int(i) % 3) * 2
            y, x, c = np.ogrid[0:h, 0:w, 0:3]
            px = ((int(i) + 3 * y + 5 * x + 11 * c) % 256).astype(np.uint8)
            payloads.append(
                encode_bmp(px) if i % 2 == 0 else encode_png(px, filter_type=int(i) % 5)
            )
        t = t.append_column("payload", pa.array(payloads, pa.binary()))
        t = t.append_column(
            "media_type",
            pa.array(["image/bmp" if i % 2 == 0 else "image/png" for i in ids]),
        )
        t = t.append_column("n_bytes", pa.array([len(p) for p in payloads], pa.int64()))
        return t

    return ds.map_batches(_attach, batch_format="pyarrow")


def payload_features(ds: rd.Dataset, dim: int = 8) -> rd.Dataset:
    """Feature-extraction plumbing: fixed-size vector per payload
    (deterministic byte-histogram projection standing in for a vision
    model forward pass)."""

    def _feat(t: pa.Table) -> pa.Table:
        # Stays pyarrow end-to-end: a FixedSizeList<float32> column, not
        # a pandas ndarray column (which Ray rewrites to its tensor
        # extension dtype and breaks downstream pandas block schemas).
        feats = np.empty((t.num_rows, dim), np.float32)
        for i, p in enumerate(t.column("payload").to_pylist()):
            b = np.frombuffer(p or b"\x00", dtype=np.uint8)
            hist = np.bincount(b % dim, minlength=dim).astype(np.float32)
            feats[i] = hist / max(1.0, hist.sum())
        arr = pa.FixedSizeListArray.from_arrays(pa.array(feats.ravel()), dim)
        return t.append_column("payload_features", arr)

    return ds.map_batches(_feat, batch_format="pyarrow", batch_size=256)


def attach_audio_payload(ds: rd.Dataset, id_col: str = "doc_id", sample_rate: int = 16000) -> rd.Dataset:
    """Synthesize a REAL WAV payload per row, deterministically from the
    id: sample i = (id * 13 + 7 i) % 65536 - 32768 (full int16 range) at
    n = 800 + (id % 5) * 40 samples. SQL-mirrorable, so the RIFF parse
    is oracle-checkable."""
    from engine.ops.codec import encode_wav

    def _attach(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = []
        for i in ids:
            n = 800 + (int(i) % 5) * 40
            idx = np.arange(n, dtype=np.int64)
            s = ((int(i) * 13 + 7 * idx) % 65536 - 32768).astype(np.int16)
            payloads.append(encode_wav(s, sample_rate))
        t = t.append_column("payload", pa.array(payloads, pa.binary()))
        t = t.append_column("media_type", pa.array(["audio/wav"] * len(ids)))
        t = t.append_column("n_bytes", pa.array([len(p) for p in payloads], pa.int64()))
        return t

    return ds.map_batches(_attach, batch_format="pyarrow")


class DecodeAudio:
    """Actor-pool WAV decode stage: real RIFF chunk walk per payload
    (engine.ops.codec.decode_wav), emitting sample count, rate and the
    exact int64 sample sum — the audio analogue of DecodePayload's
    fake=False path."""

    def __init__(self):
        from engine.ops.codec import decode_wav

        self._decode = decode_wav

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        decoded = [self._decode(p) for p in df["payload"]]
        out = df.copy()
        out["n_samples"] = np.array([s.shape[0] for s, _ in decoded], np.int64)
        out["sample_rate"] = np.array([r for _, r in decoded], np.int64)
        out["sample_sum"] = np.array(
            [int(s.sum(dtype=np.int64)) for s, _ in decoded], np.int64
        )
        return out


def decode_audio_payloads(ds: rd.Dataset, concurrency: int = 2, batch_size: int = 64) -> rd.Dataset:
    return ds.map_batches(
        DecodeAudio,
        batch_format="pandas",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def attach_video_payload(ds: rd.Dataset, id_col: str = "doc_id") -> rd.Dataset:
    """Synthesize a REAL AVI payload per row (RIFF container,
    uncompressed BI_RGB DIB frames), deterministically from the id:
    n_frames = 4 + id % 3 at 8x6, frame f pixel (y, x, c) =
    (id + 2f + 3y + 5x + 11c) % 256. SQL-mirrorable, so the container
    walk + frame sampling is oracle-checkable."""
    from engine.ops.codec import encode_avi

    def _attach(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = []
        for i in ids:
            n = 4 + int(i) % 3
            f, y, x, c = np.ogrid[0:n, 0:6, 0:8, 0:3]
            frames = ((int(i) + 2 * f + 3 * y + 5 * x + 11 * c) % 256).astype(np.uint8)
            payloads.append(encode_avi(frames, fps=10))
        t = t.append_column("payload", pa.array(payloads, pa.binary()))
        t = t.append_column("media_type", pa.array(["video/avi"] * len(ids)))
        t = t.append_column("n_bytes", pa.array([len(p) for p in payloads], pa.int64()))
        return t

    return ds.map_batches(_attach, batch_format="pyarrow")


class SampleFrames:
    """Actor-pool video frame-sampling stage: real RIFF/AVI walk per
    payload (engine.ops.codec.decode_avi), decoding every
    ``stride``-th frame and emitting container metadata plus the exact
    pixel sum of the SAMPLED frames — the shape of a frame-extraction
    stage feeding a vision encoder."""

    def __init__(self, stride: int = 2):
        from engine.ops.codec import decode_avi

        self._decode = decode_avi
        self.stride = stride

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        decoded = [self._decode(p, frame_stride=self.stride) for p in df["payload"]]
        out = df.copy()
        out["n_frames"] = np.array([m["n_frames"] for _, m in decoded], np.int64)
        out["frames_sampled"] = np.array([f.shape[0] for f, _ in decoded], np.int64)
        out["width"] = np.array([m["width"] for _, m in decoded], np.int64)
        out["height"] = np.array([m["height"] for _, m in decoded], np.int64)
        out["sampled_pixel_sum"] = np.array(
            [int(f.sum(dtype=np.int64)) for f, _ in decoded], np.int64
        )
        return out


def sample_video_frames(ds: rd.Dataset, stride: int = 2, concurrency: int = 2, batch_size: int = 32) -> rd.Dataset:
    """Small batch_size: video payloads are the widest rows in the
    engine — batch x concurrency must fit worker heaps."""
    return ds.map_batches(
        SampleFrames,
        fn_constructor_kwargs=dict(stride=stride),
        batch_format="pandas",
        concurrency=concurrency,
        batch_size=batch_size,
    )
