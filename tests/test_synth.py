"""Determinism of the changelog generator — everything downstream
(oracle equality, N-vs-4N state equality) rests on it."""

import hashlib
import os

import pyarrow.parquet as pq

from engine.cdc.synth import SynthConfig, _events_for_range, _load_doc_bases, synth_changelog


def _dir_digest(d):
    h = hashlib.sha256()
    for root, _, files in sorted(os.walk(d)):
        for f in sorted(files):
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(root, f))
                h.update(repr(sorted(t.to_pylist(), key=lambda r: r["seq"])).encode())
    return h.hexdigest()


def test_generator_is_deterministic(tmp_path, sf_dir):
    cfg = SynthConfig(seed=7, n_events=800, n_epochs=2, n_keys=200, hot_event_frac=0.5)
    a = synth_changelog(sf_dir, f"{tmp_path}/a", cfg)
    b = synth_changelog(sf_dir, f"{tmp_path}/b", cfg)
    assert _dir_digest(a) == _dir_digest(b)


def test_generator_chunk_independent(sf_dir):
    # Event i is a pure function of (seed, i): generating [0,100) must
    # equal generating [0,50)+[50,100) — the property that would let the
    # generator itself be distributed over Ray tasks.
    cfg = SynthConfig(seed=42, n_events=100, n_keys=30)
    texts, langs = _load_doc_bases(sf_dir, cfg.max_content_chars)
    whole = _events_for_range(cfg, 0, 100, texts, langs)
    lo = _events_for_range(cfg, 0, 50, texts, langs)
    hi = _events_for_range(cfg, 50, 100, texts, langs)
    for col in whole:
        merged = list(lo[col]) + list(hi[col])
        assert list(whole[col]) == merged, col


def test_unique_ascending_seq(tmp_path, sf_dir):
    cfg = SynthConfig(seed=42, n_events=500, n_epochs=2, n_keys=100)
    d = synth_changelog(sf_dir, f"{tmp_path}/c", cfg)
    seqs = []
    for root, _, files in sorted(os.walk(d)):
        for f in sorted(files):
            if f.endswith(".parquet"):
                seqs += pq.read_table(os.path.join(root, f), columns=["seq"]).column(
                    "seq"
                ).to_pylist()
    assert sorted(seqs) == list(range(500))
