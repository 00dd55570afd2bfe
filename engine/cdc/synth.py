"""Deterministic changelog generator (SURVEY.md §7 M0).

Synthesises a binlog/WAL-style change-event log over a "source-code
repository" table of the exact input_hint shape
``(repo, path, commit, lang, content)`` (BASELINE.json:15), derived from
the driver's ``documents.parquet`` — no external data.

Every event is a **pure function of (seed, global index i)** via a
counter-based splitmix64 hash, so the generated log is byte-identical
regardless of chunking, process or parallelism — the property the whole
correctness story (oracle replay, N-vs-4N state equality) rests on.

Layout: ``out_dir/epoch=<k:05d>/part-<f:04d>.parquet`` — multiple files
per epoch so Ray Data gets enough input blocks at every parallelism
level (SURVEY.md §4 "block splitting").
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import asdict, dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from engine.util.hashing import splitmix64

_U = np.uint64


@dataclass(frozen=True)
class SynthConfig:
    seed: int = 42
    n_events: int = 10_000
    n_epochs: int = 4
    n_keys: int = 2_000
    n_repos: int = 16
    # Fraction of events hitting the hot repo's keys (repo-000).
    # 0.0 → uniform. 0.8 → the "one hot repo" skew profile (SURVEY.md §5).
    hot_event_frac: float = 0.0
    files_per_epoch: int = 8
    max_content_chars: int = 400
    # Epoch index from which the additive column `size_bytes` appears
    # (None → never). Exercises M11 schema negotiation.
    evolve_at_epoch: int | None = None
    # Epoch index from which an additive `price` decimal128(12,2) column
    # appears (None → never) — exercises decimal negotiation/conform.
    # Deterministic: price = ((seq * 7919) % 1e6) / 100.
    decimal_at_epoch: int | None = None
    # Epoch index from which `size_bytes` widens int32 → int64 (requires
    # evolve_at_epoch < widen_at_epoch). Exercises lossless type widening.
    widen_at_epoch: int | None = None
    # Permute event order within each epoch before writing (seq values
    # unchanged) — exercises W4 arrival-order invariance.
    shuffle_within_epochs: bool = False
    op_mix: tuple = (60, 30, 10)  # I / U / D percent
    # Patch-update profile (update_mode="column" replay): each U event's
    # payload column (commit / lang / content) is independently nulled
    # with this probability — null meaning UNCHANGED. Pure function of
    # (seed, i, column), like every other event attribute.
    patch_null_frac: float = 0.0
    # Malformed-event injection (validator/dead-letter exercise): this
    # fraction of events is corrupted deterministically — half get an
    # unknown op 'X', half a NULL repo key. The engine must dead-letter
    # them; the sequential oracle skips them by the same rule.
    bad_event_frac: float = 0.0
    # Epoch index from which an additive `meta` STRUCT column appears
    # (None → never); from struct_at_epoch+1 the struct itself gains a
    # `forks` field — exercises recursive (nested-additive) schema
    # negotiation. Deterministic pure functions of seq:
    # stars=(seq*31)%97, license by seq%3, forks=(seq*17)%53.
    struct_at_epoch: int | None = None


def _load_doc_bases(sf_dir: str, max_chars: int):
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    ).sort_by("doc_id")
    texts = [((s or "")[:max_chars]) for s in t.column("text").to_pylist()]
    langs = [(s or "txt") for s in t.column("lang").to_pylist()]
    return texts, langs


def _events_for_range(cfg: SynthConfig, lo: int, hi: int, texts, langs) -> dict:
    """Generate events for global indices [lo, hi) — pure function."""
    i = np.arange(lo, hi, dtype=np.uint64)
    seed = _U(cfg.seed)
    u_key = splitmix64(i ^ (seed * _U(0x10001)))
    u_op = splitmix64(i ^ (seed * _U(0x20003)))
    u_rev = splitmix64(i ^ (seed * _U(0x30005)))
    u_c1 = splitmix64(i ^ (seed * _U(0x40007)))
    u_c2 = splitmix64(i ^ (seed * _U(0x50009)))

    n_keys = cfg.n_keys
    hot_keys = max(1, n_keys // cfg.n_repos)
    cold_keys = max(1, n_keys - hot_keys)
    is_hot = (u_key % _U(1_000_000)).astype(np.float64) < cfg.hot_event_frac * 1e6
    key = np.where(
        is_hot,
        (u_key >> _U(20)) % _U(hot_keys),
        _U(hot_keys) + (u_key >> _U(20)) % _U(cold_keys),
    ).astype(np.int64)

    p = (u_op % _U(100)).astype(np.int64)
    i_cut, u_cut = cfg.op_mix[0], cfg.op_mix[0] + cfg.op_mix[1]
    op = np.where(p < i_cut, "I", np.where(p < u_cut, "U", "D"))

    n_docs = len(texts)
    n_cold_repos = max(1, cfg.n_repos - 1)
    repo = np.where(
        key < hot_keys,
        "repo-000",
        np.char.add("repo-", np.char.zfill((1 + key % n_cold_repos).astype(str), 3)),
    )
    doc_of_key = key % n_docs
    lang = np.array([langs[d] for d in doc_of_key], dtype=object)
    path = np.array([f"src/d{d:05d}/f{k:06x}.{l}" for k, d, l in zip(key, doc_of_key, lang)], dtype=object)
    rev = (u_rev % _U(100_000)).astype(np.int64)
    content = np.array(
        [
            f"{texts[d]}\n// key={k} seq={s} rev={r}"
            for d, k, s, r in zip(doc_of_key, key, i, rev)
        ],
        dtype=object,
    )
    commit = np.array(
        [f"{a:016x}{b:016x}{(int(a) ^ int(b)) & 0xffffffff:08x}" for a, b in zip(u_c1, u_c2)],
        dtype=object,
    )
    if cfg.bad_event_frac > 0:
        u_bad = splitmix64(i ^ (seed * _U(0x90021)))
        bad = (u_bad % _U(1_000_000)).astype(np.float64) < cfg.bad_event_frac * 1e6
        which = (u_bad >> _U(32)) % _U(2) == 0
        op = op.copy()
        repo = repo.astype(object)
        op[bad & which] = "X"          # unknown op
        repo[bad & ~which] = None      # null key
    if cfg.patch_null_frac > 0:
        is_u = op == "U"
        lang = lang.copy()
        for j, arr in enumerate((commit, lang, content)):
            u_m = splitmix64(i ^ (seed * _U(0x7001B + 2 * j)))
            nullit = is_u & (
                (u_m % _U(1_000_000)).astype(np.float64) < cfg.patch_null_frac * 1e6
            )
            arr[nullit] = None
    return {
        "seq": i.astype(np.int64),
        "op": op,
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "content": content,
    }


def synth_changelog(sf_dir: str, out_dir: str, cfg: SynthConfig | None = None, **kw) -> str:
    """Write the deterministic changelog; returns ``out_dir``.

    Idempotent: if a ``_SYNTH_DONE.json`` marker with the identical config
    already exists, the log is reused (bench re-runs, resume tests).
    """
    cfg = cfg or SynthConfig(**kw)
    marker = os.path.join(out_dir, "_SYNTH_DONE.json")
    cfg_json = json.dumps(asdict(cfg), sort_keys=True)
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == cfg_json:
                return out_dir
    # Config changed (or partial previous run): clear the dir so stale
    # epoch files from an old layout can't survive alongside new ones.
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    texts, langs = _load_doc_bases(sf_dir, cfg.max_content_chars)
    epoch_size = (cfg.n_events + cfg.n_epochs - 1) // cfg.n_epochs
    for k in range(cfg.n_epochs):
        lo, hi = k * epoch_size, min((k + 1) * epoch_size, cfg.n_events)
        if lo >= hi:
            break
        cols = _events_for_range(cfg, lo, hi, texts, langs)
        n = hi - lo
        if cfg.evolve_at_epoch is not None and k >= cfg.evolve_at_epoch:
            wide = cfg.widen_at_epoch is None or k >= cfg.widen_at_epoch
            # A patch event whose content is null (= unchanged) leaves
            # size_bytes unset too — None propagates as a typed null.
            cols["size_bytes"] = np.array(
                [len(c) if c is not None else None for c in cols["content"]],
                dtype=object,
            )
            sb_type = pa.int64() if wide else pa.int32()
        if cfg.decimal_at_epoch is not None and k >= cfg.decimal_at_epoch:
            from decimal import Decimal

            cents = (cols["seq"] * 7919) % 1_000_000
            cols["price"] = np.array(
                [Decimal(int(c)) / 100 for c in cents], dtype=object
            )
        col_type = {"price": pa.decimal128(12, 2)}
        if cfg.struct_at_epoch is not None and k >= cfg.struct_at_epoch:
            licenses = ("mit", "apache-2.0", "gpl-3.0")
            with_forks = k >= cfg.struct_at_epoch + 1
            meta_fields = [("stars", pa.int64()), ("license", pa.string())]
            if with_forks:
                meta_fields.append(("forks", pa.int64()))
            cols["meta"] = np.array(
                [
                    {
                        "stars": int(s * 31) % 97,
                        "license": licenses[int(s) % 3],
                        **({"forks": int(s * 17) % 53} if with_forks else {}),
                    }
                    for s in cols["seq"]
                ],
                dtype=object,
            )
            col_type["meta"] = pa.struct(meta_fields)
        order = np.arange(n)
        if cfg.shuffle_within_epochs:
            rng = np.random.default_rng(cfg.seed * 1_000_003 + k)
            rng.shuffle(order)
        if "size_bytes" in cols:
            col_type["size_bytes"] = sb_type
        table = pa.table(
            {
                name: pa.array(arr[order], type=col_type.get(name))
                for name, arr in cols.items()
            }
        )
        edir = os.path.join(out_dir, f"epoch={k:05d}")
        os.makedirs(edir, exist_ok=True)
        nf = min(cfg.files_per_epoch, max(1, n))
        bounds = np.linspace(0, n, nf + 1).astype(int)
        for f_idx in range(nf):
            part = table.slice(bounds[f_idx], bounds[f_idx + 1] - bounds[f_idx])
            pq.write_table(part, os.path.join(edir, f"part-{f_idx:04d}.parquet"))
    with open(marker, "w") as f:
        f.write(cfg_json)
    return out_dir


def epoch_dirs(log_dir: str) -> list[tuple[int, str]]:
    out = []
    for name in sorted(os.listdir(log_dir)):
        if name.startswith("epoch="):
            out.append((int(name.split("=")[1]), os.path.join(log_dir, name)))
    return sorted(out)
