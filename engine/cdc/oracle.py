"""Single-process replay oracle (SURVEY.md §5).

Implementation-independent ground truth for the CDC engine: a plain
Python dict keyed on (repo, path), events applied one-by-one in
ascending ``seq`` (true sequential replay — no vectorized LWW shortcut,
so it cannot share a bug with the engine's collapse kernel). ``D``
deletes the key; ``I``/``U`` both upsert. Invalid events (bad op, null
key/seq) are skipped exactly as the engine's validator rejects them.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from engine.cdc import tailer
from engine.cdc.schema import conform_table, negotiate
from engine.cdc.verify import canonical_digest
from engine.schemas import OPS, lake_schema_for


def oracle_table(
    log_dir: str, upto_epoch: int | None = None, update_mode: str = "row"
) -> pa.Table:
    """Replay the changelog sequentially; return the final lake-shaped
    table (payload + content_sha256 + winning seq), sorted by key.

    ``update_mode="column"``: a U event's NULL payload field means
    UNCHANGED — it merges its non-null fields onto the current row (or
    onto an empty row if none exists, including right after a D); I and
    D keep full-row semantics."""
    epochs = tailer.available_epochs(log_dir)
    if upto_epoch is not None:
        epochs = [e for e in epochs if e <= upto_epoch]
    schema = None
    per_epoch = []
    import pyarrow.parquet as pq

    for k in epochs:
        t = pa.concat_tables(pq.read_table(f) for f in tailer.epoch_files(log_dir, k))
        schema = negotiate(schema, t.schema)
        per_epoch.append(t)
    if schema is None:
        raise FileNotFoundError(f"no epochs under {log_dir}")
    events = pa.concat_tables(conform_table(t, schema) for t in per_epoch)
    events = events.sort_by([("seq", "ascending")])

    payload_names = [n for n in schema.names if n not in ("seq", "op")]
    state: dict[tuple, dict] = {}
    rows = events.to_pylist()
    for row in rows:
        op, repo, path, seq = row["op"], row["repo"], row["path"], row["seq"]
        if op not in OPS or repo is None or path is None or seq is None:
            continue  # dead-lettered by the engine
        key = (repo, path)
        if op == "D":
            state.pop(key, None)
        else:
            if update_mode == "column" and op == "U":
                rec = dict(state.get(key) or {n: None for n in payload_names})
                for n_ in payload_names:
                    if row[n_] is not None:
                        rec[n_] = row[n_]
            else:
                rec = {n: row[n] for n in payload_names}
            rec["content_sha256"] = (
                hashlib.sha256(rec["content"].encode()).hexdigest()
                if rec.get("content") is not None
                else None
            )
            rec["seq"] = seq
            state[key] = rec

    lake_schema = lake_schema_for(schema)
    out_rows = [state[k] for k in sorted(state)]
    if not out_rows:
        return lake_schema.empty_table()
    cols = {f.name: [r.get(f.name) for r in out_rows] for f in lake_schema}
    return pa.table(cols, schema=lake_schema)


def oracle_state_hash(
    log_dir: str, upto_epoch: int | None = None, update_mode: str = "row"
) -> str:
    return canonical_digest(oracle_table(log_dir, upto_epoch, update_mode))
