"""Arrow schemas for the CDC engine (SURVEY.md §1).

Input-table shape is fixed by BASELINE.json:15 (input_hint): a Parquet
table of source-code repositories with columns
``(repo:string, path:string, commit:string, lang:string, content:string)``,
logical primary key ``(repo, path)``.

A change event wraps one such row with a total commit order ``seq`` and an
op code ``I``/``U``/``D`` (BASELINE.json:6 "commit-ordered log-structured
merge of event batches"). The lake table stores the latest surviving row
per key plus ``content_sha256`` and the winning ``seq``.
"""

from __future__ import annotations

import pyarrow as pa

KEY_COLS = ["repo", "path"]
META_COLS = ["seq", "op"]
OPS = ("I", "U", "D")

# Payload columns of the v0 event/lake schema. Additive schema evolution
# (BASELINE.json:6) may append further columns mid-stream; the negotiation
# layer (engine/cdc/schema.py) unifies them, so nothing below is a closed
# list — it is the *initial* schema.
PAYLOAD_COLS_V0 = ["commit", "lang", "content"]

EVENT_SCHEMA_V0 = pa.schema(
    [
        pa.field("seq", pa.int64()),
        pa.field("op", pa.string()),
        pa.field("repo", pa.string()),
        pa.field("path", pa.string()),
        pa.field("commit", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("content", pa.string()),
    ]
)

LINEAGE_SCHEMA = pa.schema(
    [
        pa.field("epoch", pa.int64()),
        pa.field("pid", pa.int64()),
        pa.field("seq_lo", pa.int64()),
        pa.field("seq_hi", pa.int64()),
        pa.field("events_in", pa.int64()),
        pa.field("upserts", pa.int64()),
        pa.field("deletes", pa.int64()),
        pa.field("rows_out", pa.int64()),
        pa.field("bytes_written", pa.int64()),
        pa.field("duration_s", pa.float64()),
    ]
)


def event_payload_fields(schema: pa.Schema) -> list[pa.Field]:
    """Payload fields of an event schema (everything but seq/op)."""
    return [schema.field(n) for n in schema.names if n not in META_COLS]


def lake_schema_for(event_schema: pa.Schema) -> pa.Schema:
    """Lake schema derived from an event schema: payload columns plus
    the winning ``seq``, and — when the payload carries ``content`` —
    its ``content_sha256`` (the per-row identity invariant). Derived
    lakes (engine/cdc/derive.py) may project ``content`` away; their
    lake schema then simply has no sha column."""
    fields = event_payload_fields(event_schema)
    extra = (
        [pa.field("content_sha256", pa.string())]
        if any(f.name == "content" for f in fields)
        else []
    )
    return pa.schema(fields + extra + [pa.field("seq", pa.int64())])
