"""Batch DML over the changelog: MERGE INTO for the lake.

``merge_into`` applies an arbitrary batch of upserts/deletes to a lake
WITHOUT bypassing the changelog: the batch is stamped with seqs above
the lake's applied watermark and PUBLISHED as the next sealed changelog
epoch (the same atomic stage-directory + ``os.rename`` protocol every
producer and the dead-letter requeue use), then folded by a normal
``replay()``. Routing DML through the log — rather than poking files —
keeps every invariant for free: exactly-once manifest commits, LWW
determinism at any parallelism, schema negotiation, lineage,
changefeeds/replicas (a replica tailing the same log sees the merge as
ordinary events), time travel, and resume.

Contrast with ``maintain.purge`` (point-in-time row removal as a
maintenance version, invisible to the changelog): ``merge_into`` is the
SQL ``MERGE INTO``/``DELETE WHERE`` a *producer* runs — it takes a
position in the log and wins/loses LWW like any other write.

Determinism contract (mirrors the SQL oracle in
engine/pipelines/cdc_queries.py::q_cdc_merge_into): a batch WITHOUT a
``seq`` column is sorted by (repo, path) and stamped
``watermark+1 .. watermark+n`` in that order, so the stamped stream —
and therefore the final state — is a pure function of (lake state,
batch rows). Duplicate (repo, path) rows keep their relative input
order under the stable sort; the LAST one wins LWW.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from engine.cdc.parse import _seq_watermark
from engine.schemas import OPS


def _publish_epoch(log_dir: str, table: pa.Table) -> int:
    """Seal ``table`` as the next changelog epoch; returns its number.
    Racing a concurrent producer for the same epoch number is retried
    (the atomic ``os.rename`` onto an existing dir fails on POSIX when
    the target is non-empty; we pre-check and retry with the next
    number — same CAS-shaped loop as the manifest publish)."""
    os.makedirs(log_dir, exist_ok=True)
    for _ in range(16):
        epochs = [
            int(n.split("=")[1])
            for n in os.listdir(log_dir)
            if n.startswith("epoch=")
        ]
        nxt = (max(epochs) + 1) if epochs else 0
        epoch_dir = os.path.join(log_dir, f"epoch={nxt:05d}")
        if os.path.isdir(epoch_dir):
            continue
        stage = os.path.join(log_dir, f".staging-{uuid.uuid4().hex[:12]}")
        os.makedirs(stage, exist_ok=True)
        pq.write_table(table, os.path.join(stage, "merge-00000.parquet"))
        try:
            os.rename(stage, epoch_dir)  # atomic seal
            return nxt
        except OSError:
            import shutil

            shutil.rmtree(stage, ignore_errors=True)
    raise RuntimeError(f"could not claim a changelog epoch under {log_dir}")


def merge_into(
    lake_dir: str,
    log_dir: str,
    data,
    default_op: str = "U",
    apply: bool = True,
    replay_cfg=None,
) -> dict:
    """MERGE a batch into the lake through its changelog.

    ``data`` — a ``pa.Table`` (or anything ``pa.table`` accepts) with the
    key columns (repo, path) and any subset of payload columns (absent
    columns null-fill via the additive conform path, exactly like a thin
    producer). Two optional control columns:

    - ``op`` — 'I'/'U'/'D' per row (``default_op`` fills it when absent;
      'U' on a missing key inserts — upsert semantics);
    - ``seq`` — producer-assigned positions. When absent, rows are
      sorted by (repo, path) and stamped ``watermark+1..watermark+n``
      (deterministic — see the module docstring). When PRESENT, every
      seq must be ABOVE the lake's applied watermark (the same
      strictly-larger-seq invariant requeue enforces; a lower seq could
      not be defended by the merge and would break live_view/scan
      base-file pruning) — violations raise, nothing is published.

    Publishes ONE sealed changelog epoch, then (``apply=True``) runs a
    normal ``replay()`` to fold it — pinned lake config (P, update_mode,
    renames, drops, summary_spec) is adopted from the manifest as with
    any resume. Returns ``{"epoch": <log epoch>, "rows": n,
    "seq_lo": .., "seq_hi": .., "replay": <replay summary or None>}``.

    Scale shape: the batch is driver-held (control-plane DML — think
    GDPR deletes, dimension refreshes, manual corrections); bulk data
    enters through producers writing the log directly. The published
    epoch is folded by the fully distributed replay, so a large merge
    batch costs one ordinary epoch, not a special path."""
    if not isinstance(data, pa.Table):
        data = pa.table(data)
    for k in ("repo", "path"):
        if k not in data.column_names:
            raise ValueError(f"merge batch must carry key column {k!r}")
    if data.num_rows == 0:
        raise ValueError("empty merge batch")
    if "op" not in data.column_names:
        if default_op not in OPS:
            raise ValueError(f"default_op {default_op!r} not in {OPS}")
        data = data.append_column(
            "op", pa.array([default_op] * data.num_rows, pa.string())
        )
    else:
        if default_op not in OPS:
            raise ValueError(f"default_op {default_op!r} not in {OPS}")
        # Null op = "row without one": fill with the default (a mixed
        # batch can mark only its deletes explicitly).
        op = pc.fill_null(data.column("op"), default_op)
        data = data.set_column(data.schema.get_field_index("op"), "op", op)
        ok = pc.is_in(op, value_set=pa.array(OPS))
        if not pc.all(pc.fill_null(ok, False)).as_py():
            raise ValueError(f"merge batch op values must be in {OPS}")
    wm = _seq_watermark(lake_dir)
    if "seq" in data.column_names:
        if pc.any(
            pc.fill_null(pc.less_equal(data.column("seq"), wm), True)
        ).as_py():
            raise ValueError(
                f"merge batch carries seq <= the lake's applied watermark {wm} "
                "(or null); drop the seq column to auto-stamp above it"
            )
        data = data.set_column(
            data.schema.get_field_index("seq"),
            "seq",
            data.column("seq").cast(pa.int64()),
        )
    else:
        order = pc.sort_indices(
            data, sort_keys=[("repo", "ascending"), ("path", "ascending")]
        )
        data = data.take(order).append_column(
            "seq",
            pa.array(wm + 1 + np.arange(data.num_rows, dtype=np.int64)),
        )
    epoch = _publish_epoch(log_dir, data)
    seqs = data.column("seq")
    out = {
        "epoch": epoch,
        "rows": data.num_rows,
        "seq_lo": int(pc.min(seqs).as_py()),
        "seq_hi": int(pc.max(seqs).as_py()),
        "replay": None,
    }
    if apply:
        from engine.cdc.replay import ReplayConfig, replay

        out["replay"] = replay(log_dir, lake_dir, replay_cfg or ReplayConfig())
    return out


def delete_where(
    lake_dir: str,
    log_dir: str,
    filters: list[tuple],
    replay_cfg=None,
    apply: bool = True,
) -> dict:
    """DELETE WHERE through the changelog (retention / TTL / GDPR-style
    predicate deletes): select the LIVE keys matching ``filters`` via
    the zone-map-pruned lake scan (file skipping happens before any data
    page is read), publish ONE sealed changelog epoch of D events for
    exactly those keys, and fold it with a normal replay via
    :func:`merge_into` — so every invariant (exactly-once commit, LWW at
    any parallelism, lineage, changefeeds/replicas, time travel, resume)
    holds for free, and a replica tailing the log sees the retention
    pass as ordinary deletes.

    ``filters`` uses scan_lake's conjunction form ``[(col, op, val),
    ...]`` (or a DNF list of conjunctions). Control-plane shape like
    ``merge_into``: the matched KEY LIST is driver-held (repo+path only,
    never payloads); bulk-fraction deletes belong in a producer. Zero
    matches publish nothing and return ``{"rows": 0}``.

    SQL-oracle form (q_cdc_delete_where): because the D events target
    precisely the live matching keys, the final state is the LWW state
    MINUS the predicate — ``SELECT ... FROM state WHERE NOT pred``."""
    from engine.cdc.scan import scan_lake
    from engine.util.collect import pull_arrow

    keys = pull_arrow(scan_lake(lake_dir, filters, columns=["repo", "path"]))
    if keys is None or keys.num_rows == 0:
        return {"rows": 0, "epoch": None, "seq_lo": None, "seq_hi": None,
                "replay": None}
    batch = pa.table(
        {
            "repo": keys.column("repo"),
            "path": keys.column("path"),
            "op": pa.array(["D"] * keys.num_rows, pa.string()),
        }
    )
    return merge_into(lake_dir, log_dir, batch, apply=apply, replay_cfg=replay_cfg)


def main(argv: list[str] | None = None) -> None:
    """Operational CLI for changelog-routed batch DML::

        python -m engine.cdc.dml --lake-dir L --log-dir G \
            --parquet batch.parquet [--op U] [--no-apply]
        python -m engine.cdc.dml --lake-dir L --log-dir G \
            --delete-where '[["lang", "=", "en"]]' [--no-apply]

    The parquet batch needs (repo, path) plus any payload columns;
    optional ``op``/``seq`` columns follow :func:`merge_into` semantics.
    ``--delete-where`` takes a JSON conjunction (or DNF list) in
    scan_lake's (col, op, value) form and runs :func:`delete_where`.
    Works on an EMPTY lake too (watermark -1 → seqs from 0; the replay
    bootstraps the lake) — DML is just another producer."""
    import argparse
    import json

    import ray

    ap = argparse.ArgumentParser(description="MERGE INTO through the changelog")
    ap.add_argument("--lake-dir", required=True)
    ap.add_argument("--log-dir", required=True)
    grp = ap.add_mutually_exclusive_group(required=True)
    grp.add_argument("--parquet", help="batch file to merge")
    grp.add_argument("--delete-where",
                     help="JSON (col, op, value) conjunction to delete")
    ap.add_argument("--op", default="U", help="default op for rows without one")
    ap.add_argument("--no-apply", action="store_true",
                    help="publish the epoch only; let the next replay fold it")
    args = ap.parse_args(argv)
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    if args.delete_where:
        flt = [tuple(t) for t in json.loads(args.delete_where)]
        out = delete_where(args.lake_dir, args.log_dir, flt,
                           apply=not args.no_apply)
    else:
        out = merge_into(
            args.lake_dir, args.log_dir, pq.read_table(args.parquet),
            default_op=args.op, apply=not args.no_apply,
        )
    print(json.dumps({
        "epoch": out["epoch"], "rows": out["rows"],
        "seq_lo": out["seq_lo"], "seq_hi": out["seq_hi"],
        "applied": bool(out["replay"]),
    }))


if __name__ == "__main__":
    main()
