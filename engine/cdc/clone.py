"""Zero-copy lake clones (branching).

``clone_lake`` branches a committed lake version into a fresh lake
directory by HARDLINKING the referenced data/summary files — O(metadata)
regardless of lake size, no data pages copied. Safe because every lake
data file is immutable by construction: merge, compaction, backfill,
purge and repartition all write NEW uuid-named files and retire old ones
via the manifest — nothing ever mutates a committed file in place, so
two lakes sharing inodes can never observe each other's writes.

The clone carries the source manifest verbatim (same version number,
same ``changelog_pos``, same pinned ``num_partitions``), so
``replay(log, clone)`` resumes exactly where the source stood — the
dev-branch workflow: branch the production lake, replay/patch/purge on
the branch, throw it away or promote it. Divergence is fully
independent; each side's vacuum only unlinks its OWN directory's links
(a shared inode survives until both sides drop it). History is
truncated at the branch point: only the cloned version exists in the
clone's manifest chain (time travel to earlier versions stays with the
source).
"""

from __future__ import annotations

import os
import shutil

from engine.cdc import sink


def _link_or_copy(src: str, dst: str) -> None:
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    try:
        os.link(src, dst)
    except OSError:  # cross-device (or FS without hardlinks): copy
        shutil.copy2(src, dst)


def clone_lake(src_lake: str, dst_lake: str, epoch: int | None = None) -> dict:
    """Branch ``src_lake`` at ``epoch`` (default: latest committed
    version) into ``dst_lake`` (must not already be a lake). Returns the
    clone's manifest (identical to the source's)."""
    manifest = sink.read_manifest(src_lake, epoch)
    if manifest is None:
        raise FileNotFoundError(f"no committed manifest under {src_lake}")
    if sink.last_committed_epoch(dst_lake) is not None:
        raise RuntimeError(f"clone target {dst_lake} is already a lake")
    version = int(manifest["epoch"])
    sink.init_lake(dst_lake)

    rels: list[str] = []
    for part_rels in sink.active_files(manifest).values():
        rels.extend(part_rels)
    summary_rel = manifest.get("summary_file")
    if summary_rel:
        abs_summary = os.path.join(src_lake, summary_rel)
        if os.path.isdir(abs_summary):  # distributed-fold summary directory
            rels.extend(
                os.path.join(summary_rel, n)
                for n in os.listdir(abs_summary)
                if n.endswith(".parquet")
            )
        else:
            rels.append(summary_rel)
    # Lineage parquets are tiny audit rows; carry the branch point's.
    lin = os.path.join(src_lake, sink.LINEAGE_DIR, f"epoch-{version:05d}.parquet")
    if os.path.exists(lin):
        rels.append(os.path.join(sink.LINEAGE_DIR, f"epoch-{version:05d}.parquet"))
    for rel in rels:
        _link_or_copy(os.path.join(src_lake, rel), os.path.join(dst_lake, rel))

    # The manifest itself is the commit point; reuse the CAS publish so a
    # racing double-clone into the same target fails loudly.
    src_path = os.path.join(src_lake, sink.MANIFEST_DIR, f"epoch-{version:05d}.json")
    dst_path = os.path.join(dst_lake, sink.MANIFEST_DIR, f"epoch-{version:05d}.json")
    tmp = dst_path + ".clone.tmp"
    shutil.copyfile(src_path, tmp)
    try:
        os.link(tmp, dst_path)
    except FileExistsError:
        raise sink.CommitConflict(f"clone target already committed: {dst_path}") from None
    finally:
        os.unlink(tmp)
    return sink.read_manifest(dst_lake, version)
