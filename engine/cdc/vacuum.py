"""Lake vacuum: orphan GC + manifest retention (SURVEY.md §2.7 C5/C4
hygiene; VERDICT round 2, Missing #2).

The two-phase sink deliberately leaves unreferenced files behind —
crashed/retried merge tasks write data files no manifest ever names, and
every rewrite/compaction supersedes the previous epoch's base file. This
module reclaims them:

- **Referenced set** — the union of every *retained* manifest's data-file
  lists plus its ``summary_file``. Retention keeps the newest
  ``retain_last`` committed manifests (time travel back to those epochs
  stays possible); older manifests are deleted too.
- **Safety** — only files under ``data/`` and ``summary/`` are eligible;
  lineage records are audit history and always kept. ``min_age_s``
  protects files an in-flight epoch just wrote but has not yet committed
  (phase 1 of the two-phase protocol): anything younger is kept
  regardless of reference status. Do not run vacuum concurrently with a
  replay unless ``min_age_s`` exceeds the epoch wall time.
- **Resume** — unaffected: :func:`engine.cdc.replay.replay` skips
  everything at or below ``last_committed_epoch`` (which retention always
  keeps), so a vacuumed lake resumes exactly where it left off.

CLI: ``python -m engine.cdc.vacuum --lake-dir L [--retain-last N]
[--min-age-s S] [--dry-run]``
"""

from __future__ import annotations

import os
import time

from engine.cdc import sink


def _committed_epochs(lake_dir: str) -> list[int]:
    mdir = os.path.join(lake_dir, sink.MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    return sorted(
        int(n[len("epoch-") : -len(".json")])
        for n in os.listdir(mdir)
        if n.startswith("epoch-") and n.endswith(".json")
    )


def referenced_files(lake_dir: str, epochs: list[int]) -> set[str]:
    """Lake-relative paths referenced by the given committed epochs."""
    refs: set[str] = set()
    for k in epochs:
        m = sink.read_manifest(lake_dir, k)
        for rels in sink.active_files(m).values():
            refs.update(rels)
        if m.get("summary_file"):
            refs.add(m["summary_file"])
    return refs


def vacuum(
    lake_dir: str,
    retain_last: int = 1,
    min_age_s: float = 0.0,
    dry_run: bool = False,
) -> dict:
    """Delete data/summary files unreferenced by the retained manifests
    and manifests older than the retention window. Returns a report dict
    (counts, bytes, retained epochs)."""
    if retain_last < 1:
        raise ValueError("retain_last must be >= 1 (the resume point must survive)")
    epochs = _committed_epochs(lake_dir)
    keep_epochs = epochs[-retain_last:]
    refs = referenced_files(lake_dir, keep_epochs)
    now = time.time()
    removed_files, removed_bytes = [], 0
    for sub in (sink.DATA_DIR, sink.SUMMARY_DIR):
        root = os.path.join(lake_dir, sub)
        for dirpath, _, names in os.walk(root):
            for name in names:
                abs_path = os.path.join(dirpath, name)
                rel = os.path.relpath(abs_path, lake_dir)
                # Distributed-fold summaries are referenced as a DIRECTORY;
                # every file under a referenced prefix is protected.
                if rel in refs or any(rel.startswith(r + os.sep) for r in refs):
                    continue
                if min_age_s and now - os.path.getmtime(abs_path) < min_age_s:
                    continue  # possibly phase-1 of an in-flight epoch
                removed_bytes += os.path.getsize(abs_path)
                removed_files.append(rel)
                if not dry_run:
                    os.remove(abs_path)
    removed_manifests = [k for k in epochs if k not in keep_epochs]
    if not dry_run:
        for k in removed_manifests:
            os.remove(os.path.join(lake_dir, sink.MANIFEST_DIR, f"epoch-{k:05d}.json"))
        # Staged-but-unclaimed commit attempts (a writer that crashed
        # between staging and the CAS link, or lost the race and died
        # before its finally-unlink) are plain orphans once aged. A
        # POSITIVE age floor is required here even when min_age_s is 0:
        # a vacuum racing a live committer must not unlink the staged
        # manifest between its fsync and the CAS os.link (that turns a
        # clean CommitConflict into FileNotFoundError for the committer).
        tmp_age = max(min_age_s, 60.0)
        mdir = os.path.join(lake_dir, sink.MANIFEST_DIR)
        for name in os.listdir(mdir):
            abs_path = os.path.join(mdir, name)
            if name.endswith(".tmp") and now - os.path.getmtime(abs_path) >= tmp_age:
                os.remove(abs_path)
        # Drop now-empty partition directories (cosmetic).
        for dirpath, dirnames, names in os.walk(
            os.path.join(lake_dir, sink.DATA_DIR), topdown=False
        ):
            if not dirnames and not names and dirpath != os.path.join(lake_dir, sink.DATA_DIR):
                os.rmdir(dirpath)
    return {
        "retained_epochs": keep_epochs,
        "removed_manifests": removed_manifests,
        "removed_files": len(removed_files),
        "removed_bytes": removed_bytes,
        "removed": sorted(removed_files),
        "dry_run": dry_run,
    }


def main(argv: list[str] | None = None) -> None:
    import argparse
    import json

    ap = argparse.ArgumentParser(description="CDC lake vacuum / orphan GC")
    ap.add_argument("--lake-dir", required=True)
    ap.add_argument("--retain-last", type=int, default=1)
    ap.add_argument("--min-age-s", type=float, default=3600.0)
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args(argv)
    report = vacuum(args.lake_dir, args.retain_last, args.min_age_s, args.dry_run)
    report.pop("removed")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
