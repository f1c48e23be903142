"""Table maintenance: small-file compaction + snapshot expiration.

The two operations every high-ingest lakehouse needs (Iceberg ships them
as ``rewrite_data_files`` / ``expire_snapshots`` procedures; the reference
has neither and degrades accordingly under many small loads):

- **Compaction**: streaming/micro-batch ingestion produces one small file
  per batch per partition; scan cost grows with file COUNT (task scheduling,
  footer reads) not just bytes.  ``compact_table`` rewrites only
  under-sized files into ~``target_file_bytes`` outputs in one atomic
  ``replace``-operation snapshot — readers never see a partial state, and
  full-sized files are carried over untouched (no rewrite amplification).
- **Expiration**: every snapshot pins its files; without expiry, storage
  grows without bound and time travel windows are infinite.
  ``expire_snapshots`` drops snapshot metadata older than the retention
  cutoff (always keeping the current one and ``keep_last``) and deletes
  data files referenced ONLY by expired snapshots.
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

from dlt_iceberg_spark.lake.table import DataFile, LakeTable

#: compaction default target (Iceberg's write.target-file-size-bytes default)
DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


@dataclass
class CompactionResult:
    rewritten_files: int
    carried_files: int
    output_files: int
    rewritten_bytes: int


def compact_table(
    table: LakeTable,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    small_file_threshold: float = 0.5,
) -> CompactionResult:
    """Bin-pack small files into ~target-size outputs, one atomic snapshot.

    Files ≥ ``small_file_threshold × target`` are carried over unchanged.
    The rewrite reads only the small files and repartitions them to
    ``ceil(small_bytes / target)`` outputs — a distributed job sized by the
    data actually rewritten, not the table.
    """
    snap = table.snapshot()
    if snap is None:
        raise FileNotFoundError(f"no such table: {table.location}")
    cutoff = int(target_file_bytes * small_file_threshold)
    small = [f for f in snap.files if f.bytes < cutoff]
    keep = [f for f in snap.files if f.bytes >= cutoff]
    if len(small) <= 1:
        return CompactionResult(0, len(snap.files), 0, 0)

    small_bytes = sum(f.bytes for f in small)
    n_out = max(1, -(-small_bytes // target_file_bytes))  # ceil
    df = table.read_files(small).repartition(n_out)
    new_files = table.stage_dataframe(df)
    table.commit(
        keep + new_files,
        snap.schema,
        "replace",
        snap.version,
        summary={
            "compaction": True,
            "rewritten-files": len(small),
            "added-files": len(new_files),
        },
    )
    return CompactionResult(len(small), len(keep), len(new_files), small_bytes)


def expire_snapshots(
    table: LakeTable,
    older_than: timedelta = timedelta(days=7),
    keep_last: int = 1,
) -> dict[str, int]:
    """Remove expired snapshot manifests and orphaned data files.

    A data file is deleted only when NO retained snapshot references it —
    the invariant that makes expiry safe under time travel.  Returns counts
    ``{"snapshots": n, "data_files": m}``.
    """
    snaps = table.snapshots()
    current = table.current_version()
    if current is None or not snaps:
        return {"snapshots": 0, "data_files": 0}
    cutoff = datetime.now(timezone.utc) - older_than
    newest_first = sorted(snaps, key=lambda s: s.version, reverse=True)
    # tagged snapshots are pinned: a named ref must stay readable
    protected = (
        {s.version for s in newest_first[:keep_last]}
        | {current}
        | set(table.tags().values())
    )

    expired = [
        s
        for s in snaps
        if s.version not in protected and datetime.fromisoformat(s.timestamp) < cutoff
    ]
    if not expired:
        return {"snapshots": 0, "data_files": 0}

    retained = [s for s in snaps if s.version not in {e.version for e in expired}]
    live_paths = {f.path for s in retained for f in s.files}
    dead_paths = {
        f.path for s in expired for f in s.files if f.path not in live_paths
    }
    for rel in sorted(dead_paths):
        p = os.path.join(table.location, rel)
        if os.path.exists(p):
            os.remove(p)
    meta = os.path.join(table.location, "metadata")
    for s in expired:
        manifest = os.path.join(meta, f"v{s.version:06d}.json")
        if os.path.exists(manifest):
            os.remove(manifest)
    return {"snapshots": len(expired), "data_files": len(dead_paths)}


def remove_orphan_files(
    table: LakeTable,
    older_than: timedelta = timedelta(days=3),
    dry_run: bool = False,
) -> dict[str, list[str]]:
    """Delete files in the table location reachable by NO snapshot
    (Iceberg's ``remove_orphan_files`` procedure).

    Orphans accumulate from failed jobs: a writer stages data files and then
    dies before commit, or commits conflict and retry.  Three kinds:

    - **data files** under ``data/`` not referenced by any snapshot manifest,
    - **staging directories** (``_staging_*``) of crashed write jobs,
    - **metadata leftovers**: ``_ptr_*`` temp pointers, and manifests with a
      version NEWER than the current pointer — a committer that wrote its
      manifest but died before the pointer rename.  These are load-bearing
      to remove: a stale future manifest permanently blocks the next commit
      at that version (O_EXCL create fails), so this procedure is also the
      table's crash-recovery path.

    Only files whose mtime is older than ``older_than`` are touched — the
    grace window that keeps a concurrent in-flight write (staged but not yet
    committed) safe, same as Iceberg's 3-day default.  ``dry_run`` reports
    without deleting.  Returns ``{"data_files": [...], "staging_dirs":
    [...], "metadata_files": [...]}`` of (to-be-)deleted paths relative to
    the table location.
    """
    cutoff = time.time() - older_than.total_seconds()

    def _old(path: str) -> bool:
        try:
            return os.path.getmtime(path) < cutoff
        except FileNotFoundError:
            return False

    # referenced = union over ALL manifests present (not just the current
    # chain): expired-but-not-yet-cleaned and future manifests still pin
    # their files until the manifest itself is removed
    meta_dir = table._meta_dir
    current = table.current_version()
    referenced: set[str] = set()
    future_manifests: list[str] = []
    if os.path.isdir(meta_dir):
        for name in os.listdir(meta_dir):
            if name.startswith("v") and name.endswith(".json"):
                version = int(name[1:-5])
                if (current is None or version > current) and _old(
                    os.path.join(meta_dir, name)
                ):
                    # stale future manifest: delete it, so don't let it pin
                    # its data files either
                    future_manifests.append(name)
                    continue
                try:
                    snap = table.snapshot(version)
                except (KeyError, ValueError):
                    continue  # mid-write or corrupt: let the grace window decide
                if snap is not None:
                    referenced.update(f.path for f in snap.files)

    out: dict[str, list[str]] = {"data_files": [], "staging_dirs": [], "metadata_files": []}

    if os.path.isdir(table._data_dir):
        for name in sorted(os.listdir(table._data_dir)):
            abs_path = os.path.join(table._data_dir, name)
            if f"data/{name}" not in referenced and _old(abs_path):
                out["data_files"].append(f"data/{name}")
                if not dry_run:
                    os.remove(abs_path)

    for name in sorted(os.listdir(table.location)):
        abs_path = os.path.join(table.location, name)
        if name.startswith("_staging_") and os.path.isdir(abs_path) and _old(abs_path):
            out["staging_dirs"].append(name)
            if not dry_run:
                shutil.rmtree(abs_path)

    if os.path.isdir(meta_dir):
        stale_meta = [n for n in os.listdir(meta_dir) if n.startswith("_ptr_")]
        stale_meta += future_manifests
        for name in sorted(stale_meta):
            abs_path = os.path.join(meta_dir, name)
            if _old(abs_path):
                out["metadata_files"].append(f"metadata/{name}")
                if not dry_run:
                    os.remove(abs_path)
    return out
