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
    protected = {s.version for s in newest_first[:keep_last]} | {current}

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
