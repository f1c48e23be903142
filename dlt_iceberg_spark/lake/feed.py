"""Checkpointed incremental changelog consumption.

The loop every downstream pipeline actually runs against a lakehouse table:
"give me what changed since my last successful run, and remember where I
got to".  The reference's consumers re-scan tables per run; Iceberg ships
this as changelog scans + external offset tracking.  Here the two are
packaged together: :class:`ChangelogFeed` pairs :meth:`LakeTable.read_changes`
with a durable version cursor stored through the table's own FileIO (so a
feed checkpoint lives wherever the table lives — local FS, HDFS, object
store via HadoopFileIO).

Delivery contract: **at-least-once, replay-on-crash**.  ``poll()`` plans the
changes in ``(acked, current]`` without side effects; ``ack(version)``
atomically advances the cursor (tmp-file + rename, the same commit
primitive the table itself uses).  A consumer that crashes after processing
but before ``ack`` re-reads the same batch on restart — the standard
checkpointed-consumer contract (exactly-once requires the consumer's own
sink to be idempotent, e.g. a keyed merge).

Scale: both poll and ack are metadata-sized — read_changes plans from
snapshot diffs (O(files touched by the range)) and the cursor is one tiny
file; nothing here scans the table.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame

from dlt_iceberg_spark.lake.table import LakeTable


class ChangelogFeed:
    """Incremental CDC consumer over a :class:`LakeTable`.

    >>> feed = ChangelogFeed(table, name="enrich-orders")
    >>> batch = feed.poll()
    >>> if batch is not None:
    ...     process(batch.changes)      # DataFrame: schema + _change_type/_commit_version
    ...     feed.ack(batch.to_version)  # durably advance the cursor
    """

    class Batch:
        __slots__ = ("changes", "from_version", "to_version")

        def __init__(self, changes: DataFrame, from_version: int | None, to_version: int):
            self.changes = changes
            self.from_version = from_version
            self.to_version = to_version

    def __init__(
        self,
        table: LakeTable,
        name: str = "default",
        net_changes: bool = True,
    ) -> None:
        if not name or any(c in name for c in "/\\"):
            raise ValueError(f"feed name must be a plain identifier, got {name!r}")
        self.table = table
        self.name = name
        self.net_changes = net_changes
        self._io = table._io
        self._dir = os.path.join(table.location, "feeds")
        self._cursor = os.path.join(self._dir, f"{name}.cursor")

    def acked_version(self) -> int | None:
        """Last durably acknowledged snapshot version (None = never acked:
        the next poll replays the table's full history as inserts)."""
        if not self._io.exists(self._cursor):
            return None
        return int(self._io.read_text(self._cursor).strip())

    def poll(self) -> "ChangelogFeed.Batch | None":
        """Changes in ``(acked, current]`` or None when caught up.

        Side-effect free: polling never moves the cursor, so an unacked
        batch is replayed identically after a crash."""
        current = self.table.current_version()
        if current is None:
            raise FileNotFoundError(f"no such table: {self.table.location}")
        acked = self.acked_version()
        if acked is not None and acked == current:
            return None
        changes = self.table.read_changes(
            acked, current, net_changes=self.net_changes
        )
        return self.Batch(changes, acked, current)

    def ack(self, version: int) -> None:
        """Durably advance the cursor to ``version`` (tmp + atomic rename).

        Acking a version older than the current cursor is rejected — a
        stale consumer must re-poll rather than silently rewind the feed."""
        acked = self.acked_version()
        if acked is not None and version < acked:
            raise ValueError(
                f"cursor already at v{acked}; refusing to rewind to v{version}"
            )
        self._io.makedirs(self._dir)
        tmp = os.path.join(self._dir, f"_cursor_{uuid.uuid4().hex}")
        self._io.write_text(tmp, str(version))
        self._io.rename(tmp, self._cursor)

    def mirror_into(
        self,
        writer,
        table_name: str,
        primary_key: list[str],
        max_batches: int | None = None,
    ) -> int:
        """Replicate this table into another via CDC apply — the classic
        changelog-consumer loop: drain batches, resolve each to one
        merge-shaped source, and land it through the normal disposition
        path (one snapshot per drained batch, ledger-idempotent).

        Per-key resolution within a batch: a key with any INSERT image
        upserts its newest insert row; a key with only DELETE images hard-
        deletes.  (With ``net_changes=True`` — the default feed mode — an
        update arrives as delete(old)+insert(new) on the same key and
        resolves to the upsert.)  Cursor acks only after the write commits,
        so a crash replays the batch — absorbed because the merge itself is
        idempotent (replaying "delete these keys, insert these rows" lands
        the same final state).

        Returns the number of batches applied.
        """
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from dlt_iceberg_spark.lake.writer import TableSpec

        spec = TableSpec(
            name=table_name,
            write_disposition={"disposition": "merge", "strategy": "delete-insert"},
            primary_key=list(primary_key),
            hard_delete_column="_dlt_deleted_at",
        )

        n = 0
        while max_batches is None or n < max_batches:
            batch = self.poll()
            if batch is None:
                break
            resolved = resolve_change_images(batch.changes, list(primary_key))
            writer.write(
                spec,
                resolved,
                load_id=f"feed.{self.name}.{batch.to_version}",
            )
            self.ack(batch.to_version)
            n += 1
        return n

    def process(self, fn, max_batches: int | None = None) -> int:
        """Drain the feed: repeatedly poll, hand the batch DataFrame to
        ``fn(changes_df)``, and ack on success.  Returns batches processed.
        ``fn`` failures propagate WITHOUT acking — the batch replays on the
        next drain (at-least-once)."""
        n = 0
        while max_batches is None or n < max_batches:
            batch = self.poll()
            if batch is None:
                break
            fn(batch.changes)
            self.ack(batch.to_version)
            n += 1
        return n


def resolve_change_images(
    changes, primary_key: list[str], deleted_col: str = "_dlt_deleted_at"
):
    """Collapse a CDC image batch to ONE merge-shaped row per key: a key
    with any INSERT image upserts its newest insert row (inserts outrank
    deletes at the same version, so an update's delete+insert pair
    resolves to the insert); a key with only DELETE images carries the
    ``deleted_col`` marker for a hard delete.  Shared by the batch
    changelog consumer (:meth:`ChangelogFeed.mirror_into`) and the
    streaming mirror (streaming/mirror.py)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    cols = [c for c in changes.columns if c not in ("_change_type", "_commit_version")]
    w = F.row_number().over(
        Window.partitionBy(*primary_key).orderBy(
            F.col("_commit_version").desc(),
            F.when(F.col("_change_type") == "insert", 0).otherwise(1),
        )
    )
    return (
        changes.withColumn("_rn", w)
        .filter(F.col("_rn") == 1)
        .withColumn(
            deleted_col,
            F.when(F.col("_change_type") == "delete", F.current_timestamp()),
        )
        .select(*cols, deleted_col)
    )
