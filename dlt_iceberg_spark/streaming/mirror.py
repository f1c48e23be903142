"""Continuous table replication: the CDC streaming source's canonical
consumer.

``stream_mirror`` composes the two streaming halves the engine already
has — ``read_stream(changes=True)`` (delete/insert images per
micro-batch) and ``stream_write`` (per-epoch disposition apply with
checkpointed exactly-once) — into a standing replica: every source
mutation (append, upsert, row-level delete, rewrite) flows to the
mirror as a merge-shaped apply, one snapshot per epoch.

Semantics per micro-batch: images collapse to one row per key
(:func:`~dlt_iceberg_spark.lake.feed.resolve_change_images` — an
update's delete+insert pair resolves to the insert; keys with only
delete images hard-delete), then land through the ordinary
delete-insert merge.  A checkpoint-replayed epoch re-applies the same
resolved batch, which the merge absorbs idempotently — and with
``state`` given, the ledger skips it outright.

This is the streaming upgrade of ``ChangelogFeed.mirror_into`` (same
resolution, same disposition): the feed polls on demand with a durable
cursor; the mirror is a Structured Streaming query with checkpoint
offsets, suited to `trigger(processingTime=...)` standing replication.

Scale: the source plans each epoch by manifest-ref diff (O(changed)),
images materialize executor-side, and the merge is key-localized — the
replica's per-epoch cost follows the CHANGE volume, never table size.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQuery

from dlt_iceberg_spark.lake.feed import resolve_change_images
from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec
from dlt_iceberg_spark.streaming.micro_batch import stream_write
from dlt_iceberg_spark.streaming.source import read_stream


def stream_mirror(
    spark,
    source_location: str,
    writer: LakeWriter,
    table_name: str,
    primary_key: list[str],
    checkpoint_dir: str,
    query_name: str = "mirror",
    from_beginning: bool = True,
    available_now: bool = True,
    trigger_interval: str | None = None,
    state=None,
    dataset_name: str = "main",
    maintain_every: int | None = None,
) -> StreamingQuery:
    """Continuously replicate the LakeTable at ``source_location`` into
    ``writer``'s ``table_name`` via streaming CDC apply.  Returns the
    running :class:`StreamingQuery` (``availableNow`` by default — one
    catch-up drain; pass ``available_now=False`` with
    ``trigger_interval`` for a standing replica)."""
    changes = read_stream(
        spark, source_location, changes=True, from_beginning=from_beginning
    )
    spec = TableSpec(
        name=table_name,
        write_disposition={"disposition": "merge", "strategy": "delete-insert"},
        primary_key=list(primary_key),
        hard_delete_column="_dlt_deleted_at",
    )
    return stream_write(
        changes,
        writer,
        spec,
        checkpoint_dir,
        state=state,
        query_name=query_name,
        available_now=available_now,
        trigger_interval=trigger_interval,
        dataset_name=dataset_name,
        maintain_every=maintain_every,
        transform=lambda batch: resolve_change_images(batch, list(primary_key)),
    )
