"""Continuous content-level dedup: the incremental-dedup operator as a
standing stream.

``stream_dedup_corpus`` composes the pieces the engine already has —
``read_stream`` (a LakeTable as a streaming source, one micro-batch per
snapshot with ``max_versions_per_batch=1``), the persisted class/signature
index (``operators/dedup.py::build_dedup_index``), and the batch-vs-corpus
probe (``batch_vs_corpus_dedup``) — into the shape a continuous-ingestion
training-data pipeline actually runs: every arriving load is near-dup
checked against EVERYTHING ingested before it, the flagged pairs land in a
queryable LakeTable, and the load's novel token-set classes append to the
index so corpus text is never re-tokenized after first ingest.

Per micro-batch (epoch = one source snapshot):

1. probe: ``batch_vs_corpus_dedup(batch, index.read())`` — the batch side
   broadcasts, the index is scanned map-side (zero corpus shuffle), and
   only banded candidates pay the exact token-set Jaccard;
2. flag: nonempty results append to the flags table, one snapshot per
   epoch, ``load_id = "<query>.<flags>.<epoch>"``;
3. index: ``append_novel_classes`` — a batch class already stored is a dup
   (flagged in step 1) and deliberately NOT re-added, so canonical ids
   stay first-ingest; the append is a delta commit.

Exactly-once: with ``state`` given, a checkpoint-replayed epoch is skipped
outright by the load ledger.  Without it, the index append is naturally
idempotent (known classes are skipped) but a replayed epoch re-appends its
flag rows — pass ``state`` for production streams, same contract as
``stream_write``.

Scale: per-epoch cost follows the BATCH (probe is O(batch-classes)
broadcast against a map-side index scan; the index append is O(novel));
the corpus can be 100 TB and the stream's steady-state cost never reads
it — only its class index, which is smaller than the corpus by the
dedup factor times the text-to-class compression.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQuery

from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec
from dlt_iceberg_spark.operators.dedup import (
    append_novel_classes,
    batch_vs_corpus_dedup,
    write_dedup_index,
)
from dlt_iceberg_spark.streaming.source import read_stream


def stream_dedup_corpus(
    spark,
    source_location: str,
    index_table,
    writer: LakeWriter,
    flags_table: str,
    text_col: str,
    id_col: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
    n_hashes: int = 64,
    bands: int = 32,
    strategy: str = "lsh",
    state=None,
    query_name: str = "sdedup",
    available_now: bool = False,
    trigger_interval: str | None = "100 milliseconds",
    from_beginning: bool = True,
    max_versions_per_batch: int | None = 1,
    dataset_name: str = "main",
) -> StreamingQuery:
    """Stand up the dedup stream over the LakeTable at
    ``source_location``; returns the running :class:`StreamingQuery`.

    ``index_table`` is the persisted class index (a :class:`LakeTable`
    handle; created on the first nonempty epoch if it doesn't exist yet).
    ``flags_table`` receives ``(corpus_id, batch_id, jaccard)`` rows via
    ``writer``.  ``max_versions_per_batch=1`` (default) makes each source
    snapshot its own epoch — loads dedup against strictly-earlier loads,
    never against co-arriving ones (batch-internal dup detection is a
    separate op, same as the batch operator).

    Trigger caveat: snapshot-grained epochs need a PROCESSING-TIME
    trigger — ``availableNow`` captures ONE latestOffset at start, which
    the admission cap has clamped to a single version, so the drain would
    silently stop after the first snapshot.  For a bounded catch-up run
    use :func:`run_dedup_backfill`, which polls the stream to the source
    head and stops it; ``available_now=True`` is only legal with the cap
    disabled (whole backlog as one epoch — no earlier/later distinction
    inside it)."""
    if available_now and max_versions_per_batch is not None:
        raise ValueError(
            "available_now drains a single capped batch and stops early; "
            "use run_dedup_backfill() for snapshot-grained catch-up, or "
            "pass max_versions_per_batch=None to process the whole "
            "backlog as one epoch"
        )
    stream = read_stream(
        spark,
        source_location,
        from_beginning=from_beginning,
        **(
            {"max_versions_per_batch": max_versions_per_batch}
            if max_versions_per_batch is not None
            else {}
        ),
    )
    spec = TableSpec(name=flags_table, write_disposition="append")

    def handle_batch(batch_df, batch_id: int) -> None:
        load_id = f"{query_name}.{flags_table}.{batch_id}"
        if state is not None and state.load_recorded(load_id):
            return
        if batch_df.isEmpty():
            return
        # feeds the probe AND the index append; lazy persists race
        batch_df = batch_df.localCheckpoint(eager=True)
        if index_table.current_version() is None:
            # first-ever load: nothing to dup against, index bootstraps
            write_dedup_index(index_table, batch_df, text_col, id_col, n_hashes)
        else:
            dups = batch_vs_corpus_dedup(
                batch_df,
                index_table.read(),
                text_col,
                id_col,
                threshold=threshold,
                n_hashes=n_hashes,
                bands=bands,
                strategy=strategy,
            )
            if not dups.isEmpty():
                writer.write(spec, dups, load_id=load_id)
            append_novel_classes(index_table, batch_df, text_col, id_col, n_hashes)
        if state is not None:
            state.store_completed_load(load_id, dataset_name, schema_version_hash="")

    sink = (
        stream.writeStream.foreachBatch(handle_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        sink = sink.trigger(availableNow=True)
    elif trigger_interval:
        sink = sink.trigger(processingTime=trigger_interval)
    return sink.start()


def run_dedup_backfill(
    spark,
    source_location: str,
    index_table,
    writer: LakeWriter,
    flags_table: str,
    text_col: str,
    id_col: str,
    checkpoint_dir: str,
    timeout: float = 300,
    **options,
) -> int:
    """Bounded catch-up: run the dedup stream until every source snapshot
    at call time has been processed as its own epoch, then stop it.
    Returns the source version the stream drained to.  The checkpoint
    persists, so the next call resumes after it — the batch-job shape of
    the standing stream (same epochs, same flags, same index)."""
    from dlt_iceberg_spark.streaming.micro_batch import drain_stream_to_head

    q = stream_dedup_corpus(
        spark,
        source_location,
        index_table,
        writer,
        flags_table,
        text_col,
        id_col,
        checkpoint_dir,
        **options,
    )
    return drain_stream_to_head(q, source_location, timeout)
