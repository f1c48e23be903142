"""Continuous vector-index maintenance: the persisted IVF index as a
standing stream.

``stream_index_vectors`` composes ``read_stream`` (a LakeTable as a
streaming source, one micro-batch per snapshot with
``max_versions_per_batch=1``) with the persisted index lifecycle
(``operators/vector_index.py``): the FIRST nonempty epoch bootstraps the
index (trains centroids on that load, or uses the caller's), every later
epoch assigns its vectors to the FROZEN centroids map-side and
delta-appends — so the index tracks the source load-by-load without ever
retraining or rescanning earlier loads, the same shape
``stream_dedup_corpus`` gives the dedup class index.

Exactly-once: with ``state`` given, a checkpoint-replayed epoch is skipped
outright by the load ledger (``append_vectors`` is NOT naturally
idempotent — a replayed epoch would duplicate its vectors — so pass
``state`` for production streams, same contract as ``stream_write``).

Scale: per-epoch cost is O(batch) — one Arrow-batched BLAS argmax against
the broadcast centroid matrix plus a delta commit; the index can hold any
number of vectors and the stream's steady-state cost never reads it.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQuery

from pyspark.sql import Window
from pyspark.sql import functions as F

from dlt_iceberg_spark.operators.vector_index import (
    append_vectors,
    delete_vectors,
    write_vector_index,
)
from dlt_iceberg_spark.streaming.source import read_stream


def stream_index_vectors(
    spark,
    source_location: str,
    index_table,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    state=None,
    query_name: str = "vecidx",
    trigger_interval: str | None = "100 milliseconds",
    from_beginning: bool = True,
    max_versions_per_batch: int | None = 1,
    dataset_name: str = "main",
    changes: bool = False,
    **index_options,
) -> StreamingQuery:
    """Stand up the index-maintenance stream over the LakeTable at
    ``source_location``; returns the running :class:`StreamingQuery`.

    ``index_table`` is a LakeTable handle for the index location
    (bootstrapped on the first nonempty epoch if it doesn't exist).
    ``index_options`` (``pq=``, ``codebooks=``, ``store_vectors=``,
    ``metadata_cols=``, …) pass through to the bootstrap
    :func:`write_vector_index` — an IVF-PQ or metadata-filtered index
    maintains from a stream exactly like the plain one, since appends
    read the frozen contract from the table's own properties.

    ``changes=True`` opens the source in CDC mode (the takedown path):
    each epoch's delete images remove their ids from the index
    (:func:`delete_vectors`, MoR equality deletes) BEFORE its insert
    images append — so a corpus hard delete (``merge_hard_delete``,
    ``position_delete_where``) propagates to the index in the epoch it
    lands, and an upsert (delete(old)+insert(new), same id) resolves to
    the new image because equality deletes mask strictly-smaller
    sequences only.  Without CDC the source's appends are the only thing
    the index ever sees — deleted vectors stay queryable forever.

    Snapshot-grained epochs need a processing-time trigger — for a
    bounded catch-up run use :func:`run_index_backfill`."""
    stream = read_stream(
        spark,
        source_location,
        from_beginning=from_beginning,
        **({"changes": True} if changes else {}),
        **(
            {"max_versions_per_batch": max_versions_per_batch}
            if max_versions_per_batch is not None
            else {}
        ),
    )

    def handle_batch(batch_df, batch_id: int) -> None:
        load_id = f"{query_name}.{batch_id}"
        if state is not None and state.load_recorded(load_id):
            return
        if changes:
            # A batch may span several commit versions
            # (max_versions_per_batch > 1 or None): resolve each id to its
            # LATEST change image before splitting, else an insert at vN
            # hard-deleted at vN+1 inside the same batch would resurrect
            # (the equality delete would commit below the append), and the
            # bootstrap epoch would index rows already deleted later in it.
            # Within one version an update is delete+insert and the insert
            # is the newer image, so insert outranks delete on ties.
            #
            # PERF (VERDICT r11 task 3): with max_versions_per_batch=1 a
            # batch holds exactly ONE commit version by construction, so
            # the window is a provable no-op — within one version every
            # id's insert image wins the tie-break, which is exactly what
            # the `_change_type == 'insert'` filter below plus the
            # deletes-first masking already produce.  Skip the per-epoch
            # id-keyed shuffle+sort statically (no runtime version probe
            # needed); multi-version batches keep the full resolution.
            if max_versions_per_batch == 1:
                latest = batch_df
            else:
                w = Window.partitionBy(id_col).orderBy(
                    F.col("_commit_version").desc(),
                    (F.col("_change_type") == "insert").cast("int").desc(),
                )
                latest = (
                    batch_df.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .drop("_rn")
                )
            # every id with a delete image gets masked — including upserts,
            # whose pre-batch copy must go; this epoch's own insert commits
            # at a higher sequence, so it survives the mask.
            deletes = (
                batch_df.filter(F.col("_change_type") == "delete")
                .select(id_col)
                .distinct()
            )
            batch_df = latest.filter(F.col("_change_type") == "insert").drop(
                "_change_type", "_commit_version"
            )
            # deletes first: the lower-sequence masks spare this epoch's
            # own inserts, giving upserts last-write-wins in one epoch
            if index_table.current_version() is not None and not deletes.isEmpty():
                delete_vectors(index_table, deletes)
        if batch_df.isEmpty():
            if state is not None:
                state.store_completed_load(
                    load_id, dataset_name, schema_version_hash=""
                )
            return
        if index_table.current_version() is None:
            write_vector_index(
                index_table,
                batch_df,
                vec_col=vec_col,
                id_col=id_col,
                n_centroids=n_centroids,
                seed=seed,
                centroids=centroids,
                **index_options,
            )
        else:
            append_vectors(index_table, batch_df)
        if state is not None:
            state.store_completed_load(load_id, dataset_name, schema_version_hash="")

    sink = (
        stream.writeStream.foreachBatch(handle_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_interval:
        sink = sink.trigger(processingTime=trigger_interval)
    return sink.start()


def run_index_backfill(
    spark,
    source_location: str,
    index_table,
    checkpoint_dir: str,
    timeout: float = 300,
    **options,
) -> int:
    """Bounded catch-up: run the index stream until every source snapshot
    at call time has been processed as its own epoch, then stop it.
    Returns the drained-to source version; the checkpoint persists, so the
    next call resumes after it."""
    from dlt_iceberg_spark.streaming.micro_batch import drain_stream_to_head

    q = stream_index_vectors(
        spark, source_location, index_table, checkpoint_dir, **options
    )
    return drain_stream_to_head(q, source_location, timeout)
