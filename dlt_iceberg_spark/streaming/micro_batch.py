"""Micro-batch streaming into lake tables + event-time operators.

Design notes (100 TB / always-on):

- ``stream_write`` funnels every micro-batch through
  :meth:`LakeWriter.write`, so each batch is one atomic snapshot under any
  disposition (append / replace / merge) — the streaming analogue of the
  reference's one-snapshot-per-load invariant.  Exactly-once across
  restarts: Spark's checkpoint replays a failed batch with the SAME
  ``batch_id``; the load ledger (``_dlt_loads``) already dedupes by load_id
  (reference destination_client.py:1139-1150), so replayed batches no-op
  instead of double-writing.
- Event-time operators (windowed counts, sessionization, in-stream dedup)
  are plain DataFrame transformations valid on BOTH batch and streaming
  inputs — batch mode is how the oracle checks them; streaming mode adds
  watermarks to bound state.  State size is O(open windows × key
  cardinality), the knob being the watermark delay.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from dlt_iceberg_spark.lake.state import StateStore
from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec


def await_stream(q: StreamingQuery, timeout: float = 300) -> None:
    """Block until ``q`` terminates, surfacing failures LOUDLY.

    ``awaitTermination(timeout)`` alone is a silent trap for bounded
    (availableNow) queries: a source that crashes mid-batch leaves the
    query terminated-with-exception, and a hung one leaves it running —
    either way a naive caller reads a partial sink and fails later with a
    confusing wrong-rows error far from the cause.  This raises the
    stream's own error if it failed, and a TimeoutError (after stopping
    the query) if it never finished."""
    finished = q.awaitTermination(timeout)
    exc = q.exception()
    if exc is not None:
        raise exc
    if not finished:
        q.stop()
        raise TimeoutError(
            f"streaming query {q.name or q.id} did not terminate within "
            f"{timeout}s (no failure reported; likely hung source or "
            "starved scheduler)"
        )


def drain_stream_to_head(
    q: StreamingQuery, source_location: str, timeout: float = 300
) -> int:
    """Poll a snapshot-grained lake stream until every source snapshot at
    CALL time has been processed as its own epoch, then stop it.  Returns
    the drained-to version.

    This is the bounded-catch-up companion to ``max_versions_per_batch=1``
    streams (``availableNow`` would capture one capped offset and stop
    after a single snapshot) — shared by the dedup and vector-index
    backfills."""
    import ast
    import json
    import time

    from dlt_iceberg_spark.streaming.source import _current_version

    target = _current_version(source_location)
    try:
        deadline = time.time() + timeout
        while time.time() < deadline:
            if q.exception() is not None:
                raise q.exception()
            lp = q.lastProgress
            if lp and lp.get("sources"):
                end = lp["sources"][0].get("endOffset")
                if end is not None:
                    if isinstance(end, str):
                        # Python DataSource offsets surface as the dict's
                        # repr, not JSON — accept both
                        try:
                            v = json.loads(end)
                        except json.JSONDecodeError:
                            v = ast.literal_eval(end)
                    else:
                        v = end
                    if (
                        int(v.get("version", -1)) >= (target or 0)
                        and lp["numInputRows"] == 0
                    ):
                        break
            time.sleep(0.25)
        else:
            raise TimeoutError(
                f"stream did not reach version {target} within {timeout}s"
            )
    finally:
        q.stop()
        q.awaitTermination(30)
    return target


def stream_write(
    stream_df: DataFrame,
    writer: LakeWriter,
    spec: TableSpec,
    checkpoint_dir: str,
    state: StateStore | None = None,
    query_name: str = "stream",
    available_now: bool = True,
    trigger_interval: str | None = None,
    dataset_name: str = "main",
    maintain_every: int | None = None,
    maintenance_policy: Any | None = None,
    transform=None,
) -> StreamingQuery:
    """Write a streaming DataFrame into a lake table via ``foreachBatch``.

    Each micro-batch runs the full disposition pipeline (create/evolve →
    safe cast → append/replace/merge) and commits exactly one snapshot.
    With ``state`` given, batches are ledger-idempotent: a batch replayed
    after a crash (same Spark ``batch_id`` from the checkpoint) is skipped.

    ``maintain_every=N`` runs the table-upkeep cycle
    (:func:`~dlt_iceberg_spark.lake.maintenance.maintain` — delete folding,
    small-file compaction, snapshot expiry, orphan removal) after every Nth
    successful batch.  An always-on MoR upsert stream otherwise accumulates
    one delete file + one small data file PER BATCH forever: reads slow
    down linearly (every file pays the growing anti-join mask) and metadata
    grows without bound.  With the cadence, outstanding delete files and
    small files stay bounded by N regardless of stream lifetime — the
    streaming analogue of Iceberg's scheduled maintenance procedures.
    Maintenance runs inside ``foreachBatch`` between commits, so it
    serializes with the stream's own writes (no self-conflict).

    ``transform`` (DataFrame -> DataFrame) runs on each micro-batch BEFORE
    the disposition — the hook for per-batch logic a streaming plan cannot
    express (e.g. keyed windows resolving CDC images, see
    :func:`stream_mirror`).
    """

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        load_id = f"{query_name}.{spec.name}.{batch_id}"
        if state is not None and state.load_recorded(load_id):
            return
        if batch_df.isEmpty():
            return
        if transform is not None:
            batch_df = transform(batch_df)
        writer.write(spec, batch_df, load_id=load_id)
        if state is not None:
            state.store_completed_load(load_id, dataset_name, schema_version_hash="")
        if maintain_every and (batch_id + 1) % maintain_every == 0:
            from dlt_iceberg_spark.lake.maintenance import maintain

            table = writer.catalog.load_table(
                writer.namespace, spec.name, branch=writer.branch
            )
            maintain(table, maintenance_policy)

    sink = (
        stream_df.writeStream.foreachBatch(handle_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        sink = sink.trigger(availableNow=True)
    elif trigger_interval:
        sink = sink.trigger(processingTime=trigger_interval)
    return sink.start()


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = "2 hours",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling (or sliding) event-time counts with late-data bound.

    On a streaming input the watermark caps state: windows older than
    max(event time) − delay are finalized and dropped.  On a batch input the
    same plan is a plain window aggregation (how the oracle checks it).
    """
    src = events
    if watermark is not None and events.isStreaming:
        # watermarks require tz-aware TIMESTAMP; session tz is UTC so the
        # cast from TimestampNTZ is value-preserving
        src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp")).withWatermark(
            ts_col, watermark
        )
    win = (
        F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    )
    return (
        src.groupBy(win.alias("win"), *[F.col(c) for c in group_cols])
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            "n_events",
            "total_value",
        )
    )


def sessionized(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    user_col: str = "user_id",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Gap-based session windows per user (``session_window`` — dynamic
    windows that extend while events keep arriving within ``gap``)."""
    src = events
    if watermark is not None and events.isStreaming:
        # watermarks require tz-aware TIMESTAMP; session tz is UTC so the
        # cast from TimestampNTZ is value-preserving
        src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp")).withWatermark(
            ts_col, watermark
        )
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(user_col),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def running_user_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    idle_timeout_ms: int = 30 * 60 * 1000,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-key
    running (count, sum) maintained across micro-batches, emitted once per
    batch per active key; state for keys idle past ``idle_timeout_ms``
    (processing time) is emitted one final time and dropped.

    This is the shape Spark's built-in aggregations can't express: custom
    state transition + custom eviction policy.  State is per key —
    O(active keys) across the cluster, hash-partitioned by key.  Batch
    inputs get the equivalent one-shot groupBy (same output schema).
    """
    out_schema = (
        f"{key_col} long, n_events long, total_value double, closed boolean"
    )
    if not events.isStreaming:
        return (
            events.groupBy(key_col)
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(value_col).cast("double").alias("total_value"),
            )
            .withColumn("closed", F.lit(False))
        )

    state_schema = "n long, total double"

    def update(key, pdfs, state):
        import pandas as pd

        (k,) = key
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id_": [k], "n_events": [n], "total_value": [total], "closed": [True]}
            ).rename(columns={"user_id_": key_col})
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id_": [k], "n_events": [n], "total_value": [total], "closed": [False]}
        ).rename(columns={"user_id_": key_col})

    return events.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "append", "ProcessingTimeTimeout"
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    bound: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: pair each left event with right events of
    the same key whose time falls in ``[left_ts, left_ts + bound]``.

    On streaming inputs both sides carry a watermark and the time-range
    condition bounds join state: Spark buffers each side only within
    ``watermark + bound`` of the stream head, then evicts — without the
    range predicate a stream-stream join would have to keep every row
    forever.  State is hash-partitioned by the join key across executors.
    On batch inputs the identical plan is a plain range join (how tests
    check equivalence).  Column names must be disjoint apart from the key.
    """
    l_src, r_src = left, right
    if left.isStreaming:
        l_src = left.withColumn(left_ts, F.col(left_ts).cast("timestamp")).withWatermark(
            left_ts, watermark
        )
    if right.isStreaming:
        r_src = right.withColumn(right_ts, F.col(right_ts).cast("timestamp")).withWatermark(
            right_ts, watermark
        )
    cond = (
        (F.col(left_ts) <= F.col(right_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {bound}"))
    )
    return l_src.join(r_src, on=[key_col], how="inner").where(cond)


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon.

    Streaming input → ``dropDuplicatesWithinWatermark`` (state bounded by
    the watermark, unlike unbounded ``dropDuplicates``); batch input →
    plain ``dropDuplicates`` (identical result on finite data).
    """
    if events.isStreaming:
        return (
            events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(keys)
        )
    return events.dropDuplicates(keys)
