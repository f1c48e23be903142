"""Streaming extension tests: micro-batch → disposition path, event-time ops.

Pattern: file-source streams over tmpdir parquet, ``availableNow`` triggers
(bounded runs), assertions on snapshot counts / row sets — the streaming
analogue of the reference's incremental-load goldens
(tests/test_class_based_atomic.py:213-293).
"""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dlt_iceberg_spark.lake.catalog import LakeCatalog
from dlt_iceberg_spark.lake.state import StateStore
from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec
from dlt_iceberg_spark.streaming import (
    sessionized,
    stream_write,
    streaming_dedup,
    windowed_event_counts,
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, ts=ts, user_id=u, event_type=et, value=v) for i, ts, u, et, v in rows],
        EVENT_SCHEMA,
    )


def _ts(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def _drop_file(df, inp, name):
    """Land a single parquet FILE in the stream input dir (the file source
    reads top-level files, not write.parquet's output directories)."""
    import glob
    import shutil
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "out")
        df.coalesce(1).write.parquet(out)
        part = glob.glob(os.path.join(out, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(inp, name))


@pytest.fixture()
def stream_dirs(tmp_path):
    inp = tmp_path / "input"
    inp.mkdir()
    return str(inp), str(tmp_path / "ckpt"), str(tmp_path / "warehouse")


def _run_stream(spark, inp, ckpt, writer, spec, state=None, **kw):
    stream = spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", 1).parquet(inp)
    q = stream_write(stream, writer, spec, ckpt, state=state, query_name="t", **kw)
    q.awaitTermination(120)
    return q


def test_stream_append_one_snapshot_per_batch(spark, stream_dirs):
    inp, ckpt, wh = stream_dirs
    batch1 = _mk_events(spark, [(1, _ts("2024-01-01T00:00:00"), 1, "click", 1.0)])
    batch2 = _mk_events(spark, [(2, _ts("2024-01-01T01:00:00"), 2, "view", 2.0)])
    _drop_file(batch1, inp, "f1.parquet")
    _drop_file(batch2, inp, "f2.parquet")

    catalog = LakeCatalog(spark, wh)
    writer = LakeWriter(catalog, "main")
    spec = TableSpec(name="events_stream", write_disposition="append")
    _run_stream(spark, inp, ckpt, writer, spec)

    table = catalog.load_table("main", "events_stream")
    # maxFilesPerTrigger=1 → 2 micro-batches → 1 snapshot per batch
    assert [sn.operation for sn in table.snapshots()] == ["create", "append", "append"]
    assert table.read().count() == 2

    # new file + SAME checkpoint → only the new data is processed (incremental)
    batch3 = _mk_events(spark, [(3, _ts("2024-01-01T02:00:00"), 1, "click", 3.0)])
    _drop_file(batch3, inp, "f3.parquet")
    _run_stream(spark, inp, ckpt, writer, spec)
    assert table.read().count() == 3
    assert len(table.snapshots()) == 4  # one more append snapshot


def test_stream_merge_upsert_latest_wins(spark, stream_dirs):
    inp, ckpt, wh = stream_dirs
    b1 = _mk_events(spark, [(1, _ts("2024-01-01T00:00:00"), 1, "click", 1.0),
                            (2, _ts("2024-01-01T00:01:00"), 2, "view", 2.0)])
    b2 = _mk_events(spark, [(2, _ts("2024-01-01T00:05:00"), 2, "view", 20.0),
                            (3, _ts("2024-01-01T00:06:00"), 3, "buy", 3.0)])
    _drop_file(b1, inp, "f1.parquet")
    _drop_file(b2, inp, "f2.parquet")

    catalog = LakeCatalog(spark, wh)
    writer = LakeWriter(catalog, "main")
    spec = TableSpec(
        name="events_upsert",
        write_disposition={"disposition": "merge", "strategy": "upsert"},
        primary_key=["event_id"],
    )
    _run_stream(spark, inp, ckpt, writer, spec)

    rows = {r.event_id: r for r in catalog.load_table("main", "events_upsert").read().collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2].value == 20.0  # second batch updated the row


def test_stream_ledger_idempotency(spark, stream_dirs):
    inp, ckpt, wh = stream_dirs
    _drop_file(_mk_events(spark, [(1, _ts("2024-01-01T00:00:00"), 1, "click", 1.0)]), inp, "f1.parquet")
    catalog = LakeCatalog(spark, wh)
    writer = LakeWriter(catalog, "main")
    state = StateStore(catalog, "main")
    spec = TableSpec(name="events_ledger", write_disposition="append")
    _run_stream(spark, inp, ckpt, writer, spec, state=state)
    table = catalog.load_table("main", "events_ledger")
    assert table.read().count() == 1
    assert state.load_recorded("t.events_ledger.0")

    # simulate a replayed batch 0 (fresh checkpoint, same query name and
    # input): the ledger pre-check skips it — no duplicate rows
    _run_stream(spark, inp, str(ckpt) + "_replay", writer, spec, state=state)
    assert table.read().count() == 1


def test_windowed_counts_stream_matches_batch(spark, stream_dirs):
    inp, ckpt, _ = stream_dirs
    rows = [
        (1, _ts("2024-01-01T00:10:00"), 1, "click", 1.0),
        (2, _ts("2024-01-01T00:50:00"), 2, "click", 2.0),
        (3, _ts("2024-01-01T01:10:00"), 1, "view", 4.0),
        (4, _ts("2024-01-01T03:10:00"), 3, "click", 8.0),
    ]
    batch = _mk_events(spark, rows)
    _drop_file(batch, inp, "f1.parquet")
    expected = {
        tuple(r) for r in windowed_event_counts(batch, watermark=None).collect()
    }

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(inp)
    agg = windowed_event_counts(stream, watermark="1 minute")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.table("win_counts").collect()}
    assert got == expected


def test_sessionized_batch_and_stream(spark, stream_dirs):
    inp, ckpt, _ = stream_dirs
    rows = [
        # user 1: two sessions (gap > 30 min between them)
        (1, _ts("2024-01-01T00:00:00"), 1, "click", 1.0),
        (2, _ts("2024-01-01T00:10:00"), 1, "click", 1.0),
        (3, _ts("2024-01-01T02:00:00"), 1, "click", 1.0),
        # user 2: one session
        (4, _ts("2024-01-01T00:05:00"), 2, "view", 1.0),
    ]
    batch = _mk_events(spark, rows)
    sess = {(r.user_id, r.n_events) for r in sessionized(batch, watermark=None).collect()}
    assert sess == {(1, 2), (1, 1), (2, 1)}

    _drop_file(batch, inp, "f1.parquet")
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(inp)
    q = (
        sessionized(stream)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.user_id, r.n_events) for r in spark.table("sessions").collect()}
    assert got == sess


def test_streaming_dedup(spark, stream_dirs):
    inp, ckpt, _ = stream_dirs
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 1, "click", 1.0),
        (1, _ts("2024-01-01T00:00:30"), 1, "click", 1.0),  # dup event_id
        (2, _ts("2024-01-01T00:01:00"), 2, "view", 2.0),
    ]
    batch = _mk_events(spark, rows)
    assert streaming_dedup(batch, ["event_id"]).count() == 2

    _drop_file(batch, inp, "f1.parquet")
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(inp)
    q = (
        streaming_dedup(stream, ["event_id"])
        .writeStream.format("memory")
        .queryName("deduped")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.table("deduped").count() == 2


@pytest.mark.slow
def test_running_user_totals_stateful(spark, stream_dirs):
    from dlt_iceberg_spark.streaming import running_user_totals

    inp, ckpt, _ = stream_dirs
    b1 = _mk_events(spark, [(1, _ts("2024-01-01T00:00:00"), 1, "click", 1.0),
                            (2, _ts("2024-01-01T00:01:00"), 1, "view", 2.0),
                            (3, _ts("2024-01-01T00:02:00"), 2, "click", 5.0)])
    b2 = _mk_events(spark, [(4, _ts("2024-01-01T00:10:00"), 1, "buy", 4.0)])
    _drop_file(b1, inp, "f1.parquet")
    _drop_file(b2, inp, "f2.parquet")

    stream = spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", 1).parquet(inp)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("running_totals").collect()
    # state carried across micro-batches: user 1 reaches (3, 7.0) in batch 2
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append((r.n_events, r.total_value))
    assert (3, 7.0) in per_user[1]
    assert (2, 5.0) in per_user[2] or (1, 5.0) in per_user[2]

    # batch-mode equivalent: one-shot totals, same schema
    batch_out = {r.user_id: (r.n_events, r.total_value)
                 for r in running_user_totals(b1.unionByName(b2)).collect()}
    assert batch_out == {1: (3, 7.0), 2: (1, 5.0)}


def test_stream_interval_join_matches_batch(spark, stream_dirs):
    from dlt_iceberg_spark.streaming import stream_interval_join

    inp, ckpt, _ = stream_dirs
    views_rows = [
        (1, _ts("2024-01-01T00:00:00"), 1, "view", 0.0),
        (2, _ts("2024-01-01T00:10:00"), 2, "view", 0.0),
        (3, _ts("2024-01-01T03:00:00"), 1, "view", 0.0),
    ]
    buys_rows = [
        (10, _ts("2024-01-01T00:30:00"), 1, "buy", 9.0),   # within 1h of view 1
        (11, _ts("2024-01-01T02:00:00"), 2, "buy", 5.0),   # >1h after view 2 -> no match
        (12, _ts("2024-01-01T03:30:00"), 1, "buy", 7.0),   # within 1h of view 3
    ]
    views = _mk_events(spark, views_rows).select(
        "user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("view_id")
    )
    buys = _mk_events(spark, buys_rows).select(
        "user_id", F.col("ts").alias("r_ts"), F.col("event_id").alias("buy_id")
    )

    # batch form of the same plan
    batch = stream_interval_join(views, buys, bound="1 hour")
    got = sorted((r.view_id, r.buy_id) for r in batch.collect())
    assert got == [(1, 10), (3, 12)]

    # streaming: both sides as file streams, availableNow, memory sink
    vdir, bdir = os.path.join(inp, "v"), os.path.join(inp, "b")
    os.makedirs(vdir), os.makedirs(bdir)
    _drop_file(_mk_events(spark, views_rows), vdir, "v.parquet")
    _drop_file(_mk_events(spark, buys_rows), bdir, "b.parquet")
    v_stream = (
        spark.readStream.schema(EVENT_SCHEMA).parquet(vdir)
        .select("user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("view_id"))
    )
    b_stream = (
        spark.readStream.schema(EVENT_SCHEMA).parquet(bdir)
        .select("user_id", F.col("ts").alias("r_ts"), F.col("event_id").alias("buy_id"))
    )
    joined = stream_interval_join(v_stream, b_stream, bound="1 hour")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_stream = sorted(
        (r.view_id, r.buy_id) for r in spark.sql("SELECT * FROM ssj").collect()
    )
    assert got_stream == got


@pytest.mark.slow
def test_stream_merge_mor_no_rewrite(spark, stream_dirs):
    """Streaming upserts with merge_mode=mor: each micro-batch lands data +
    a delete file, never rewriting earlier batches' files — the streaming
    ingest pattern that stays O(batch) forever."""
    inp, ckpt, wh = stream_dirs
    b1 = _mk_events(spark, [(1, _ts("2024-01-01T00:00:00"), 1, "click", 1.0),
                            (2, _ts("2024-01-01T00:01:00"), 2, "view", 2.0)])
    b2 = _mk_events(spark, [(2, _ts("2024-01-01T00:05:00"), 2, "view", 20.0),
                            (3, _ts("2024-01-01T00:06:00"), 3, "buy", 3.0)])
    _drop_file(b1, inp, "f1.parquet")
    _drop_file(b2, inp, "f2.parquet")

    catalog = LakeCatalog(spark, wh)
    writer = LakeWriter(catalog, "main")
    spec = TableSpec(
        name="ev_mor",
        write_disposition={"disposition": "merge", "strategy": "upsert"},
        primary_key=["event_id"],
        merge_mode="mor",
    )
    _run_stream(spark, inp, ckpt, writer, spec)

    table = catalog.load_table("main", "ev_mor")
    snaps = table.snapshots()
    assert [sn.operation for sn in snaps][-2:] == ["merge-mor", "merge-mor"]
    # batch-1 data files carried untouched into the final snapshot
    b1_files = {f.path for f in snaps[-2].files}
    assert b1_files <= {f.path for f in snaps[-1].files}
    out = {r.event_id: r.value for r in table.read().collect()}
    assert out == {1: 1.0, 2: 20.0, 3: 3.0}


def test_stream_in_cdc_out(spark, stream_dirs):
    """End-to-end systems shape: micro-batches land as snapshots, a
    checkpointed ChangelogFeed drains exactly the new rows per cycle —
    streaming in, CDC out, nothing reprocessed."""
    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.feed import ChangelogFeed
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec

    inp, ckpt, wh = stream_dirs
    catalog = LakeCatalog(spark, wh)
    writer = LakeWriter(catalog, "s")
    spec = TableSpec(name="ev", write_disposition="append")

    _drop_file(_mk_events(spark, [(1, _ts("2024-01-01T00:00:00"), 1, "a", 1.0)]), inp, "b1.parquet")
    _drop_file(_mk_events(spark, [(2, _ts("2024-01-01T00:01:00"), 2, "b", 2.0)]), inp, "b2.parquet")
    _run_stream(spark, inp, ckpt, writer, spec)

    table = catalog.load_table("s", "ev")
    feed = ChangelogFeed(table, name="down")
    got = []
    n = feed.process(lambda df: got.append(sorted(r.event_id for r in df.collect())))
    assert n == 1 and sorted(got[0]) == [1, 2]

    # next streaming cycle appends one more batch; the feed sees ONLY it
    _drop_file(_mk_events(spark, [(3, _ts("2024-01-01T00:02:00"), 3, "c", 3.0)]), inp, "b3.parquet")
    _run_stream(spark, inp, ckpt, writer, spec)
    table = catalog.load_table("s", "ev")
    feed2 = ChangelogFeed(table, name="down")
    n = feed2.process(lambda df: got.append(sorted(r.event_id for r in df.collect())))
    assert n == 1 and got[-1] == [3]
    assert feed2.poll() is None


@pytest.mark.slow
def test_long_stream_mor_with_maintenance_cadence(spark, stream_dirs):
    """VERDICT r3 #8: an always-on MoR upsert stream must not accumulate
    delete files / small files / snapshots without bound.  12 micro-batches
    with ``maintain_every=4`` (fold aggressively, keep 4 snapshots): at
    stream end the outstanding delete-file count is bounded by the cadence
    (< 4, vs 11 unmaintained), the live data files are compacted, expiry
    has trimmed history, and the read is still exactly last-writer-wins."""
    from datetime import timedelta

    from dlt_iceberg_spark.lake.maintenance import MaintenancePolicy

    inp, ckpt, wh = stream_dirs
    # 12 single-file batches; keys cycle over 1..4 so every batch after the
    # first is an upsert that must mask earlier rows
    for b in range(12):
        key = b % 4 + 1
        _drop_file(
            _mk_events(
                spark,
                [(key, _ts(f"2024-01-01T00:{b:02d}:00"), key, "upd", float(b))],
            ),
            inp,
            f"f{b:02d}.parquet",
        )

    catalog = LakeCatalog(spark, wh)
    writer = LakeWriter(catalog, "main")
    spec = TableSpec(
        name="ev_long",
        write_disposition={"disposition": "merge", "strategy": "upsert"},
        primary_key=["event_id"],
        merge_mode="mor",
    )
    policy = MaintenancePolicy(
        fold_deletes_over=1,
        expire_older_than=timedelta(0),
        keep_last_snapshots=4,
        remove_orphans=False,  # nothing crashed; keep the test deterministic
    )
    _run_stream(
        spark, inp, ckpt, writer, spec, maintain_every=4, maintenance_policy=policy
    )

    table = catalog.load_table("main", "ev_long")
    snap = table.snapshot()
    # bounded delete mask: at most the batches since the last maintenance
    assert len(snap.delete_files) < 4, [d.path for d in snap.delete_files]
    # bounded history: expiry kept the tail only
    assert len(table.snapshots()) <= 6
    # bounded file count: compaction folded the per-batch small files
    assert snap.n_files <= 6, snap.n_files
    # correctness: last writer per key (batches 8..11 hit keys 1..4)
    out = {r.event_id: r.value for r in table.read().collect()}
    assert out == {1: 8.0, 2: 9.0, 3: 10.0, 4: 11.0}

    # contrast: same stream WITHOUT maintenance accumulates one delete file
    # per upsert batch — the unbounded shape the cadence exists to prevent
    import os as _os

    ckpt2 = _os.path.join(_os.path.dirname(ckpt), "ckpt2")
    writer2 = LakeWriter(catalog, "nomaint")
    _run_stream(spark, inp, ckpt2, writer2, spec)
    unmaintained = catalog.load_table("nomaint", "ev_long").snapshot()
    assert len(unmaintained.delete_files) >= 11  # one per MoR batch, unbounded


def test_await_stream_surfaces_stream_failure(spark, tmp_path):
    """A crashed stream must raise its OWN error at the await — not leak a
    partial sink that fails later as a confusing wrong-rows mismatch
    (VERDICT r6 task 7)."""
    import pytest

    from dlt_iceberg_spark.streaming import await_stream

    src_dir = str(tmp_path / "in")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(src_dir)

    def boom(df, epoch_id):
        raise RuntimeError("deliberate boom in micro-batch")

    q = (
        spark.readStream.schema("id long, v string")
        .parquet(src_dir)
        .writeStream.foreachBatch(boom)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="deliberate boom"):
        await_stream(q)


def test_await_stream_passes_healthy_bounded_query(spark, tmp_path):
    from dlt_iceberg_spark.streaming import await_stream

    src_dir = str(tmp_path / "in")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(src_dir)
    q = (
        spark.readStream.schema("id long, v string")
        .parquet(src_dir)
        .writeStream.format("memory")
        .queryName("await_ok")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    await_stream(q)
    assert spark.table("await_ok").count() == 1
