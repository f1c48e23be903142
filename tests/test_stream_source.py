"""LakeTable streaming SOURCE (streaming/source.py) — Iceberg streaming-read
parity: snapshot versions as offsets, append-only tailing, per-file
partitions read executor-side via Arrow, exactly-once across checkpoint
restarts.
"""

import os

import pytest
from pyspark.sql import functions as F

from dlt_iceberg_spark.lake.catalog import LakeCatalog
from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec
from dlt_iceberg_spark.streaming.source import read_stream


def _drain(spark, sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}")


def _drain_to_dir(spark, sdf, out_dir, checkpoint):
    """Restartable drain: parquet sink + checkpoint (the memory sink cannot
    recover from a checkpoint).  Returns the sink's cumulative contents."""
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.schema(sdf.schema).parquet(out_dir)


def _mk(spark, warehouse, batches):
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    for i, rows in enumerate(batches):
        writer.write(
            TableSpec(name="t", write_disposition="append"),
            spark.createDataFrame(rows, "id long, v string"),
            load_id=f"l{i}",
        )
    return catalog, writer, catalog.load_table("ds", "t")


def test_from_beginning_streams_all_appends(spark, warehouse):
    catalog, writer, t = _mk(
        spark, warehouse, [[(1, "a"), (2, "b")], [(3, "c")]]
    )
    out = _drain(spark, read_stream(spark, t.location, from_beginning=True), "tail_all")
    assert sorted((r.id, r.v) for r in out.collect()) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]


def test_default_start_tails_only_new_appends(spark, warehouse, tmp_path):
    catalog, writer, t = _mk(spark, warehouse, [[(1, "a")]])
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    out = _drain_to_dir(spark, read_stream(spark, t.location), sink, ckpt)
    assert out.count() == 0  # default offset = current snapshot
    writer.write(
        TableSpec(name="t", write_disposition="append"),
        spark.createDataFrame([(2, "b")], "id long, v string"),
        load_id="l1",
    )
    out = _drain_to_dir(spark, read_stream(spark, t.location), sink, ckpt)
    # same checkpoint: the second run picks up exactly the new append
    assert [(r.id, r.v) for r in out.collect()] == [(2, "b")]


def test_starting_version_rewinds(spark, warehouse):
    catalog, writer, t = _mk(
        spark, warehouse, [[(1, "a")], [(2, "b")], [(3, "c")]]
    )
    v = t.current_version()
    out = _drain(
        spark,
        read_stream(spark, t.location, starting_version=v - 1),
        "tail_rewind",
    )
    assert [(r.id, r.v) for r in out.collect()] == [(3, "c")]


def test_checkpoint_replay_is_exactly_once(spark, warehouse, tmp_path):
    catalog, writer, t = _mk(spark, warehouse, [[(1, "a")], [(2, "b")]])
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    sdf = read_stream(spark, t.location, from_beginning=True)
    out = _drain_to_dir(spark, sdf, sink, ckpt)
    assert out.count() == 2
    # restart from the same checkpoint with no new data: no duplicates
    out = _drain_to_dir(
        spark, read_stream(spark, t.location, from_beginning=True), sink, ckpt
    )
    assert out.count() == 2


def test_stream_bridges_rename_eras(spark, warehouse):
    catalog, writer, t = _mk(spark, warehouse, [[(1, "a")]])
    t.rename_column("v", "val")
    writer.write(
        TableSpec(name="t", write_disposition="append"),
        spark.createDataFrame([(2, "b")], "id long, val string"),
        load_id="l1",
    )
    t = catalog.load_table("ds", "t")
    out = _drain(
        spark, read_stream(spark, t.location, from_beginning=True), "tail_ren"
    )
    assert out.columns == ["id", "val"]
    assert sorted((r.id, r.val) for r in out.collect()) == [(1, "a"), (2, "b")]


def test_stream_refuses_rewrite_snapshots(spark, warehouse):
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    spec = TableSpec(
        name="t",
        write_disposition={"disposition": "merge", "strategy": "upsert"},
        primary_key=["id"],
    )
    writer.write(spec, spark.createDataFrame([(1, "a")], "id long, v string"), load_id="l0")
    writer.write(spec, spark.createDataFrame([(1, "B")], "id long, v string"), load_id="l1")
    t = catalog.load_table("ds", "t")
    sdf = read_stream(spark, t.location, from_beginning=True)
    q = (
        sdf.writeStream.format("memory")
        .queryName("tail_refuse")
        .trigger(availableNow=True)
        .start()
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="cannot stream across"):
        q.awaitTermination(120)


def test_stream_typed_columns_roundtrip(spark, warehouse):
    # timestamps/dates/doubles through the Arrow partition reader
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    df = spark.sql(
        "SELECT 1L AS id, TIMESTAMP'2024-03-01 10:30:00' AS ts, "
        "DATE'2024-03-01' AS d, 1.5D AS x"
    )
    writer.write(TableSpec(name="t", write_disposition="append"), df, load_id="l0")
    t = catalog.load_table("ds", "t")
    out = _drain(
        spark, read_stream(spark, t.location, from_beginning=True), "tail_typed"
    )
    r = out.collect()[0]
    b = df.collect()[0]
    assert (r.id, r.ts, r.d, r.x) == (b.id, b.ts, b.d, b.x)


def test_max_versions_per_batch_chunks_backfill(spark, warehouse, tmp_path):
    """Backfill admission control: with max_versions_per_batch=1 a
    3-snapshot history drains in 3 micro-batches of one append each
    (ProcessingTime trigger; Spark keeps calling until latestOffset stops
    advancing), never one giant batch."""
    import time

    catalog, writer, t = _mk(
        spark, warehouse, [[(1, "a")], [(2, "b")], [(3, "c")]]
    )
    sdf = read_stream(
        spark, t.location, from_beginning=True, max_versions_per_batch=1
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("tail_chunked")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    deadline = time.time() + 60
    while time.time() < deadline:
        if spark.sql("select count(*) c from tail_chunked").collect()[0].c == 3:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)
    assert sorted(
        (r.id, r.v) for r in spark.sql("select * from tail_chunked").collect()
    ) == [(1, "a"), (2, "b"), (3, "c")]
    # each planned batch advanced ONE version: with 1 row per append, no
    # batch may carry more than one row
    prog = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert prog and all(p["numInputRows"] == 1 for p in prog)


def test_stream_bridges_promote_eras(spark, warehouse):
    """A promote-column snapshot inside the tailed range passes through;
    int32-era files read widened under the long stream schema."""
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    writer.write(
        TableSpec(name="t", write_disposition="append"),
        spark.createDataFrame([(1, 10)], "id long, v int"),
        load_id="l0",
    )
    t = catalog.load_table("ds", "t")
    t.promote_column_type("v", "long")
    writer.write(
        TableSpec(name="t", write_disposition="append"),
        spark.createDataFrame([(2, 2**40)], "id long, v long"),
        load_id="l1",
    )
    t = catalog.load_table("ds", "t")
    out = _drain(
        spark, read_stream(spark, t.location, from_beginning=True), "tail_promo"
    )
    assert dict(out.dtypes)["v"] == "bigint"
    assert sorted((r.id, r.v) for r in out.collect()) == [(1, 10), (2, 2**40)]


def test_append_planning_reads_only_unique_manifests(spark, warehouse, monkeypatch):
    """Manifest-ref diff: planning one append micro-batch on a table with
    many prior appends reads ONLY the manifests unique to that step (the
    new one, plus any fold), never the whole manifest set — the streaming
    tail stays O(added) at any table size."""
    import pyarrow.parquet as pq_mod

    from dlt_iceberg_spark.streaming import source as src_mod

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    for i in range(12):
        writer.write(
            TableSpec(name="t", write_disposition="append"),
            spark.createDataFrame([(i, f"v{i}")], "id long, v string"),
            load_id=f"l{i}",
        )
    t = catalog.load_table("ds", "t")
    head = t.current_version()
    n_manifests_total = len(t.snapshot().manifests)
    assert n_manifests_total >= 3  # the table actually has history

    reader = src_mod._LakeStreamReader(
        t.schema(), {"location": t.location}
    )
    reads = []
    real = pq_mod.read_table

    def counting(path, *a, **kw):
        if "/metadata/m-" in str(path):
            reads.append(str(path))
        return real(path, *a, **kw)

    monkeypatch.setattr(pq_mod, "read_table", counting)
    parts = reader.partitions({"version": head - 1}, {"version": head})
    monkeypatch.setattr(pq_mod, "read_table", real)
    assert len(parts) == 1  # the one appended file
    # strictly fewer manifest reads than the table holds; an append step
    # reads its own new manifest (plus at most a fold's worth)
    assert 0 < len(set(reads)) < n_manifests_total, (len(set(reads)), n_manifests_total)
