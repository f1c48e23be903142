"""Native streaming SINK (`writeStream.format("laketable")`,
streaming/sink.py): executor-side Arrow→parquet staging, one atomic
snapshot per epoch, replay-safe commits, stats parity with batch writes.
"""

import os

import pytest
from pyspark.sql import functions as F

from dlt_iceberg_spark.lake.catalog import LakeCatalog
from dlt_iceberg_spark.lake.table import LakeTable
from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec
from dlt_iceberg_spark.streaming.source import register_lake_stream_source


@pytest.fixture()
def reg(spark):
    register_lake_stream_source(spark)
    return spark


def _file_feed(spark, src_dir, ckpt, loc, schema="id bigint, v bigint"):
    sdf = spark.readStream.schema(schema).parquet(src_dir + "/*")
    q = (
        sdf.writeStream.format("laketable")
        .option("location", loc)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_sink_lands_atomic_snapshot_with_stats(reg, tmp_path):
    spark = reg
    src = str(tmp_path / "in")
    spark.range(20).select("id", (F.col("id") * 3).alias("v")).write.parquet(
        src + "/p1"
    )
    loc = str(tmp_path / "t")
    _file_feed(spark, src, str(tmp_path / "ckpt"), loc)
    t = LakeTable(spark, loc)
    assert sorted(r.v for r in t.read().collect()) == [i * 3 for i in range(20)]
    snap = t.snapshot()
    assert snap.operation == "append"
    # stream-landed files carry min/max stats: pruning works like batch
    _, files = t._select_files(snap, [("v", ">=", 57)])
    assert 0 < len(files) < snap.n_files or snap.n_files == 1


def test_sink_restart_is_exactly_once(reg, tmp_path):
    spark = reg
    src, ckpt, loc = str(tmp_path / "in"), str(tmp_path / "ckpt"), str(tmp_path / "t")
    spark.createDataFrame([(1, 10)], "id bigint, v bigint").write.parquet(src + "/p1")
    _file_feed(spark, src, ckpt, loc)
    # restart with no new input: no new snapshot, no duplicate rows
    t = LakeTable(spark, loc)
    v_before = t.current_version()
    _file_feed(spark, src, ckpt, loc)
    assert t.current_version() == v_before
    spark.createDataFrame([(2, 20)], "id bigint, v bigint").write.parquet(src + "/p2")
    _file_feed(spark, src, ckpt, loc)
    assert sorted((r.id, r.v) for r in t.read().collect()) == [(1, 10), (2, 20)]


def test_sink_refuses_partitioned_tables(reg, tmp_path):
    spark = reg
    catalog = LakeCatalog(spark, str(tmp_path / "wh"))
    writer = LakeWriter(catalog, "ds")
    writer.write(
        TableSpec(
            name="t",
            write_disposition="append",
            column_hints={"v": {"x-partition": True}},
        ),
        spark.createDataFrame([(1, "a")], "id long, v string"),
        load_id="l0",
    )
    t = catalog.load_table("ds", "t")
    src = str(tmp_path / "in")
    spark.createDataFrame([(2, "b")], "id long, v string").write.parquet(src + "/p1")
    sdf = spark.readStream.schema("id long, v string").parquet(src + "/*")
    q = (
        sdf.writeStream.format("laketable")
        .option("location", t.location)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="unpartitioned"):
        q.awaitTermination(120)
    # staged files were aborted — the table is untouched
    assert t.read().count() == 1


def test_sink_refuses_schema_mismatch(reg, tmp_path):
    spark = reg
    catalog = LakeCatalog(spark, str(tmp_path / "wh"))
    writer = LakeWriter(catalog, "ds")
    writer.write(
        TableSpec(name="t", write_disposition="append"),
        spark.createDataFrame([(1, "a")], "id long, v string"),
        load_id="l0",
    )
    t = catalog.load_table("ds", "t")
    src = str(tmp_path / "in")
    spark.createDataFrame([(2.5, "b")], "id double, v string").write.parquet(
        src + "/p1"
    )
    sdf = spark.readStream.schema("id double, v string").parquet(src + "/*")
    q = (
        sdf.writeStream.format("laketable")
        .option("location", t.location)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="does not match"):
        q.awaitTermination(120)
    assert t.read().count() == 1


def test_source_to_sink_mirror(reg, tmp_path):
    """Compose the format's two halves: tail table A with the streaming
    SOURCE and land every append into table B with the native SINK."""
    spark = reg
    catalog = LakeCatalog(spark, str(tmp_path / "wh"))
    writer = LakeWriter(catalog, "ds")
    for i in range(3):
        writer.write(
            TableSpec(name="a", write_disposition="append"),
            spark.createDataFrame([(i, f"v{i}")], "id long, v string"),
            load_id=f"l{i}",
        )
    a = catalog.load_table("ds", "a")
    b_loc = str(tmp_path / "wh" / "ds" / "b")
    from dlt_iceberg_spark.streaming.source import read_stream

    q = (
        read_stream(spark, a.location, from_beginning=True)
        .writeStream.format("laketable")
        .option("location", b_loc)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    b = LakeTable(spark, b_loc)
    assert sorted((r.id, r.v) for r in b.read().collect()) == [
        (0, "v0"), (1, "v1"), (2, "v2"),
    ]
