"""Compaction + snapshot-expiration tests."""

import os
from datetime import timedelta

import pytest

from dlt_iceberg_spark.lake.catalog import LakeCatalog
from dlt_iceberg_spark.lake.maintenance import compact_table, expire_snapshots
from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec


@pytest.fixture()
def loaded_table(spark, warehouse):
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "main")
    spec = TableSpec(name="t", write_disposition="append")
    # 4 small appends -> 4 small files (coalesced single-partition writes)
    for i in range(4):
        df = spark.range(i * 10, (i + 1) * 10).coalesce(1)
        writer.write(spec, df, load_id=f"load-{i}")
    return catalog.load_table("main", "t")


def test_compact_merges_small_files(loaded_table):
    before = loaded_table.snapshot()
    assert len(before.files) == 4
    res = compact_table(loaded_table, target_file_bytes=1 << 20)
    after = loaded_table.snapshot()
    assert res.rewritten_files == 4 and res.carried_files == 0
    assert len(after.files) == res.output_files == 1
    assert after.operation == "replace" and after.summary["compaction"] is True
    # data identical
    assert sorted(r.id for r in loaded_table.read().collect()) == list(range(40))


def test_compact_noop_when_files_are_large(loaded_table):
    res = compact_table(loaded_table, target_file_bytes=64)  # every file "large"
    assert res.rewritten_files == 0 and res.output_files == 0
    assert loaded_table.snapshot().operation == "append"  # no new snapshot


def test_compact_carries_large_files(loaded_table, spark):
    compact_table(loaded_table, target_file_bytes=1 << 20)  # 1 big file now
    writer_files = len(loaded_table.snapshot().files)
    assert writer_files == 1


def test_expire_snapshots_removes_history_and_orphans(loaded_table):
    table = loaded_table
    compact_table(table, target_file_bytes=1 << 20)
    n_before = len(table.snapshots())  # create + 4 appends + compaction
    assert n_before == 6
    data_files_before = len(os.listdir(os.path.join(table.location, "data")))

    res = expire_snapshots(table, older_than=timedelta(seconds=0), keep_last=1)
    assert res["snapshots"] == n_before - 1
    assert res["data_files"] == 4  # the 4 pre-compaction small files
    assert len(table.snapshots()) == 1
    data_files_after = len(os.listdir(os.path.join(table.location, "data")))
    assert data_files_after == data_files_before - 4
    # current snapshot still fully readable
    assert table.read().count() == 40


def test_expire_respects_retention_window(loaded_table):
    res = expire_snapshots(loaded_table, older_than=timedelta(days=1))
    assert res == {"snapshots": 0, "data_files": 0}  # everything too recent
    assert len(loaded_table.snapshots()) == 5
