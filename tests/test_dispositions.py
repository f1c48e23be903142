"""Write-disposition golden tests — the reference's core E2E specs:

- F1 upsert/delete-insert: [1,2,3] then [2,3,4] ⇒ exactly [1,2,3,4]
  (tests/test_merge_disposition.py:18-190, test_delete_insert_merge.py).
- F2 hard delete incl. all-deleted → empty (tests/test_capabilities.py:14-223).
- F3 atomicity: many files, one snapshot per load (test_class_based_atomic.py:100-106).
"""

import pytest
from pyspark.sql import Row

from dlt_iceberg_spark.lake.catalog import LakeCatalog
from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec


@pytest.fixture()
def writer(spark, warehouse):
    return LakeWriter(LakeCatalog(spark, warehouse), "ds")


def users_df(spark, rows):
    return spark.createDataFrame(
        [Row(user_id=r[0], name=r[1], score=r[2]) for r in rows],
        "user_id long, name string, score long",
    )


def read(writer, name):
    t = writer.catalog.load_table("ds", name)
    return {r.user_id: r for r in t.read().collect()}, t


BATCH1 = [(1, "alice", 10), (2, "bob", 20), (3, "carol", 30)]
BATCH2 = [(2, "bob2", 21), (3, "carol2", 31), (4, "dave", 40)]


@pytest.mark.parametrize("strategy", ["upsert", "delete-insert"])
def test_merge_golden_case(spark, writer, strategy):
    spec = TableSpec(
        "users",
        write_disposition={"disposition": "merge", "strategy": strategy},
        primary_key=["user_id"],
    )
    writer.write(spec, users_df(spark, BATCH1))
    writer.write(spec, users_df(spark, BATCH2))
    rows, table = read(writer, "users")
    assert sorted(rows) == [1, 2, 3, 4]
    assert rows[1].name == "alice" and rows[1].score == 10  # untouched
    assert rows[2].name == "bob2" and rows[2].score == 21  # updated
    assert rows[3].name == "carol2"
    assert rows[4].name == "dave"  # inserted
    # exactly one snapshot per load (after the create snapshot)
    ops = [s.operation for s in table.snapshots()]
    assert ops == ["create", "merge", "merge"]


def test_string_merge_means_upsert(spark, writer):
    spec = TableSpec("users", write_disposition="merge", primary_key=["user_id"])
    assert spec.resolve_strategy() == ("merge", "upsert")
    writer.write(spec, users_df(spark, BATCH1))
    writer.write(spec, users_df(spark, BATCH2))
    rows, _ = read(writer, "users")
    assert sorted(rows) == [1, 2, 3, 4]


def test_merge_composite_key(spark, writer):
    df1 = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (2, "a", 3)], "k1 long, k2 string, v long"
    )
    df2 = spark.createDataFrame([(1, "b", 99), (3, "c", 4)], "k1 long, k2 string, v long")
    spec = TableSpec(
        "ck",
        write_disposition={"disposition": "merge", "strategy": "delete-insert"},
        primary_key=["k1", "k2"],
    )
    writer.write(spec, df1)
    writer.write(spec, df2)
    out = {(r.k1, r.k2): r.v for r in writer.catalog.load_table("ds", "ck").read().collect()}
    assert out == {(1, "a"): 1, (1, "b"): 99, (2, "a"): 3, (3, "c"): 4}


def test_merge_without_pk_appends(spark, writer):
    """W6 (destination_client.py:1399-1403): warn + append."""
    spec = TableSpec("nopk", write_disposition="merge")
    writer.write(spec, users_df(spark, BATCH1[:2]))
    writer.write(spec, users_df(spark, BATCH1[:2]))
    assert writer.catalog.load_table("ds", "nopk").read().count() == 4


def test_hard_delete(spark, writer):
    """F2: {1: update, 2: delete, 4: new} over [1,2,3] ⇒ [1,3,4]."""
    spec = TableSpec(
        "users",
        write_disposition={"disposition": "merge", "strategy": "delete-insert"},
        primary_key=["user_id"],
    )
    writer.write(spec, users_df(spark, BATCH1))
    batch = spark.createDataFrame(
        [
            Row(user_id=1, name="alice2", score=11, _dlt_deleted_at=None),
            Row(user_id=2, name="bob", score=20, _dlt_deleted_at="2026-01-01T00:00:00"),
            Row(user_id=4, name="dave", score=40, _dlt_deleted_at=None),
        ],
        "user_id long, name string, score long, _dlt_deleted_at string",
    )
    writer.write(spec, batch)
    rows, table = read(writer, "users")
    assert sorted(rows) == [1, 3, 4]
    assert rows[1].name == "alice2"
    assert "_dlt_deleted_at" not in table.schema().fieldNames()


def test_hard_delete_all_rows_empties_table(spark, writer):
    spec = TableSpec(
        "users",
        write_disposition={"disposition": "merge", "strategy": "upsert"},
        primary_key=["user_id"],
    )
    writer.write(spec, users_df(spark, BATCH1))
    batch = spark.createDataFrame(
        [Row(user_id=i, name="x", score=0, _dlt_deleted_at="now") for i in (1, 2, 3)],
        "user_id long, name string, score long, _dlt_deleted_at string",
    )
    writer.write(spec, batch)
    assert writer.catalog.load_table("ds", "users").read().count() == 0


def test_replace_disposition(spark, writer):
    spec = TableSpec("users", write_disposition="replace")
    writer.write(spec, users_df(spark, BATCH1))
    writer.write(spec, users_df(spark, BATCH2))
    rows, table = read(writer, "users")
    assert sorted(rows) == [2, 3, 4]
    assert [s.operation for s in table.snapshots()] == ["create", "overwrite", "overwrite"]


def test_append_atomicity_many_files_one_snapshot(spark, writer):
    """F3: 100 rows across many input partitions → exactly 1 snapshot."""
    df = spark.range(100).selectExpr("id AS user_id", "'u' AS name", "id AS score").repartition(8)
    spec = TableSpec("events", write_disposition="append")
    writer.write(spec, df)
    table = writer.catalog.load_table("ds", "events")
    snaps = table.snapshots()
    assert [s.operation for s in snaps] == ["create", "append"]
    assert len(snaps[-1].files) > 1  # many files...
    assert table.read().count() == 100
    writer.write(spec, df.limit(30))
    assert len(table.snapshots()) == 3  # ...one more snapshot per load
    assert table.read().count() == 130


def test_merge_prunes_untouched_files(spark, writer):
    """Copy-on-write: a batch touching high keys must not rewrite low-key files."""
    spec_append = TableSpec("big", write_disposition="append")
    low = spark.createDataFrame([(i, "low") for i in range(100)], "id long, v string")
    high = spark.createDataFrame([(i, "high") for i in range(1000, 1100)], "id long, v string")
    writer.write(spec_append, low.coalesce(1))
    writer.write(spec_append, high.coalesce(1))
    spec = TableSpec(
        "big",
        write_disposition={"disposition": "merge", "strategy": "upsert"},
        primary_key=["id"],
    )
    batch = spark.createDataFrame([(1050, "updated")], "id long, v string")
    writer.write(spec, batch)
    table = writer.catalog.load_table("ds", "big")
    snap = table.snapshot()
    assert snap.summary["pruned_files"] >= 1  # low-key file untouched
    out = {r.id: r.v for r in table.read().collect()}
    assert out[1050] == "updated" and out[0] == "low" and len(out) == 200


def test_merge_on_bucket_partitioned_pk_rewrites_one_bucket(spark, writer):
    """Copy-on-write on a bucket[8](id) table: key [min,max] cannot prune
    (hash mixing), so the batch's distinct bucket values must do it — a
    1-row batch rewrites ~1/8 of the files, and the rewritten files keep
    their partition tuples (merge must not degrade future pruning)."""
    hints = {"id": {"partition": True, "x-partition-transform": "bucket[8]"}}
    spec_append = TableSpec("bt", write_disposition="append", column_hints=hints)
    df = spark.createDataFrame([(i, "v") for i in range(400)], "id long, v string")
    writer.write(spec_append, df)
    table = writer.catalog.load_table("ds", "bt")
    n_before = table.snapshot().n_files
    assert n_before >= 8  # hive-layouted: ≥ one file per populated bucket

    spec = TableSpec(
        "bt",
        write_disposition={"disposition": "merge", "strategy": "upsert"},
        primary_key=["id"],
        column_hints=hints,
    )
    writer.write(spec, spark.createDataFrame([(5, "updated")], "id long, v string"))
    snap = table.snapshot()
    assert snap.summary["rewritten_files"] <= -(-n_before // 8) + 1
    assert snap.summary["pruned_files"] >= n_before - 2
    out = {r.id: r.v for r in table.read().collect()}
    assert out[5] == "updated" and len(out) == 400
    # every live file still records its bucket tuple
    assert all("id_bucket" in f.partition for f in snap.files)
    # and the post-merge table still prunes point lookups
    _, files = table._select_files(snap, [("id", "=", 5)])
    assert len(files) <= -(-snap.n_files // 8) + 1


def test_sort_order_clusters_files_for_pruning(spark, warehouse):
    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec
    from pyspark.sql import functions as F

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "main")
    df = spark.range(10000).select(F.col("id"), (F.col("id") % 97).alias("v")).orderBy(F.rand(7))
    writer.write(TableSpec(name="sorted_t", write_disposition="append", sort_order=["id"], sort_buckets=4), df)

    table = catalog.load_table("main", "sorted_t")
    snap = table.snapshot()
    assert len(snap.files) > 1
    ranges = sorted((f.stats["id"][0], f.stats["id"][1]) for f in snap.files)
    # range partitioning => pairwise disjoint id ranges
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    # a narrow key-range probe prunes to a single file
    hit, miss = table.prune_files(snap, "id", 10, 20)
    assert len(hit) == 1 and len(miss) == len(snap.files) - 1
    # rows intact
    assert table.read().count() == 10000


def test_replace_partitions_dynamic_overwrite(spark, warehouse):
    from pyspark.sql import Row
    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "main")
    spec_append = TableSpec(
        name="pt",
        write_disposition="append",
        column_hints={"cat": {"partition": True, "x-partition-transform": "identity"}},
    )
    writer.write(
        spec_append,
        spark.createDataFrame(
            [Row(cat="A", v=1), Row(cat="A", v=2), Row(cat="B", v=3)]
        ),
    )
    table = catalog.load_table("main", "pt")
    # partition metadata recorded per file
    assert all("cat" in f.partition for f in table.snapshot().files)

    # dynamic overwrite: only B and C partitions replaced, A untouched
    spec_replace = TableSpec(
        name="pt",
        write_disposition={"disposition": "replace", "scope": "partitions"},
        column_hints=spec_append.column_hints,
    )
    writer.write(
        spec_replace,
        spark.createDataFrame([Row(cat="B", v=30), Row(cat="C", v=40)]),
    )
    rows = {(r.cat, r.v) for r in table.read().collect()}
    assert rows == {("A", 1), ("A", 2), ("B", 30), ("C", 40)}
    snap = table.snapshot()
    assert snap.operation == "overwrite-partitions"
    assert snap.summary["replaced-partitions"] == 2
    # one snapshot for the whole partition overwrite
    assert [s.operation for s in table.snapshots()] == [
        "create", "append", "overwrite-partitions",
    ]


def test_replace_partitions_rewrites_legacy_unpartitioned_files(spark, warehouse):
    from pyspark.sql import Row
    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec
    from dlt_iceberg_spark.lake.table import DataFile

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "main")
    hints = {"cat": {"partition": True, "x-partition-transform": "identity"}}
    writer.write(
        TableSpec(name="pt2", write_disposition="append", column_hints=hints),
        spark.createDataFrame([Row(cat="A", v=1), Row(cat="B", v=2)]),
    )
    table = catalog.load_table("main", "pt2")
    # simulate legacy files: strip partition metadata from the snapshot
    snap = table.snapshot()
    legacy_files = [
        DataFile(path=f.path, rows=f.rows, bytes=f.bytes, stats=f.stats, partition={})
        for f in snap.files
    ]
    table.commit(legacy_files, snap.schema, "append", snap.version)

    writer.write(
        TableSpec(
            name="pt2",
            write_disposition={"disposition": "replace", "scope": "partitions"},
            column_hints=hints,
        ),
        spark.createDataFrame([Row(cat="B", v=20)]),
    )
    rows = {(r.cat, r.v) for r in table.read().collect()}
    # A's row survives the legacy rewrite; B replaced
    assert rows == {("A", 1), ("B", 20)}


def test_replace_partitions_refuses_high_cardinality_batch(spark, warehouse, monkeypatch):
    """The dynamic-overwrite tuple collect is BOUNDED: a batch spanning more
    distinct partition tuples than REPLACE_PARTITION_MAX refuses with the
    mis-declared-spec diagnosis instead of materializing an unbounded set
    on the driver."""
    import pytest as _pytest
    from pyspark.sql import Row, functions as F

    from dlt_iceberg_spark.lake import writer as writer_mod
    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "main")
    hints = {"cat": {"partition": True, "x-partition-transform": "identity"}}
    writer.write(
        TableSpec(name="hc", write_disposition="append", column_hints=hints),
        spark.createDataFrame([Row(cat="A", v=1)]),
    )
    monkeypatch.setattr(writer_mod, "REPLACE_PARTITION_MAX", 5)
    before = catalog.load_table("main", "hc").current_version()
    with _pytest.raises(ValueError, match="high-cardinality"):
        writer.write(
            TableSpec(
                name="hc",
                write_disposition={"disposition": "replace", "scope": "partitions"},
                column_hints=hints,
            ),
            spark.range(20).select(
                F.concat(F.lit("c"), F.col("id")).alias("cat"),
                F.col("id").alias("v"),
            ),
        )
    # refused before any commit landed
    assert catalog.load_table("main", "hc").current_version() == before


def test_replace_partitions_requires_partitioned_table(spark, warehouse):
    import pytest as _pytest
    from pyspark.sql import Row
    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "main")
    writer.write(TableSpec(name="flat", write_disposition="append"),
                 spark.createDataFrame([Row(v=1)]))
    with _pytest.raises(ValueError, match="partition-scoped replace"):
        writer.write(
            TableSpec(name="flat", write_disposition={"disposition": "replace", "scope": "partitions"}),
            spark.createDataFrame([Row(v=2)]),
        )


def test_partition_spec_evolution(spark, warehouse):
    """Partition-spec evolution (Iceberg ALTER ... PARTITION FIELD): hints on
    a later load change the spec for NEW files only; hint-less loads leave
    it untouched; identical hints are idempotent (no extra snapshot)."""
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "main")
    plain = TableSpec(name="pe", write_disposition="append")
    rows = [Row(id=i, cat="A" if i % 2 else "B") for i in range(10)]
    writer.write(plain, spark.createDataFrame(rows), load_id="l0")
    table = catalog.load_table("main", "pe")
    assert table.snapshot().partition_spec == []

    hinted = TableSpec(
        name="pe",
        write_disposition="append",
        column_hints={"cat": {"partition": True, "x-partition-transform": "identity"}},
    )
    writer.write(hinted, spark.createDataFrame(rows), load_id="l1")
    snap = table.snapshot()
    assert [p["column"] for p in snap.partition_spec] == ["cat"]
    ops = [s.operation for s in table.snapshots()]
    assert "evolve-partition" in ops
    # new files carry partition tuples; the pre-evolution files do not
    parts = {f.partition.get("cat") for f in snap.files}
    assert {"A", "B"} <= parts and (None in parts or any(not f.partition for f in snap.files))

    # identical hints again -> no further evolution snapshot
    n_before = len(table.snapshots())
    writer.write(hinted, spark.createDataFrame(rows), load_id="l2")
    ops_after = [s.operation for s in table.snapshots()]
    assert ops_after.count("evolve-partition") == 1
    assert len(table.snapshots()) == n_before + 1  # just the append

    # hint-less load keeps the evolved spec
    writer.write(plain, spark.createDataFrame(rows), load_id="l3")
    assert [p["column"] for p in table.snapshot().partition_spec] == ["cat"]

    # incremental read passes through the metadata-only evolution snapshot
    assert table.read_incremental(1).count() == 30  # after l0's append (v1)


def test_read_where_prunes_files_by_manifest_stats(spark, warehouse):
    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec
    from pyspark.sql import functions as F

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "main")
    df = spark.range(10000).select(
        F.col("id"), (F.col("id") % 97).alias("v"), (F.col("id") % 2 == 0).alias("even")
    ).orderBy(F.rand(7))
    writer.write(
        TableSpec(name="pt", write_disposition="append", sort_order=["id"], sort_buckets=4), df
    )
    table = catalog.load_table("main", "pt")
    n_files = len(table.snapshot().files)
    assert n_files > 1

    # narrow range probe: scans ONE file, exact result
    pruned = table.read(where=[("id", ">=", 10), ("id", "<=", 20)])
    assert len(pruned.inputFiles()) == 1
    assert sorted(r.id for r in pruned.collect()) == list(range(10, 21))

    # equality probe
    eq = table.read(where=[("id", "=", 5000)])
    assert len(eq.inputFiles()) == 1 and eq.collect()[0].id == 5000

    # predicate on an unclustered column can't prune but stays exact
    v = table.read(where=[("v", "=", 11)])
    assert len(v.inputFiles()) == n_files
    assert v.count() == df.filter("v = 11").count()

    # empty-range probe: no files at all, schema preserved
    none = table.read(where=[("id", ">", 10**9)])
    assert none.inputFiles() == [] and none.count() == 0
    full = table.read().schema
    assert [(f.name, f.dataType) for f in none.schema] == [(f.name, f.dataType) for f in full]

    # bad input surfaces early
    import pytest as _pytest
    with _pytest.raises(ValueError, match="no such column"):
        table.read(where=[("nope", "=", 1)])
    with _pytest.raises(ValueError, match="unsupported predicate"):
        table.read(where=[("id", "BETWEEN", 1)])


def test_stale_commit_loses_then_writer_retry_succeeds(spark, warehouse, monkeypatch):
    """Optimistic concurrency end-to-end: a committer holding a stale
    snapshot raises CommitConflictError; the writer's retry loop re-reads
    the table and lands the load on the new head."""
    import pytest as _pytest

    from dlt_iceberg_spark.errors import CommitConflictError
    from dlt_iceberg_spark.lake import table as table_mod
    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec, WriterConfig

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "main", WriterConfig(retry_backoff_base=0.0))
    spec = TableSpec(name="race", write_disposition="append")
    writer.write(spec, spark.range(0, 10), load_id="l0")

    # manual committer reads a snapshot, then a competing load lands
    table = catalog.load_table("main", "race")
    stale = table.snapshot()
    staged = table.stage_dataframe(spark.range(100, 110))
    writer.write(spec, spark.range(10, 20), load_id="l1")
    with _pytest.raises(CommitConflictError):
        table.commit(stale.files + staged, stale.schema, "append", stale.version)
    # the competing load is intact
    assert sorted(r.id for r in table.read().collect()) == list(range(20))

    # writer-level retry: first commit attempt conflicts, rerun lands
    calls = {"n": 0}
    orig = table_mod.LakeTable.commit

    def flaky(self, *a, **k):
        if calls["n"] == 0:
            calls["n"] += 1
            raise CommitConflictError("simulated race")
        return orig(self, *a, **k)

    monkeypatch.setattr(table_mod.LakeTable, "commit", flaky)
    writer.write(spec, spark.range(20, 30), load_id="l2")
    assert calls["n"] == 1
    monkeypatch.undo()
    assert sorted(r.id for r in catalog.load_table("main", "race").read().collect()) == list(range(30))


def test_mixed_partitioning_e2e(spark, warehouse):
    """Reference golden case (tests/test_partitioning_e2e.py:207): one table
    partitioned by hour(timestamp) + identity(region) + bucket[5](customer):
    the spec records all three transforms and every data file carries the
    full partition tuple."""
    from datetime import datetime, timedelta

    from pyspark.sql import Row
    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "main")
    base = datetime(2024, 1, 1)
    rows = [
        Row(
            sale_id=i,
            sale_timestamp=base + timedelta(hours=i % 6),
            region=f"region_{i % 3}",
            customer_id=i % 10,
            amount=i * 50.0,
        )
        for i in range(20)
    ]
    spec = TableSpec(
        name="sales",
        write_disposition="append",
        column_hints={
            "sale_timestamp": {"x-partition": True, "x-partition-transform": "hour"},
            "region": {"x-partition": True},  # identity default
            "customer_id": {"x-partition": True, "x-partition-transform": "bucket[5]"},
        },
    )
    writer.write(spec, spark.createDataFrame(rows))
    table = catalog.load_table("main", "sales")
    snap = table.snapshot()
    by_transform = {p["transform"]: p for p in snap.partition_spec}
    assert set(by_transform) == {"hour", "identity", "bucket"}
    assert by_transform["bucket"]["param"] == 5
    assert by_transform["hour"]["column"] == "sale_timestamp"
    assert by_transform["identity"]["column"] == "region"
    # every file records its full 3-field partition tuple (field naming:
    # "{col}_{transform}", identity keeps the column name)
    for f in snap.files:
        assert set(f.partition) >= {
            "sale_timestamp_hour",
            "region",
            "customer_id_bucket",
        }
    # partition values actually partition the data: 6 hours x 3 regions x
    # <=5 buckets, each file holds exactly one tuple
    assert len({tuple(sorted(f.partition.items())) for f in snap.files}) == len(snap.files)
    # round trip intact
    got = {(r.sale_id, r.region) for r in table.read().collect()}
    assert got == {(i, f"region_{i % 3}") for i in range(20)}


def test_date_column_stats_and_pruned_read(spark, warehouse):
    """DateType stats come out of parquet footers as datetime.date — they
    must survive the JSON manifest encoding (as ISO strings, which order
    lexicographically == chronologically) and drive range pruning."""
    import datetime

    from pyspark.sql import Row
    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "main")
    writer.write(
        TableSpec(name="dated", write_disposition="append"),
        spark.createDataFrame(
            [Row(id=1, d=datetime.date(2024, 1, 1)), Row(id=2, d=datetime.date(2024, 6, 1))]
        ),
    )
    table = catalog.load_table("main", "dated")
    stats = [f.stats["d"] for f in table.snapshot().files if "d" in f.stats]
    assert stats and all(isinstance(s[0], str) for s in stats)
    assert table.read().count() == 2
    assert table.read(where=[("d", ">=", "2024-05-01")]).count() == 1


def test_resolve_bloom_columns_defaults_to_merge_keys():
    from dlt_iceberg_spark.lake.writer import TableSpec

    merge = TableSpec(name="t", write_disposition="merge", primary_key=["id"])
    assert merge.resolve_bloom_columns() == ["id"]
    append = TableSpec(name="t", write_disposition="append", primary_key=["id"])
    assert append.resolve_bloom_columns() == []
    hinted = TableSpec(
        name="t",
        write_disposition="append",
        column_hints={"user": {"x-bloom-filter": True}},
    )
    assert hinted.resolve_bloom_columns() == ["user"]
    explicit = TableSpec(
        name="t", write_disposition="merge", primary_key=["id"],
        bloom_filter_columns=[],
    )
    assert explicit.resolve_bloom_columns() == []  # explicit empty disables


def test_stage_dataframe_writes_parquet_bloom_filters(spark, tmp_path):
    """bloom_columns must reach the parquet writer: the bloom filter is a
    real on-disk structure, so the same data must produce strictly larger
    files with it enabled (pyarrow/duckdb here can't introspect bloom
    offsets, so size delta is the observable)."""
    from dlt_iceberg_spark.lake.table import LakeTable

    df = spark.range(100_000).selectExpr("id", "cast(id as string) as s").coalesce(1)
    plain = LakeTable(spark, str(tmp_path / "plain"))
    bloomed = LakeTable(spark, str(tmp_path / "bloomed"))
    f_plain = plain.stage_dataframe(df)
    f_bloom = bloomed.stage_dataframe(df, bloom_columns=["id", "s"])
    assert sum(f.bytes for f in f_bloom) > sum(f.bytes for f in f_plain) + 100_000
    # and an absent column is ignored, not an error
    f_skip = plain.stage_dataframe(df, bloom_columns=["nope"])
    assert abs(sum(f.bytes for f in f_skip) - sum(f.bytes for f in f_plain)) < 10_000


def test_custom_partition_name_e2e(spark, warehouse):
    """Reference golden (tests/test_capabilities.py:285-340): custom
    partition-field names from the adapter (month('created_at',
    'event_month'), identity('region', 'event_region')) must flow through
    the hints into the table's partition spec and every file's partition
    tuple."""
    from datetime import datetime

    from pyspark.sql import Row
    from dlt_iceberg_spark.adapter import iceberg_adapter, iceberg_partition
    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec

    hints = iceberg_adapter(
        {},
        partition=[
            iceberg_partition.month("created_at", "event_month"),
            iceberg_partition.identity("region", "event_region"),
        ],
    ).column_hints
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "main")
    rows = [
        Row(id=1, created_at=datetime(2024, 1, 15), region="US"),
        Row(id=2, created_at=datetime(2024, 3, 2), region="EU"),
    ]
    writer.write(
        TableSpec(name="events", write_disposition="append", column_hints=hints),
        spark.createDataFrame(rows),
    )
    table = catalog.load_table("main", "events")
    snap = table.snapshot()
    spec_names = {p["name"] for p in snap.partition_spec}
    assert spec_names == {"event_month", "event_region"}
    for f in snap.files:
        assert set(f.partition) == {"event_month", "event_region"}
    # custom-named partition prunes: only the US file is read
    us = table.read(where=None)
    assert us.count() == 2


def test_concurrent_writers_thread_race(spark, warehouse):
    """Real optimistic-concurrency race: N threads append through the
    writer simultaneously against one table.  Atomic pointer-rename means
    exactly one committer wins each version; losers classify the conflict
    retryable, re-read the head, and reland.  Every row must arrive
    exactly once, in one snapshot per load."""
    import threading

    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec, WriterConfig

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "main", WriterConfig(max_retries=10, retry_backoff_base=0.0))
    spec = TableSpec(name="race_t", write_disposition="append")
    writer.write(spec, spark.range(0, 10), load_id="seed")

    n_threads = 5
    errors: list[Exception] = []
    barrier = threading.Barrier(n_threads)

    def worker(i: int) -> None:
        try:
            barrier.wait()
            writer.write(spec, spark.range(100 + i * 10, 100 + i * 10 + 10), load_id=f"l{i}")
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []

    table = catalog.load_table("main", "race_t")
    ids = sorted(r.id for r in table.read().collect())
    assert ids == list(range(0, 10)) + list(range(100, 100 + n_threads * 10))
    # one snapshot per append (+1 create): versions strictly increment
    versions = [s.version for s in table.snapshots()]
    assert versions == sorted(versions) and len(set(versions)) == len(versions)
    assert len(versions) >= n_threads + 1


def test_append_conflict_retry_does_not_restage(spark, warehouse, monkeypatch):
    """A lost commit race must be resolved by RE-COMMITTING the already
    staged files against the new head — never by re-staging the batch
    (O(commit) conflict cost, not O(batch))."""
    from dlt_iceberg_spark.errors import CommitConflictError
    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.table import LakeTable
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec, WriterConfig

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "main", WriterConfig(retry_backoff_base=0.0))
    spec = TableSpec(name="t", write_disposition="append")
    writer.write(spec, spark.range(0, 10), load_id="l0")

    stages = {"n": 0}
    commits = {"n": 0}
    orig_stage = LakeTable.stage_dataframe
    orig_commit = LakeTable.commit

    def counting_stage(self, *a, **k):
        stages["n"] += 1
        return orig_stage(self, *a, **k)

    def flaky_commit(self, *a, **k):
        commits["n"] += 1
        if commits["n"] == 1:
            raise CommitConflictError("simulated lost race")
        return orig_commit(self, *a, **k)

    monkeypatch.setattr(LakeTable, "stage_dataframe", counting_stage)
    monkeypatch.setattr(LakeTable, "commit", flaky_commit)
    writer.write(spec, spark.range(10, 20), load_id="l1")
    assert stages["n"] == 1  # staged exactly once despite the conflict
    assert commits["n"] == 2  # first attempt lost, second landed
    monkeypatch.undo()
    table = catalog.load_table("main", "t")
    assert sorted(r.id for r in table.read().collect()) == list(range(20))


def test_mor_conflict_retry_does_not_restage(spark, warehouse, monkeypatch):
    from dlt_iceberg_spark.errors import CommitConflictError
    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.table import LakeTable
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec, WriterConfig

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "main", WriterConfig(retry_backoff_base=0.0))
    spec = TableSpec(
        name="t2", write_disposition="merge", primary_key=["id"], merge_mode="mor"
    )
    writer.write(spec, spark.range(0, 10), load_id="l0")

    stages = {"n": 0}
    commits = {"n": 0}
    orig_stage = LakeTable.stage_dataframe
    orig_commit = LakeTable.commit

    def counting_stage(self, *a, **k):
        stages["n"] += 1
        return orig_stage(self, *a, **k)

    def flaky_commit(self, *a, **k):
        commits["n"] += 1
        if commits["n"] == 1:
            raise CommitConflictError("simulated lost race")
        return orig_commit(self, *a, **k)

    monkeypatch.setattr(LakeTable, "stage_dataframe", counting_stage)
    monkeypatch.setattr(LakeTable, "commit", flaky_commit)
    writer.write(spec, spark.range(5, 15), load_id="l1")
    # 2 stage calls = delete-key file + data file, each staged exactly once
    assert stages["n"] == 2 and commits["n"] == 2
    monkeypatch.undo()
    table = catalog.load_table("main", "t2")
    assert sorted(r.id for r in table.read().collect()) == list(range(15))
