"""Merge-on-read (equality delete files) tests.

Iceberg v2 semantics: a delete file masks matching rows only in data files
with a strictly smaller sequence number; writes are O(batch), reads pay an
anti-join until fold_deletes/compaction rewrites the masks away.
"""

import pytest
from pyspark.sql import functions as F

from dlt_iceberg_spark.lake.catalog import LakeCatalog
from dlt_iceberg_spark.lake.maintenance import compact_table
from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec


def _mor_spec(**kw):
    return TableSpec(
        name=kw.pop("name", "t"),
        write_disposition={"disposition": "merge", "strategy": kw.pop("strategy", "upsert")},
        primary_key=["id"],
        merge_mode="mor",
        **kw,
    )


@pytest.fixture()
def base(spark, warehouse):
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "id long, val string"
    ).repartition(4)
    writer.write(TableSpec(name="t", write_disposition="append"), df, load_id="l0")
    return catalog, writer


def test_mor_upsert_is_o_batch_and_correct(spark, base):
    catalog, writer = base
    before = catalog.load_table("ds", "t").snapshot()

    batch = spark.createDataFrame(
        [(5, "NEW5"), (6, "NEW6"), (100, "NEW100")], "id long, val string"
    )
    writer.write(_mor_spec(), batch, load_id="l1")

    table = catalog.load_table("ds", "t")
    snap = table.snapshot()
    assert snap.operation == "merge-mor"
    # every pre-existing data file carried over byte-identical: no rewrite
    assert {f.path for f in before.files} <= {f.path for f in snap.files}
    assert len(snap.delete_files) >= 1
    assert snap.delete_files[0].equality_ids == ["id"]
    # delete sequence is newer than old data, same as new data
    assert all(d.sequence == snap.version for d in snap.delete_files)

    out = {r.id: r.val for r in table.read().collect()}
    assert len(out) == 101
    assert out[5] == "NEW5" and out[6] == "NEW6" and out[100] == "NEW100"
    assert out[7] == "v7"


def test_mor_reinserted_key_survives_older_delete(spark, base):
    catalog, writer = base
    # hard-delete id=3 via MoR (delete file only)
    batch = spark.createDataFrame([(3, "x", "2026-01-01")], "id long, val string, _dlt_deleted_at string")
    writer.write(_mor_spec(), batch, load_id="l1")
    table = catalog.load_table("ds", "t")
    ids = {r.id for r in table.read().collect()}
    assert 3 not in ids and len(ids) == 99

    # a later plain append re-inserts id=3: the OLD delete must not mask it
    writer.write(
        TableSpec(name="t", write_disposition="append"),
        spark.createDataFrame([(3, "back")], "id long, val string"),
        load_id="l2",
    )
    table = catalog.load_table("ds", "t")
    out = {r.id: r.val for r in table.read().collect()}
    assert out[3] == "back" and len(out) == 100
    # the append inherited the delete file (didn't clear it)
    assert len(table.snapshot().delete_files) == 1


def test_mor_delete_insert_keeps_duplicate_batch_keys(spark, base):
    catalog, writer = base
    batch = spark.createDataFrame([(1, "a"), (1, "b")], "id long, val string")
    writer.write(_mor_spec(strategy="delete-insert"), batch, load_id="l1")
    rows = catalog.load_table("ds", "t").read().filter("id = 1").collect()
    assert sorted(r.val for r in rows) == ["a", "b"]


def test_fold_deletes_restores_plain_scan(spark, base):
    catalog, writer = base
    writer.write(
        _mor_spec(),
        spark.createDataFrame([(5, "NEW5")], "id long, val string"),
        load_id="l1",
    )
    table = catalog.load_table("ds", "t")
    before = {(r.id, r.val) for r in table.read().collect()}
    folded = table.fold_deletes()
    assert folded.delete_files == [] and folded.operation == "replace"
    after_table = catalog.load_table("ds", "t")
    assert {(r.id, r.val) for r in after_table.read().collect()} == before
    # idempotent
    assert after_table.fold_deletes().version == folded.version


def test_cow_merge_on_mor_table_folds_first(spark, base):
    catalog, writer = base
    writer.write(
        _mor_spec(),
        spark.createDataFrame([(5, "MOR5")], "id long, val string"),
        load_id="l1",
    )
    # switch back to copy-on-write for the next load
    cow = TableSpec(
        name="t",
        write_disposition={"disposition": "merge", "strategy": "upsert"},
        primary_key=["id"],
    )
    writer.write(
        cow, spark.createDataFrame([(6, "COW6")], "id long, val string"), load_id="l2"
    )
    table = catalog.load_table("ds", "t")
    assert table.snapshot().delete_files == []
    out = {r.id: r.val for r in table.read().collect()}
    assert out[5] == "MOR5" and out[6] == "COW6" and out[4] == "v4" and len(out) == 100


def test_compaction_folds_deletes(spark, base):
    catalog, writer = base
    writer.write(
        _mor_spec(),
        spark.createDataFrame([(5, "NEW5")], "id long, val string"),
        load_id="l1",
    )
    table = catalog.load_table("ds", "t")
    compact_table(table, target_file_bytes=1 << 20)
    table = catalog.load_table("ds", "t")
    assert table.snapshot().delete_files == []
    out = {r.id: r.val for r in table.read().collect()}
    assert out[5] == "NEW5" and len(out) == 100


def test_mor_metadata_and_pruned_read(spark, base):
    catalog, writer = base
    writer.write(
        _mor_spec(),
        spark.createDataFrame([(5, "NEW5")], "id long, val string"),
        load_id="l1",
    )
    table = catalog.load_table("ds", "t")
    meta = table.metadata_df("delete_files").collect()
    assert len(meta) == 1 and meta[0].equality_ids == ["id"]
    # where-pruned read still applies the masks
    got = {r.id: r.val for r in table.read(where=[("id", "<=", 10)]).collect()}
    assert got[5] == "NEW5" and len(got) == 11


def test_position_delete_where(spark, base):
    catalog, writer = base
    table = catalog.load_table("ds", "t")
    before = table.snapshot()

    snap = table.position_delete_where([("id", "<", 10)])
    assert snap.operation == "delete"
    # data files untouched — delete is metadata + a tiny address file
    assert {f.path for f in before.files} == {f.path for f in snap.files}
    pos = [d for d in snap.delete_files if d.content == "position"]
    assert pos and all(d.equality_ids == [] for d in pos)
    assert sum(d.rows for d in pos) == 10
    assert all(d.sequence == snap.version for d in pos)

    out = {r.id for r in table.read().collect()}
    assert out == set(range(10, 100))
    # pruned read still correct through the position mask
    sub = {r.id for r in table.read(where=[("id", "<", 20)]).collect()}
    assert sub == set(range(10, 20))
    # metadata table exposes the content flavor
    md = table.metadata_df("delete_files").collect()
    assert {r.content for r in md} == {"position"}


def test_position_delete_only_masks_older_or_same_sequence(spark, base):
    catalog, writer = base
    table = catalog.load_table("ds", "t")
    table.position_delete_where([("id", "=", 7)])

    # rows appended AFTER the delete must not be masked even at the same id
    writer.write(
        TableSpec(name="t", write_disposition="append"),
        spark.createDataFrame([(7, "BACK")], "id long, val string"),
        load_id="l2",
    )
    table = catalog.load_table("ds", "t")
    vals = sorted(r.val for r in table.read().filter(F.col("id") == 7).collect())
    assert vals == ["BACK"]


def test_position_deletes_compose_with_equality_deletes(spark, base):
    catalog, writer = base
    # equality-delete ids 5,6 via a MoR upsert, then position-delete id<3
    writer.write(
        _mor_spec(),
        spark.createDataFrame([(5, "NEW5"), (6, "NEW6")], "id long, val string"),
        load_id="l1",
    )
    table = catalog.load_table("ds", "t")
    table.position_delete_where([("id", "<", 3)])
    table = catalog.load_table("ds", "t")
    contents = {d.content for d in table.snapshot().delete_files}
    assert contents == {"equality", "position"}
    out = {r.id: r.val for r in table.read().collect()}
    assert set(out) == set(range(3, 100))
    assert out[5] == "NEW5" and out[6] == "NEW6" and out[7] == "v7"


def test_position_delete_no_match_is_noop(spark, base):
    catalog, _ = base
    table = catalog.load_table("ds", "t")
    v0 = table.snapshot().version
    snap = table.position_delete_where([("id", ">", 10_000)])
    assert snap.version == v0  # nothing matched -> no commit
    assert table.read().count() == 100


def test_fold_deletes_clears_position_deletes(spark, base):
    catalog, _ = base
    table = catalog.load_table("ds", "t")
    table.position_delete_where([("id", "<", 50)])
    table = catalog.load_table("ds", "t")
    snap = table.fold_deletes()
    assert snap.delete_files == []
    assert {r.id for r in table.read().collect()} == set(range(50, 100))


def test_position_delete_requires_predicate(spark, base):
    catalog, _ = base
    table = catalog.load_table("ds", "t")
    with pytest.raises(ValueError, match="non-empty predicate"):
        table.position_delete_where([])
    assert table.read().count() == 100


def test_update_where_mor(spark, base):
    catalog, _ = base
    table = catalog.load_table("ds", "t")
    before = table.snapshot()

    snap = table.update_where(
        [("id", "<", 3)], {"val": F.concat(F.lit("upd:"), F.col("val"))}
    )
    assert snap.operation == "merge"
    # old data files untouched, one small new file with the updated images
    assert {f.path for f in before.files} <= {f.path for f in snap.files}
    assert snap.summary["updated-rows"] == 3
    pos = [d for d in snap.delete_files if d.content == "position"]
    assert sum(d.rows for d in pos) == 3

    out = {r.id: r.val for r in table.read().collect()}
    assert len(out) == 100
    assert out[0] == "upd:v0" and out[2] == "upd:v2" and out[3] == "v3"

    # changelog shows old images out, new images in
    ch = sorted(
        (r.id, r.val, r._change_type)
        for r in table.read_changes(before.version).collect()
    )
    assert ch == [
        (0, "upd:v0", "insert"), (0, "v0", "delete"),
        (1, "upd:v1", "insert"), (1, "v1", "delete"),
        (2, "upd:v2", "insert"), (2, "v2", "delete"),
    ]


def test_update_where_literal_and_validation(spark, base):
    catalog, _ = base
    table = catalog.load_table("ds", "t")
    v0 = table.snapshot().version
    with pytest.raises(ValueError, match="non-empty predicate"):
        table.update_where([], {"val": "x"})
    with pytest.raises(ValueError, match="no such column"):
        table.update_where([("id", "=", 1)], {"bogus": "x"})
    snap = table.update_where([("id", "=", 1)], {"val": "LIT"})
    assert snap.version > v0
    assert table.read().filter(F.col("id") == 1).collect()[0].val == "LIT"
    # updating already-updated rows works (masks compose across versions)
    table.update_where([("id", "=", 1)], {"val": "LIT2"})
    vals = [r.val for r in catalog.load_table("ds", "t").read().filter(F.col("id") == 1).collect()]
    assert vals == ["LIT2"]
    # no-match update is a no-op commit
    t2 = catalog.load_table("ds", "t")
    v = t2.snapshot().version
    assert t2.update_where([("id", "=", 99999)], {"val": "never"}).version == v


def test_delete_stats_skip_untouched_files(spark, base):
    """Delete-file key-range stats (Iceberg delete-manifest stats): a
    localized MoR delete leaves files outside its key range on the plain
    scan path — no anti-join at all."""
    from dlt_iceberg_spark.plans import explain_str

    catalog, writer = base  # base: ids 0..99
    # MoR-upsert a batch whose key range [200, 201] misses EVERY existing
    # file: the delete-file stats prove no old row can match, so the read
    # plans with NO anti-join anywhere (the new same-sequence file is
    # never masked by its own commit either)
    writer.write(
        _mor_spec(),
        spark.createDataFrame([(200, "N200"), (201, "N201")], "id long, val string"),
        load_id="l1",
    )
    table = catalog.load_table("ds", "t")
    snap = table.snapshot()
    assert all(d.stats.get("id") for d in snap.delete_files)  # stats recorded
    plan = explain_str(table.read(), "simple")
    assert "LeftAnti" not in plan, plan
    out = {r.id: r.val for r in table.read().collect()}
    assert len(out) == 102 and out[200] == "N200" and out[50] == "v50"

    # a second upsert that DOES overlap old ids pays exactly one anti-join
    writer.write(
        _mor_spec(),
        spark.createDataFrame([(0, "N0")], "id long, val string"),
        load_id="l2",
    )
    table = catalog.load_table("ds", "t")
    plan = explain_str(table.read(), "simple")
    assert plan.count("LeftAnti") == 1, plan
    out = {r.id: r.val for r in table.read().collect()}
    assert out[0] == "N0" and len(out) == 102


def test_position_delete_conflict_then_retry(spark, base, monkeypatch):
    """A commit racing past position_delete_where's snapshot raises
    CommitConflictError (staged address files are head-independent); a
    plain re-call replans against the new head and succeeds."""
    from dlt_iceberg_spark.errors import CommitConflictError
    from dlt_iceberg_spark.lake.table import LakeTable

    catalog, writer = base
    table = catalog.load_table("ds", "t")
    real = LakeTable.stage_position_deletes
    raced = {"done": False}

    def stage_and_race(self, *a, **kw):
        out = real(self, *a, **kw)
        if not raced["done"]:
            raced["done"] = True
            writer.write(
                TableSpec(name="t", write_disposition="append"),
                spark.createDataFrame([(700, "race")], "id long, val string"),
                load_id="racer",
            )
        return out

    monkeypatch.setattr(LakeTable, "stage_position_deletes", stage_and_race)
    with pytest.raises(CommitConflictError):
        table.position_delete_where([("id", "<", 3)])
    # retry from fresh state: succeeds and composes with the raced append
    table = catalog.load_table("ds", "t")
    table.position_delete_where([("id", "<", 3)])
    out = {r.id for r in catalog.load_table("ds", "t").read().collect()}
    assert out == set(range(3, 100)) | {700}
