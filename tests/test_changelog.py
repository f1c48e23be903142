"""CDC changelog (LakeTable.read_changes) — the engine's equivalent of
Iceberg's create_changelog_view.

Reference parity note: the reference has no changelog surface; this is part
of the beyond-reference lake layer (SURVEY §2.2 merge semantics are what a
changelog consumer downstream would feed on).
"""

import pytest
from pyspark.sql import functions as F

from dlt_iceberg_spark.lake.catalog import LakeCatalog
from dlt_iceberg_spark.lake.maintenance import compact_table
from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec


def _rows(df):
    return sorted(
        (r.id, r.val, r._change_type, r._commit_version) for r in df.collect()
    )


@pytest.fixture()
def base(spark, warehouse):
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "id long, val string"
    ).repartition(2)
    writer.write(TableSpec(name="t", write_disposition="append"), df, load_id="l0")
    return catalog, writer


def test_appends_become_inserts(spark, base):
    catalog, writer = base
    table = catalog.load_table("ds", "t")
    v0 = table.snapshot().version
    writer.write(
        TableSpec(name="t", write_disposition="append"),
        spark.createDataFrame([(100, "x"), (101, "y")], "id long, val string"),
        load_id="l1",
    )
    table = catalog.load_table("ds", "t")
    v1 = table.snapshot().version
    ch = _rows(table.read_changes(v0))
    assert ch == [(100, "x", "insert", v1), (101, "y", "insert", v1)]
    # full-history changelog: creation rows are inserts too
    all_ch = table.read_changes(None)
    assert all_ch.filter(F.col("_change_type") == "insert").count() == 22
    assert all_ch.filter(F.col("_change_type") == "delete").count() == 0


def test_cow_upsert_raw_and_net(spark, base):
    catalog, writer = base
    table = catalog.load_table("ds", "t")
    v0 = table.snapshot().version
    writer.write(
        TableSpec(
            name="t",
            write_disposition={"disposition": "merge", "strategy": "upsert"},
            primary_key=["id"],
        ),
        spark.createDataFrame([(3, "NEW3"), (777, "NEW777")], "id long, val string"),
        load_id="l1",
    )
    table = catalog.load_table("ds", "t")
    raw = table.read_changes(v0)
    # raw CoW changelog re-emits rewritten rows; net cancels the noise
    net = _rows(table.read_changes(v0, net_changes=True))
    v1 = table.snapshot().version
    assert net == [
        (3, "NEW3", "insert", v1),
        (3, "v3", "delete", v1),
        (777, "NEW777", "insert", v1),
    ]
    # raw contains at least the net rows
    raw_set = set(_rows(raw))
    assert set(net) <= raw_set


def test_mor_upsert_emits_delete_images(spark, base):
    catalog, writer = base
    table = catalog.load_table("ds", "t")
    v0 = table.snapshot().version
    writer.write(
        TableSpec(
            name="t",
            write_disposition={"disposition": "merge", "strategy": "upsert"},
            primary_key=["id"],
            merge_mode="mor",
        ),
        spark.createDataFrame([(4, "NEW4")], "id long, val string"),
        load_id="l1",
    )
    table = catalog.load_table("ds", "t")
    v1 = table.snapshot().version
    ch = _rows(table.read_changes(v0))
    assert (4, "v4", "delete", v1) in ch  # old image via equality keys
    assert (4, "NEW4", "insert", v1) in ch
    assert len(ch) == 2  # MoR touches nothing else


def test_position_delete_emits_addressed_images(spark, base):
    catalog, _ = base
    table = catalog.load_table("ds", "t")
    v0 = table.snapshot().version
    table.position_delete_where([("id", "<", 2)])
    table = catalog.load_table("ds", "t")
    v1 = table.snapshot().version
    ch = _rows(table.read_changes(v0))
    assert ch == [(0, "v0", "delete", v1), (1, "v1", "delete", v1)]


def test_compaction_is_changelog_silent(spark, base):
    catalog, writer = base
    for i in range(3):
        writer.write(
            TableSpec(name="t", write_disposition="append"),
            spark.createDataFrame([(50 + i, "z")], "id long, val string"),
            load_id=f"s{i}",
        )
    table = catalog.load_table("ds", "t")
    v_before = table.snapshot().version
    compact_table(table, target_file_bytes=1 << 30)
    table = catalog.load_table("ds", "t")
    assert table.snapshot().version > v_before  # compaction committed
    assert table.read_changes(v_before).count() == 0


def test_changelog_range_validation(spark, base):
    catalog, _ = base
    table = catalog.load_table("ds", "t")
    v0 = table.snapshot().version
    with pytest.raises(ValueError, match="newer"):
        table.read_changes(v0 + 5, v0)
    empty = table.read_changes(v0, v0)
    assert empty.count() == 0
    assert empty.columns[-2:] == ["_change_type", "_commit_version"]


# ---------------------------------------------------------------------------
# ChangelogFeed: checkpointed incremental consumption
# ---------------------------------------------------------------------------


def test_feed_drains_and_checkpoints(spark, base):
    from dlt_iceberg_spark.lake.feed import ChangelogFeed

    catalog, writer = base
    table = catalog.load_table("ds", "t")
    feed = ChangelogFeed(table, name="c1")

    # first poll replays full history as inserts
    b = feed.poll()
    assert b.from_version is None
    assert b.changes.count() == 20
    feed.ack(b.to_version)
    assert feed.poll() is None  # caught up

    writer.write(
        TableSpec(name="t", write_disposition="append"),
        spark.createDataFrame([(100, "x")], "id long, val string"),
        load_id="l1",
    )
    b2 = ChangelogFeed(catalog.load_table("ds", "t"), name="c1").poll()
    assert [(r.id, r._change_type) for r in b2.changes.collect()] == [(100, "insert")]


def test_feed_replays_unacked_batch(spark, base):
    from dlt_iceberg_spark.lake.feed import ChangelogFeed

    catalog, _ = base
    table = catalog.load_table("ds", "t")
    feed = ChangelogFeed(table, name="crashy")
    first = feed.poll()
    again = ChangelogFeed(table, name="crashy").poll()  # "restart", no ack
    assert first.to_version == again.to_version
    assert first.changes.count() == again.changes.count() == 20
    with pytest.raises(ValueError, match="rewind"):
        feed.ack(first.to_version)  # fine
        feed.ack(first.to_version - 1)


def test_feed_process_loop(spark, base):
    from dlt_iceberg_spark.lake.feed import ChangelogFeed

    catalog, writer = base
    seen = []
    table = catalog.load_table("ds", "t")
    n = ChangelogFeed(table, name="loop").process(lambda df: seen.append(df.count()))
    assert n == 1 and seen == [20]

    table.position_delete_where([("id", "<", 5)])
    table = catalog.load_table("ds", "t")
    n = ChangelogFeed(table, name="loop").process(lambda df: seen.append(df.count()))
    assert n == 1 and seen == [20, 5]  # 5 delete images, nothing replayed

    # failing consumer leaves the cursor untouched
    def boom(df):
        raise RuntimeError("consumer crash")

    writer.write(
        TableSpec(name="t", write_disposition="append"),
        spark.createDataFrame([(200, "y")], "id long, val string"),
        load_id="l2",
    )
    table = catalog.load_table("ds", "t")
    feed = ChangelogFeed(table, name="loop")
    with pytest.raises(RuntimeError):
        feed.process(boom)
    n = feed.process(lambda df: seen.append(df.count()))
    assert n == 1 and seen[-1] == 1  # the same batch replayed


def test_feed_independent_consumers(spark, base):
    from dlt_iceberg_spark.lake.feed import ChangelogFeed

    catalog, _ = base
    table = catalog.load_table("ds", "t")
    a, b = ChangelogFeed(table, name="a"), ChangelogFeed(table, name="b")
    ba = a.poll()
    a.ack(ba.to_version)
    assert a.poll() is None
    assert b.poll() is not None  # b has its own cursor
    with pytest.raises(ValueError, match="identifier"):
        ChangelogFeed(table, name="bad/name")


def test_changelog_across_schema_evolution(spark, base):
    catalog, writer = base
    v0 = catalog.load_table("ds", "t").snapshot().version
    # evolve: a later load adds a column; earlier snapshots predate it
    writer.write(
        TableSpec(name="t", write_disposition="append"),
        spark.createDataFrame([(300, "n", "ex")], "id long, val string, extra string"),
        load_id="l1",
    )
    table = catalog.load_table("ds", "t")
    assert "extra" in [f.name for f in table.snapshot().schema.fields]
    # full-history changelog presents the END schema, null-filling old rows
    ch = table.read_changes(None)
    assert ch.columns[:3] == ["id", "val", "extra"]
    rows = {r.id: r.extra for r in ch.collect()}
    assert rows[300] == "ex" and rows[0] is None
    # and delete images from pre-evolution files null-fill too
    table.position_delete_where([("id", "=", 1)])
    table = catalog.load_table("ds", "t")
    ch2 = [r for r in table.read_changes(v0 + 1).collect() if r._change_type == "delete"]
    assert len(ch2) == 1 and ch2[0].id == 1 and ch2[0].extra is None


def test_dataset_changes_surface(spark, base):
    from dlt_iceberg_spark.lake.dataset import Dataset

    catalog, writer = base
    v0 = catalog.load_table("ds", "t").snapshot().version
    writer.write(
        TableSpec(name="t", write_disposition="append"),
        spark.createDataFrame([(500, "q")], "id long, val string"),
        load_id="l1",
    )
    ds = Dataset(catalog, "ds")
    rows = ds.changes("t", v0).dataframe().collect()
    assert [(r.id, r._change_type) for r in rows] == [(500, "insert")]
    assert ds.changes("t", v0).fetchall()[0][0] == 500


def test_changelog_refuses_expired_range(spark, base, monkeypatch):
    """A consumer whose cursor predates retained history must get an error,
    not silently truncated changes."""
    catalog, writer = base
    table = catalog.load_table("ds", "t")
    v0 = table.snapshot().version
    for i in range(2):
        writer.write(
            TableSpec(name="t", write_disposition="append"),
            spark.createDataFrame([(600 + i, "x")], "id long, val string"),
            load_id=f"l{i}",
        )
    table = catalog.load_table("ds", "t")
    mid = table.snapshot().parent
    # simulate expiry of the mid snapshot
    real = type(table).snapshot

    def fake(self, version=None):
        if version == mid:
            return None
        return real(self, version)

    monkeypatch.setattr(type(table), "snapshot", fake)
    with pytest.raises(ValueError, match="expired"):
        table.read_changes(v0)
    # full-history request bootstraps from retained history instead
    assert table.read_changes(None).count() >= 1


@pytest.mark.slow
def test_mirror_into_replicates_table(spark, base):
    """CDC apply: a downstream table tracks the source through appends,
    updates, and deletes via the changelog feed."""
    from dlt_iceberg_spark.lake.feed import ChangelogFeed
    from dlt_iceberg_spark.lake.writer import LakeWriter

    catalog, writer = base  # source ds.t: ids 0..19
    mirror_writer = LakeWriter(catalog, "mirror")

    def sync():
        table = catalog.load_table("ds", "t")
        return ChangelogFeed(table, name="mir", net_changes=True).mirror_into(
            mirror_writer, "t2", ["id"]
        )

    assert sync() == 1  # bootstrap
    src = lambda: sorted(
        (r.id, r.val) for r in catalog.load_table("ds", "t").read().collect()
    )
    dst = lambda: sorted(
        (r.id, r.val) for r in catalog.load_table("mirror", "t2").read().collect()
    )
    assert dst() == src()

    # mutate the source: update, position delete, append — one sync catches up
    t = catalog.load_table("ds", "t")
    t.update_where([("id", "=", 3)], {"val": "U3"})
    t = catalog.load_table("ds", "t")
    t.position_delete_where([("id", "=", 7)])
    writer.write(
        TableSpec(name="t", write_disposition="append"),
        spark.createDataFrame([(900, "new")], "id long, val string"),
        load_id="lX",
    )
    assert sync() == 1
    assert dst() == src()
    got = dict(dst())
    assert got[3] == "U3" and 7 not in got and got[900] == "new"

    # idle source -> no batch, mirror untouched
    assert sync() == 0


def test_changelog_planning_reads_only_unique_manifests(spark, warehouse, monkeypatch):
    """Manifest-ref diff on the BATCH changelog: read_changes over an
    append-only range plans from each step's unique manifests, never a
    full per-snapshot listing (the planning twin of the streaming test in
    test_stream_source.py)."""
    import dlt_iceberg_spark.lake.table as table_mod
    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec

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
    n_manifests = len(t.snapshot().manifests)
    assert n_manifests >= 3

    real = table_mod.read_manifest
    reads = []

    def counting(location, ref, io=None):
        reads.append(ref.path)
        return real(location, ref, io=io)

    monkeypatch.setattr(table_mod, "read_manifest", counting)
    out = t.read_changes(head - 1, head)
    n_rows = out.count()
    monkeypatch.setattr(table_mod, "read_manifest", real)
    assert n_rows == 1
    assert 0 < len(set(reads)) < n_manifests, (len(set(reads)), n_manifests)
