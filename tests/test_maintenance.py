"""Compaction + snapshot-expiration tests."""

import os
from datetime import timedelta

import pytest

from dlt_iceberg_spark.lake.catalog import LakeCatalog
from dlt_iceberg_spark.lake.maintenance import (
    compact_table,
    expire_snapshots,
    remove_orphan_files,
)
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


def test_compact_where_scopes_the_rewrite(loaded_table):
    """compact_table(where=...) binpacks only the files whose stats may
    match; out-of-scope small files carry over by reference (Iceberg's
    rewrite_data_files filter) and their rows are untouched."""
    before = loaded_table.snapshot()
    assert len(before.files) == 4  # ids 0-9 / 10-19 / 20-29 / 30-39
    res = compact_table(
        loaded_table, target_file_bytes=1 << 20, where=[("id", "<", 20)]
    )
    after = loaded_table.snapshot()
    # the two low-range files merged into one; the other two carried over
    assert res.rewritten_files == 2 and res.output_files == 1
    assert len(after.files) == 3
    kept_paths = {f.path for f in before.files} & {f.path for f in after.files}
    assert len(kept_paths) == 2  # high-range files referenced unchanged
    assert sorted(r.id for r in loaded_table.read().collect()) == list(range(40))


def test_compact_preserves_partition_layout(spark, warehouse):
    """Compacting a hive-partitioned table must KEEP the partition layout:
    rewritten files carry their partition tuples (one output file per
    value), so partition pruning and dynamic overwrite still see them —
    staging without partition_exprs silently degraded both."""
    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    hints = {"cat": {"x-partition": True}}
    for load in range(4):  # 4 loads × 3 cats = 12 small files
        writer.write(
            TableSpec(name="pt", write_disposition="append", column_hints=hints),
            spark.createDataFrame(
                [(load * 10 + i, c) for i, c in enumerate("abc")],
                "v long, cat string",
            ).coalesce(1),
            load_id=f"l{load}",
        )
    t = catalog.load_table("ds", "pt")
    assert len(t.snapshot().files) >= 12
    res = compact_table(t, target_file_bytes=1 << 20)
    assert res.rewritten_files >= 12
    snap = t.snapshot()
    # every compacted file carries its tuple; one file per partition value
    assert all(f.partition.get("cat") is not None for f in snap.files)
    assert sorted(f.partition["cat"] for f in snap.files) == ["a", "b", "c"]
    # pruning still decisive
    _, planned = t._select_files(snap, [("cat", "=", "b")])
    assert [f.partition["cat"] for f in planned] == ["b"]
    assert t.read().count() == 12
    # dynamic overwrite sees no "legacy" files: only b is replaced
    writer.write(
        TableSpec(
            name="pt",
            write_disposition={"disposition": "replace", "scope": "partitions"},
            column_hints=hints,
        ),
        spark.createDataFrame([(99, "b")], "v long, cat string"),
    )
    rows = {(r.v, r.cat) for r in catalog.load_table("ds", "pt").read().collect()}
    assert (99, "b") in rows and len(rows) == 9  # 8 a/c rows + the new b


def test_compact_vector_index_keeps_probe_pruning(spark, warehouse):
    """The IVF index survives compaction: inverted-list partition tuples
    carry through, so probe pruning and probe-all exactness hold."""
    import numpy as np

    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.operators.similarity import (
        cosine_topk_bruteforce,
        fixed_centroids,
    )
    from dlt_iceberg_spark.operators.vector_index import (
        append_vectors,
        build_vector_index,
        ivf_topk_persisted,
    )

    rng = np.random.default_rng(11)
    mk = lambda n, s: spark.createDataFrame(
        [(s + i, [float(x) for x in rng.normal(size=8)]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    catalog = LakeCatalog(spark, warehouse)
    corpus = mk(80, 0)
    idx = build_vector_index(
        catalog, "ann", "cidx", corpus,
        centroids=fixed_centroids(corpus, n_centroids=4),
    )
    extra = mk(40, 80)
    append_vectors(idx, extra)  # second load: small files per list
    idx = catalog.load_table("ann", "cidx")
    compact_table(idx, target_file_bytes=1 << 20)
    idx = catalog.load_table("ann", "cidx")
    snap = idx.snapshot()
    assert all(f.partition.get("centroid") is not None for f in snap.files)
    one = int(snap.files[0].partition["centroid"])
    _, planned = idx._select_files(snap, [("centroid", "in", [one])])
    assert 0 < len(planned) < len(snap.files)
    both = corpus.unionByName(extra)
    queries = corpus.filter("vec_id < 3")
    got = sorted(
        (r.query_id, r.rank, r.neighbor_id, round(r.cosine, 9))
        for r in ivf_topk_persisted(queries, idx, k=5, nprobe=4).collect()
    )
    exact = sorted(
        (r.query_id, r.rank, r.neighbor_id, round(r.cosine, 9))
        for r in cosine_topk_bruteforce(queries, both, k=5).collect()
    )
    assert got == exact


def test_update_where_and_zorder_keep_partition_tuples(spark, warehouse):
    """The other full/partial-rewrite paths hold the partition layout too:
    update_where's new image files and rewrite_zorder's clustered files
    all carry their partition tuples."""
    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    hints = {"cat": {"x-partition": True}}
    writer.write(
        TableSpec(name="up", write_disposition="append", column_hints=hints),
        spark.createDataFrame(
            [(i, "ab"[i % 2], float(i)) for i in range(20)],
            "id long, cat string, v double",
        ),
        load_id="l0",
    )
    t = catalog.load_table("ds", "up")
    t.update_where([("id", "<", 4)], {"v": 100.0})
    t = catalog.load_table("ds", "up")
    assert all(f.partition.get("cat") is not None for f in t.snapshot().files)
    got = {r.id: r.v for r in t.read().collect()}
    assert got[0] == 100.0 and got[3] == 100.0 and got[10] == 10.0
    # z-order rewrite on the partitioned table: tuples survive, data exact
    from dlt_iceberg_spark.lake.maintenance import rewrite_zorder

    rewrite_zorder(t, ["id", "v"])
    t = catalog.load_table("ds", "up")
    snap = t.snapshot()
    assert all(f.partition.get("cat") is not None for f in snap.files)
    _, planned = t._select_files(snap, [("cat", "=", "a")])
    assert planned and all(f.partition["cat"] == "a" for f in planned)
    assert {r.id: r.v for r in t.read().collect()} == got


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
    # everything too recent
    assert res == {"snapshots": 0, "data_files": 0, "clone_pinned_files": 0}
    assert len(loaded_table.snapshots()) == 5


# -- tags + rollback ---------------------------------------------------------


def test_tags_pin_snapshots_against_expiry(loaded_table):
    table = loaded_table
    tagged_v = table.current_version() - 2
    table.create_tag("audit", tagged_v)
    assert table.tags() == {"audit": tagged_v}
    # everything old enough to expire except current + tagged
    res = expire_snapshots(table, older_than=timedelta(seconds=0), keep_last=1)
    assert res["snapshots"] > 0
    kept = {s.version for s in table.snapshots()}
    assert tagged_v in kept
    # the tagged snapshot stays readable through the ref
    assert table.read(tag="audit").count() == table.snapshot(tagged_v).total_rows
    with pytest.raises(ValueError, match="already exists"):
        table.create_tag("audit")
    table.delete_tag("audit")
    with pytest.raises(ValueError, match="no such tag"):
        table.read(tag="audit")


def test_rollback_restores_old_state_as_new_snapshot(loaded_table):
    table = loaded_table
    v_before = table.current_version()
    rows_before = sorted(r.id for r in table.read().collect())
    target = v_before - 2  # before the last two appends
    snap = table.rollback(target)
    assert snap.version == v_before + 1 and snap.operation == "rollback"
    assert snap.summary["rolled-back-to"] == target
    got = sorted(r.id for r in table.read().collect())
    assert got == sorted(r.id for r in table.read(target).collect())
    assert len(got) < len(rows_before)
    # history preserved: time travel to the pre-rollback head still works
    assert sorted(r.id for r in table.read(v_before).collect()) == rows_before
    # refs metadata table
    table.create_tag("pre-fix", v_before)
    refs = {(r.name, r.type, r.version) for r in table.metadata_df("refs").collect()}
    assert ("pre-fix", "tag", v_before) in refs
    assert ("main", "branch", table.current_version()) in refs
    # rollback to current is a no-op
    assert table.rollback(table.current_version()).version == table.current_version()


# -- orphan file cleanup -----------------------------------------------------


def _backdate(path, days=10):
    old = os.path.getmtime(path) - days * 86400
    os.utime(path, (old, old))


def test_remove_orphans_deletes_only_old_unreferenced(loaded_table, spark):
    table = loaded_table
    # crashed write: staged data files, never committed
    orphans = table.stage_dataframe(spark.range(5).coalesce(1))
    live_before = table.read().count()
    # grace window: nothing old enough yet
    assert remove_orphan_files(table) == {
        "data_files": [],
        "staging_dirs": [],
        "metadata_files": [],
    }
    for f in orphans:
        _backdate(os.path.join(table.location, f.path))
    # dry run reports but keeps the files
    report = remove_orphan_files(table, dry_run=True)
    assert sorted(report["data_files"]) == sorted(f.path for f in orphans)
    assert all(os.path.exists(os.path.join(table.location, f.path)) for f in orphans)
    # real run deletes them; referenced files survive even when old
    for f in table.snapshot().files:
        _backdate(os.path.join(table.location, f.path))
    report = remove_orphan_files(table)
    assert sorted(report["data_files"]) == sorted(f.path for f in orphans)
    assert not any(os.path.exists(os.path.join(table.location, f.path)) for f in orphans)
    assert table.read().count() == live_before


def test_remove_orphans_recovers_crashed_commit(loaded_table):
    table = loaded_table
    current = table.current_version()
    # simulate a committer that wrote its manifest but died before the
    # pointer rename: unreachable from any ref, and commits number PAST it
    # (global max+1) rather than colliding with it
    stale = os.path.join(table._meta_dir, f"v{current + 1:06d}.json")
    with open(stale, "w") as fh:
        fh.write("{}")
    snap = table.snapshot()
    committed = table.commit(snap.files, snap.schema, "append", current)
    assert committed.version == current + 2
    # within grace: untouched (could be a concurrent commit about to land)
    assert remove_orphan_files(table)["metadata_files"] == []
    _backdate(stale)
    report = remove_orphan_files(table)
    assert report["metadata_files"] == [f"metadata/v{current + 1:06d}.json"]
    assert table.current_version() == current + 2


def test_remove_orphans_cleans_staging_dirs(loaded_table):
    table = loaded_table
    staging = os.path.join(table.location, "_staging_deadbeef")
    os.makedirs(staging)
    with open(os.path.join(staging, "part-0.parquet"), "w") as fh:
        fh.write("x")
    _backdate(staging)
    report = remove_orphan_files(table)
    assert report["staging_dirs"] == ["_staging_deadbeef"]
    assert not os.path.exists(staging)


# -- z-order rewrite ---------------------------------------------------------


def test_zorder_rewrite_enables_multicolumn_pruning(spark, warehouse):
    from pyspark.sql import functions as F

    from dlt_iceberg_spark.lake.maintenance import rewrite_zorder

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "main")
    # two independent dimensions; hash-random layout -> every file spans the
    # full range of both x and y, so min/max pruning is useless
    df = (
        spark.range(20000)
        .select(
            "id",
            (F.col("id") % 100).cast("int").alias("x"),
            ((F.col("id") * 37) % 100).cast("int").alias("y"),
        )
        .repartition(8)
    )
    writer.write(TableSpec(name="z", write_disposition="append"), df, load_id="l0")
    table = catalog.load_table("main", "z")
    before = table.snapshot()
    assert len(table.prune_files(before, "x", 10, 19)[0]) == len(before.files)
    assert len(table.prune_files(before, "y", 10, 19)[0]) == len(before.files)

    total = sum(f.bytes for f in before.files)
    res = rewrite_zorder(table, ["x", "y"], target_file_bytes=total // 16)
    after = table.snapshot()
    assert after.operation == "replace" and after.summary["zorder"] == "x,y"
    assert res.output_files == len(after.files) >= 8

    # a ~10%-wide probe on EITHER column now skips most files
    hits_x = len(table.prune_files(after, "x", 10, 19)[0])
    hits_y = len(table.prune_files(after, "y", 10, 19)[0])
    assert hits_x <= len(after.files) * 0.6
    assert hits_y <= len(after.files) * 0.6
    # data unchanged
    assert sorted(r.id for r in table.read().collect()) == list(range(20000))


def test_zorder_rejects_unorderable_columns(spark, warehouse):
    from dlt_iceberg_spark.lake.maintenance import rewrite_zorder

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "main")
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    writer.write(TableSpec(name="zs", write_disposition="append"), df, load_id="l0")
    table = catalog.load_table("main", "zs")
    with pytest.raises(ValueError, match="cannot zorder"):
        rewrite_zorder(table, ["s"])
    with pytest.raises(ValueError, match="no such column"):
        rewrite_zorder(table, ["nope"])


def test_compute_stats_skips_commit_when_no_file_gains_a_sketch(spark, tmp_path):
    """A file that yields no groupBy(input_file_name) row (zero-row file)
    can never gain a sketch by rescan: ANALYZE must WARN and skip the
    commit instead of churning an 'analyze' snapshot per maintenance cycle
    while approx_distinct stays refused."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dlt_iceberg_spark.lake.maintenance import compute_table_stats
    from dlt_iceberg_spark.lake.table import DataFile, LakeTable

    loc = str(tmp_path / "t")
    t = LakeTable(spark, loc)
    df = spark.range(10).withColumnRenamed("id", "k")
    files = t.stage_dataframe(df)
    # a zero-row parquet file committed alongside: valid, but no scan row
    os.makedirs(os.path.join(loc, "data"), exist_ok=True)
    empty_rel = "data/empty-000.parquet"
    pq.write_table(
        pa.table({"k": pa.array([], type=pa.int64())}),
        os.path.join(loc, empty_rel),
    )
    files = files + [DataFile(path=empty_rel, rows=0, bytes=64)]
    t.commit(files, df.schema, "create", None)
    v0 = t.current_version()
    with pytest.warns(UserWarning, match="no sketch row"):
        n1 = compute_table_stats(t, ["k"])
    # nothing gained on the zero-row file alone → no commit either time
    assert n1 >= 1  # first pass sketches the real file
    v1 = t.current_version()
    assert v1 == v0 + 1
    with pytest.warns(UserWarning, match="no sketch row"):
        n2 = compute_table_stats(t, ["k"])
    assert n2 == 0
    assert t.current_version() == v1  # no churn: version unchanged


def test_maintain_runs_full_cycle(spark, tmp_path):
    """One-call upkeep: folds MoR deletes past the threshold, compacts
    small files, expires old snapshots, sweeps crashed-commit leftovers —
    and reports each step."""
    from datetime import timedelta

    from dlt_iceberg_spark.lake.maintenance import MaintenancePolicy, maintain
    from dlt_iceberg_spark.lake.table import LakeTable

    loc = str(tmp_path / "t")
    t = LakeTable(spark, loc)
    df = spark.range(100).withColumnRenamed("id", "k")
    t.commit(t.stage_dataframe(df.repartition(8)), df.schema, "create", None)
    # outstanding equality deletes over the fold threshold
    for i in range(3):
        dfiles = t.stage_delete_files(
            spark.createDataFrame([(i,)], "k long"), ["k"]
        )
        snap = t.snapshot()
        t.commit(
            None, snap.schema, "merge-mor", snap.version,
            manifests=snap.manifests, new_files=snap.inline_files,
            delete_files=list(snap.delete_files) + dfiles,
        )
    # a crashed commit's staging dir
    import os
    os.makedirs(os.path.join(loc, "_staging_dead"), exist_ok=True)
    with open(os.path.join(loc, "_staging_dead", "x.parquet"), "w") as fh:
        fh.write("junk")

    report = maintain(
        t,
        MaintenancePolicy(
            fold_deletes_over=2,
            expire_older_than=timedelta(seconds=0),
            keep_last_snapshots=1,
            orphans_older_than=timedelta(seconds=0),
        ),
    )
    assert report["folded_delete_files"] == 3
    assert report["compaction"]["output_files"] >= 1
    assert report["expired"]["snapshots"] >= 1
    assert not t.snapshot().delete_files
    assert sorted(r.k for r in t.read().collect()) == list(range(3, 100))
    # staging dir swept
    assert not os.path.exists(os.path.join(loc, "_staging_dead"))


def test_consolidate_position_deletes_merges_and_drops_dangling(spark, tmp_path):
    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.maintenance import consolidate_position_deletes
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec

    catalog = LakeCatalog(spark, str(tmp_path / "wh"))
    writer = LakeWriter(catalog, "ds")
    writer.write(
        TableSpec(name="t", write_disposition="append"),
        spark.createDataFrame([(i, i) for i in range(20)], "id long, v long"),
        load_id="l0",
    )
    t = catalog.load_table("ds", "t")
    # three separate position-delete commits -> three mask files
    for lo, hi in ((0, 2), (2, 4), (4, 6)):
        t.position_delete_where([("v", ">=", lo), ("v", "<", hi)])
        t = catalog.load_table("ds", "t")
    n_masks = len([d for d in t.snapshot().delete_files if d.content == "position"])
    assert n_masks >= 3  # one mask file per delete commit (or more: one per partition)
    before = sorted(r.v for r in t.read().collect())

    report = consolidate_position_deletes(t)
    assert report["consolidated"] == n_masks and report["addresses"] == 6
    t = catalog.load_table("ds", "t")
    pos = [d for d in t.snapshot().delete_files if d.content == "position"]
    assert len(pos) == 1  # one mask file now
    assert sorted(r.v for r in t.read().collect()) == before  # row set unchanged
    # data files untouched (zero-rewrite guarantee)
    assert t.snapshot().summary.get("consolidated-delete-files") == n_masks
    # changelog passes straight through the consolidation snapshot
    ch = t.read_changes(t.snapshot().parent)
    assert ch.count() == 0


def test_consolidation_after_cow_rewrite_drops_dangling_addresses(spark, tmp_path):
    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.maintenance import consolidate_position_deletes
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec

    catalog = LakeCatalog(spark, str(tmp_path / "wh"))
    writer = LakeWriter(catalog, "ds")
    writer.write(
        TableSpec(name="t", write_disposition="append"),
        spark.createDataFrame([(i, f"v{i}") for i in range(10)], "id long, val string"),
        load_id="l0",
    )
    t = catalog.load_table("ds", "t")
    t.position_delete_where([("id", "=", 3)])
    t.position_delete_where([("id", "=", 4)])
    # CoW upsert rewrites the file(s) holding the addressed rows: the old
    # addresses dangle (their target path leaves the live set)
    writer.write(
        TableSpec(
            name="t",
            write_disposition={"disposition": "merge", "strategy": "upsert"},
            primary_key=["id"],
        ),
        spark.createDataFrame([(5, "FIVE")], "id long, val string"),
        load_id="l1",
    )
    t = catalog.load_table("ds", "t")
    before = sorted((r.id, r.val) for r in t.read().collect())
    report = consolidate_position_deletes(t)
    t = catalog.load_table("ds", "t")
    assert sorted((r.id, r.val) for r in t.read().collect()) == before
    assert report["dropped"] >= 0


def test_sort_order_recorded_and_compaction_preserves_clustering(spark, warehouse):
    """The declared sort order is TABLE metadata: compaction must re-sort
    its binpacked rewrite by it, or the disjoint per-file ranges every
    selective scan depends on silently die at the first maintenance run."""
    from pyspark.sql import functions as F

    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.maintenance import compact_table
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ns")
    spec = TableSpec(
        name="t", write_disposition="append", sort_order=["k"], sort_buckets=4
    )
    # several small appends -> small-file debt, each load range-clustered
    for i in range(4):
        writer.write(
            spec,
            spark.range(i * 1000, (i + 1) * 1000).select(
                (F.col("id") % 4000).alias("k"), F.col("id").alias("v")
            ),
        )
    t = catalog.load_table("ns", "t")
    assert t.snapshot().properties["write.sort-order"] == "k"
    # target sized so the binpack emits MULTIPLE outputs (the disjointness
    # claim is vacuous on a single file)
    res = compact_table(t, target_file_bytes=30_000)
    assert res.rewritten_files > 1
    snap = t.snapshot()
    assert len(snap.files) > 1
    # compacted files must carry DISJOINT k-ranges (clustering preserved)
    ranges = sorted(tuple(f.stats["k"]) for f in snap.files)
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlap after compaction: {ranges}"
    # and a selective scan must open only a fraction of the files
    _, picked = t._select_files(snap, [("k", "<", 500)])
    assert len(picked) < len(snap.files)


def test_compaction_without_sort_order_binpacks_plain(spark, warehouse):
    from pyspark.sql import functions as F

    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.maintenance import compact_table
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ns")
    for i in range(3):
        writer.write(
            TableSpec(name="t", write_disposition="append"),
            spark.range(i * 100, (i + 1) * 100).select(F.col("id").alias("k")),
        )
    t = catalog.load_table("ns", "t")
    assert "write.sort-order" not in t.snapshot().properties
    res = compact_table(t, target_file_bytes=1 << 30)
    assert res.rewritten_files >= 2  # plain binpack still works


def test_sort_order_declared_on_existing_table_via_evolution_commit(spark, warehouse):
    from pyspark.sql import functions as F

    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ns")
    df = spark.range(100).select(F.col("id").alias("k"))
    writer.write(TableSpec(name="t", write_disposition="append"), df)
    writer.write(
        TableSpec(name="t", write_disposition="append", sort_order=["k"]), df
    )
    t = catalog.load_table("ns", "t")
    assert t.snapshot().properties["write.sort-order"] == "k"


def test_export_emits_declared_sort_order(spark, warehouse):
    import json
    import os

    from pyspark.sql import functions as F

    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ns")
    writer.write(
        TableSpec(name="t", write_disposition="append", sort_order=["k"]),
        spark.range(50).select(F.col("id").alias("k"), F.lit("x").alias("s")),
    )
    t = catalog.load_table("ns", "t")
    meta = json.loads(open(t.export_iceberg_metadata()).read())
    order = meta["sort-orders"][0]
    assert meta["default-sort-order-id"] == order["order-id"] == 1
    [fld] = order["fields"]
    snap = t.snapshot()
    assert fld["source-id"] == snap.field_ids["k"]
    assert fld["transform"] == "identity" and fld["direction"] == "asc"


def test_compaction_preserves_zorder_clustering(spark, warehouse):
    """rewrite_zorder records write.zorder-by; a later binpack re-applies
    the z-order instead of interleaving the hypercubes."""
    from pyspark.sql import functions as F

    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.maintenance import compact_table, rewrite_zorder
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ns")
    df = spark.range(20000).select(
        (F.col("id") % 100).cast("int").alias("x"),
        ((F.col("id") * 37) % 100).cast("int").alias("y"),
    )
    writer.write(TableSpec(name="t", write_disposition="append"), df)
    t = catalog.load_table("ns", "t")
    total = sum(f.bytes for f in t.snapshot().files)
    rewrite_zorder(t, ["x", "y"], target_file_bytes=total // 16)
    assert t.snapshot().properties["write.zorder-by"] == "x,y"

    def frac(sn, col):
        return len(t.prune_files(sn, col, 10, 19)[0]) / len(sn.files)

    snap = t.snapshot()
    assert frac(snap, "x") <= 0.6 and frac(snap, "y") <= 0.6
    # hash-random small appends create debt spanning the full key space;
    # the binpack must RE-zorder or multi-column pruning dies
    for i in range(3):
        writer.write(
            TableSpec(name="t", write_disposition="append"),
            spark.range(2000).select(
                (F.col("id") % 100).cast("int").alias("x"),
                ((F.col("id") * 37) % 100).cast("int").alias("y"),
            ),
        )
    compact_table(t, target_file_bytes=total // 16)
    after = t.snapshot()
    assert len(after.files) >= 8
    # the binpacked portion is small (3 micro-appends), so its files span
    # wider z-ranges than the bulk rewrite's — selectivity stays strong on
    # BOTH columns (an un-zordered binpack would sit at ~1.0)
    assert frac(after, "x") <= 0.75 and frac(after, "y") <= 0.75
