"""Branch (write-audit-publish) tests.

Iceberg branch semantics (SURVEY.md §4): writes on a branch are invisible
to main until fast-forward publish; maintenance must never eat a live
branch's snapshots or files.
"""

import os
from datetime import timedelta

import pytest

from dlt_iceberg_spark.errors import CommitConflictError
from dlt_iceberg_spark.lake.catalog import LakeCatalog
from dlt_iceberg_spark.lake.maintenance import expire_snapshots, remove_orphan_files
from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec


@pytest.fixture()
def table(spark, warehouse):
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "main")
    writer.write(
        TableSpec(name="t", write_disposition="append"),
        spark.range(0, 10).coalesce(1),
        load_id="l0",
    )
    return catalog.load_table("main", "t")


def _append_on(view, spark, lo, hi):
    snap = view.snapshot()
    files = view.stage_dataframe(spark.range(lo, hi).coalesce(1))
    return view.commit(snap.files + files, snap.schema, "append", snap.version)


def test_branch_write_is_invisible_to_main(table, spark):
    main_head = table.current_version()
    audit = table.for_branch("audit")
    # implicit fork: the branch starts at main's head
    assert audit.current_version() == main_head

    _append_on(audit, spark, 10, 20)

    assert table.current_version() == main_head
    assert sorted(r.id for r in table.read().collect()) == list(range(10))
    assert sorted(r.id for r in audit.read().collect()) == list(range(20))
    assert table.branches()["audit"] == audit.current_version() > main_head

    refs = {(r.name, r.type) for r in table.metadata_df("refs").collect()}
    assert {("main", "branch"), ("audit", "branch")} <= refs


def test_fast_forward_publishes_branch(table, spark):
    audit = table.for_branch("audit")
    _append_on(audit, spark, 10, 20)
    _append_on(audit, spark, 20, 30)

    published = table.fast_forward("audit")
    assert published == audit.current_version() == table.current_version()
    assert sorted(r.id for r in table.read().collect()) == list(range(30))
    # ancestry is intact: history walks back through the branch commits
    history = table.metadata_df("history").collect()
    assert [r.is_current for r in history].count(True) == 1


def test_fast_forward_rejects_diverged_branches(table, spark):
    audit = table.for_branch("audit")
    _append_on(audit, spark, 10, 20)
    _append_on(table, spark, 100, 110)  # main advances independently
    with pytest.raises(CommitConflictError, match="not an ancestor"):
        table.fast_forward("audit")
    # the other direction diverged too
    with pytest.raises(CommitConflictError, match="not an ancestor"):
        audit.fast_forward("main")


def test_concurrent_branch_commits_get_distinct_versions(table, spark):
    audit = table.for_branch("audit")
    s1 = _append_on(audit, spark, 10, 20)
    s2 = _append_on(table, spark, 100, 110)
    assert s1.version != s2.version
    assert sorted(r.id for r in audit.read().collect()) == list(range(20))
    assert (
        sorted(r.id for r in table.read().collect())
        == list(range(10)) + list(range(100, 110))
    )


def test_delete_branch(table, spark):
    audit = table.for_branch("audit")
    _append_on(audit, spark, 10, 20)
    table.delete_branch("audit")
    assert "audit" not in table.branches()
    with pytest.raises(ValueError):
        table.delete_branch("audit")
    with pytest.raises(ValueError):
        table.delete_branch("main")


def test_expire_protects_branch_heads(table, spark):
    audit = table.for_branch("audit")
    _append_on(audit, spark, 10, 20)
    _append_on(table, spark, 100, 110)
    _append_on(table, spark, 110, 120)

    expire_snapshots(table, older_than=timedelta(seconds=0), keep_last=1)

    # the branch survives expiry: head retained, data files still present
    assert sorted(r.id for r in audit.read().collect()) == list(range(20))
    assert sorted(r.id for r in table.read().collect()) == (
        list(range(10)) + list(range(100, 120))
    )


def test_orphan_cleanup_keeps_live_branch_but_reaps_dead_commits(table, spark):
    audit = table.for_branch("audit")
    _append_on(audit, spark, 10, 20)
    branch_head = audit.current_version()

    # a committer that died before the pointer rename: manifest present,
    # reachable from no ref
    meta = table._meta_dir
    dead = os.path.join(meta, "v000099.json")
    with open(os.path.join(meta, f"v{branch_head:06d}.json")) as fh:
        payload = fh.read()
    with open(dead, "w") as fh:
        fh.write(payload.replace(f'"version": {branch_head}', '"version": 99'))
    for name in os.listdir(meta):
        os.utime(os.path.join(meta, name), (0, 0))

    report = remove_orphan_files(table, older_than=timedelta(seconds=1))
    assert "metadata/v000099.json" in report["metadata_files"]
    assert not os.path.exists(dead)
    # live branch untouched
    assert sorted(r.id for r in audit.read().collect()) == list(range(20))
    assert not report["data_files"]


def test_position_delete_on_branch_then_publish(table, spark):
    """WAP-style audited deletes: position deletes land on a branch,
    main is untouched until fast-forward publishes the branch head."""
    main_head = table.current_version()
    audit = table.for_branch("audit")
    audit.position_delete_where([("id", "<", 3)])

    # branch sees the masked scan, main sees everything
    assert {r.id for r in audit.read().collect()} == set(range(3, 10))
    assert table.current_version() == main_head
    assert {r.id for r in table.read().collect()} == set(range(10))

    table.fast_forward("audit")
    assert {r.id for r in table.read().collect()} == set(range(3, 10))
    # published changelog carries the delete images
    ch = table.read_changes(main_head)
    assert sorted(r.id for r in ch.collect()) == [0, 1, 2]
    assert {r._change_type for r in ch.collect()} == {"delete"}
