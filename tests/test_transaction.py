"""Multi-table transactions: atomic publish, rollback, conflicts, and
crash recovery (intent-log roll-forward), in both pointer modes.

The invariant: across any interleaving of staged writes, crashes between
pointer flips, and recovery, readers of main end up seeing either EVERY
table of a transaction published or NONE — and a transaction whose fork
point was overtaken publishes nothing.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from dlt_iceberg_spark.errors import CommitConflictError, TableNotFoundError
from dlt_iceberg_spark.lake.catalog import LakeCatalog
from dlt_iceberg_spark.lake.transaction import (
    CatalogTransaction,
    TransactionError,
    _flip_main,
    recover_transactions,
)
from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec


def _df(spark, rows, schema="id long, v string"):
    return spark.createDataFrame(rows, schema)


@pytest.fixture
def catalog(spark, warehouse):
    return LakeCatalog(spark, warehouse)


def _seed(catalog, spark):
    w = LakeWriter(catalog, "ds")
    w.write(
        TableSpec(name="fact", write_disposition="append", primary_key=["id"]),
        _df(spark, [(1, "a"), (2, "b")]),
        load_id="seed",
    )
    return catalog.load_table("ds", "fact")


def test_commit_publishes_every_table_or_none(spark, catalog):
    fact = _seed(catalog, spark)
    v0 = fact.current_version()
    txn = catalog.transaction("ds")
    txn.write(
        TableSpec(name="fact", write_disposition="append", primary_key=["id"]),
        _df(spark, [(3, "c")]),
    )
    txn.write(
        TableSpec(name="dims", write_disposition="append", primary_key=["id"]),
        _df(spark, [(10, "x")]),
    )
    # nothing visible on main before commit: fact unchanged, dims empty
    assert catalog.load_table("ds", "fact").current_version() == v0
    assert catalog.load_table("ds", "fact").read().count() == 2
    assert catalog.load_table("ds", "dims").read().count() == 0  # stage-create
    res = txn.commit()
    assert sorted(res["tables"]) == ["dims", "fact"]
    assert catalog.load_table("ds", "fact").read().count() == 3
    assert catalog.load_table("ds", "dims").read().count() == 1
    # intent cleaned up, branch refs gone
    assert not catalog._io.isdir(os.path.join(catalog.warehouse, "_txns")) or \
        catalog._io.listdir(os.path.join(catalog.warehouse, "_txns")) == []
    assert "txn-" not in " ".join(catalog.load_table("ds", "fact").branches())


def test_rollback_discards_staging_and_created_tables(spark, catalog):
    fact = _seed(catalog, spark)
    v0 = fact.current_version()
    txn = catalog.transaction("ds")
    txn.write(
        TableSpec(name="fact", write_disposition="append", primary_key=["id"]),
        _df(spark, [(3, "c")]),
    )
    txn.write(
        TableSpec(name="dims", write_disposition="append", primary_key=["id"]),
        _df(spark, [(10, "x")]),
    )
    txn.rollback()
    assert catalog.load_table("ds", "fact").current_version() == v0
    assert catalog.load_table("ds", "fact").read().count() == 2
    with pytest.raises(TableNotFoundError):
        catalog.load_table("ds", "dims")
    with pytest.raises(TransactionError):
        txn.commit()


def test_conflict_when_any_table_overtaken(spark, catalog):
    _seed(catalog, spark)
    txn = catalog.transaction("ds")
    txn.write(
        TableSpec(name="fact", write_disposition="append", primary_key=["id"]),
        _df(spark, [(3, "c")]),
    )
    txn.write(
        TableSpec(name="other", write_disposition="append", primary_key=["id"]),
        _df(spark, [(1, "z")]),
    )
    # a foreign writer lands on fact's main between stage and publish
    LakeWriter(catalog, "ds").write(
        TableSpec(name="fact", write_disposition="append", primary_key=["id"]),
        _df(spark, [(99, "zz")]),
        load_id="foreign",
    )
    with pytest.raises(CommitConflictError, match="fork"):
        txn.commit()
    # nothing published: fact holds only the foreign row, other is empty
    assert catalog.load_table("ds", "fact").read().count() == 3
    assert catalog.load_table("ds", "other").read().count() == 0
    txn.rollback()


def test_row_level_ops_ride_the_transaction_branch(spark, catalog):
    _seed(catalog, spark)
    txn = catalog.transaction("ds")
    txn.table("fact").update_where([("id", "=", 1)], {"v": "UPDATED"})
    main_vals = {
        r.id: r.v for r in catalog.load_table("ds", "fact").read().collect()
    }
    assert main_vals[1] == "a"  # invisible pre-commit
    txn.commit()
    vals = {r.id: r.v for r in catalog.load_table("ds", "fact").read().collect()}
    assert vals[1] == "UPDATED"


def test_context_manager_commits_on_success_rolls_back_on_error(spark, catalog):
    _seed(catalog, spark)
    with catalog.transaction("ds") as txn:
        txn.write(
            TableSpec(name="fact", write_disposition="append", primary_key=["id"]),
            _df(spark, [(3, "c")]),
        )
    assert catalog.load_table("ds", "fact").read().count() == 3
    with pytest.raises(RuntimeError, match="boom"):
        with catalog.transaction("ds") as txn:
            txn.write(
                TableSpec(
                    name="fact", write_disposition="append", primary_key=["id"]
                ),
                _df(spark, [(4, "d")]),
            )
            raise RuntimeError("boom")
    assert catalog.load_table("ds", "fact").read().count() == 3


def test_empty_transaction_commit_is_noop(spark, catalog):
    _seed(catalog, spark)
    txn = catalog.transaction("ds")
    txn.table("fact")  # tracked, never written
    assert txn.commit() == {"txn": txn.txn_id, "tables": []}


def test_crash_mid_publish_rolls_forward_on_recovery(spark, catalog, monkeypatch):
    _seed(catalog, spark)
    w = LakeWriter(catalog, "ds")
    w.write(
        TableSpec(name="second", write_disposition="append", primary_key=["id"]),
        _df(spark, [(1, "s")]),
        load_id="seed2",
    )
    txn = catalog.transaction("ds")
    for name, row in (("fact", (3, "c")), ("second", (2, "t"))):
        txn.write(
            TableSpec(name=name, write_disposition="append", primary_key=["id"]),
            _df(spark, [row]),
        )
    # crash after the FIRST pointer flip
    import dlt_iceberg_spark.lake.transaction as txn_mod

    real_flip = txn_mod._flip_main
    calls = {"n": 0}

    def dying_flip(table, expected, to):
        if calls["n"] >= 1:
            raise OSError("simulated crash")
        calls["n"] += 1
        real_flip(table, expected, to)

    monkeypatch.setattr(txn_mod, "_flip_main", dying_flip)
    with pytest.raises(OSError, match="simulated crash"):
        txn.commit()
    monkeypatch.setattr(txn_mod, "_flip_main", real_flip)
    # torn state: exactly one of the two tables published, intent retained
    counts = [
        catalog.load_table("ds", n).read().count() for n in ("fact", "second")
    ]
    assert sorted(counts) == [1, 3] or sorted(counts) == [2, 3]
    txn_dir = os.path.join(catalog.warehouse, "_txns")
    assert len(catalog._io.listdir(txn_dir)) == 1
    # recovery (run implicitly by the next transaction()) rolls FORWARD
    results = recover_transactions(catalog)
    assert results and results[0]["action"] == "rolled-forward"
    assert catalog.load_table("ds", "fact").read().count() == 3
    assert catalog.load_table("ds", "second").read().count() == 2
    assert catalog._io.listdir(txn_dir) == []
    # idempotent: nothing pending on a second pass
    assert recover_transactions(catalog) == []


def test_recovery_blocks_on_foreign_write_over_unflipped_table(
    spark, catalog, monkeypatch
):
    _seed(catalog, spark)
    w = LakeWriter(catalog, "ds")
    w.write(
        TableSpec(name="second", write_disposition="append", primary_key=["id"]),
        _df(spark, [(1, "s")]),
        load_id="seed2",
    )
    txn = catalog.transaction("ds")
    for name, row in (("fact", (3, "c")), ("second", (2, "t"))):
        txn.write(
            TableSpec(name=name, write_disposition="append", primary_key=["id"]),
            _df(spark, [row]),
        )
    import dlt_iceberg_spark.lake.transaction as txn_mod

    real_flip = txn_mod._flip_main
    calls = {"n": 0}

    def dying_flip(table, expected, to):
        if calls["n"] >= 1:
            raise OSError("simulated crash")
        calls["n"] += 1
        real_flip(table, expected, to)

    monkeypatch.setattr(txn_mod, "_flip_main", dying_flip)
    with pytest.raises(OSError):
        txn.commit()
    monkeypatch.setattr(txn_mod, "_flip_main", real_flip)
    # a foreign writer overwrites the NOT-yet-flipped table
    flipped_first = (
        catalog.load_table("ds", "fact").read().count() == 3
    )
    victim = "second" if flipped_first else "fact"
    LakeWriter(catalog, "ds").write(
        TableSpec(name=victim, write_disposition="append", primary_key=["id"]),
        _df(spark, [(77, "foreign")]),
        load_id="foreign",
    )
    results = recover_transactions(catalog)
    assert results and results[0]["action"] == "blocked"
    assert results[0]["blocked"] == [victim]
    # intent kept for the operator
    txn_dir = os.path.join(catalog.warehouse, "_txns")
    assert len(catalog._io.listdir(txn_dir)) == 1


def test_rest_catalog_multi_ref_cas_is_indivisible(spark, tmp_path):
    from dlt_iceberg_spark.lake.pointers import MockCatalogServer

    server = MockCatalogServer()
    url = server.start()
    try:
        catalog = LakeCatalog(spark, str(tmp_path / "wh"), pointer_catalog_url=url)
        _seed(catalog, spark)
        txn = catalog.transaction("ds")
        txn.write(
            TableSpec(name="fact", write_disposition="append", primary_key=["id"]),
            _df(spark, [(3, "c")]),
        )
        txn.write(
            TableSpec(name="dims", write_disposition="append", primary_key=["id"]),
            _df(spark, [(10, "x")]),
        )
        txn.commit()
        assert catalog.load_table("ds", "fact").read().count() == 3
        assert catalog.load_table("ds", "dims").read().count() == 1

        # the server CAS is all-or-nothing: one stale change rejects the
        # WHOLE batch, leaving even the valid change unapplied
        from dlt_iceberg_spark.lake.pointers import rest_commit_transaction

        fact_store = catalog._pointer_store_for(
            catalog.table_location("ds", "fact")
        )
        dims_store = catalog._pointer_store_for(
            catalog.table_location("ds", "dims")
        )
        fact_head, dims_head = fact_store.get("main"), dims_store.get("main")
        ok = rest_commit_transaction(
            url,
            [
                {
                    "table": catalog.table_location("ds", "fact"),
                    "ref": "main",
                    "expected": fact_head,
                    "new": fact_head + 1,
                },
                {
                    "table": catalog.table_location("ds", "dims"),
                    "ref": "main",
                    "expected": dims_head + 41,  # stale
                    "new": dims_head + 42,
                },
            ],
        )
        assert ok is False
        assert fact_store.get("main") == fact_head  # valid change NOT applied
        assert dims_store.get("main") == dims_head

        # a foreign write between stage and publish fails the transaction
        txn2 = catalog.transaction("ds")
        txn2.write(
            TableSpec(name="fact", write_disposition="append", primary_key=["id"]),
            _df(spark, [(4, "d")]),
        )
        LakeWriter(catalog, "ds").write(
            TableSpec(name="fact", write_disposition="append", primary_key=["id"]),
            _df(spark, [(99, "zz")]),
            load_id="foreign",
        )
        with pytest.raises(CommitConflictError):
            txn2.commit()
        # nothing flipped by the failed transaction
        assert catalog.load_table("ds", "fact").read().count() == 4
    finally:
        server.stop()


@pytest.mark.slow
def test_pipeline_transactional_run_is_all_or_nothing(spark, warehouse):
    from dlt_iceberg_spark.lake.pipeline import Pipeline, Resource

    p = Pipeline(spark, warehouse, dataset_name="ds")

    def good():
        return spark.createDataFrame([(1, "a")], "id long, v string")

    def bad():
        raise RuntimeError("extract exploded")

    with pytest.raises(RuntimeError, match="extract exploded"):
        p.run(
            Resource(good, "t1", "append", ["id"]),
            Resource(bad, "t2", "append", ["id"]),
            load_id="l0",
            transactional=True,
        )
    # nothing published, load not recorded
    with pytest.raises(TableNotFoundError):
        p.catalog.load_table("ds", "t1")
    assert not p.state.load_recorded("l0")

    info = p.run(
        Resource(good, "t1", "append", ["id"]),
        Resource(
            lambda: spark.createDataFrame([(2, "b")], "id long, v string"),
            "t2",
            "append",
            ["id"],
        ),
        load_id="l1",
        transactional=True,
    )
    assert sorted(info.tables) == ["t1", "t2"]
    assert p.catalog.load_table("ds", "t1").read().count() == 1
    assert p.catalog.load_table("ds", "t2").read().count() == 1
    assert p.state.load_recorded("l1")
    # idempotent replay
    assert p.run(
        Resource(good, "t1", "append", ["id"]),
        load_id="l1",
        transactional=True,
    ).already_loaded


def test_pipeline_transactional_refuses_wap_branch(spark, warehouse):
    from dlt_iceberg_spark.lake.pipeline import Pipeline, Resource

    p = Pipeline(spark, warehouse, dataset_name="ds", branch="audit")
    with pytest.raises(ValueError, match="transactional"):
        p.run(
            Resource(
                lambda: spark.createDataFrame([(1, "a")], "id long, v string"),
                "t1",
                "append",
                ["id"],
            ),
            transactional=True,
        )


@pytest.mark.slow
def test_property_random_txn_interleavings_match_model(spark, warehouse, monkeypatch):
    """30 seeded rounds of {stage-on-1..3-tables, commit | rollback |
    foreign-write-then-conflict | crash-mid-publish-then-recover} must
    leave every table equal to a pure-Python model at every settle point:
    a transaction lands in the model all-or-nothing."""
    import random

    import dlt_iceberg_spark.lake.transaction as txn_mod

    rng = random.Random(7)
    catalog = LakeCatalog(spark, warehouse)
    w = LakeWriter(catalog, "ds")
    tables = ["t0", "t1", "t2"]
    model: dict[str, set] = {}
    next_id = [0]

    def batch(n=2):
        rows = [(next_id[0] + i, f"r{next_id[0] + i}") for i in range(n)]
        next_id[0] += n
        return rows

    def foreign(name):
        rows = batch(1)
        w.write(
            TableSpec(name=name, write_disposition="append", primary_key=["id"]),
            _df(spark, rows),
            load_id=f"f{next_id[0]}",
        )
        model.setdefault(name, set()).update(rows)

    def settle_check():
        for name, expect in model.items():
            got = {
                (r.id, r.v)
                for r in catalog.load_table("ds", name).read().collect()
            }
            assert got == expect, (name, got ^ expect)

    real_flip = txn_mod._flip_main
    for rnd_i in range(30):
        action = rng.choice(["commit", "commit", "rollback", "conflict", "crash"])
        touched = rng.sample(tables, rng.randint(1, 3))
        txn = catalog.transaction("ds")
        staged: dict[str, list] = {}
        for name in touched:
            rows = batch(rng.randint(1, 3))
            staged[name] = rows
            txn.write(
                TableSpec(
                    name=name, write_disposition="append", primary_key=["id"]
                ),
                _df(spark, rows),
            )
        if action == "rollback":
            txn.rollback()
            # created-but-rolled-back tables leave the catalog
            for name in touched:
                if name not in model and catalog.table_exists("ds", name):
                    raise AssertionError(f"{name} should have been dropped")
        elif action == "conflict":
            victim = rng.choice(touched)
            if victim not in model:
                # foreign write CREATES the table the txn also created ->
                # writer appends on main past the fork
                pass
            foreign(victim)
            try:
                txn.commit()
                raise AssertionError("expected CommitConflictError")
            except CommitConflictError:
                pass
            txn.rollback() if txn._state == "open" else None
        elif action == "crash":
            kill_at = rng.randint(0, max(0, len(touched) - 1))
            calls = {"n": 0}

            def dying(table, expected, to, _k=kill_at, _c=calls):
                if _c["n"] == _k:
                    raise OSError("crash")
                _c["n"] += 1
                real_flip(table, expected, to)

            monkeypatch.setattr(txn_mod, "_flip_main", dying)
            try:
                txn.commit()
                committed = True
            except OSError:
                committed = False
            monkeypatch.setattr(txn_mod, "_flip_main", real_flip)
            res = recover_transactions(catalog)
            if not committed:
                assert res and res[0]["action"] in ("rolled-forward", "completed")
            # intent-logged: the txn lands fully (roll-forward semantics)
            for name, rows in staged.items():
                model.setdefault(name, set()).update(rows)
        else:
            txn.commit()
            for name, rows in staged.items():
                model.setdefault(name, set()).update(rows)
        # occasionally interleave plain foreign writes
        if rng.random() < 0.3:
            foreign(rng.choice(tables))
        settle_check()


def test_rollback_spares_created_table_with_foreign_commits(spark, catalog):
    """A table this transaction created but a foreign writer has since
    committed to is NOT dropped on rollback — only our branch is shed."""
    _seed(catalog, spark)
    txn = catalog.transaction("ds")
    txn.write(
        TableSpec(name="fresh", write_disposition="append", primary_key=["id"]),
        _df(spark, [(1, "staged")]),
    )
    LakeWriter(catalog, "ds").write(
        TableSpec(name="fresh", write_disposition="append", primary_key=["id"]),
        _df(spark, [(2, "foreign")]),
        load_id="foreign",
    )
    with pytest.raises(CommitConflictError):
        txn.commit()
    txn.rollback()
    rows = {r.v for r in catalog.load_table("ds", "fresh").read().collect()}
    assert rows == {"foreign"}


def test_orphan_cleanup_spares_open_transaction_staging(spark, catalog):
    """Files referenced only by an OPEN transaction's branch survive
    remove_orphan_files even with a zero grace window — branch-head
    reachability, not mtime, is what protects them."""
    from datetime import timedelta

    from dlt_iceberg_spark.lake.maintenance import remove_orphan_files

    _seed(catalog, spark)
    txn = catalog.transaction("ds")
    txn.write(
        TableSpec(name="fact", write_disposition="append", primary_key=["id"]),
        _df(spark, [(3, "c")]),
    )
    res = remove_orphan_files(
        catalog.load_table("ds", "fact"), older_than=timedelta(seconds=0)
    )
    assert res["data_files"] == [] and res["metadata_files"] == []
    txn.commit()
    assert catalog.load_table("ds", "fact").read().count() == 3


def test_transaction_spans_namespaces(spark, catalog):
    """One transaction can publish tables in DIFFERENT namespaces
    atomically (Iceberg REST commitTransaction spans namespaces)."""
    _seed(catalog, spark)
    txn = catalog.transaction("ds")
    txn.write(
        TableSpec(name="fact", write_disposition="append", primary_key=["id"]),
        _df(spark, [(3, "c")]),
    )
    txn.write(
        TableSpec(name="audit_log", write_disposition="append"),
        _df(spark, [(1, "created fact batch")]),
        namespace="ops",
    )
    assert catalog.load_table("ds", "fact").read().count() == 2
    res = txn.commit()
    assert sorted(res["tables"]) == ["audit_log", "fact"]
    assert catalog.load_table("ds", "fact").read().count() == 3
    assert catalog.load_table("ops", "audit_log").read().count() == 1


def test_abort_clears_blocked_intent(spark, catalog, monkeypatch):
    """After recovery reports `blocked`, abort_transaction discards the
    intent and branches; already-published tables stay, the blocked one
    keeps the foreign write."""
    from dlt_iceberg_spark.lake.transaction import abort_transaction

    _seed(catalog, spark)
    w = LakeWriter(catalog, "ds")
    w.write(
        TableSpec(name="second", write_disposition="append", primary_key=["id"]),
        _df(spark, [(1, "s")]),
        load_id="seed2",
    )
    txn = catalog.transaction("ds")
    for name, row in (("fact", (3, "c")), ("second", (2, "t"))):
        txn.write(
            TableSpec(name=name, write_disposition="append", primary_key=["id"]),
            _df(spark, [row]),
        )
    import dlt_iceberg_spark.lake.transaction as txn_mod

    real_flip = txn_mod._flip_main
    calls = {"n": 0}

    def dying_flip(table, expected, to):
        if calls["n"] >= 1:
            raise OSError("simulated crash")
        calls["n"] += 1
        real_flip(table, expected, to)

    monkeypatch.setattr(txn_mod, "_flip_main", dying_flip)
    with pytest.raises(OSError):
        txn.commit()
    monkeypatch.setattr(txn_mod, "_flip_main", real_flip)
    flipped_first = catalog.load_table("ds", "fact").read().count() == 3
    victim = "second" if flipped_first else "fact"
    LakeWriter(catalog, "ds").write(
        TableSpec(name=victim, write_disposition="append", primary_key=["id"]),
        _df(spark, [(77, "foreign")]),
        load_id="foreign",
    )
    assert recover_transactions(catalog)[0]["action"] == "blocked"
    res = abort_transaction(catalog, txn.txn_id)
    assert victim in res["discarded"] and len(res["kept_published"]) == 1
    # intent cleared: recovery has nothing pending, victim keeps foreign row
    assert recover_transactions(catalog) == []
    rows = {r.v for r in catalog.load_table("ds", victim).read().collect()}
    assert "foreign" in rows and ("c" not in rows and "t" not in rows)
    with pytest.raises(FileNotFoundError):
        abort_transaction(catalog, txn.txn_id)


def test_pending_transactions_lists_intents(spark, catalog, monkeypatch):
    from dlt_iceberg_spark.lake.transaction import (
        abort_transaction,
        pending_transactions,
    )

    _seed(catalog, spark)
    assert pending_transactions(catalog) == []
    txn = catalog.transaction("ds")
    txn.write(
        TableSpec(name="fact", write_disposition="append", primary_key=["id"]),
        _df(spark, [(3, "c")]),
    )
    import dlt_iceberg_spark.lake.transaction as txn_mod

    monkeypatch.setattr(
        txn_mod, "_flip_main",
        lambda *a: (_ for _ in ()).throw(OSError("crash")),
    )
    with pytest.raises(OSError):
        txn.commit()
    monkeypatch.undo()
    pending = pending_transactions(catalog)
    assert [p["txn"] for p in pending] == [txn.txn_id]
    assert pending[0]["entries"][0]["table"] == "fact"
    abort_transaction(catalog, txn.txn_id)
    assert pending_transactions(catalog) == []
