"""State ledger semantics (FIXTURES.md F11; reference tests/test_with_state_sync.py,
test_load_metadata_resilience.py)."""

import pytest
from pyspark.sql import types as T

from dlt_iceberg_spark.lake.catalog import LakeCatalog
from dlt_iceberg_spark.lake.state import StateStore
from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec


@pytest.fixture()
def store(spark, warehouse):
    return StateStore(LakeCatalog(spark, warehouse), "ds")


def test_newest_schema_wins(store):
    store.store_schema("s", "h1", 1, {"v": 1})
    store.store_schema("s", "h2", 2, {"v": 2})
    store.store_schema("other", "h9", 9, {"v": 9})
    row = store.get_newest_schema("s")
    assert row.version == 2 and row.version_hash == "h2"


def test_schema_lookup_by_hash_exact(store):
    store.store_schema("s", "abc", 1, {"v": 1})
    assert store.get_schema_by_hash("abc").schema_name == "s"
    assert store.get_schema_by_hash("missing") is None


def test_store_schema_idempotent_by_hash(store):
    assert store.store_schema("s", "h1", 1, {}) is True
    assert store.store_schema("s", "h1", 1, {}) is False
    df = store.catalog.load_table("ds", "_dlt_version").read()
    assert df.count() == 1


def test_load_ledger_idempotent(store):
    assert store.store_completed_load("load-1", "s", "h1") is True
    assert store.load_recorded("load-1")
    assert store.store_completed_load("load-1", "s", "h1") is False
    df = store.catalog.load_table("ds", "_dlt_loads").read()
    assert df.count() == 1
    assert df.collect()[0].status == 0


def test_newest_pipeline_state_wins(store):
    store.store_pipeline_state("p", {"n": 1}, version=1)
    store.store_pipeline_state("p", {"n": 2}, version=2)
    row = store.get_stored_state("p")
    assert '"n": 2' in row.state
    assert store.get_stored_state("missing") is None


def test_derive_schema_from_tables_fallback(spark, warehouse):
    """M1 fallback (destination_client.py:435-525): no _dlt_version → derive
    from live tables, skipping _dlt_*."""
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    writer.write(
        TableSpec("users"),
        spark.createDataFrame([(1, "a")], "user_id long, name string"),
    )
    store = StateStore(catalog, "ds")
    store.store_completed_load("x")  # creates a _dlt_ table that must be skipped
    doc = store.derive_schema_from_tables()
    assert doc["version_hash"] == "derived_from_iceberg"
    assert set(doc["tables"]) == {"users"}
    assert doc["tables"]["users"]["columns"]["user_id"]["data_type"] == "bigint"


# ---- load-ledger resilience (reference golden cases:
# tests/test_load_metadata_resilience.py:34-128) ----------------------------

def test_store_load_retries_transient_commit_error(store, monkeypatch):
    """A transient commit conflict retries with backoff and lands exactly
    one row."""
    from dlt_iceberg_spark.errors import CommitConflictError

    calls = {"n": 0}
    orig = type(store)._append

    def flaky(self, name, schema, rows):
        calls["n"] += 1
        if calls["n"] == 1:
            raise CommitConflictError("transient commit failure")
        return orig(self, name, schema, rows)

    sleeps = []
    monkeypatch.setattr(type(store), "_append", flaky)
    assert store.store_completed_load("retry-load", sleep=sleeps.append) is True
    assert calls["n"] == 2
    assert sleeps == [1.0]
    assert store.load_recorded("retry-load")


def test_store_load_idempotent_no_append_when_recorded(store, monkeypatch):
    """Second store for the same load_id must not append at all."""
    assert store.store_completed_load("idem-load") is True

    def boom(self, *a, **k):
        raise AssertionError("append must not be called for a recorded load")

    monkeypatch.setattr(type(store), "_append", boom)
    assert store.store_completed_load("idem-load") is False


def test_store_load_ambiguous_commit_read_after_error(store, monkeypatch):
    """When the commit errors but the read-after-error check finds the row
    (a concurrent committer recorded this load), do NOT retry the append —
    retrying would double-record the load."""
    from dlt_iceberg_spark.errors import CommitConflictError

    orig = type(store)._append
    calls = {"n": 0}

    def ambiguous(self, name, schema, rows):
        calls["n"] += 1
        # the append "fails" AFTER a concurrent writer landed the same row
        orig(self, name, schema, rows)
        raise CommitConflictError("state unknown")

    sleeps = []
    monkeypatch.setattr(type(store), "_append", ambiguous)
    assert store.store_completed_load("ambig-load", sleep=sleeps.append) is True
    assert calls["n"] == 1  # no second append
    assert sleeps == []  # no backoff: ambiguity resolved by reading
    monkeypatch.setattr(type(store), "_append", orig)
    df = store._table_df(
        "_dlt_loads", __import__("dlt_iceberg_spark.lake.state", fromlist=["LOADS_SCHEMA"]).LOADS_SCHEMA
    )
    assert df.filter(df.load_id == "ambig-load").count() == 1


# ---- reference golden cases: tests/test_with_state_sync.py ----------------

def test_lookups_return_none_when_tables_missing(spark, warehouse):
    """Fresh destination: every lookup returns None instead of raising
    (reference: test_get_stored_{schema,schema_by_hash,state}_returns_none
    _when_table_missing)."""
    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.state import StateStore

    store = StateStore(LakeCatalog(spark, warehouse), "fresh_ns")
    assert store.get_newest_schema("any") is None
    assert store.get_schema_by_hash("deadbeef") is None
    assert store.get_stored_state("any") is None
    assert store.load_recorded("any") is False


def test_restore_prefers_ledger_over_derivation(spark, warehouse):
    """When _dlt_version has a row, restore returns THAT doc verbatim —
    derivation only kicks in on a ledger-less destination (reference:
    test_get_stored_schema_prefers_dlt_version_over_derivation)."""
    from pyspark.sql import Row
    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.state import StateStore
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec

    catalog = LakeCatalog(spark, warehouse)
    store = StateStore(catalog, "main")
    # a live table exists (derivation WOULD find it)...
    LakeWriter(catalog, "main").write(
        TableSpec(name="users", write_disposition="append"),
        spark.createDataFrame([Row(user_id=1, name="a")]),
    )
    derived = store.restore_schema("pipe")
    assert "users" in derived["tables"]  # no ledger yet -> derived
    assert derived["version_hash"] == "derived_from_iceberg"
    # ...but once the ledger has a doc, it wins verbatim
    doc = {"tables": {"users": {"columns": {"user_id": {"data_type": "bigint"}}}},
           "custom_marker": True}
    store.store_schema("pipe", "hash-1", 1, doc)
    assert store.restore_schema("pipe") == doc


# ---- timestamp-flavor compatibility (reference golden cases:
# tests/test_with_state_sync.py:313-430) -------------------------------------


def test_state_created_at_adapts_to_existing_timestamptz_schema(spark, warehouse):
    """A state table pre-created with tz-aware created_at keeps its flavor;
    the engine's naive-UTC batch adapts instead of clashing."""
    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.state import STATE_SCHEMA, STATE_TABLE, StateStore

    tz_schema = T.StructType(
        [
            T.StructField(
                f.name, T.TimestampType() if f.name == "created_at" else f.dataType, f.nullable
            )
            for f in STATE_SCHEMA.fields
        ]
    )
    catalog = LakeCatalog(spark, warehouse)
    catalog.create_namespace("ds")
    catalog.create_table("ds", STATE_TABLE, tz_schema)

    store = StateStore(catalog, "ds")
    store.store_pipeline_state("my_pipeline", {"state": True}, 1, "hash1")

    table = catalog.load_table("ds", STATE_TABLE)
    field = {f.name: f.dataType for f in table.schema().fields}["created_at"]
    assert isinstance(field, T.TimestampType)  # NOT downgraded to ntz
    row = store.get_stored_state("my_pipeline")
    assert row is not None and row.state == '{"state": true}'
    assert row.created_at is not None


def test_state_created_at_preserves_naive_schema(spark, warehouse):
    """Default path: the engine-created table stays timestamp_ntz across
    appends (no silent upgrade either)."""
    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.state import STATE_TABLE, StateStore

    catalog = LakeCatalog(spark, warehouse)
    catalog.create_namespace("ds")
    store = StateStore(catalog, "ds")
    store.store_pipeline_state("p", {"a": 1}, 1, "h1")
    store.store_pipeline_state("p", {"a": 2}, 2, "h2")
    table = catalog.load_table("ds", STATE_TABLE)
    field = {f.name: f.dataType for f in table.schema().fields}["created_at"]
    assert isinstance(field, T.TimestampNTZType)
    assert store.get_stored_state("p").version == 2
