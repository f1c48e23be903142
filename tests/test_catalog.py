"""Catalog surface tests (SURVEY §2.1 S5, §2.2 W9-W12): namespace/table
listing, create/load/drop+purge, drop_storage, stray-table registration,
custom location layouts — the goldens mirror the reference's
tests/test_drop_tables.py and test_capabilities.py:229-279."""

import os

import pytest
from pyspark.sql import types as T

from dlt_iceberg_spark.errors import (
    NamespaceNotFoundError,
    TableAlreadyExistsError,
    TableNotFoundError,
)
from dlt_iceberg_spark.lake.catalog import LakeCatalog

SCHEMA = T.StructType([T.StructField("id", T.LongType(), False)])


@pytest.fixture()
def catalog(spark, warehouse):
    return LakeCatalog(spark, warehouse)


def test_namespace_lifecycle(catalog):
    assert catalog.list_namespaces() == []
    catalog.create_namespace("ns1")
    catalog.create_namespace("ns2")
    assert catalog.list_namespaces() == ["ns1", "ns2"]
    assert catalog.namespace_exists("ns1") and not catalog.namespace_exists("nope")


def test_table_lifecycle_and_listing(catalog):
    catalog.create_table("ns", "t1", SCHEMA)
    catalog.create_table("ns", "t2", SCHEMA)
    assert catalog.list_tables("ns") == ["t1", "t2"]
    assert catalog.table_exists("ns", "t1")
    with pytest.raises(TableAlreadyExistsError):
        catalog.create_table("ns", "t1", SCHEMA)
    with pytest.raises(NamespaceNotFoundError):
        catalog.list_tables("missing_ns")
    loaded = catalog.load_table("ns", "t1")
    assert loaded.schema() == SCHEMA


def test_drop_table_purge_removes_data(catalog, spark):
    catalog.create_table("ns", "t", SCHEMA)
    loc = catalog.table_location("ns", "t")
    assert os.path.isdir(loc)
    catalog.drop_table("ns", "t", purge=True)
    assert not os.path.isdir(loc)
    with pytest.raises(TableNotFoundError):
        catalog.load_table("ns", "t")
    with pytest.raises(TableNotFoundError):
        catalog.drop_table("ns", "t")


def test_drop_without_purge_keeps_data_files(catalog):
    catalog.create_table("ns", "t", SCHEMA)
    loc = catalog.table_location("ns", "t")
    catalog.drop_table("ns", "t", purge=False)
    assert not catalog.table_exists("ns", "t")  # metadata gone
    assert os.path.isdir(loc)  # data dir retained


def test_drop_storage(catalog):
    catalog.create_table("ns", "a", SCHEMA)
    catalog.create_table("ns", "b", SCHEMA)
    catalog.drop_storage("ns")
    assert not catalog.namespace_exists("ns")


def test_register_stray_tables(catalog, spark, warehouse):
    catalog.create_table("ns", "known", SCHEMA)
    # a stray table: valid metadata on disk, created by a *different*
    # catalog handle (reference scenario: files landed outside the catalog)
    other = LakeCatalog(spark, warehouse)
    other.create_table("ns", "stray", SCHEMA)
    # junk dir without snapshot metadata must NOT register
    os.makedirs(os.path.join(warehouse, "ns", "junk"))
    assert catalog.register_stray_tables("ns") == ["known", "stray"]
    assert catalog.register_stray_tables("empty_ns") == []


def test_custom_location_layout(spark, warehouse):
    catalog = LakeCatalog(
        spark, warehouse, location_layout="{namespace}/custom/{table_name}"
    )
    catalog.create_table("ns", "t", SCHEMA)
    assert os.path.isdir(os.path.join(warehouse, "ns", "custom", "t"))
    assert catalog.load_table("ns", "t").schema() == SCHEMA
