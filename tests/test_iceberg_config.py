"""Iceberg catalog config mapping tests (pure, no jar needed) —
URI-scheme flavor detection + auth/S3 conf emission, mirroring the
reference's catalog wiring (destination_client.py:679-734)."""

from dlt_iceberg_spark.lake.iceberg_config import (
    ICEBERG_EXTENSION,
    S3_FILE_IO,
    SPARK_CATALOG_IMPL,
    IcebergCatalogConfig,
)


def test_rest_catalog_with_oauth_and_s3():
    cfg = IcebergCatalogConfig(
        catalog_name="lake",
        catalog_uri="http://nessie:19120/iceberg/main",
        warehouse="s3://lakehouse",
        credential="client:secret",
        oauth2_server_uri="http://auth/token",
        s3_endpoint="http://minio:9000",
        s3_access_key_id="ak",
        s3_secret_access_key="sk",
        s3_region="us-east-1",
    )
    conf = cfg.to_spark_conf()
    assert cfg.catalog_type() == "rest"
    assert conf["spark.sql.extensions"] == ICEBERG_EXTENSION
    assert conf["spark.sql.catalog.lake"] == SPARK_CATALOG_IMPL
    assert conf["spark.sql.catalog.lake.type"] == "rest"
    assert conf["spark.sql.catalog.lake.uri"] == "http://nessie:19120/iceberg/main"
    assert conf["spark.sql.catalog.lake.credential"] == "client:secret"
    assert conf["spark.sql.catalog.lake.oauth2-server-uri"] == "http://auth/token"
    assert conf["spark.sql.catalog.lake.scope"] == "PRINCIPAL_ROLE:ALL"
    assert conf["spark.sql.catalog.lake.io-impl"] == S3_FILE_IO
    assert conf["spark.sql.catalog.lake.s3.endpoint"] == "http://minio:9000"
    assert conf["spark.sql.catalog.lake.s3.path-style-access"] == "true"
    assert conf["spark.sql.catalog.lake.client.region"] == "us-east-1"
    # snapshot freshness default
    assert conf["spark.sql.catalog.lake.cache-enabled"] == "false"


def test_rest_bearer_token_without_oauth():
    cfg = IcebergCatalogConfig(catalog_uri="https://polaris/api/catalog", token="t0k")
    conf = cfg.to_spark_conf()
    assert conf["spark.sql.catalog.lake.token"] == "t0k"
    assert "spark.sql.catalog.lake.credential" not in conf


def test_sigv4_for_glue():
    cfg = IcebergCatalogConfig(
        catalog_uri="https://glue.us-west-2.amazonaws.com/iceberg",
        sigv4_enabled=True,
        signing_region="us-west-2",
    )
    conf = cfg.to_spark_conf()
    assert conf["spark.sql.catalog.lake.rest.sigv4-enabled"] == "true"
    assert conf["spark.sql.catalog.lake.rest.signing-region"] == "us-west-2"
    assert conf["spark.sql.catalog.lake.rest.signing-name"] == "execute-api"


def test_jdbc_catalog_from_sqlite_uri():
    cfg = IcebergCatalogConfig(
        catalog_uri="sqlite:///tmp/catalog.db", warehouse="file:///tmp/wh",
        jdbc_user="u", jdbc_password="p",
    )
    conf = cfg.to_spark_conf()
    assert cfg.catalog_type() == "jdbc"
    assert conf["spark.sql.catalog.lake.type"] == "jdbc"
    assert conf["spark.sql.catalog.lake.uri"] == "jdbc:sqlite:///tmp/catalog.db"
    assert conf["spark.sql.catalog.lake.jdbc.user"] == "u"


def test_hadoop_catalog_default():
    cfg = IcebergCatalogConfig(warehouse="file:///tmp/wh")
    conf = cfg.to_spark_conf()
    assert cfg.catalog_type() == "hadoop"
    assert conf["spark.sql.catalog.lake.type"] == "hadoop"
    assert conf["spark.sql.catalog.lake.warehouse"] == "file:///tmp/wh"
    assert "spark.sql.catalog.lake.uri" not in conf


def test_apply_to_builder_roundtrip():
    from pyspark.sql import SparkSession

    cfg = IcebergCatalogConfig(catalog_uri="http://r/c", warehouse="s3://w")
    builder = cfg.apply(SparkSession.builder)
    opts = builder._options
    assert opts["spark.sql.catalog.lake.type"] == "rest"
    assert opts["spark.sql.catalog.lake.warehouse"] == "s3://w"
