"""Integration-shaped REST-catalog tests, mirroring the reference's
health-check-skip pattern (tests/test_destination_rest_catalog.py:29-44,
tests/test_lakekeeper.py:103) so the suite is live the moment a catalog
endpoint + iceberg-spark-runtime jar exist.

Prerequisites (skipped automatically when absent — no Docker in this
environment):

    1. A REST catalog (Nessie/Polaris/Lakekeeper):
         docker compose up -d        # reference's docker-compose.yml:1-60
    2. export LAKE_REST_CATALOG_URI=http://localhost:19120/iceberg/main
       (optionally LAKE_REST_TOKEN / LAKE_S3_* for auth + object store)
    3. An iceberg-spark-runtime jar on the Spark classpath.

The non-skipped portion pins the full builder wiring — every conf key the
live session would receive — so config regressions surface in ANY
environment; only the endpoint round-trip needs the real catalog.
"""

from __future__ import annotations

import os
import urllib.error
import urllib.request

import pytest
from pyspark.sql import SparkSession

from dlt_iceberg_spark.lake.iceberg_config import (
    ICEBERG_EXTENSION,
    SPARK_CATALOG_IMPL,
    IcebergCatalogConfig,
)

CATALOG_URI = os.environ.get("LAKE_REST_CATALOG_URI")


def _catalog_available() -> bool:
    """Health-check the configured REST catalog (reference pattern:
    is_nessie_available, test_destination_rest_catalog.py:29-36)."""
    if not CATALOG_URI:
        return False
    probe = CATALOG_URI.rstrip("/") + "/v1/config"
    try:
        with urllib.request.urlopen(probe, timeout=2) as resp:
            return resp.status == 200
    except (urllib.error.URLError, OSError):
        return False


def _iceberg_jar_on_classpath() -> bool:
    try:
        import glob

        from pyspark.find_spark_home import _find_spark_home

        jars = glob.glob(os.path.join(_find_spark_home(), "jars", "iceberg-spark-runtime*"))
        return bool(jars)
    except Exception:
        return False


def _live_config() -> IcebergCatalogConfig:
    return IcebergCatalogConfig(
        catalog_name="it",
        catalog_uri=CATALOG_URI,
        warehouse=os.environ.get("LAKE_REST_WAREHOUSE", "s3://lakehouse"),
        token=os.environ.get("LAKE_REST_TOKEN"),
        s3_endpoint=os.environ.get("LAKE_S3_ENDPOINT"),
        s3_access_key_id=os.environ.get("LAKE_S3_ACCESS_KEY_ID"),
        s3_secret_access_key=os.environ.get("LAKE_S3_SECRET_ACCESS_KEY"),
        s3_region=os.environ.get("LAKE_S3_REGION"),
    )


# ---- always-on: full session wiring (no jar, no endpoint needed) ----------


def test_apply_wires_every_conf_key_into_builder():
    """`apply` must push the COMPLETE conf map into the builder — the exact
    keys a live Iceberg session resolves; a dropped key would only surface
    in production otherwise."""
    cfg = IcebergCatalogConfig(
        catalog_name="it",
        catalog_uri="http://localhost:19120/iceberg/main",
        warehouse="s3://lakehouse",
        credential="client:secret",
        oauth2_server_uri="http://localhost:19120/oauth/token",
        s3_endpoint="http://localhost:9000",
        s3_access_key_id="ak",
        s3_secret_access_key="sk",
        s3_region="us-east-1",
    )
    builder = SparkSession.builder.appName("wiring-check")
    builder = cfg.apply(builder)
    opts = dict(builder._options)
    for key, val in cfg.to_spark_conf().items():
        assert opts.get(key) == val, f"conf key {key!r} not wired"
    assert opts["spark.sql.extensions"] == ICEBERG_EXTENSION
    assert opts["spark.sql.catalog.it"] == SPARK_CATALOG_IMPL


def test_auth_option_passthrough_matrix():
    """Auth selection mirrors the reference: OAuth2 client-credentials wins
    over static token; SigV4 adds signing confs; JDBC gets user/password."""
    oauth = IcebergCatalogConfig(
        catalog_uri="https://polaris/api/catalog", credential="c:s",
        oauth2_server_uri="https://auth/token", token="ignored",
    ).to_spark_conf()
    assert oauth["spark.sql.catalog.lake.credential"] == "c:s"
    assert "spark.sql.catalog.lake.token" not in oauth

    bearer = IcebergCatalogConfig(
        catalog_uri="https://lakekeeper/catalog", token="tok",
    ).to_spark_conf()
    assert bearer["spark.sql.catalog.lake.token"] == "tok"

    sigv4 = IcebergCatalogConfig(
        catalog_uri="https://glue.amazonaws.com/iceberg",
        sigv4_enabled=True, signing_region="eu-west-1",
    ).to_spark_conf()
    assert sigv4["spark.sql.catalog.lake.rest.sigv4-enabled"] == "true"
    assert sigv4["spark.sql.catalog.lake.rest.signing-region"] == "eu-west-1"
    assert sigv4["spark.sql.catalog.lake.rest.signing-name"] == "execute-api"

    jdbc = IcebergCatalogConfig(
        catalog_uri="postgresql://db/catalog", jdbc_user="u", jdbc_password="p",
    ).to_spark_conf()
    assert jdbc["spark.sql.catalog.lake.uri"].startswith("jdbc:postgresql://")
    assert jdbc["spark.sql.catalog.lake.jdbc.user"] == "u"


# ---- integration: needs a live endpoint + jar -----------------------------


@pytest.mark.integration
@pytest.mark.skipif(
    not _catalog_available(),
    reason="REST catalog not reachable — set LAKE_REST_CATALOG_URI and "
    "run the reference's docker compose up -d",
)
@pytest.mark.skipif(
    not _iceberg_jar_on_classpath(),
    reason="iceberg-spark-runtime jar not on the Spark classpath",
)
def test_rest_catalog_roundtrip():
    """Write-read round trip through the live catalog (reference parity:
    test_destination_rest_catalog.py — create, load 25 rows, append 10,
    verify 35)."""
    cfg = _live_config()
    spark = cfg.apply(
        SparkSession.builder.master("local[2]").appName("rest-it")
    ).getOrCreate()
    try:
        spark.sql("CREATE NAMESPACE IF NOT EXISTS it.itests")
        spark.sql("DROP TABLE IF EXISTS it.itests.events")
        spark.sql(
            "CREATE TABLE it.itests.events (event_id BIGINT, value DOUBLE) USING iceberg"
        )
        spark.range(25).selectExpr(
            "id AS event_id", "CAST(id * 10 AS DOUBLE) AS value"
        ).writeTo("it.itests.events").append()
        assert spark.table("it.itests.events").count() == 25
        spark.range(25, 35).selectExpr(
            "id AS event_id", "CAST(id * 10 AS DOUBLE) AS value"
        ).writeTo("it.itests.events").append()
        assert spark.table("it.itests.events").count() == 35
        snaps = spark.sql("SELECT * FROM it.itests.events.snapshots").count()
        assert snaps >= 2  # one per load — the reference's one-snapshot-per-load contract
    finally:
        spark.stop()
