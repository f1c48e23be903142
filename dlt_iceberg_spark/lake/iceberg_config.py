"""Apache Iceberg catalog configuration for a real Spark+Iceberg deployment.

The reference auto-detects the catalog flavor from the URI scheme and wires
auth + object-store options into PyIceberg (destination_client.py:679-734;
config surface 113-167).  On Spark the same deployment point is the catalog
conf namespace ``spark.sql.catalog.<name>.*`` resolved by the
iceberg-spark-runtime jar.  This module is the pure config mapping —
``IcebergCatalogConfig`` mirrors the reference's knobs and emits the Spark
conf dict; it needs no Iceberg jar to construct (the jar is only needed to
*use* the session), so the mapping is unit-testable anywhere.

Flavor detection (same rules as the reference):
- ``http(s)://``            → REST catalog (Nessie / Polaris / Lakekeeper /
                              Glue / Unity via their REST endpoints)
- ``jdbc:`` / ``sqlite://`` / ``postgresql://`` → JDBC catalog
- ``file://`` / bare path / no URI → Hadoop catalog (filesystem warehouse)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import SparkSession

ICEBERG_EXTENSION = "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
SPARK_CATALOG_IMPL = "org.apache.iceberg.spark.SparkCatalog"
S3_FILE_IO = "org.apache.iceberg.aws.s3.S3FileIO"


@dataclass
class IcebergCatalogConfig:
    """Reference config surface (destination_client.py:113-167) → Spark conf."""

    catalog_name: str = "lake"
    catalog_uri: str | None = None
    warehouse: str | None = None

    # OAuth2 client-credentials, or static bearer token
    credential: str | None = None
    oauth2_server_uri: str | None = None
    scope: str | None = "PRINCIPAL_ROLE:ALL"
    token: str | None = None

    # AWS SigV4 request signing (Glue REST)
    sigv4_enabled: bool = False
    signing_region: str | None = None
    signing_name: str = "execute-api"

    # S3 / object store
    s3_endpoint: str | None = None
    s3_access_key_id: str | None = None
    s3_secret_access_key: str | None = None
    s3_region: str | None = None

    # JDBC catalog credentials
    jdbc_user: str | None = None
    jdbc_password: str | None = None

    # snapshot freshness: disable table metadata caching so every query
    # re-resolves the current snapshot (reference always re-creates views,
    # sql_client.py:51-55)
    cache_enabled: bool = False

    def catalog_type(self) -> str:
        uri = self.catalog_uri or ""
        if uri.startswith(("http://", "https://")):
            return "rest"
        if uri.startswith(("jdbc:", "sqlite://", "postgresql://")):
            return "jdbc"
        return "hadoop"

    def to_spark_conf(self) -> dict[str, str]:
        base = f"spark.sql.catalog.{self.catalog_name}"
        ctype = self.catalog_type()
        conf: dict[str, Any] = {
            "spark.sql.extensions": ICEBERG_EXTENSION,
            base: SPARK_CATALOG_IMPL,
            f"{base}.type": ctype,
            f"{base}.cache-enabled": str(self.cache_enabled).lower(),
        }
        if self.warehouse:
            conf[f"{base}.warehouse"] = self.warehouse
        if ctype in ("rest", "jdbc") and self.catalog_uri:
            conf[f"{base}.uri"] = self._normalized_uri()

        if ctype == "rest":
            if self.credential and self.oauth2_server_uri:
                conf[f"{base}.credential"] = self.credential
                conf[f"{base}.oauth2-server-uri"] = self.oauth2_server_uri
                if self.scope:
                    conf[f"{base}.scope"] = self.scope
            elif self.token:
                conf[f"{base}.token"] = self.token
            if self.sigv4_enabled:
                conf[f"{base}.rest.sigv4-enabled"] = "true"
                if self.signing_region:
                    conf[f"{base}.rest.signing-region"] = self.signing_region
                conf[f"{base}.rest.signing-name"] = self.signing_name
        elif ctype == "jdbc":
            if self.jdbc_user:
                conf[f"{base}.jdbc.user"] = self.jdbc_user
            if self.jdbc_password:
                conf[f"{base}.jdbc.password"] = self.jdbc_password

        if any((self.s3_endpoint, self.s3_access_key_id, self.s3_secret_access_key, self.s3_region)):
            conf[f"{base}.io-impl"] = S3_FILE_IO
            if self.s3_endpoint:
                conf[f"{base}.s3.endpoint"] = self.s3_endpoint
                conf[f"{base}.s3.path-style-access"] = "true"
            if self.s3_access_key_id:
                conf[f"{base}.s3.access-key-id"] = self.s3_access_key_id
            if self.s3_secret_access_key:
                conf[f"{base}.s3.secret-access-key"] = self.s3_secret_access_key
            if self.s3_region:
                conf[f"{base}.client.region"] = self.s3_region
        return {k: str(v) for k, v in conf.items()}

    def _normalized_uri(self) -> str:
        """JDBC catalogs want ``jdbc:``-prefixed URIs; the reference accepts
        ``sqlite://``/``postgresql://`` and PyIceberg adds the prefix."""
        uri = self.catalog_uri or ""
        if self.catalog_type() == "jdbc" and not uri.startswith("jdbc:"):
            return f"jdbc:{uri}"
        return uri

    def apply(self, builder: SparkSession.Builder) -> SparkSession.Builder:
        """Apply to a SparkSession builder (requires the
        iceberg-spark-runtime jar on the session classpath to take effect)."""
        for k, v in self.to_spark_conf().items():
            builder = builder.config(k, v)
        return builder
