"""User-facing destination factory + pipeline constructor — API parity with
the reference's entry points (src/dlt_iceberg/destination.py:439-473:
``iceberg_rest(**kwargs)`` returning a dlt destination, consumed by
``dlt.pipeline(destination=..., dataset_name=...)``).

A reference user's setup code maps one-to-one::

    # reference                              # here
    from dlt_iceberg import iceberg_rest     from dlt_iceberg_spark import iceberg_rest, pipeline
    p = dlt.pipeline(                        p = pipeline(
        pipeline_name="loads",                   "loads",
        destination=iceberg_rest(                destination=iceberg_rest(
            catalog_uri="sqlite:///c.db",            catalog_uri="sqlite:///c.db",
            warehouse="file:///wh",                  warehouse="/wh",
            namespace="prod"),                       namespace="prod"),
        dataset_name="prod")                     dataset_name="prod")
    p.run(users())                           p.run(users)

``catalog_uri`` is carried as an :class:`IcebergCatalogConfig` so a real
Iceberg REST/JDBC deployment is a session-conf swap (the config's
``apply``/``to_spark_conf``), not a code change; the local engine runs on
the warehouse path directly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

from dlt_iceberg_spark.lake.iceberg_config import IcebergCatalogConfig
from dlt_iceberg_spark.lake.pipeline import Pipeline
from dlt_iceberg_spark.lake.writer import WriterConfig


@dataclass
class IcebergDestination:
    """Where loads land: warehouse + namespace (+ optional real-catalog
    deployment config).  The reference's destination instance analogue."""

    warehouse: str
    namespace: str = "main"
    catalog_config: IcebergCatalogConfig | None = None
    writer_config: WriterConfig | None = None
    extra: dict[str, Any] = field(default_factory=dict)

    def capabilities(self) -> dict[str, Any]:
        """The capability surface the reference advertises
        (destination.py:439-473 + _raw_capabilities override;
        tests/test_capabilities.py asserts these)."""
        return {
            "loader_file_format": "parquet",
            "naming_convention": "snake_case",
            "supported_merge_strategies": ["delete-insert", "upsert"],
            "supports_schema_evolution": True,
            "supports_hard_deletes": True,
            "supports_partitioning": [
                "identity", "year", "month", "day", "hour", "bucket", "truncate",
            ],
        }


def iceberg_rest(
    *,
    warehouse: str,
    namespace: str = "main",
    catalog_uri: str | None = None,
    writer_config: WriterConfig | None = None,
    **catalog_options: Any,
) -> IcebergDestination:
    """Destination factory with the reference's signature shape.

    ``catalog_uri``/auth options build an :class:`IcebergCatalogConfig`
    (OAuth2/SigV4/S3 passthrough — lake/iceberg_config.py); locally the
    engine commits to ``warehouse`` with the same dispositions either way.
    """
    wh = warehouse
    for prefix in ("file://",):
        if wh.startswith(prefix):
            wh = wh[len(prefix):]
    cfg = None
    if catalog_uri is not None or catalog_options:
        known = {
            k: v
            for k, v in catalog_options.items()
            if k in IcebergCatalogConfig.__dataclass_fields__
        }
        unknown = set(catalog_options) - set(known)
        if unknown:
            raise TypeError(f"unknown catalog options: {sorted(unknown)}")
        cfg = IcebergCatalogConfig(catalog_uri=catalog_uri, warehouse=warehouse, **known)
    return IcebergDestination(
        warehouse=wh,
        namespace=namespace,
        catalog_config=cfg,
        writer_config=writer_config,
    )


def pipeline(
    pipeline_name: str,
    *,
    destination: IcebergDestination,
    dataset_name: str | None = None,
    spark: SparkSession | None = None,
    branch: str = "main",
) -> Pipeline:
    """``dlt.pipeline`` analogue: bind a name + destination into a runnable
    :class:`Pipeline` (extract → atomic snapshot per table → ledger)."""
    if spark is None:
        from dlt_iceberg_spark.session import get_spark

        spark = get_spark(pipeline_name)
    return Pipeline(
        spark,
        destination.warehouse,
        dataset_name=dataset_name or destination.namespace,
        pipeline_name=pipeline_name,
        writer_config=destination.writer_config,
        branch=branch,
    )
