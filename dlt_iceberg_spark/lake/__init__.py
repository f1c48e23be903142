"""Atomic snapshot-based lake table layer (Iceberg-shaped, Spark-native).

No Iceberg runtime jar ships in this environment, so the write-side
dispositions of the reference (SURVEY.md §2.2) are implemented over a
lightweight table format: parquet data files + JSON snapshot manifests with
an atomically-renamed current-pointer.  The merge semantics themselves are
pure DataFrame plans (``merge.py``) and are backend-agnostic — against a real
Iceberg catalog they compile to a single ``MERGE INTO``.
"""

from dlt_iceberg_spark.lake.merge import (
    upsert_plan,
    delete_insert_plan,
    split_hard_deletes,
    merge_plan,
)
from dlt_iceberg_spark.lake.table import LakeTable, Snapshot, DataFile
from dlt_iceberg_spark.lake.catalog import LakeCatalog
from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec, WriterConfig, commit_load
from dlt_iceberg_spark.lake.state import StateStore
from dlt_iceberg_spark.lake.dataset import Dataset
from dlt_iceberg_spark.lake.feed import ChangelogFeed
from dlt_iceberg_spark.lake.pipeline import Pipeline, Resource, resource, LoadInfo
from dlt_iceberg_spark.lake.maintenance import (
    CompactionResult,
    MaintenancePolicy,
    backfill_stats,
    consolidate_position_deletes,
    compact_table,
    expire_snapshots,
    maintain,
    remove_orphan_files,
    rewrite_zorder,
)
from dlt_iceberg_spark.lake.iceberg_config import IcebergCatalogConfig
from dlt_iceberg_spark.lake.matview import IncrementalJoinView
from dlt_iceberg_spark.lake.rollup import IncrementalRollup

__all__ = [
    "IncrementalJoinView",
    "IncrementalRollup",
    "upsert_plan",
    "delete_insert_plan",
    "split_hard_deletes",
    "merge_plan",
    "LakeTable",
    "Snapshot",
    "DataFile",
    "LakeCatalog",
    "LakeWriter",
    "TableSpec",
    "WriterConfig",
    "commit_load",
    "StateStore",
    "Dataset",
    "ChangelogFeed",
    "Pipeline",
    "Resource",
    "resource",
    "LoadInfo",
    "backfill_stats",
    "consolidate_position_deletes",
    "compact_table",
    "expire_snapshots",
    "CompactionResult",
    "MaintenancePolicy",
    "maintain",
    "remove_orphan_files",
    "rewrite_zorder",
    "IcebergCatalogConfig",
]
