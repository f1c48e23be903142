"""Ingestion sources (SURVEY.md §2.1 S6).

The reference's sources are plain Python generators — CSV rows via
``csv.DictReader`` (examples/incremental_load.py:20-30) and a REST API
flattened to dicts with range-splitting retry
(examples/usgs_earthquakes.py:26-133).  Here each becomes a DataFrame
producer usable as a :class:`~dlt_iceberg_spark.lake.pipeline.Resource`:

- files (CSV/JSON/parquet) read through Spark's distributed readers with
  explicit schemas/casts — scans scale with the cluster;
- REST-style record fetches stay driver-side only for the *cursor walk*;
  the scale path is :func:`distributed_fetch`, which fans the fetch
  partitions out to executors via ``mapInPandas``.
"""

from dlt_iceberg_spark.sources.files import csv_source, json_source, parquet_source
from dlt_iceberg_spark.sources.records import (
    distributed_fetch,
    fetch_with_split,
    flatten_record,
    records_source,
)

__all__ = [
    "csv_source",
    "json_source",
    "parquet_source",
    "records_source",
    "fetch_with_split",
    "flatten_record",
    "distributed_fetch",
]
