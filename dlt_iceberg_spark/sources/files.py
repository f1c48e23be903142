"""File-based sources: CSV / JSON-lines / parquet → DataFrame.

The reference reads CSV row-by-row on the driver
(examples/incremental_load.py:20-30, ``csv.DictReader`` + per-row int
casts); Spark's readers do the same work distributed — a 100 TB CSV landing
zone scans as thousands of parallel tasks, and explicit casts replace the
per-row coercions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def csv_source(
    spark: SparkSession,
    path: str,
    casts: dict[str, str] | None = None,
    header: bool = True,
    delimiter: str = ",",
    schema: str | None = None,
) -> DataFrame:
    """CSV scan with explicit column casts.

    Prefer ``casts`` (read as string, cast listed columns) or a full
    ``schema`` DDL over ``inferSchema`` — inference costs an extra full
    pass over the data, which at scale doubles the scan.
    """
    reader = spark.read.option("header", header).option("sep", delimiter)
    if schema:
        df = reader.schema(schema).csv(path)
    else:
        df = reader.csv(path)
    for col, dtype in (casts or {}).items():
        df = df.withColumn(col, F.col(col).cast(dtype))
    return df


def json_source(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    multiline: bool = False,
) -> DataFrame:
    """JSON-lines scan (one record per line; ``multiline`` for arrays).

    An explicit schema skips Spark's sampling pass and keeps corrupt
    records visible in ``_corrupt_record`` instead of failing the scan.
    """
    reader = spark.read.option("multiline", multiline)
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def parquet_source(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan (vectorized reader; pushdown/pruning from Catalyst)."""
    return spark.read.parquet(path)
