"""Shared plumbing for compute-bound operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure a compute-bound stage runs at cluster parallelism.

    Small inputs (one parquet file, one row group) scan as a single
    partition, serializing every downstream expression onto one core even on
    a 32-core local mode / 1000-executor cluster.  Repartition ONLY when the
    scan is under-parallel — at 100 TB the scan already yields thousands of
    partitions and this is a no-op (no shuffle added); on a single small file
    the round-robin shuffle of raw rows costs far less than the serialized
    compute it unblocks.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
